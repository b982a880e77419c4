#!/bin/bash
# Round-19 fixture rebuild: /tmp was wiped between rounds; stacked
# derivation per the committed decade recipe (ScaleUp scaladoc — span
# must exceed the source fixture's key range). sf300 documents added
# for the doc-index absorb leg above sf100 (VERDICT r18 #4).
set -euo pipefail
cd /root/repo
CLS=${GRAFT_CLASSES:-/tmp/cls_r19a}
{
  echo "=== sf1.0 (all) from testdata sf0.1 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /root/testdata/sf0.1 /tmp/graft_sf1.0 10 10000000
  echo "=== sf10 (all) from sf1.0 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf1.0 /tmp/graft_sf10 10 100000000
  echo "=== sf100 (emb+docs) from sf10 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf10 /tmp/graft_sf100 10 1000000000 embeddings,documents
  echo "=== sf300 (docs) from sf100 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf100 /tmp/graft_sf300 3 10000000000 documents
  echo "=== sf1000 (emb+docs) from sf100 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf100 /tmp/graft_sf1000 10 10000000000 documents,embeddings
  echo "=== fixtures19 done $(date +%H:%M:%S)"
  du -sh /tmp/graft_sf*
} >> r19m/fixtures.log 2>&1
