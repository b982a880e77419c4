#!/bin/bash
# Round-20 fixture rebuild (minimal set): the sf100 chain for the
# Maintain rebuild record + standing IVF index, and sf1000 DOCUMENTS
# ONLY for the 50M-doc index-create measurement (VERDICT r19 #2 — the
# doc-leg run needs every spare GB for the ~30 GB index; sf300 and the
# sf1000 embeddings are not used this round).
set -euo pipefail
cd /root/repo
CLS=${GRAFT_CLASSES:-/tmp/cls_r20}
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
  echo "=== sf1000 (docs only) from sf100 $(date +%H:%M:%S)"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf100 /tmp/graft_sf1000 10 10000000000 documents
  echo "=== fixtures20 done $(date +%H:%M:%S)"
  du -sh /tmp/graft_sf*
} >> r20m/fixtures.log 2>&1
