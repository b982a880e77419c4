#!/bin/bash
# Round-17 fixture (re)build: /tmp kept round-16's sf1.0/sf10/sf300/
# sf1000(embeddings) fixtures and their standing artifacts; only sf100
# (wiped for space) and the sf1000 documents table (curation decade,
# VERDICT r16 #7) are missing. Stacked derivation per the committed
# decade recipe (ScaleUp scaladoc): span must exceed the source
# fixture's key range.
set -euo pipefail
cd /root/repo
mkdir -p r17m
{
  echo "=== sf100 (emb+docs) from sf10 $(date +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf10 /tmp/graft_sf100 10 1000000000 embeddings,documents
  echo "=== sf1000 documents from sf100 $(date +%H:%M:%S)"
  SPARK_GRAFT_CPUS=32 scripts/jrun.sh graft.ScaleUp \
    /tmp/graft_sf100 /tmp/graft_sf1000 10 10000000000 documents
  echo "=== fixtures done $(date +%H:%M:%S)"
} >> r17m/fixtures.log 2>&1
