#!/bin/bash
# Round-19 campaign B — the two absorb-lifecycle records:
#   1. sf100 TERMINAL PATH (VERDICT r18 #3): absorb past 2x the design
#      point -> atomic refusal -> re-writeIndex at the re-derived
#      geometry (k2 ~ sqrt(4.2M)) -> assignment-consistent probe
#      equivalence. Doc leg rides (create+absorb at 5 M docs).
#   2. sf300 DOC LEG (VERDICT r18 #4): the doc-index create/absorb one
#      leg above sf100 — 15 M docs, ~9 GB band-table scratch (the 50 M
#      fourth decade is ~30 GB, over this box's disk; sf300 is the
#      largest disk-affordable record).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r19m
CLS=/tmp/cls_r19_new
mkdir -p "$OUT"
log() { echo "=== $1 $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) free=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)G" >> "$OUT/campaign_b.log"; }

log "absorb sf100 rebuild"
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_ABSORB_REBUILD=1 \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf100 "$OUT/absorb_rebuild_sf100.json" \
  > "$OUT/absorb_rebuild_sf100.log" 2>&1 || echo "absorb sf100 exited $?" >> "$OUT/campaign_b.log"
tail -c 600 "$OUT/absorb_rebuild_sf100.json" >> "$OUT/campaign_b.log" 2>/dev/null; echo >> "$OUT/campaign_b.log"

log "absorb sf300 doc leg"
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=64 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_ABSORB_VEC=0 \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf300 "$OUT/absorb_docs_sf300.json" \
  > "$OUT/absorb_docs_sf300.log" 2>&1 || echo "absorb sf300 exited $?" >> "$OUT/campaign_b.log"
tail -c 600 "$OUT/absorb_docs_sf300.json" >> "$OUT/campaign_b.log" 2>/dev/null; echo >> "$OUT/campaign_b.log"
log "campaign19b done"
