#!/bin/bash
# Round-20 campaign A — the two records VERDICT r19 asked for:
#   1. sf100 TERMINAL PATH THROUGH graft.Maintain (VERDICT r19 #1): the
#      same refuse -> rebuild -> equivalence runbook r19 measured via
#      the harness (absorb_rebuild_sf100.json, 82.5 s / 0 spill), now
#      executed by the production entry — Maintain.maintainRoot armed
#      with the standing corpus detects the 2x trip, takes the root
#      claim, re-writeIndexes at the re-derived design point, and gates
#      assignment consistency + the search recall floor before release.
#   2. sf1000 DOC LEG (VERDICT r19 #2): the 50 M-doc index create —
#      r19's stated-arithmetic projection (~30 GB band table) made a
#      measurement; sf300 freed (rebuildable in ~1 min) for headroom.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r20m
CLS=/tmp/cls_r20
mkdir -p "$OUT"
log() { echo "=== $1 $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) free=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)G" >> "$OUT/campaign_a.log"; }

log "maintain rebuild sf100"
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_ABSORB_REBUILD=1 SPARK_GRAFT_ABSORB_REBUILD_VIA=maintain \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf100 "$OUT/maintain_rebuild_sf100.json" \
  > "$OUT/maintain_rebuild_sf100.log" 2>&1 || echo "maintain sf100 exited $?" >> "$OUT/campaign_a.log"
tail -c 900 "$OUT/maintain_rebuild_sf100.json" >> "$OUT/campaign_a.log" 2>/dev/null; echo >> "$OUT/campaign_a.log"

log "doc index create sf1000 (50M docs)"
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=128 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_ABSORB_VEC=0 \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf1000 "$OUT/absorb_docs_sf1000.json" \
  > "$OUT/absorb_docs_sf1000.log" 2>&1 || echo "doc sf1000 exited $?" >> "$OUT/campaign_a.log"
tail -c 900 "$OUT/absorb_docs_sf1000.json" >> "$OUT/campaign_a.log" 2>/dev/null; echo >> "$OUT/campaign_a.log"
log "campaign A done"
