#!/bin/bash
# Round-17 campaign: the rep-only multi-probe + first-band emission
# rewrite of the ANN self-join family, measured where round 16 said it
# mattered (PERF.md r16 §9 / VERDICT r16 next-round #1-#4, #7):
#   A. sf10 semdedup_ann  — full-fanout regime (200k < 2^20): first-band
#      emission's win alone, same regime as r16's 8.3 s record.
#   B. sf100 semdedup_ann — the rep-only regime's first decade (2M).
#   C. sf300 semdedup_ann — probe-only against standing artifacts
#      (VERDICT #4: r16's 423.1 s conflated build+probe).
#   D. sf1000 semdedup_ann — 20M vectors, metrics captured DURING the
#      timed rep (SPARK_GRAFT_METRICS=timed), under the ~60GB scratch
#      ceiling the r16 record hit.
#   E. sf1000 curation funnel re-anchor on HEAD (documents-only fixture).
# One JVM per leg (jrun), SPARK_GRAFT_SHUFFLE=128 for fourth-decade legs.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r17m
mkdir -p "$OUT"

run() { # run <sfdir> <dirname> <reps> <query-list> <shuffle> [min_free_gb]
  local sf=$1 name=$2 reps=$3 qs=$4 shuf=$5 need=${6:-12}
  local free_gb
  free_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
  echo "=== $name sf=$sf reps=$reps shuffle=$shuf $(date +%H:%M:%S) free=${free_gb}G" >> "$OUT/campaign.log"
  if [ "$free_gb" -lt "$need" ]; then
    echo "SKIP $name: ${free_gb}G free < ${need}G needed" >> "$OUT/campaign.log"
    return 1
  fi
  mkdir -p "$OUT/$name"
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_SHUFFLE=$shuf SPARK_GRAFT_METRICS=timed \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}

run /tmp/graft_sf10   sf10_semdedup_ann  2 semdedup_ann 32  12
run /tmp/graft_sf100  sf100_semdedup_ann 2 semdedup_ann 32  15
run /tmp/graft_sf300  sf300_semdedup_ann 2 semdedup_ann 128 20
run /tmp/graft_sf1000 sf1000_semdedup_ann 1 semdedup_ann 128 25
run /tmp/graft_sf1000 sf1000_curate 2 gopher_filter,domain_mix,curate_prep,curate_funnel,curriculum_order 128 20
echo "=== campaign17 done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
