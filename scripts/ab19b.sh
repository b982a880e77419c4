#!/bin/bash
# ab19 continuation: four more interleaved pairs with REVERSED
# within-pair order (r19 first) — combined with ab19.sh's three
# (r18 first), position-in-pair effects cancel under the ~10-min
# autocorrelated box drift the first session exposed.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r19m
run() {
  local cls=$1 name=$2
  echo "=== $name $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$OUT/ab.log"
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$cls SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=1 SPARK_GRAFT_SHUFFLE=32 SPARK_GRAFT_BENCH_DIR=$OUT/$name \
  SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $?" >> "$OUT/ab.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/ab.log"
}
for i in 4 5 6 7; do
  run /tmp/cls_ab_r19 ab_r19_$i
  run /tmp/cls_ab_r18 ab_r18_$i
done
echo "=== ab19b done $(date +%H:%M:%S)" >> "$OUT/ab.log"
