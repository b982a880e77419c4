#!/bin/bash
# Round-16 campaign, part 3: sf1000 vector legs on the sampled-Lloyd +
# two-level-routed IVF build (parts 1-2 = campaign16.sh/campaign16b.sh;
# the flat build measured 1045.6 s at sf100 = ~10 h projected at sf1000
# and was killed — r16m/sf100_subset/, PERF.md round-16).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r16m
run() {
  local sf=$1 name=$2 reps=$3 qs=$4 need=${5:-12}
  local free_gb
  free_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
  echo "=== $name sf=$sf reps=$reps $(date +%H:%M:%S) free=${free_gb}G" >> "$OUT/campaign.log"
  if [ "$free_gb" -lt "$need" ]; then
    echo "SKIP $name: ${free_gb}G free < ${need}G needed" >> "$OUT/campaign.log"
    return 1
  fi
  mkdir -p "$OUT/$name"
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}
run /tmp/graft_sf1000 sf1000_ivf 1 ivf_knn,ivf_probe,ivf_recall,ivf_quant 20
run /tmp/graft_sf1000 sf1000_semdedup_ann 1 semdedup_ann 20
mkdir -p "$OUT/sf1000_neardup_guard"
echo "=== embedding_neardup (guard expected) $(date +%H:%M:%S)" >> "$OUT/campaign.log"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1000 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_ONLY=embedding_neardup SPARK_GRAFT_BENCH_DIR=$OUT/sf1000_neardup_guard SPARK_DRIVER_MEM=8g \
  scripts/jrun.sh graft.Bench > "$OUT/sf1000_neardup_guard/stdout.json" 2> "$OUT/sf1000_neardup_guard/run.log" || \
  echo "embedding_neardup exited nonzero (guard refusal expected)" >> "$OUT/campaign.log"
grep -m1 -o "bucket.*" "$OUT/sf1000_neardup_guard/run.log" | head -1 >> "$OUT/campaign.log" || true
echo "=== campaign16c done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
