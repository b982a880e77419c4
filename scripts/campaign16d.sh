#!/bin/bash
# Round-16 part 4: the two sf1000 rows that exceeded the 32-partition
# per-task budget, re-run at SPARK_GRAFT_SHUFFLE=128 (the committed
# scale-experiment knob: exchange width must follow data volume — a
# real cluster runs these joins at hundreds of partitions; local[32]
# at 32 partitions puts a 20M-row hash build at ~30MB/task, the
# measured "Can't acquire" edge in r16m/sf1000_ivf_p32).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r16m
run() {
  local sf=$1 name=$2 reps=$3 qs=$4 need=${5:-12}
  local free_gb
  free_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
  echo "=== $name sf=$sf reps=$reps shuffle=128 $(date +%H:%M:%S) free=${free_gb}G" >> "$OUT/campaign.log"
  if [ "$free_gb" -lt "$need" ]; then
    echo "SKIP $name: ${free_gb}G free < ${need}G needed" >> "$OUT/campaign.log"; return 1
  fi
  mkdir -p "$OUT/$name"
  SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps SPARK_GRAFT_SHUFFLE=128 \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}
run /tmp/graft_sf1000 sf1000_ivf 1 ivf_knn,ivf_probe,ivf_recall,ivf_quant 20
run /tmp/graft_sf1000 sf1000_semdedup_ann 1 semdedup_ann 25
echo "=== campaign16d done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
