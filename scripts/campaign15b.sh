#!/bin/bash
# Round-15 post-fix sf1000 re-measure: the pair family on the
# census-pruned + member-pruned shapes (commit ea53458), same harness
# and fixture as campaign15.sh so the records A/B cleanly against
# r15m/sf1000/{minhash_pairs,minhash_pairs_verified,pair_jaccard,
# dup_clusters}. One JVM per query, disk guard per launch.
set -uo pipefail
cd /root/repo
SF=/tmp/graft_sf1000
OUT=/root/repo/r15m/sf1000_fix
mkdir -p "$OUT"

run() { # run <dirname> <reps> <query-list> [min_free_gb]
  local name=$1 reps=$2 qs=$3 need=${4:-12}
  local free_gb
  free_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
  echo "=== $name reps=$reps $(date +%H:%M:%S) free=${free_gb}G" >> "$OUT/campaign.log"
  if [ "$free_gb" -lt "$need" ]; then
    echo "SKIP $name: ${free_gb}G free < ${need}G needed" >> "$OUT/campaign.log"
    return 1
  fi
  mkdir -p "$OUT/$name"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}

run minhash_pairs 2 minhash_pairs
run minhash_pairs_verified 2 minhash_pairs_verified 15
# post-fix node-level attribution for the PERF.md after-table
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g scripts/jrun.sh graft.Explain \
  minhash_pairs_verified "$SF" exec \
  > "$OUT/minhash_pairs_verified/explain_exec.txt" 2>/dev/null || true
run pair_jaccard 2 pair_jaccard 20
run dup_clusters 1 dup_clusters 15
echo "=== campaign15b done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
