#!/bin/bash
# Round-19 campaign D: the STANDING anchors — same legs as campaign C's
# sf1000 pass but on now-warm artifacts (campaign C's first-touch walls
# carry the BuildOnce builds; these are the round-20-comparable walls).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r19m
CLS=/tmp/cls_r19c
run() {
  local sf=$1 name=$2 reps=$3 qs=$4 shuf=$5
  echo "=== $name $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) free=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)G" >> "$OUT/campaign_d.log"
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_SHUFFLE=$shuf SPARK_GRAFT_METRICS=timed \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign_d.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign_d.log"
}
run /tmp/graft_sf1000 d_sf1000_docs_standing 1 \
  dedup_hash,dedup_hash_probe,minhash_pairs_verified,pair_jaccard,dup_clusters,corpus_dedup,corpus_dedup_probe 128
run /tmp/graft_sf1000 d_sf1000_semdedup 1 semdedup_ann 128
echo "=== campaign19d done $(date +%H:%M:%S)" >> "$OUT/campaign_d.log"
