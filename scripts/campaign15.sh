#!/bin/bash
# Round-15 sf1000 campaign (VERDICT r14 items 2-4): pair-family fourth
# decade, standing-corpus dedup_hash A/B, wide re-record WITH
# shuffle/spill metrics. One JVM per family (jrun.sh — no sbt lock), a
# disk guard before each launch (the pair family spilled 70 GB of
# in-memory bytes at sf1000 in r14; on-disk scratch is compressed but
# still tens of GB), logs + bench_subset.json per family under r15m/.
set -uo pipefail
cd /root/repo
SF=/tmp/graft_sf1000
OUT=/root/repo/r15m/sf1000
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

# pair family, lightest first (both were zero-spill at sf100)
run minhash_pairs 2 minhash_pairs
run pair_jaccard 2 pair_jaccard
# the r14 record's 70.8 GB-spill query: re-measure on HEAD, 2 reps
run minhash_pairs_verified 2 minhash_pairs_verified 20
# spill diagnosis (VERDICT r14 finding 2): final adaptive plan + the
# per-node spill/shuffle table — names WHICH operator pays at sf1000
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=8g scripts/jrun.sh graft.Explain \
  minhash_pairs_verified "$SF" exec \
  > "$OUT/minhash_pairs_verified/explain_exec.txt" 2>/dev/null || true
run dup_clusters 1 dup_clusters 15
# standing-corpus exact dedup: rep 1 builds the drop-set artifact,
# rep 2 probes; inline dedup_hash in the same JVM for the A/B
run dedup_hash_ab 2 dedup_hash,dedup_hash_probe 15
# wide re-record (r13 item 3, carried twice): the r12-era
# bench_wide_sf1000.json predates Bench's metrics pass — re-record the
# same 10 queries WITH shuffle_mb/spill_mb
run wide 2 doc_dedup,minhash_pairs,incremental_dedup,incremental_dedup_bloom,pack_sequences,simhash_neardup,token_count,lang_id,gopher_filter,curate_prep 15
echo "=== campaign done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
