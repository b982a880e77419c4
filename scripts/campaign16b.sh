#!/bin/bash
# Round-16 campaign, part 2: the legs the ArgMaxBy/bandPairsCapped fixes
# unblock (part 1 = campaign16.sh; its knn/rplsh sf1000 legs completed
# before the ivf leg was killed mid-SortAggregate — see PERF.md r16).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r16m
run() { # run <sfdir> <dirname> <reps> <query-list> [min_free_gb]
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
SUBSET="q1_agg,explode_pframes,doc_dedup,dedup_hash,minhash_bands,minhash_pairs_verified,pair_jaccard,simhash_neardup,dup_clusters,corpus_dedup,corpus_dedup_probe,incremental_dedup,incremental_dedup_bloom,knn_cosine,quant_knn,ivf_knn,ivf_probe,rplsh_knn,rplsh_probe,semantic_decontam,repetition_profile,token_budget,curate_prep,curriculum_order,training_prep"

run /tmp/graft_sf10 sf10_semdedup_ann 2 semdedup_ann
run /tmp/graft_sf100 sf100_subset 2 "$SUBSET" 20
run /tmp/graft_sf100 sf100_semdedup 1 semdedup 15
run /tmp/graft_sf100 sf100_semdedup_ann 1 semdedup_ann 15
run /tmp/graft_sf1000 sf1000_ivf 1 ivf_knn,ivf_probe,ivf_recall,ivf_quant 20
run /tmp/graft_sf1000 sf1000_semdedup_ann 1 semdedup_ann 20
# expected guard refusal: label buckets are corpus/|labels| rows
mkdir -p "$OUT/sf1000_neardup_guard"
echo "=== embedding_neardup (guard expected) $(date +%H:%M:%S)" >> "$OUT/campaign.log"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1000 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_ONLY=embedding_neardup SPARK_GRAFT_BENCH_DIR=$OUT/sf1000_neardup_guard SPARK_DRIVER_MEM=8g \
  scripts/jrun.sh graft.Bench > "$OUT/sf1000_neardup_guard/stdout.json" 2> "$OUT/sf1000_neardup_guard/run.log" || \
  echo "embedding_neardup exited nonzero (guard refusal expected)" >> "$OUT/campaign.log"
grep -m1 -o "bucket.*" "$OUT/sf1000_neardup_guard/run.log" | head -1 >> "$OUT/campaign.log" || true
echo "=== campaign16b done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
