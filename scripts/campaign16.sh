#!/bin/bash
# Round-16 scale campaign, on the JITTERED fixtures (ScaleUp r16: clones
# are near-dups, never bit-identical) and the promoted AnnGeometry
# contract (RP-LSH width / IVF k derived from corpus size — the catalog
# path, no env knob anywhere here).
#   A. sf100 full-subset re-baseline (VERDICT r15 #4: the standing
#      scale-critical subset record was r12-era, pre census/checkpoint/
#      kernel fixes).
#   B. sf100 semdedup at derived k≈√n (r15's guard-refusal row: the
#      contract k is exactly what the guard demanded).
#   C. sf10 semdedup_ann at the dedup width (first measured record of
#      the self-join geometry).
#   D. sf1000 vector families at contract geometry: knn/quant, ivf
#      (k=4473, argmax assign), rplsh (48 planes — catalog default now).
#   E. sf1000 embedding_neardup: expected withBucketBound refusal
#      (coarse label buckets), captured like r15's semdedup_guard.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r16m
mkdir -p "$OUT"

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

case "${1:-all}" in
  sf100)
    run /tmp/graft_sf100 sf100_subset 2 "$SUBSET" 20
    run /tmp/graft_sf100 sf100_semdedup 1 semdedup 15
    ;;
  sf10)
    run /tmp/graft_sf10 sf10_semdedup_ann 2 semdedup_ann
    ;;
  sf1000)
    run /tmp/graft_sf1000 sf1000_knn 2 knn_cosine,knn_bucketed,quant_knn,quant_rerank,quant_recall
    run /tmp/graft_sf1000 sf1000_rplsh 2 rplsh_knn,rplsh_probe,rplsh_recall 20
    run /tmp/graft_sf1000 sf1000_ivf 1 ivf_knn,ivf_probe,ivf_recall,ivf_quant 20
    # expected guard refusal: label buckets are corpus/|labels| rows
    mkdir -p "$OUT/sf1000_neardup_guard"
    echo "=== embedding_neardup (guard expected) $(date +%H:%M:%S)" >> "$OUT/campaign.log"
    SPARK_GRAFT_SF_DIR=/tmp/graft_sf1000 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_ONLY=embedding_neardup SPARK_GRAFT_BENCH_DIR=$OUT/sf1000_neardup_guard SPARK_DRIVER_MEM=8g \
      scripts/jrun.sh graft.Bench > "$OUT/sf1000_neardup_guard/stdout.json" 2> "$OUT/sf1000_neardup_guard/run.log" || \
      echo "embedding_neardup exited nonzero (guard refusal expected)" >> "$OUT/campaign.log"
    grep -m1 -o "bucket.*" "$OUT/sf1000_neardup_guard/run.log" | head -1 >> "$OUT/campaign.log" || true
    ;;
  all)
    "$0" sf10
    "$0" sf100
    "$0" sf1000
    ;;
esac
echo "=== campaign16 ${1:-all} done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
