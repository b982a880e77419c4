#!/bin/bash
# Round-18 campaign: the three VERDICT-r17 measurement items on HEAD code.
#   A. sf1000 recall/ANN family — the bounded-heap top-k (top_k_by)
#      replaced the window sort in the brute-force passes; the recall
#      audits were the family's last by-design spillers (5.6-6.4 GB).
#      semdedup_ann rides along (rep-only both-orientation emission).
#   B. sf1000 documents family on standing artifacts — clean walls for
#      the fallback-threshold record, plus training_prep at REPS=2 so
#      rep 1 carries the tpdrop artifact build and rep 2 is the
#      standing-artifact probe cost (the VERDICT #2 split), plus the
#      new training_prep_probe row.
#   C. sf100 absorb leg (doc index create+absorb; the 50 M-doc index's
#      sig-carrying band table is ~30 GB — over this box's free disk).
# One JVM per leg (jrun from a classpath snapshot), shuffle=128 at the
# fourth decade, SPARK_GRAFT_METRICS=timed for byte maps in the timed rep.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r18m
CLS=${GRAFT_CLASSES:-/tmp/graft_cls_r18c}
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
  GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_SHUFFLE=$shuf SPARK_GRAFT_METRICS=timed \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}

run /tmp/graft_sf1000 sf1000_ann_topk 1 \
  knn_cosine,rplsh_recall,ivf_recall,quant_knn,quant_rerank,quant_recall,semdedup_ann 128 20
run /tmp/graft_sf1000 sf1000_docs_standing 1 \
  dedup_hash,dedup_hash_probe,minhash_pairs_verified,pair_jaccard,dup_clusters,corpus_dedup,corpus_dedup_probe 128 20
run /tmp/graft_sf1000 sf1000_training_prep 2 training_prep,training_prep_probe 128 25
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=8g \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf100 "$OUT/absorb_sf100.json" \
  > "$OUT/absorb_sf100.log" 2>&1 || echo "absorb_sf100 exited $?" >> "$OUT/campaign.log"
echo "=== campaign18 done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
