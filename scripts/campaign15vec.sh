#!/bin/bash
# Round-15 vector-family fourth decade (embeddings-only sf1000 fixture,
# 20M vectors = 100x the family's largest prior record at sf100). One
# JVM per family; semdedup runs LAST expecting its withBucketBound guard
# to refuse (k=8 fixed while clusters grew 10^4x - the documented
# contract); semdedup_ann is excluded: the clone-repeat embedding
# derivation makes its band-key candidate self-join degenerate-quadratic
# (every vector has 10^4 bit-identical clones sharing all band keys),
# the same declared fixture artifact as embedding_neardup's exclusion.
set -uo pipefail
cd /root/repo
SF=/tmp/graft_sf1000
OUT=/root/repo/r15m/sf1000_vec
mkdir -p "$OUT"
run() {
  local name=$1 reps=$2 qs=$3
  mkdir -p "$OUT/$name"
  echo "=== $name reps=$reps $(date +%H:%M:%S)" >> "$OUT/campaign.log"
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (UNEXPECTED - stdout.json may be truncated)" >> "$OUT/campaign.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign.log"
}
run knn 2 knn_cosine,knn_bucketed,quant_knn,quant_rerank,quant_recall
run ivf 2 ivf_knn,ivf_probe,ivf_recall,ivf_quant
run rplsh 1 rplsh_knn,rplsh_probe,rplsh_recall
# the guard-refusal capture: semdedup SHOULD fail loudly here
mkdir -p "$OUT/semdedup_guard"
echo "=== semdedup (guard expected) $(date +%H:%M:%S)" >> "$OUT/campaign.log"
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
SPARK_GRAFT_ONLY=semdedup SPARK_GRAFT_BENCH_DIR=$OUT/semdedup_guard SPARK_DRIVER_MEM=8g \
  scripts/jrun.sh graft.Bench > "$OUT/semdedup_guard/stdout.json" 2> "$OUT/semdedup_guard/run.log" || \
  echo "semdedup exited nonzero (guard refusal expected)" >> "$OUT/campaign.log"
grep -m1 -o "bucket.*" "$OUT/semdedup_guard/run.log" | head -1 >> "$OUT/campaign.log" || true
echo "=== vec campaign done $(date +%H:%M:%S)" >> "$OUT/campaign.log"
