#!/bin/bash
# Round-19 campaign C:
#   1. sf100 maintenance record — AbsorbScale's new Maintain leg: five
#      absorb-accreted file sets compacted by the same graft.Maintain
#      entry an operator's cron runs, probe equivalence re-proved.
#   2. Fresh sf1000 anchors on HEAD + the REBUILT fixtures (r19 rebuilt
#      /tmp from scratch; r18's fourth-decade walls are on dead fixture
#      files, so round 20 needs same-fixture baselines): the docs
#      standing family, the training_prep build/probe pair (rep 1
#      carries the tpdrop artifact build, rep 2 is the standing-artifact
#      probe), and the semdedup pair.
set -uo pipefail
cd /root/repo
OUT=/root/repo/r19m
CLS=/tmp/cls_r19c
mkdir -p "$OUT"

run() { # run <sfdir> <name> <reps> <queries> <shuffle> [min_free_gb]
  local sf=$1 name=$2 reps=$3 qs=$4 shuf=$5 need=${6:-12}
  local free_gb
  free_gb=$(df -BG --output=avail /tmp | tail -1 | tr -dc 0-9)
  echo "=== $name sf=$sf reps=$reps $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) free=${free_gb}G" >> "$OUT/campaign_c.log"
  if [ "$free_gb" -lt "$need" ]; then
    echo "SKIP $name: ${free_gb}G free < ${need}G needed" >> "$OUT/campaign_c.log"; return 1
  fi
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$CLS SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_SHUFFLE=$shuf SPARK_GRAFT_METRICS=timed \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign_c.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign_c.log"
}

echo "=== absorb maintain sf100 $(date +%H:%M:%S)" >> "$OUT/campaign_c.log"
GRAFT_CLASSES=$CLS SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 SPARK_DRIVER_MEM=8g \
SPARK_GRAFT_ABSORB_MAINTAIN=1 SPARK_GRAFT_ABSORB_DOCS=0 \
  scripts/jrun.sh graft.AbsorbScale /tmp/graft_sf100 "$OUT/absorb_maintain_sf100.json" \
  > "$OUT/absorb_maintain_sf100.log" 2>&1 || echo "maintain sf100 exited $?" >> "$OUT/campaign_c.log"
cat "$OUT/absorb_maintain_sf100.json" >> "$OUT/campaign_c.log" 2>/dev/null; echo >> "$OUT/campaign_c.log"

run /tmp/graft_sf1000 c_sf1000_docs 1 \
  dedup_hash,dedup_hash_probe,minhash_pairs_verified,pair_jaccard,dup_clusters,corpus_dedup,corpus_dedup_probe 128 20
run /tmp/graft_sf1000 c_sf1000_semdedup 1 semdedup_ann 128 20
run /tmp/graft_sf1000 c_sf1000_training 2 training_prep,training_prep_probe 128 25
echo "=== campaign19c done $(date +%H:%M:%S)" >> "$OUT/campaign_c.log"
