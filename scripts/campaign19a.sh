#!/bin/bash
# Round-19 campaign A — the top_k_by CPU-trade attribution (VERDICT r18
# #2), SAME-BOX A/B: two classpath snapshots that differ ONLY in
# TopKBy.update/merge (old = unconditional id.eval + insert per row;
# new = pre-id.eval early exit on ord + sorted-merge early break),
# interleaved old/new/old/new per scale so box drift cancels.
#   Leg W:  warmup at each SF — materializes the BuildOnce artifacts
#           (fresh /tmp) so the measured legs pay zero first-touch cost.
#   Leg A:  sf0.1, the four recall rows, REPS=3, 2 JVMs per variant.
#   Leg B:  sf1000 (20 M vectors), rplsh_recall + ivf_recall, 1 rep,
#           2 JVMs per variant.
#   Leg C:  per-node exec attribution of rplsh_recall at sf1000 on the
#           NEW classes (ObjectHashAggregate agg-time vs the distinct()
#           barrier's exchange).
set -uo pipefail
cd /root/repo
OUT=/root/repo/r19m
mkdir -p "$OUT"
QS4=rplsh_recall,ivf_recall,ivf_recall_n4,quant_recall

run() { # run <cls> <sfdir> <name> <reps> <queries> <shuffle>
  local cls=$1 sf=$2 name=$3 reps=$4 qs=$5 shuf=$6
  echo "=== $name cls=$cls $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$OUT/campaign_a.log"
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$cls SPARK_GRAFT_SF_DIR=$sf SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=$reps \
  SPARK_GRAFT_SHUFFLE=$shuf SPARK_GRAFT_METRICS=timed \
  SPARK_GRAFT_ONLY=$qs SPARK_GRAFT_BENCH_DIR=$OUT/$name SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $? (check run.log)" >> "$OUT/campaign_a.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/campaign_a.log"
}

# Leg W: warmups build artifacts (old classes build byte-identical
# artifacts — TopKBy never touches what lands on disk)
run /tmp/cls_r19_new /root/testdata/sf0.1 w_sf01 1 "$QS4" 32
run /tmp/cls_r19_new /tmp/graft_sf1000 w_sf1000 1 rplsh_recall,ivf_recall 128

# Leg A: sf0.1 interleaved
run /tmp/cls_r19_oldupd /root/testdata/sf0.1 a_sf01_old1 3 "$QS4" 32
run /tmp/cls_r19_new    /root/testdata/sf0.1 a_sf01_new1 3 "$QS4" 32
run /tmp/cls_r19_oldupd /root/testdata/sf0.1 a_sf01_old2 3 "$QS4" 32
run /tmp/cls_r19_new    /root/testdata/sf0.1 a_sf01_new2 3 "$QS4" 32

# Leg B: sf1000 interleaved
run /tmp/cls_r19_oldupd /tmp/graft_sf1000 b_sf1000_old1 1 rplsh_recall,ivf_recall 128
run /tmp/cls_r19_new    /tmp/graft_sf1000 b_sf1000_new1 1 rplsh_recall,ivf_recall 128
run /tmp/cls_r19_oldupd /tmp/graft_sf1000 b_sf1000_old2 1 rplsh_recall,ivf_recall 128
run /tmp/cls_r19_new    /tmp/graft_sf1000 b_sf1000_new2 1 rplsh_recall,ivf_recall 128

# Leg C: per-node attribution (new classes)
GRAFT_CLASSES=/tmp/cls_r19_new SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=128 SPARK_DRIVER_MEM=8g \
  scripts/jrun.sh graft.Explain rplsh_recall /tmp/graft_sf1000 exec \
  > "$OUT/attr_rplsh_recall_sf1000.txt" 2> "$OUT/attr_rplsh_recall_sf1000.log" || \
  echo "explain exited $?" >> "$OUT/campaign_a.log"
echo "=== campaign19a done $(date +%H:%M:%S)" >> "$OUT/campaign_a.log"
