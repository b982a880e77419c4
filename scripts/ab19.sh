#!/bin/bash
# Round-19 cross-round headline, the r8-section-3 way (VERDICT r18 #1):
# SAME-BOX two-worktree A/B between the r18 end-of-round snapshot
# (65d8a01) and r19 HEAD — interleaved full-catalog sf0.1 runs,
# back-to-back, one JVM per wall. This replaces calib-normalized
# cross-day comparisons entirely: r18's four committed baselines
# normalize to contradictory signs (builder pair -13%, driver pair
# +14%), so walls from different days carry no cross-round information
# on this shared VM.
#   usage: scripts/ab19.sh [r18_commit]   (default 65d8a01)
set -uo pipefail
cd /root/repo
R18=${1:-65d8a01}
OUT=/root/repo/r19m
mkdir -p "$OUT"
WT=/tmp/wt_r18
if [ ! -d "$WT" ]; then
  git worktree add "$WT" "$R18" || exit 1
fi
# a surviving worktree from an earlier experiment may sit on a
# different commit than the label claims (r19 review) — verify, and
# recompile BOTH sides so neither classpath ships stale bytecode
WT_HEAD=$(git -C "$WT" rev-parse HEAD)
WANT=$(git rev-parse "$R18")
if [ "$WT_HEAD" != "$WANT" ]; then
  echo "worktree at $WT_HEAD, expected $WANT — refusing to mislabel legs" >> "$OUT/ab.log"
  exit 1
fi
( cd "$WT" && sbt -batch compile ) >> "$OUT/ab.log" 2>&1 || { echo "r18 compile failed" >> "$OUT/ab.log"; exit 1; }
( cd /root/repo && sbt -batch compile ) >> "$OUT/ab.log" 2>&1 || { echo "r19 compile failed" >> "$OUT/ab.log"; exit 1; }
rm -rf /tmp/cls_ab_r18 && cp -a "$WT/target/scala-2.13/classes" /tmp/cls_ab_r18
rm -rf /tmp/cls_ab_r19 && cp -a /root/repo/target/scala-2.13/classes /tmp/cls_ab_r19

run() { # run <cls> <name>
  local cls=$1 name=$2
  echo "=== $name $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$OUT/ab.log"
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$cls SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=1 SPARK_GRAFT_SHUFFLE=32 SPARK_GRAFT_BENCH_DIR=$OUT/$name \
  SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $?" >> "$OUT/ab.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/ab.log"
}

# one warmup each (artifact parity: both sides resolve the same
# BuildOnce roots; first touch must not land inside a measured wall),
# then 3 interleaved measured pairs
run /tmp/cls_ab_r18 ab_w_r18
run /tmp/cls_ab_r19 ab_w_r19
for i in 1 2 3; do
  run /tmp/cls_ab_r18 ab_r18_$i
  run /tmp/cls_ab_r19 ab_r19_$i
done
echo "=== ab19 done $(date +%H:%M:%S)" >> "$OUT/ab.log"
