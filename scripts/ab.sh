#!/bin/bash
# Cross-round same-box A/B, parameterized (VERDICT r19 #3: ab19.sh was
# hard-wired to 65d8a01 and the bytecode-diff scoping was a separate
# manual step — every round rebuilt the instrument by hand).
#
# Produces, under $OUT:
#   ab_bytecode_diff.txt      which .class files differ between the two
#                             classpaths — scopes exactly which catalog
#                             rows COULD differ; byte-identical rows'
#                             deltas are instrument noise by construction
#   ab_old_w / ab_new_w       one warmup leg each (BuildOnce artifact
#                             parity; first touch never lands in a
#                             measured wall)
#   ab_old_N / ab_new_N       interleaved measured legs, alternating
#                             within-pair order (old-first on odd pairs,
#                             new-first on even) so position-in-pair
#                             effects cancel under the box's ~10-min
#                             autocorrelated drift (see ab19b.sh)
#   ab.log                    timestamps + load + one JSON line per leg
#
# The discipline this instrument encodes (graft-cross-round-wall-claims):
# walls alone cannot resolve <±20% on this box — settle claims
# STRUCTURALLY: the bytecode diff names the rows that could move; for
# those, run a dedicated kernel A/B; everything else is flat by
# construction.
#
#   usage: scripts/ab.sh <prev_commit> [pairs] [outdir] [sfdir]
#          pairs default 3, outdir default r20m, sfdir default
#          /root/testdata/sf0.1
set -uo pipefail
cd /root/repo
PREV=${1:?usage: scripts/ab.sh <prev_commit> [pairs] [outdir] [sfdir]}
PAIRS=${2:-3}
OUT=${3:-/root/repo/r20m}
SF=${4:-/root/testdata/sf0.1}
mkdir -p "$OUT"
WT=/tmp/wt_ab_prev
WANT=$(git rev-parse "$PREV") || exit 1
if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$WANT" || exit 1
fi
# a surviving worktree from an earlier run may sit on a different
# commit than the label claims — verify, and recompile BOTH sides so
# neither classpath ships stale bytecode
WT_HEAD=$(git -C "$WT" rev-parse HEAD)
if [ "$WT_HEAD" != "$WANT" ]; then
  ( cd "$WT" && git checkout --detach "$WANT" ) >> "$OUT/ab.log" 2>&1 || {
    echo "worktree at $WT_HEAD, expected $WANT - refusing to mislabel legs" >> "$OUT/ab.log"
    exit 1
  }
fi
( cd "$WT" && sbt -batch compile ) >> "$OUT/ab.log" 2>&1 || { echo "prev compile failed" >> "$OUT/ab.log"; exit 1; }
( cd /root/repo && sbt -batch compile ) >> "$OUT/ab.log" 2>&1 || { echo "cur compile failed" >> "$OUT/ab.log"; exit 1; }
rm -rf /tmp/cls_ab_old /tmp/cls_ab_new
cp -a "$WT/target/scala-2.13/classes" /tmp/cls_ab_old
cp -a /root/repo/target/scala-2.13/classes /tmp/cls_ab_new

# the scoping record FIRST: which class files differ (content, not
# timestamps) — emitted automatically so no round ships legs without it
{
  echo "# bytecode diff: $WANT (old) vs working HEAD (new)  $(date +%F' '%H:%M:%S)"
  diff -rq /tmp/cls_ab_old /tmp/cls_ab_new | sort
} > "$OUT/ab_bytecode_diff.txt"

run() { # run <cls> <name>
  local cls=$1 name=$2
  echo "=== $name $(date +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)" >> "$OUT/ab.log"
  mkdir -p "$OUT/$name"
  GRAFT_CLASSES=$cls SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_REPS=1 SPARK_GRAFT_SHUFFLE=32 SPARK_GRAFT_BENCH_DIR=$OUT/$name \
  SPARK_DRIVER_MEM=8g \
    scripts/jrun.sh graft.Bench > "$OUT/$name/stdout.json" 2> "$OUT/$name/run.log" || \
    echo "$name exited $?" >> "$OUT/ab.log"
  tail -1 "$OUT/$name/stdout.json" >> "$OUT/ab.log"
}

run /tmp/cls_ab_old ab_old_w
run /tmp/cls_ab_new ab_new_w
for i in $(seq 1 "$PAIRS"); do
  if [ $((i % 2)) -eq 1 ]; then
    run /tmp/cls_ab_old ab_old_$i
    run /tmp/cls_ab_new ab_new_$i
  else
    run /tmp/cls_ab_new ab_new_$i
    run /tmp/cls_ab_old ab_old_$i
  fi
done
echo "=== ab done $(date +%H:%M:%S)" >> "$OUT/ab.log"
