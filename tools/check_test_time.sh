#!/bin/bash
# Suite wall-time canary (round-10 guard): the parallel forked test
# groups (build.sbt Test/testGrouping) keep `sbt test` at ~4-7 min on a
# quiet host (r9: 3:55). If a QUIET-host run blows through the budget,
# the groups have likely re-serialized (ForkedTestGroup limit reverted,
# a new heavy suite landed in "rest", or heartbeat tuning regressed) —
# inspect build.sbt before blaming a slow test. Under host contention
# the suite can legitimately take far longer; re-run quiet before
# failing the build on this.
# Usage: tools/check_test_time.sh [budget_seconds]   (default 1260 = 3x7min)
set -e
BUDGET=${1:-1260}
cd "$(dirname "$0")/.."
START=$(date +%s)
sbt -batch test
ELAPSED=$(( $(date +%s) - START ))
echo "sbt test wall time: ${ELAPSED}s (budget ${BUDGET}s)"
if [ "$ELAPSED" -gt "$BUDGET" ]; then
  echo "FAIL: suite exceeded ${BUDGET}s on what should be a quiet host —" \
       "check build.sbt Test/testGrouping + concurrentRestrictions" >&2
  exit 1
fi
