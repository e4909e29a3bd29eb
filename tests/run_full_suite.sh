#!/bin/sh
# Full ~350-test suite (incl. --runslow), one fresh process per test file.
#
# Why chunked: a single full-suite process deterministically segfaults in
# XLA's CPU backend_compile after ~300 prior compiles (reproduced with the
# persistent cache on AND off; the same test passes standalone — upstream
# compiler-state issue, see the commit log). Per-file processes sidestep it
# and keep each chunk under shell timeouts. The default `pytest -q` CI
# profile does NOT need this script — it is single-process green.
#
# Usage: sh tests/run_full_suite.sh   (from the repo root; ~25 min cold,
# ~9 min with the warm tests-only XLA cache conftest enables on CPU)
#
# The last line is a one-line machine-checkable artifact:
#   FULL SUITE: NNN passed, MMM skipped, 0 failed across K files
set -u
cd "$(dirname "$0")/.."
fail=0
total_pass=0
total_skip=0
total_fail=0
nfiles=0
log=$(mktemp)
trap 'rm -f "$log"' EXIT
for f in tests/test_*.py; do
  echo "=== $f"
  nfiles=$((nfiles + 1))
  if OUTERSPACE_RUN_SLOW=1 python -m pytest "$f" -q --no-header >"$log" 2>&1; then
    tail -n 1 "$log"
  else
    fail=1
    tail -n 15 "$log"
  fi
  # accumulate the per-file pytest summary counts ("N passed", "N
  # skipped", "N failed" in any order on the summary line)
  summary=$(grep -Eo '[0-9]+ (passed|skipped|failed)' "$log" | tail -n 3)
  p=$(echo "$summary" | awk '/passed/ {s+=$1} END {print s+0}')
  s=$(echo "$summary" | awk '/skipped/ {s+=$1} END {print s+0}')
  x=$(echo "$summary" | awk '/failed/ {s+=$1} END {print s+0}')
  total_pass=$((total_pass + p))
  total_skip=$((total_skip + s))
  total_fail=$((total_fail + x))
done
if [ $fail -ne 0 ]; then
  echo "FULL SUITE: $total_pass passed, $total_skip skipped, $total_fail failed across $nfiles files — at least one chunk failed" >&2
  exit 1
fi
echo "FULL SUITE: $total_pass passed, $total_skip skipped, $total_fail failed across $nfiles files"
