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
set -u
cd "$(dirname "$0")/.."
fail=0
log=$(mktemp)
trap 'rm -f "$log"' EXIT
for f in tests/test_*.py; do
  echo "=== $f"
  if OUTERSPACE_RUN_SLOW=1 python -m pytest "$f" -q --no-header >"$log" 2>&1; then
    tail -n 1 "$log"
  else
    fail=1
    tail -n 15 "$log"
  fi
done
if [ $fail -ne 0 ]; then
  echo "FULL SUITE: at least one chunk failed" >&2
  exit 1
fi
echo "FULL SUITE: all chunks green"
