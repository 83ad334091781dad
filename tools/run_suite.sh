#!/bin/bash
# Full-suite runner for the 1-core box (VERDICT r3 weak #6): the monolithic
# `pytest tests/` exceeds a 10-minute window cold, so run module-by-module
# with a per-module timeout and print one summary line at the end.
#
# Usage:
#   tools/run_suite.sh                 # CPU tier, all modules
#   tools/run_suite.sh -m smoke       # pass-through pytest args
#   FM_TESTS_TPU=1 tools/run_suite.sh -m tpu   # compiled-kernel tier
#   FM_SUITE_TIMEOUT=1200 tools/run_suite.sh   # slower box
set -u
cd "$(dirname "$0")/.."
TIMEOUT=${FM_SUITE_TIMEOUT:-900}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.cache/jax_comp}

pass=0; fail=0; failed_mods=""
for f in tests/test_*.py; do
  t0=$(date +%s)
  out=$(timeout "$TIMEOUT" python -m pytest "$f" -q "$@" 2>&1)
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  tail_line=$(echo "$out" | grep -E "(passed|failed|error|no tests ran)" | tail -1)
  if [ $rc -eq 0 ]; then
    pass=$((pass+1)); status=ok
  elif [ $rc -eq 5 ]; then
    pass=$((pass+1)); status="no-tests(deselected)"
  elif [ $rc -eq 124 ]; then
    fail=$((fail+1)); failed_mods="$failed_mods $f"; status=TIMEOUT
  else
    fail=$((fail+1)); failed_mods="$failed_mods $f"; status=FAIL
  fi
  printf "%-34s %-22s %4ss  %s\n" "$f" "$status" "$dt" "$tail_line"
  if [ "$status" = FAIL ]; then echo "$out" | tail -30; fi
done

echo "---"
if [ $fail -eq 0 ]; then
  echo "SUITE GREEN: $pass modules passed"
else
  echo "SUITE RED: $fail failed ($failed_mods), $pass passed"
  exit 1
fi
