#!/usr/bin/env bash
# Full-suite runner: one pytest process PER TEST FILE.
#
# Why: the XLA CPU compiler on this image segfaults after enough large
# compiles accumulate in a single process (reproducible near the END of a
# monolithic `pytest tests/` run, in whichever test compiles next — observed
# in test_slam.py and test_voxel_grid.py on different runs; every file passes
# in a fresh process). Fresh processes bound the per-process compile count.
# The persistent JAX compile cache cannot paper over this: serializing the
# largest executable segfaults too (see tests/conftest.py).
#
# Usage: tools/run_tests.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
fail=0
total_pass=0
for f in tests/test_*.py; do
  out=$(python -m pytest "$f" -q "$@" 2>&1)
  rc=$?
  line=$(echo "$out" | grep -E "passed|failed|error" | tail -1)
  printf "%-36s %s\n" "$f" "$line"
  if [ $rc -ne 0 ]; then
    fail=1
    echo "$out" | tail -30
  fi
done
exit $fail
