#!/usr/bin/env bash
# Full test suite in TWO pytest processes (alphabetical split at
# test_grid_md3_sharded): a single process accumulates XLA-compile RSS on the
# 1-CPU host and can segfault near the end (CLAUDE.md). This script is the
# one-command version of the documented split — "N green" should mean
# "./run_tests.sh exited 0".
set -u
cd "$(dirname "$0")"

FIRST=$(ls tests/test_*.py | sort | awk '$0 < "tests/test_grid_md3_sharded.py"')
SECOND=$(ls tests/test_*.py | sort | awk '$0 >= "tests/test_grid_md3_sharded.py"')

echo "=== half 1 ==="
python -m pytest $FIRST -q "$@"
rc1=$?
echo "=== half 2 ==="
python -m pytest $SECOND -q "$@"
rc2=$?

if [ $rc1 -ne 0 ] || [ $rc2 -ne 0 ]; then
  echo "SUITE: FAILED (half1=$rc1 half2=$rc2)"
  exit 1
fi
echo "SUITE: all green"
