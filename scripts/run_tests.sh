#!/bin/bash
# The full test gate, one pytest process per test file.
#
# WHY per-file processes: XLA:CPU's JIT segfaults after enough compiles
# have accumulated in one long-lived process alongside heavy C++
# extension stacks — first seen with libtorch resident (VERDICT r4
# missing #3: reproducible rc-139 at tests/test_matcher.py), and in
# round 5 the crash point migrated into the torch-FREE half
# (test_train.py, stack in backend_compile_and_load) as the suite grew.
# Every test passes when its file runs in a fresh process; per-file
# isolation makes the gate deterministic at the cost of ~5 min of
# interpreter/import overhead.
#
# Usage:
#   scripts/run_tests.sh            # full gate (~50 min on 1 core)
#   scripts/run_tests.sh -m smoke   # fast tier (< 5 min)
set -u
cd "$(dirname "$0")/.."

fail=()
for f in tests/test_*.py; do
    echo "=== $f ==="
    python -m pytest "$f" -q "$@"
    rc=$?
    # exit 5 = no tests collected in this file for the given -m filter
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        fail+=("$f(rc=$rc)")
    fi
done

if [ ${#fail[@]} -eq 0 ]; then
    echo "=== full gate green ==="
else
    echo "=== FAILED: ${fail[*]} ==="
    exit 1
fi
