#!/bin/bash
# The full test gate, split into two processes.
#
# WHY: XLA:CPU's JIT segfaults (rc 139) when compiling after libtorch is
# resident in a process that has already compiled ~100 programs — the
# full single-process run reproducibly crashes around
# tests/test_matcher.py (VERDICT r4 missing #3; three identical crashes
# in /tmp/pytest_r4*.log, reproduced in round 5). Every test passes when
# the torch-oracle files run in their own process. Pre-importing torch
# before the first XLA compile does NOT fix it (tried round 5).
#
# Usage:
#   scripts/run_tests.sh            # full gate (~45 min on 1 core)
#   scripts/run_tests.sh -m smoke   # fast tier (< 5 min), both halves
set -e
cd "$(dirname "$0")/.."

TORCH_FILES="tests/test_api.py tests/test_carhynet.py \
tests/test_golden_torch.py tests/test_matcher.py"

echo "=== [1/2] torch-free suite ==="
python -m pytest tests/ -q \
    --ignore tests/test_api.py --ignore tests/test_carhynet.py \
    --ignore tests/test_golden_torch.py --ignore tests/test_matcher.py \
    "$@"

echo "=== [2/2] torch-oracle suite (own process) ==="
python -m pytest $TORCH_FILES -q "$@"

echo "=== full gate green ==="
