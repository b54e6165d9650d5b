#!/bin/bash
# Round-3 phase 4: decode-step cost bisection (0.6B, bs=64, ctx 1536) —
# where do the ~2.9 ms/step above the HBM floor go?
set -u
cd "$(dirname "$0")/.."
for mode in full noattn nowrite nosample nolmhead; do
  echo "=== bisect_decode $mode ==="
  timeout 2400 python -u tools/bisect_decode.py $mode int8 \
    >"results/r3_bisect_$mode.out" 2>"results/r3_bisect_$mode.err"
  tail -1 "results/r3_bisect_$mode.out"
done
echo "PHASE4 DONE"
