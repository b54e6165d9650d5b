#!/bin/bash
# Round-3 phase 2: re-run the family configs that OOMed in phase 1.
# Today's tunnel session raises RESOURCE_EXHAUSTED at ~9.6-10.0 GiB live
# (4B kv8 at ~10.0 died, 4B kv4 at ~9.6 ran), well under round 2's ~11.3.
# Every run here pins --num-pages so planned live stays <= ~9.3 GiB:
#   4B  w8 kv8 bs=16: 4.8 (w) + 2.6 (272p) + ~0.4        = 7.8
#   4B  w8+qe kv8 bs=32: 4.4 + 5.0 (528p) + 0.4          = 9.8 -> 500p = 9.5
#   8B  w8+qe kv4 bs=8: 8.25 + 0.72 (150p) + 0.4         = 9.4
#   8B  w4+qe kv4 bs=32: 4.45 + 2.55 (530p) + 0.4        = 7.4
set -u
cd "$(dirname "$0")/.."
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout 5400 python -u bench.py "$@" >"results/$name.out" 2>"results/$name.err"
  echo "=== $name done rc=$? in $((SECONDS-t0))s ==="
  tail -1 "results/$name.out"
}

run r3_4b_bs16   --model-size 4B --num-seqs 16 --max-batched-tokens 4096 --num-pages 272
run r3_8b_w4_v2  --model-size 8B --num-seqs 32 --max-batched-tokens 2048 \
                 --quant int4 --kv-cache-dtype int4 --quant-embed --num-pages 530
run r3_8b_w8kv4  --model-size 8B --num-seqs 8 --max-batched-tokens 2048 \
                 --kv-cache-dtype int4 --quant-embed --num-pages 150
run r3_4b_bs32qe --model-size 4B --num-seqs 32 --max-batched-tokens 4096 \
                 --quant-embed --num-pages 500

# INT4-planes at low batch (r2 verdict item 4: bs=1 w4 must reach w8) + the
# kernel-level comparison (bf16 / int8 / int4-planes / int4-rows).
run r3_w4_bs1 --num-seqs 1 --quant int4
run r3_w4_bs8 --num-seqs 8 --quant int4
echo "=== qmm micro-bench ==="
timeout 3600 python -u bench_kernels.py --qmm >results/r3_qmm.out 2>results/r3_qmm.err
cat results/r3_qmm.out
echo "PHASE2 DONE"
