#!/bin/bash
# Round-3 phase 3: 8B retries (host-side init/quantize fix) + prefill-MFU
# structural experiments (q_tile 256, wider prefix chunks) + final headline.
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

# 8B family (BASELINE config 5's model): int4+kv4 at batch, w8(+qe)+kv4 low
# batch, and w8+kv8+qe at bs=4 (full-int8 weights, minimal KV).
run r3_8b_w4_v3  --model-size 8B --num-seqs 32 --max-batched-tokens 2048 \
                 --quant int4 --kv-cache-dtype int4 --quant-embed --num-pages 530
run r3_8b_w8kv4_v2 --model-size 8B --num-seqs 8 --max-batched-tokens 2048 \
                 --kv-cache-dtype int4 --quant-embed --num-pages 150
run r3_8b_w8kv8  --model-size 8B --num-seqs 4 --max-batched-tokens 2048 \
                 --quant-embed --num-pages 80

# 4B w8+qe kv8 bs=32 retry: phase 2 used 500 pages < the 512-page peak and
# preempt-thrashed (765 tok/s, 7.9% MFU); peak + reserve slack is ~548.
run r3_4b_bs32qe_v2 --model-size 4B --num-seqs 32 --max-batched-tokens 4096 \
                 --quant-embed --num-pages 548

# Prefill-MFU experiments on 0.6B (r2 verdict item 7): q-tile 256 and
# 1024-token prefix chunks vs the 40.3% baseline.
run r3_qtile256  --num-seqs 64 --q-tile 256
run r3_ppc8      --num-seqs 64 --pages-per-chunk 8

# Final headline confirmation on today's code.
run r3_headline  --num-seqs 64
echo "PHASE3 DONE"
