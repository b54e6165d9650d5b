#!/bin/bash
# Round-3 TPU experiment sequence (VERDICT r2 items 1, 5, 8): model-family
# benches (1.7B/4B/8B — BASELINE config 5's 8B has never been run), kv4
# decode cells, cold-vs-warm TTFT. Sequential — one tunnel client at a time;
# generous timeouts (compiles queue server-side, killing makes it worse).
#
# HBM fitting notes (v5e, ~11.3 GiB usable of 16; int8 weights, bf16 embed):
#   1.7B w8 ~1.9 GiB  -> bs=64 kv8 fits (1024 pages needed, ~1080 budgeted)
#   4B   w8 ~4.1 GiB  -> bs=32 kv8 (512 pages), bs=64 kv4 (1024 half-size)
#   8B   w8 ~8.9 GiB  -> bs=8 kv8 at util 0.89 + 2048-token prefill budget
#   8B   w4 ~5.1 GiB  -> bs=32 kv4
set -u
cd "$(dirname "$0")/.."
mkdir -p results
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  local t0=$SECONDS
  timeout 5400 python -u bench.py "$@" >"results/$name.out" 2>"results/$name.err"
  local rc=$?
  echo "=== $name done rc=$rc in $((SECONDS-t0))s ==="
  tail -1 "results/$name.out"
}

# 1. Model family (verdict item 1)
run r3_17b  --model-size 1.7B --num-seqs 64 --max-batched-tokens 4096
run r3_8b   --model-size 8B   --num-seqs 8  --max-batched-tokens 2048 --hbm-utilization 0.89
run r3_4b   --model-size 4B   --num-seqs 32 --max-batched-tokens 4096
run r3_8b_w4  --model-size 8B --num-seqs 32 --max-batched-tokens 2048 --quant int4 --kv-cache-dtype int4
run r3_4b_kv4 --model-size 4B --num-seqs 64 --max-batched-tokens 4096 --kv-cache-dtype int4

# 2. kv4 vs kv8 decode cells, 0.6B (verdict item 5)
for bs in 1 8 64; do
  run "r3_kv4_bs$bs" --num-seqs $bs --kv-cache-dtype int4
  run "r3_kv8_bs$bs" --num-seqs $bs --kv-cache-dtype int8
done

# 3. Cold-vs-warm TTFT (verdict item 8)
echo "=== ttft warm-disk-cache (warm + lazy modes) ==="
timeout 3600 python -u tools/ttft_bench.py >results/r3_ttft_warmdisk.out 2>results/r3_ttft_warmdisk.err
echo "=== ttft cold-cache lazy ==="
timeout 5400 python -u tools/ttft_bench.py --fresh-cache --modes lazy >results/r3_ttft_cold_lazy.out 2>results/r3_ttft_cold_lazy.err
echo "=== ttft cold-cache warm ==="
timeout 5400 python -u tools/ttft_bench.py --fresh-cache --modes warm >results/r3_ttft_cold_warm.out 2>results/r3_ttft_cold_warm.err
cat results/r3_ttft_*.out
echo "ALL DONE"
