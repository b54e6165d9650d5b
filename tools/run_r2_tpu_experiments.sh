#!/bin/bash
# Round-2 TPU experiment batch — run serially (the tunnel is one client at
# a time). Each step has its own timeout and log.
set -x
cd /root/repo

# 1. INT4 weight bench (the +w4 README row; now via the Pallas dequant matmul)
timeout 3000 python -u bench.py --quant int4 > bench_w4.out 2> bench_w4.err
echo "w4 exit: $?"

# 2. Low-batch INT4 (weight-bound regime — where int4 should pay)
timeout 3000 python -u bench_grid.py --backends pallas --batch-sizes 1 8 \
  --input-lens 1024 --quant int4 > grid_w4_lowbs.out 2> grid_w4_lowbs.err
echo "grid-w4 exit: $?"

# 3. Prefill bisect: where does the 64x1024 prefill step spend time?
for mode in full noattn noquant; do
  timeout 1800 python -u tools/bisect_prefill.py $mode 128 \
    > bisect_prefill_${mode}.out 2>&1
  echo "bisect $mode exit: $?"
done
# q_tile 256 variant
timeout 1800 python -u tools/bisect_prefill.py full 256 \
  > bisect_prefill_full_q256.out 2>&1
echo "bisect q256 exit: $?"
