"""Split the engine-level prefill step time into device compute vs dispatch
overhead (VERDICT r3 item 7: bisect the 0.6B prefill MFU).

Hypothesis: 0.6B prefill MFU (37-41%) is depressed by FIXED per-dispatch cost
(tunnel round-trip ~55 ms + per-step meta device_put), which larger models
amortize over longer steps — explaining MFU growing 40->58->65->72% with
model size. Test: dispatch the SAME full prefill step N times back-to-back
fetching only the last result (the proxy only synchronizes on a real fetch),
vs fetching every step. The pipelined per-step time approximates device
compute; the difference is round-trip overhead a local-chip deployment never
pays (and that fused multi-step decode already amortizes for decode).

Usage: python tools/probe_prefill_overhead.py [nseq] [len] [iters]
Env: NVT_QUANT (default int4), NVT_KVD (default int4) to match bench.py.
"""
import logging, os, sys, time
logging.basicConfig(level=logging.INFO)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from bench import QWEN3_0_6B
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import BatchMeta, build_prefill_meta
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

NSEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             load_format="random", decode_steps=32,
             quant=os.environ.get("NVT_QUANT", "int4"),
             kv_cache_dtype=os.environ.get("NVT_KVD", "int4"),
             max_num_seqs=64, kvcache_block_size=128,
             num_kvcache_blocks=int(os.environ.get("NVT_PAGES", "-1")))
runner = ModelRunner(cfg)

bm = BlockManager(cfg.num_kvcache_blocks, cfg.kvcache_block_size)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(NSEQ)]
for s in seqs:
    bm.allocate(s)

key = runner.bucket_key(seqs, True, 1)
_, t, s_pad = key[:3]
raw = build_prefill_meta(seqs, t, s_pad, cfg.kvcache_block_size,
                         cfg.pages_per_seq, runner.num_slots,
                         q_tile=cfg.prefill_q_tile)
step_fn = runner._get_step_fn(key)

# Warm: compile + first execution.
meta = jax.device_put(BatchMeta(**raw), runner._rep)
runner.rng_key, sub = jax.random.split(runner.rng_key)
kv, tokens = step_fn(runner.params, runner.kv_cache, meta, sub)
runner.kv_cache = kv
np.asarray(tokens)

# device_put cost of the per-step meta (paid once per engine step).
best_put = min(
    (lambda t0: (np.asarray(  # fetch one leaf to force the transfer round
        jax.device_put(BatchMeta(**raw), runner._rep).positions[0]),
        time.perf_counter() - t0)[1])(time.perf_counter())
    for _ in range(5))
print(f"meta device_put+fetch round: {best_put*1e3:.1f} ms")

# A: fetch every step (what ModelRunner.run does).
ts = []
for _ in range(ITERS):
    t0 = time.perf_counter()
    runner.rng_key, sub = jax.random.split(runner.rng_key)
    runner.kv_cache, tokens = step_fn(runner.params, runner.kv_cache, meta,
                                      sub)
    np.asarray(tokens)
    ts.append(time.perf_counter() - t0)
synced = min(ts)
print(f"synced per-step   ({NSEQ}x{LEN}): {synced*1e3:.1f} ms  "
      f"({NSEQ*LEN/synced:.0f} tok/s)  all={['%.0f' % (x*1e3) for x in ts]}")

# B: enqueue ITERS steps, fetch once.
t0 = time.perf_counter()
for _ in range(ITERS):
    runner.rng_key, sub = jax.random.split(runner.rng_key)
    runner.kv_cache, tokens = step_fn(runner.params, runner.kv_cache, meta,
                                      sub)
np.asarray(tokens)
piped = (time.perf_counter() - t0) / ITERS
print(f"pipelined per-step ({NSEQ}x{LEN}, {ITERS} deep): {piped*1e3:.1f} ms  "
      f"({NSEQ*LEN/piped:.0f} tok/s)")
print(f"fixed dispatch overhead per synced step: {(synced-piped)*1e3:.1f} ms "
      f"({100*(synced-piped)/synced:.0f}% of the synced step)")
