"""Bisect a full prefill dispatch on real TPU (usage:
python tools/bisect_prefill.py [full|noattn|noquant|host]).

full    — 8 seqs x 1024 tokens, int8 KV, the production prefill step
noattn  — attention (incl. quantize+write-through) replaced by identity
noquant — kv_cache_dtype bfloat16 (no quantize_kv_rows, smaller writes)
host    — time build_prefill_meta alone (no device work)
"""
import logging, os, sys, time
logging.basicConfig(level=logging.INFO)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from bench import QWEN3_0_6B
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
QTILE = int(sys.argv[2]) if len(sys.argv) > 2 else 128
NSEQ, LEN = 8, 1024
kvd = "bfloat16" if mode == "noquant" else "int8"
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             load_format="random", decode_steps=32, kv_cache_dtype=kvd,
             max_num_seqs=64, kvcache_block_size=128, prefill_q_tile=QTILE,
             num_kvcache_blocks=int(os.environ.get("NVT_PAGES", "-1")))

if mode == "host":
    from nanovllm_tpu.engine.batch import build_prefill_meta
    bm = BlockManager(1024, cfg.kvcache_block_size)
    rng = np.random.default_rng(0)
    seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                     SamplingParams(max_tokens=4, ignore_eos=True),
                     block_size=cfg.kvcache_block_size) for _ in range(NSEQ)]
    for s in seqs:
        bm.allocate(s)
    best = float("inf")
    for _ in range(20):
        t0 = time.perf_counter()
        build_prefill_meta(seqs, 8192, 8, cfg.kvcache_block_size, 16,
                           1024 * cfg.kvcache_block_size, q_tile=128)
        best = min(best, time.perf_counter() - t0)
    print(f"build_prefill_meta({NSEQ}x{LEN}): {best*1e3:.2f} ms")
    sys.exit(0)

runner = ModelRunner(cfg)
if mode == "noattn":
    def fake_attn_fn(is_prefill, qmax, pk):
        def attn(q, k, v, cache, layer_i, meta):
            return q, cache
        return attn
    runner._attn_fn = fake_attn_fn
print("mode:", mode)

bm = BlockManager(cfg.num_kvcache_blocks, cfg.kvcache_block_size)
rng = np.random.default_rng(0)
best = float("inf")
for it in range(6):
    seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                     SamplingParams(max_tokens=4, ignore_eos=True),
                     block_size=cfg.kvcache_block_size)
            for _ in range(NSEQ)]
    for s in seqs:
        bm.allocate(s)
    t0 = time.perf_counter()
    runner.run(seqs, is_prefill=True)
    dt = time.perf_counter() - t0
    if it:  # first iter compiles
        best = min(best, dt)
    for s in seqs:
        bm.deallocate(s)
print(f"prefill dispatch ({mode}, {NSEQ}x{LEN}, q_tile={QTILE}): "
      f"{best*1e3:.1f} ms ({NSEQ*LEN/best:.0f} tok/s)")

if os.environ.get("PROFILE"):
    import jax
    with jax.profiler.trace("/tmp/pf_trace"):
        seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                         SamplingParams(max_tokens=4, ignore_eos=True),
                         block_size=cfg.kvcache_block_size)
                for _ in range(NSEQ)]
        for s in seqs:
            bm.allocate(s)
        runner.run(seqs, is_prefill=True)
    print("trace written to /tmp/pf_trace")
