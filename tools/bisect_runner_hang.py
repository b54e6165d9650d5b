"""Reproduce ModelRunner.run's prefill hang stage by stage."""
import logging, os, sys, time
logging.basicConfig(level=logging.INFO)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from bench import QWEN3_0_6B
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.batch import BatchMeta, build_prefill_meta
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

mode = sys.argv[1] if len(sys.argv) > 1 else "noattn"
NSEQ, LEN = 8, 1024
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             load_format="random", decode_steps=32, kv_cache_dtype="int8",
             max_num_seqs=64, kvcache_block_size=128, prefill_q_tile=128,
             native_core=(sys.argv[2] == "native" if len(sys.argv) > 2 else False))

runner = ModelRunner(cfg)
if mode == "noattn":
    def fake_attn_fn(is_prefill, qmax, pk):
        def attn(q, k, v, cache, layer_i, meta):
            return q, cache
        return attn
    runner._attn_fn = fake_attn_fn

bm = BlockManager(cfg.num_kvcache_blocks, cfg.kvcache_block_size)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(NSEQ)]
for s in seqs:
    bm.allocate(s)

key = runner.bucket_key(seqs, True, 1)
print("bucket:", key, flush=True)
_, t, s = key[:3]
raw = build_prefill_meta(seqs, t, s, cfg.kvcache_block_size,
                         cfg.pages_per_seq, runner.num_slots,
                         q_tile=cfg.prefill_q_tile)


def stage(name, fn):
    t0 = time.time()
    r = fn()
    print(f"[{time.time()-t0:7.2f}s] {name}", flush=True)
    return r


meta = stage("device_put meta", lambda: jax.device_put(
    BatchMeta(**raw), runner._rep))
stage("meta ready", lambda: jax.block_until_ready(meta))
runner.rng_key, sub = stage("rng split",
                            lambda: jax.random.split(runner.rng_key))
stage("rng ready", lambda: jax.block_until_ready(sub))
step_fn = stage("get step fn", lambda: runner._get_step_fn(key))
lowered = stage("trace/lower", lambda: step_fn.lower(
    runner.params, runner.kv_cache, meta, sub))
compiled = stage("compile", lambda: lowered.compile())
out = stage("dispatch", lambda: compiled(
    runner.params, runner.kv_cache, meta, sub))
stage("block", lambda: jax.block_until_ready(out[1]))
print("tokens:", np.asarray(out[1])[:, :NSEQ], flush=True)
