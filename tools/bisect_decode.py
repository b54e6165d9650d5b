"""Bisect the decode dispatch on real TPU: full vs no-KV-write vs
no-attention vs no-sampler vs no-lm-head
(usage: python tools/bisect_decode.py [full|nowrite|noattn|nosample|nolmhead])."""
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
KVD = sys.argv[2] if len(sys.argv) > 2 else "int8"
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             load_format="random", decode_steps=32, kv_cache_dtype=KVD,
             max_num_seqs=64, kvcache_block_size=128)
runner = ModelRunner(cfg)
if mode == "noattn":
    def fake_attn_fn(is_prefill, qmax, pk):
        def attn(q, k, v, cache, layer_i, meta):
            return q, cache
        return attn
    runner._attn_fn = fake_attn_fn
elif mode == "nowrite":
    # The kernel writes KV itself now; sentinel slots disable the merge +
    # window write-backs.
    import jax.numpy as jnp
    import nanovllm_tpu.ops.attention_pallas as ap
    orig_decode = ap.paged_decode_attention

    def _nw(q, kr, vr, sc, data, scales, li, ctx, bt, slots, **kw):
        slots = jnp.full_like(slots, kw["num_slots"])
        return orig_decode(q, kr, vr, sc, data, scales, li, ctx, bt, slots,
                           **kw)
    ap.paged_decode_attention = _nw
elif mode == "nosample":
    # Constant token feedback: removes Gumbel RNG + fused argmax, keeps the
    # lm_head matmul (its fp32 [64, V] logits still materialize).
    import jax.numpy as jnp
    import nanovllm_tpu.engine.model_runner as mr
    mr.sample = lambda logits, temps, rng, *a: jnp.full(
        logits.shape[:-1], 7, jnp.int32)
elif mode == "nolmhead":
    # Also skip the lm_head matmul: forward returns zero logits (the matmul
    # DCEs because nothing consumes x's last-token rows).
    import jax.numpy as jnp
    import nanovllm_tpu.engine.model_runner as mr
    from nanovllm_tpu.models import qwen3 as q3
    orig_fwd = q3.forward
    def _nolm(params, cfg2, kv_cache, meta, attn_fn):
        logits, kv_cache = orig_fwd(params, cfg2, kv_cache, meta, attn_fn)
        logits = jnp.zeros_like(logits)
        return logits, kv_cache
    mr.qwen3 = type("M", (), {"forward": staticmethod(_nolm)})
    mr.sample = lambda logits, temps, rng, *a: jnp.full(
        logits.shape[:-1], 7, jnp.int32)
print("mode:", mode)

bm = BlockManager(cfg.num_kvcache_blocks, cfg.kvcache_block_size)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, 1536).tolist(),
                 SamplingParams(max_tokens=400, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(64)]
for s in seqs:
    bm.allocate(s)
    s.append_token(7)
    bm.commit_token(s)
    bm.reserve(s, 32)
toks = runner.run(seqs, is_prefill=False, num_steps=32)  # compile
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    runner.run(seqs, is_prefill=False, num_steps=32)
    best = min(best, time.perf_counter() - t0)
print(f"decode dispatch ({mode}, kv={KVD}): {best*1e3:.1f} ms "
      f"({best/32*1e3:.2f} ms/step, {64*32/best:.0f} tok/s)")
