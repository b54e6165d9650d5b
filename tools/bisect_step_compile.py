"""Bisect WHICH part of the prefill step program hangs the remote compile.

Usage: python tools/bisect_step_compile.py VARIANT
  noattn    embed + layer scan (attention = identity) + lm_head + sample
  nodonate  same as noattn but kv cache not donated
  nocache   layer scan without the kv cache in the carry at all
  nohead    stop before the lm head (return x.sum())
  noembed   skip the embedding gather (ones instead)
  nosample  logits returned, no sampler
  headonly  embed + lm_head + sample, no layer scan
"""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from bench import QWEN3_0_6B
from nanovllm_tpu.engine.batch import BatchMeta, build_prefill_meta
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.ops.kv_cache import create_kv_cache
from nanovllm_tpu.ops.norm import add_rms_norm, rms_norm
from nanovllm_tpu.ops.rope import apply_rope, rope_cos_sin
from nanovllm_tpu.ops.sampler import sample
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.loader import init_random_params

variant = sys.argv[1] if len(sys.argv) > 1 else "noattn"
mc = QWEN3_0_6B
NSEQ, LEN, T, PS = 8, 1024, 8192, 128
PAGES = 1666 if variant == 'exact' else 1024
NUM_SLOTS = PAGES * PS

print("init params...", flush=True)
params = init_random_params(mc, jnp.bfloat16, 0)
jax.block_until_ready(params)
cache = create_kv_cache(mc.num_hidden_layers, mc.num_key_value_heads,
                        PAGES, PS, mc.head_dim, jnp.int8)
cache = jax.device_put(cache)
jax.block_until_ready(cache)
print("cache ready", flush=True)

bm = BlockManager(PAGES, PS)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, mc.vocab_size, LEN).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True), block_size=PS)
        for _ in range(NSEQ)]
for s in seqs:
    bm.allocate(s)
md = build_prefill_meta(seqs, T, NSEQ, PS, 16, NUM_SLOTS, q_tile=128)
meta = BatchMeta(**{k: jnp.asarray(v) for k, v in md.items()})
if variant in ("rbg", "exact"):
    key = jax.random.key(0, impl="rbg")
else:
    key = jax.random.PRNGKey(0)


def fwd(params, kv_cache, meta, rng_key):
    if variant == "noembed":
        x = jnp.ones((T, mc.hidden_size), jnp.bfloat16)
    else:
        x = params["embed"][meta.input_ids]
    residual = jnp.zeros_like(x)
    rope_cs = rope_cos_sin(meta.positions, mc.head_dim, mc.rope_theta)
    hq, hkv, d, eps = (mc.num_attention_heads, mc.num_key_value_heads,
                       mc.head_dim, mc.rms_norm_eps)
    I = mc.intermediate_size

    def layer(x, residual, lp, cache):
        t = x.shape[0]
        h, residual = add_rms_norm(x, residual, lp["input_ln"], eps)
        q = h @ lp["wq"]
        k = h @ lp["wk"]
        v = h @ lp["wv"]
        q = q.reshape(t, hq, d)
        k = k.reshape(t, hkv, d)
        v = v.reshape(t, hkv, d)
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
        q, k = apply_rope(q, k, *rope_cs)
        attn_out = q  # identity attention
        h = attn_out.reshape(t, hq * d) @ lp["o"]
        h, residual = add_rms_norm(h, residual, lp["post_ln"], eps)
        gate = h @ lp["gate"]
        up = h @ lp["up"]
        h = (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up) \
            @ lp["down"]
        return h, residual, cache

    if variant != "headonly":
        if variant == "nocache":
            def body(carry, inputs):
                x, residual = carry
                _, lp = inputs
                x, residual, _ = layer(x, residual, lp, None)
                return (x, residual), None
            (x, residual), _ = lax.scan(
                body, (x, residual),
                (jnp.arange(mc.num_hidden_layers), params["layers"]))
        else:
            def body(carry, inputs):
                x, residual, cache = carry
                _, lp = inputs
                x, residual, cache = layer(x, residual, lp, cache)
                return (x, residual, cache), None
            (x, residual, kv_cache), _ = lax.scan(
                body, (x, residual, kv_cache),
                (jnp.arange(mc.num_hidden_layers), params["layers"]))

    x = rms_norm(x + residual, params["final_ln"], mc.rms_norm_eps)
    if variant == "nohead":
        return kv_cache, x.sum()[None]
    last = x[meta.last_token_idx]
    logits = (last @ params["lm_head"]).astype(jnp.float32)
    if variant == "nosample":
        return kv_cache, logits.sum()[None]
    tokens = sample(logits, meta.temperatures, rng_key, None, None)
    return kv_cache, tokens


donate = () if variant == "nodonate" else (1,)
f = jax.jit(fwd, donate_argnums=donate)
print(f"compiling variant={variant} ...", flush=True)
t0 = time.time()
cache2, toks = f(params, cache, meta, key)
jax.block_until_ready(toks)
print(f"variant={variant}: compile+run {time.time()-t0:.1f}s", flush=True)
