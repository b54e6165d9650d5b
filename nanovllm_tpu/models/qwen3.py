"""Qwen3 decoder, TPU-native: pure functions over a params pytree.

Capability parity with reference nanovllm/models/qwen3.py (GQA, per-head
q/k RMSNorm, non-interleaved RoPE, SiLU-and-mul MLP, RMSNorm residual stream,
fused QKV + gate_up weight layout, tied embeddings) — re-architected:

- No nn.Module graph: params are a pytree, the forward is a pure function,
  layers run under `lax.scan` over stacked [L, ...] weights so every jit
  bucket compiles one layer body instead of N (XLA-friendly, SURVEY §7.2).
- The attention backend is a function argument, not a class chosen by a
  string planted on the HF config (reference models/qwen3.py:44-56).
- Tensor parallelism is expressed by sharding the stacked weights over the
  mesh "tp" axis (fused QKV / gate_up sharded on the output dim, o/down on
  the input dim, embeddings on vocab) and letting GSPMD insert the psum —
  the NCCL all_reduce of reference layers/linear.py:186-190 becomes an ICI
  collective placed by the compiler.
- Attention scale applied exactly once (fixes the reference's Triton-path
  double scaling, SURVEY §2.5).

Params pytree (stacked over layers L, x @ W layout):
  embed:    [V, H]
  layers:
    input_ln: [L, H]          post_ln: [L, H]
    wq:      [L, H, Hq*D]     wk/wv: [L, H, Hkv*D]
    q_norm:  [L, D]           k_norm: [L, D]
    o:       [L, Hq*D, H]
    gate:    [L, H, I]        up: [L, H, I]
    down:    [L, I, H]
  final_ln: [H]
  lm_head:  [H, V]

q/k/v (and gate/up) are separate leaves rather than fused as in the reference
(models/qwen3.py:64-70): a fused output dim sharded over the TP mesh axis
would split misaligned with head boundaries and force GSPMD reshards; the
separate form shards head-aligned with zero extra collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.ops.norm import add_rms_norm, rms_norm
from nanovllm_tpu.ops.quant import qmm
from nanovllm_tpu.ops.rope import apply_rope, rope_cos_sin


def _layer(x, residual, lp, cache, layer_i, meta, cfg: ModelConfig, attn_fn,
           rope_cs):
    hq = cfg.num_attention_heads
    hkv = cfg.num_key_value_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    t = x.shape[0]

    h, residual = add_rms_norm(x, residual, lp["input_ln"], eps)

    q = qmm(h, lp["wq"])
    k = qmm(h, lp["wk"])
    v = qmm(h, lp["wv"])
    if "bq" in lp:  # Qwen2/2.5-style QKV biases
        q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
    q = q.reshape(t, hq, d)
    k = k.reshape(t, hkv, d)
    v = v.reshape(t, hkv, d)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q, k = apply_rope(q, k, *rope_cs)

    attn_out, cache = attn_fn(q, k, v, cache, layer_i, meta)
    h = qmm(attn_out.reshape(t, hq * d), lp["o"])

    h, residual = add_rms_norm(h, residual, lp["post_ln"], eps)
    gate = qmm(h, lp["gate"])
    up = qmm(h, lp["up"])
    h = qmm(jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up,
            lp["down"])
    return h, residual, cache


def forward_hidden(params, cfg: ModelConfig, kv_cache, meta, attn_fn):
    """Returns (last-token hidden states [S, H], updated kv_cache) — the
    decoder stack without the LM head, so the runner can fuse head+sampling
    over vocab tiles (ops/sampler.fused_sample) instead of materializing
    [S, V] fp32 logits.

    kv_cache: the flat 2-D {"data", "scales"} dict of ops/kv_cache.py
    (data rows indexed by (layer, page, k|v, offset)), threaded WHOLE
    through the layer scan carry; each layer's writes hit its own row range
    of the donated buffers in place (leading-dim row scatters in the XLA
    backend, in-kernel DMAs in the Pallas backend). The cache is never
    sliced per layer — a slice/update-slice pair on a stacked layout
    materialized a full layer copy per layer per step (measured: it turns
    decode into an HBM-bandwidth cache memcpy), which is why the layout is
    flat with the layer folded into the row index.
    """
    from nanovllm_tpu.ops.quant import embed_lookup
    x = embed_lookup(params["embed"], meta.input_ids,
                     params["final_ln"].dtype)
    residual = jnp.zeros_like(x)
    rope_cs = rope_cos_sin(meta.positions, cfg.head_dim, cfg.rope_theta)

    def body(carry, inputs):
        x, residual, cache = carry
        layer_i, lp = inputs
        x, residual, cache = _layer(x, residual, lp, cache, layer_i, meta,
                                    cfg, attn_fn, rope_cs)
        return (x, residual, cache), None

    (x, residual, kv_cache), _ = lax.scan(
        body, (x, residual, kv_cache),
        (jnp.arange(cfg.num_hidden_layers), params["layers"]))

    x = rms_norm(x + residual, params["final_ln"], cfg.rms_norm_eps)
    # Only last-token rows feed the LM head (reference embed_head.py:62-65).
    return x[meta.last_token_idx], kv_cache  # [S, H]


def compute_logits(params, last):
    """LM head on last-token hidden rows (reference embed_head.py:66-71).
    bf16 matmul with fp32 accumulation on the MXU — no fp32 weight copy."""
    return qmm(last, params["lm_head"], preferred=jnp.float32)


def forward(params, cfg: ModelConfig, kv_cache, meta, attn_fn):
    """Returns (last_token_logits [S, V] fp32, updated kv_cache)."""
    last, kv_cache = forward_hidden(params, cfg, kv_cache, meta, attn_fn)
    return compute_logits(params, last), kv_cache
