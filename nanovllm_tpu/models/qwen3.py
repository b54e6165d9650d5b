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
from nanovllm_tpu.ops.rope import apply_rope


def _layer(x, residual, lp, cache_l, meta, cfg: ModelConfig, attn_fn):
    hq = cfg.num_attention_heads
    hkv = cfg.num_key_value_heads
    d = cfg.head_dim
    eps = cfg.rms_norm_eps
    t = x.shape[0]

    if residual is None:
        residual = x
        h = rms_norm(x, lp["input_ln"], eps)
    else:
        h, residual = add_rms_norm(x, residual, lp["input_ln"], eps)

    q = (h @ lp["wq"]).reshape(t, hq, d)
    k = (h @ lp["wk"]).reshape(t, hkv, d)
    v = (h @ lp["wv"]).reshape(t, hkv, d)
    if cfg.qk_norm:
        q = rms_norm(q, lp["q_norm"], eps)
        k = rms_norm(k, lp["k_norm"], eps)
    q, k = apply_rope(q, k, meta.positions, cfg.rope_theta)

    attn_out, cache_l = attn_fn(q, k, v, cache_l, meta)
    h = attn_out.reshape(t, hq * d) @ lp["o"]

    h, residual = add_rms_norm(h, residual, lp["post_ln"], eps)
    gate = h @ lp["gate"]
    up = h @ lp["up"]
    h = (jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up) @ lp["down"]
    return h, residual, cache_l


def forward(params, cfg: ModelConfig, kv_cache, meta, attn_fn):
    """Returns (last_token_logits [S, V] fp32, updated kv_cache [L, ...]).

    kv_cache: [L, 2, Hkv, pages, page_size, D]. Threaded through `lax.scan`
    as part of the carry and updated in place per layer via
    dynamic_update_index — with the cache donated into the jitted step, XLA
    aliases the buffer and the update is truly in-place.
    """
    x = params["embed"][meta.input_ids].astype(params["layers"]["wq"].dtype)

    num_layers = cfg.num_hidden_layers

    def body(carry, layer_i):
        x, residual, cache = carry
        lp = jax.tree.map(lambda p: lax.dynamic_index_in_dim(
            p, layer_i, axis=0, keepdims=False), params["layers"])
        cache_l = lax.dynamic_index_in_dim(cache, layer_i, axis=0,
                                           keepdims=False)
        x, residual, cache_l = _layer(x, residual, lp, cache_l, meta, cfg,
                                      attn_fn)
        cache = lax.dynamic_update_index_in_dim(cache, cache_l, layer_i,
                                                axis=0)
        return (x, residual, cache), None

    # First layer outside scan: it establishes the residual stream (carry
    # structure must be uniform).
    lp0 = jax.tree.map(lambda p: p[0], params["layers"])
    cache0 = kv_cache[0]
    x, residual, cache0 = _layer(x, None, lp0, cache0, meta, cfg, attn_fn)
    kv_cache = lax.dynamic_update_index_in_dim(kv_cache, cache0, 0, axis=0)

    if num_layers > 1:
        (x, residual, kv_cache), _ = lax.scan(
            body, (x, residual, kv_cache),
            jnp.arange(1, num_layers), length=num_layers - 1)

    x = rms_norm(x + residual, params["final_ln"], cfg.rms_norm_eps)
    # Only last-token rows feed the LM head (reference embed_head.py:62-65).
    last = x[meta.last_token_idx]  # [S, H]
    # bf16 matmul with fp32 accumulation on the MXU — no fp32 weight copy.
    logits = jnp.matmul(last, params["lm_head"],
                        preferred_element_type=jnp.float32)
    return logits, kv_cache
