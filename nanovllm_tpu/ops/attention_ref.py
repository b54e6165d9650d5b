"""XLA reference attention backend (CPU-runnable, gather-into-dense).

Capability equivalent of the reference SDPA baseline backend
(nanovllm/layers/attention_sdpa.py): new KV is written through to the paged
cache, then each sequence's context is gathered into a dense buffer and
attention runs as plain einsums. Deliberately simple and memory-hungry — it
is the correctness baseline for the Pallas backend and the CPU test target
(its OOM behavior at large batch×len is authentic to the baseline's crossover
grid, SURVEY §6).

One scale application only (the reference's Triton double-scaling quirk,
SURVEY §2.5, is fixed). Softmax in fp32.
"""

from __future__ import annotations

import jax.numpy as jnp

from nanovllm_tpu.ops.kv_cache import gather_pages, write_kv

NEG_INF = float("-inf")


def ref_attention(q, k, v, cache, layer_i, meta, *, scale: float,
                  max_q_len: int, num_gather_pages: int, page_size: int,
                  num_slots: int, num_layers: int):
    """q: [T, Hq, D]; k, v: [T, Hkv, D]; cache: [L*2*num_slots, Hkv*D]
    (full 2-D row cache — see ops/kv_cache.py for the layout rationale).

    Returns (out [T, Hq, D], updated cache).
    """
    t, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv  # GQA group size
    s = meta.block_tables.shape[0]
    qmax = max_q_len

    cache = write_kv(cache, layer_i, k, v, meta.slot_mapping, num_slots,
                     num_layers, page_size)
    kd, vd = gather_pages(cache, layer_i, meta.block_tables,
                          num_gather_pages, page_size, num_slots, hkv,
                          num_layers, head_dim=d)
    kmax = kd.shape[2]

    # Densify flat ragged queries into [S(+dump), Qmax, Hq, D].
    q_dense = jnp.zeros((s + 1, qmax, hq, d), q.dtype)
    q_dense = q_dense.at[meta.seq_idx, meta.q_offset].set(q)
    pos_dense = jnp.full((s + 1, qmax), -1, jnp.int32)
    pos_dense = pos_dense.at[meta.seq_idx, meta.q_offset].set(meta.positions)
    q_dense, pos_dense = q_dense[:s], pos_dense[:s]

    qg = q_dense.reshape(s, qmax, hkv, g, d)
    scores = jnp.einsum(
        "sqhgd,shkd->shgqk", qg.astype(jnp.float32), kd.astype(jnp.float32)
    ) * scale  # [S, Hkv, G, Qmax, Kmax]

    kv_pos = jnp.arange(kmax, dtype=jnp.int32)
    mask = (kv_pos[None, None, :] <= pos_dense[:, :, None]) & (
        kv_pos[None, None, :] < meta.context_lens[:, None, None]
    )  # [S, Qmax, Kmax]; pad rows (pos -1) mask everything
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)  # fully-masked rows
    probs = jnp.exp(scores - smax)
    probs = jnp.where(mask[:, None, None, :, :], probs, 0.0)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs / jnp.maximum(denom, 1e-20)

    out = jnp.einsum("shgqk,shkd->sqhgd", probs, vd.astype(jnp.float32))
    out = out.reshape(s, qmax, hq, d).astype(q.dtype)
    # Dump row for pad tokens, then gather back to the flat layout.
    out = jnp.concatenate([out, jnp.zeros((1, qmax, hq, d), q.dtype)], axis=0)
    return out[meta.seq_idx, meta.q_offset], cache
