"""Paged KV-cache creation and the KV scatter (write-through) op.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE 2-D row array

    cache[(layer * 2 + kv) * num_slots + slot, Hkv * D]

where slot = page_id * page_size + offset. Why this exact shape (learned the
hard way on hardware):
- Per-layer slicing of a stacked cache (dynamic_index/update_index) makes XLA
  materialize a full layer copy per layer per step.
- A 5-D scatter at (layer, :, :, slot) triggers an operand RELAYOUT copy on
  TPU (the scatter wants the indexed dim major), doubling HBM at compile.
- A leading-dim row scatter on a 2-D array is the embedding-update pattern:
  no transpose, aliases in place on the donated buffer.
- A page read is ONE contiguous [page_size, Hkv*D] DMA covering all KV heads
  (the Pallas kernels batch all heads per program anyway).
- Tensor parallelism shards the minor Hkv*D dim: head-aligned contiguous
  per-device chunks when Hkv % tp == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype) -> jax.Array:
    num_slots = num_pages * page_size
    return jnp.zeros(
        (num_layers * 2 * num_slots, num_kv_heads * head_dim), dtype=dtype)


def kv_row_base(layer_i, is_v: int, num_slots: int):
    return (layer_i * 2 + is_v) * num_slots


def write_kv(cache, layer_i, k, v, slot_mapping, num_slots: int):
    """Scatter new K/V rows for one layer into the paged cache.

    cache: [L*2*num_slots, Hkv*D] (donated; row scatter is in-place)
    k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold num_slots, an
    out-of-bounds slot relative to the layer's K region only — so pads are
    redirected to an explicit drop by clamping against the region bound).
    """
    t = k.shape[0]
    hd = k.shape[1] * k.shape[2]
    valid = slot_mapping < num_slots
    k_rows = kv_row_base(layer_i, 0, num_slots) + slot_mapping
    v_rows = kv_row_base(layer_i, 1, num_slots) + slot_mapping
    total = cache.shape[0]
    # Pad tokens: send the row index out of bounds so mode="drop" discards it
    # (their in-layer slot is only out of bounds for the layer region).
    rows = jnp.concatenate([
        jnp.where(valid, k_rows, total),
        jnp.where(valid, v_rows, total),
    ])
    upd = jnp.concatenate([k.reshape(t, hd), v.reshape(t, hd)], axis=0)
    return cache.at[rows].set(upd.astype(cache.dtype), mode="drop",
                              unique_indices=True)


def gather_pages(cache, layer_i, block_tables, num_gather_pages: int,
                 page_size: int, num_slots: int, num_kv_heads: int):
    """Dense gather of per-sequence KV from the paged cache (the XLA reference
    backend's read path; reference attention_sdpa.py:148-182 capability).

    Returns k, v: [S, Hkv, num_gather_pages * page_size, D].
    """
    s = block_tables.shape[0]
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    slots = (tables[:, :, None] * page_size
             + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
    hd = cache.shape[1]
    d = hd // num_kv_heads
    k = cache[kv_row_base(layer_i, 0, num_slots) + slots]  # [S, K, Hkv*D]
    v = cache[kv_row_base(layer_i, 1, num_slots) + slots]
    kmax = slots.shape[1]
    k = jnp.moveaxis(k.reshape(s, kmax, num_kv_heads, d), 2, 1)
    v = jnp.moveaxis(v.reshape(s, kmax, num_kv_heads, d), 2, 1)
    return k, v
