"""Paged KV-cache creation and the KV scatter (write-through) op.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59). On TPU the
scatter is expressed as an XLA scatter over a flat slot view with the cache
donated into the step function — XLA's buffer aliasing makes it in-place, so
no Pallas kernel is needed for correctness; the Pallas attention kernels read
the same layout.

Cache layout per layer: [2, kv_heads, num_pages, page_size, head_dim]
- kv_heads leading so the tensor-parallel mesh shards it cleanly, and each
  head's pages are contiguous for the decode kernel's per-head DMA streaming.
- full cache stacks layers: [L, 2, kv_heads, num_pages, page_size, head_dim].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype) -> jax.Array:
    return jnp.zeros(
        (num_layers, 2, num_kv_heads, num_pages, page_size, head_dim),
        dtype=dtype,
    )


def write_kv(layer_cache, k, v, slot_mapping):
    """Scatter new K/V rows into the paged cache.

    layer_cache: [2, Hkv, pages, page_size, D]
    k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold an out-of-bounds
    slot; scatter mode "drop" discards them).
    Returns the updated layer cache.
    """
    _, hkv, pages, page_size, d = layer_cache.shape
    flat = layer_cache.reshape(2, hkv, pages * page_size, d)
    kv = jnp.stack([k, v], axis=0).astype(flat.dtype)  # [2, T, Hkv, D]
    kv = jnp.moveaxis(kv, 2, 1)  # [2, Hkv, T, D]
    flat = flat.at[:, :, slot_mapping].set(kv, mode="drop")
    return flat.reshape(layer_cache.shape)


def gather_pages(layer_cache, block_tables, num_gather_pages: int):
    """Dense gather of per-sequence KV from the paged cache (the XLA reference
    backend's read path; reference attention_sdpa.py:148-182 capability).

    Returns k, v: [S, Hkv, num_gather_pages * page_size, D].
    """
    _, hkv, _, page_size, d = layer_cache.shape
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    # [2, Hkv, S, Pk, page_size, D]
    gathered = layer_cache[:, :, tables]
    s = tables.shape[0]
    gathered = gathered.reshape(2, hkv, s, num_gather_pages * page_size, d)
    k = jnp.moveaxis(gathered[0], 1, 0)  # [S, Hkv, K, D]
    v = jnp.moveaxis(gathered[1], 1, 0)
    return k, v
