"""Paged KV-cache creation and the KV scatter (write-through) op.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE flat-slot array [L, 2, kv_heads, num_slots, head_dim] where
slot = page_id * page_size + offset; a page is an aligned slot range.
Critical TPU design point: the cache is NEVER sliced per layer — per-layer
slicing (dynamic_index_in_dim + update) makes XLA materialize layer copies,
turning every decode step into a full-cache HBM copy. Instead all writes are
scatters into the full donated array at (layer, slots), which XLA performs
in place, and the Pallas kernels DMA pages straight out of the full array
with a layer offset.

kv_heads leads the slot dim so the tensor-parallel mesh shards it cleanly and
each head's slots are contiguous for per-head DMA streaming.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype) -> jax.Array:
    return jnp.zeros(
        (num_layers, 2, num_kv_heads, num_pages * page_size, head_dim),
        dtype=dtype,
    )


def write_kv(cache, layer_i, k, v, slot_mapping):
    """Scatter new K/V rows for one layer into the full paged cache.

    cache: [L, 2, Hkv, num_slots, D] (donated; scatter is in-place)
    k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold an out-of-bounds
    slot; scatter mode "drop" discards them).
    """
    # Advanced-indexing note: layer_i (scalar) and slot_mapping ([T]) are
    # separated by slices, so the indexed view is [T, 2, Hkv, D].
    kv = jnp.stack([k, v], axis=1).astype(cache.dtype)  # [T, 2, Hkv, D]
    return cache.at[layer_i, :, :, slot_mapping].set(kv, mode="drop")


def gather_pages(cache, layer_i, block_tables, num_gather_pages: int,
                 page_size: int):
    """Dense gather of per-sequence KV from the paged cache (the XLA reference
    backend's read path; reference attention_sdpa.py:148-182 capability).

    Returns k, v: [S, Hkv, num_gather_pages * page_size, D].
    """
    s = block_tables.shape[0]
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    slots = (tables[:, :, None] * page_size
             + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
    # Reference-backend read path: per-seq dense gather (the layer slice is
    # acceptable here — this backend is the correctness baseline, the Pallas
    # backend DMAs pages from the full cache without any slice).
    gathered = cache[layer_i][:, :, slots]       # [2, Hkv, S, K, D]
    k = jnp.moveaxis(gathered[0], 1, 0)          # [S, Hkv, K, D]
    v = jnp.moveaxis(gathered[1], 1, 0)
    return k, v
