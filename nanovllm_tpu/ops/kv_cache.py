"""Paged KV-cache creation and the KV scatter (write-through) op.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE 2-D row array, head-major:

    cache[((head * L + layer) * 2 + kv) * num_slots + slot, D]

where slot = page_id * page_size + offset. Why this exact shape (each point
learned on hardware):
- Per-layer slicing of a stacked cache (dynamic_index/update_index) makes XLA
  materialize a full layer copy per layer per step.
- A scatter at (layer, :, head, slot) on a >2-D cache triggers an operand
  RELAYOUT copy on TPU (the scatter wants indexed dims major), doubling HBM.
- A leading-dim row scatter on a 2-D array is the embedding-update pattern:
  no transpose, aliases in place on the donated buffer.
- One (head, page) block is a contiguous [page_size, D] run, so the Pallas
  kernels DMA pages directly into [Hkv, chunk, D] buffers — no in-VMEM
  transposes on the streamed KV (a whole-KV VPU shuffle per step otherwise).
- Head is the outermost row group, so tensor-parallel row sharding
  (P("tp", None)) is head-aligned when Hkv % tp == 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype) -> dict:
    """Returns {"data": [rows, D], "scales": f32[rows] | f32[1]}.

    With dtype int8 each row carries a per-(token, head) absmax scale
    (INT8 KV cache — halves the decode HBM traffic, the dominant term).
    Scales are folded into attention scores/probabilities, never into the
    streamed KV data."""
    num_slots = num_pages * page_size
    rows = num_kv_heads * num_layers * 2 * num_slots
    data = jnp.zeros((rows, head_dim), dtype=dtype)
    scales = (jnp.ones(rows, jnp.float32) if dtype == jnp.int8
              else jnp.ones(1, jnp.float32))
    return {"data": data, "scales": scales}


def kv_row_base(head, layer_i, is_v: int, num_layers: int, num_slots: int):
    return ((head * num_layers + layer_i) * 2 + is_v) * num_slots


def write_kv(cache: dict, layer_i, k, v, slot_mapping, num_slots: int,
             num_layers: int) -> dict:
    """Scatter new K/V rows for one layer into the paged cache.

    cache: {"data": [Hkv*L*2*num_slots, D], "scales": f32[rows]|f32[1]}
    (donated; row scatter is in-place).
    k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold num_slots —
    out of bounds only within a region, so invalid rows are redirected past
    the whole array and dropped).

    INT8 mode quantizes per row (token, head): absmax/127 scale stored in
    the parallel scales array.
    """
    data = cache["data"]
    t, hkv, d = k.shape
    heads = jnp.arange(hkv, dtype=jnp.int32)
    k_base = kv_row_base(heads, layer_i, 0, num_layers, num_slots)  # [Hkv]
    v_base = kv_row_base(heads, layer_i, 1, num_layers, num_slots)
    valid = (slot_mapping < num_slots)[:, None]  # [T, 1]
    total = data.shape[0]
    k_rows = jnp.where(valid, k_base[None, :] + slot_mapping[:, None], total)
    v_rows = jnp.where(valid, v_base[None, :] + slot_mapping[:, None], total)
    rows = jnp.concatenate([k_rows.reshape(-1), v_rows.reshape(-1)])
    upd = jnp.concatenate(
        [k.reshape(t * hkv, d), v.reshape(t * hkv, d)], axis=0)
    if data.dtype == jnp.int8:
        upd = upd.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(upd), axis=-1, keepdims=True)
        scale = jnp.maximum(absmax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(upd / scale), -127, 127).astype(jnp.int8)
        data = data.at[rows].set(q, mode="drop", unique_indices=True)
        scales = cache["scales"].at[rows].set(
            scale[:, 0], mode="drop", unique_indices=True)
        return {"data": data, "scales": scales}
    data = data.at[rows].set(upd.astype(data.dtype), mode="drop",
                             unique_indices=True)
    return {"data": data, "scales": cache["scales"]}


def gather_pages(cache: dict, layer_i, block_tables, num_gather_pages: int,
                 page_size: int, num_slots: int, num_kv_heads: int,
                 num_layers: int):
    """Dense gather of per-sequence KV from the paged cache (the XLA reference
    backend's read path; reference attention_sdpa.py:148-182 capability).
    Dequantizes int8 rows with their scales.

    Returns k, v: [S, Hkv, num_gather_pages * page_size, D] (fp32 if int8).
    """
    data = cache["data"]
    s = block_tables.shape[0]
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    slots = (tables[:, :, None] * page_size
             + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
    heads = jnp.arange(num_kv_heads, dtype=jnp.int32)
    k_base = kv_row_base(heads, layer_i, 0, num_layers, num_slots)  # [Hkv]
    v_base = kv_row_base(heads, layer_i, 1, num_layers, num_slots)
    k_rows = k_base[:, None, None] + slots[None]  # [Hkv, S, K]
    v_rows = v_base[:, None, None] + slots[None]
    # rows [Hkv, S, K] -> gather -> [Hkv, S, K, D] -> [S, Hkv, K, D]
    k = jnp.moveaxis(data[k_rows], 0, 1)
    v = jnp.moveaxis(data[v_rows], 0, 1)
    if data.dtype == jnp.int8:
        ks = jnp.moveaxis(cache["scales"][k_rows], 0, 1)[..., None]
        vs = jnp.moveaxis(cache["scales"][v_rows], 0, 1)[..., None]
        k = k.astype(jnp.float32) * ks
        v = v.astype(jnp.float32) * vs
    return k, v
