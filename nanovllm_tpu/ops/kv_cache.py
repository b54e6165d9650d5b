"""Paged KV-cache creation and the KV write/gather ops.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE 2-D array with all KV heads contiguous in the lane (minor) dim,
and each page's V rows directly after its K rows:

    data[((layer * num_pages + page) * 2 + kv) * page_size + offset, Hkv * D]

where slot = page_id * page_size + offset. INT8 mode keeps per-(token, head)
absmax scales in a parallel bf16 array with ONE row per slot (not per K/V
row) and SCALE_LANES lanes:

    scales[(layer * num_pages + page) * page_size + offset, SCALE_LANES]

with the K scale of head h at lane h and the V scale at lane Hkv + h (lanes
>= 2*Hkv unused). Sharing one row between K and V halves the scale-stream
bytes (the decode kernel is HBM-bandwidth-bound; scale rows are pure
overhead on top of the int8 payload: 12.5%, vs 25% for the earlier
row-per-K/V layout). The full-tile lane width is load-bearing: Mosaic only
DMAs lane windows that cover whole 128-lane tiles, so a dense [rows, 2*Hkv]
array cannot be streamed page-wise, while a denser packing (tokens x heads
per row) cannot be dotted against token-major score columns without a
forbidden minor-dim reshape. bf16 keeps the scale relative error ~0.4% vs
the ~0.8% int8 quantization error.

Why this exact shape (each point learned on TPU hardware; see git history
for the earlier head-major and split-K/V layouts and their measured costs):
- A page is ONE contiguous [2 * page_size, Hkv*D] run carrying K then V for
  every head: the Pallas kernels stream a page's ENTIRE KV in a single DMA
  plus one [page_size, SCALE_LANES] scale copy when INT8 — DMA-issue rate,
  not HBM bandwidth, was the decode kernel's measured bottleneck at every
  step of this evolution.
- New KV rows are leading-dim row scatters ([T, Hkv*D] and [T, SCALE_LANES]):
  the one scatter pattern XLA performs in place on a donated buffer with no
  operand relayout. The old 1-D scales array made XLA spend 94 us/layer
  scattering 1024 scalars; 2-D rows fix it.
- Scatters at (layer, :, head, slot) on a >2-D cache trigger an operand
  RELAYOUT copy on TPU; per-layer slicing of a stacked cache materializes a
  full layer copy per step. Both are avoided by the flat 2-D form.
- In-kernel, per-head tiles are static lane slices [:, h*D:(h+1)*D] — no
  reshape of the minor dim (Mosaic rejects those) and no in-VMEM transposes
  of the streamed data.
- Tensor parallelism shards the lane dim head-aligned: P(None, "tp") puts
  Hkv/tp full heads (and their scale lanes) on each device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_LANES = 128  # one full TPU lane tile per scale row
SCALE_DTYPE = jnp.bfloat16


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype,
                    num_shards: int = 1) -> dict:
    """Returns {"data": [L*2*num_slots, Hkv*D], "scales": bf16[L*num_slots,
    SCALE_LANES * num_shards] (int8) | f32[1, 1] (dummy otherwise)}.

    num_shards > 1 gives every tensor-parallel shard its own full 128-lane
    scale window (shard s owns lanes [s*128, (s+1)*128), local head h's K
    scale at local lane h, V at local lane Hkv_local + h) — a lane-sharded
    [rows, 128] array would hand each shard a sub-tile window Mosaic cannot
    DMA."""
    num_slots = num_pages * page_size
    data = jnp.zeros((num_layers * 2 * num_slots, num_kv_heads * head_dim),
                     dtype=dtype)
    scales = (jnp.ones((num_layers * num_slots, SCALE_LANES * num_shards),
                       SCALE_DTYPE)
              if dtype == jnp.int8 else jnp.ones((1, 1), jnp.float32))
    return {"data": data, "scales": scales}


def kv_rows(layer_i, is_v, slots, page_size: int, num_pages: int):
    """Row indices of (layer, k|v, slot) in `data` under the
    page-interleaved layout (works elementwise on traced arrays and ints)."""
    page = slots // page_size
    off = slots % page_size
    return ((layer_i * num_pages + page) * 2 + is_v) * page_size + off


def scale_rows(layer_i, slots, page_size: int, num_pages: int):
    """Row indices of (layer, slot) in `scales` (one shared K+V row)."""
    page = slots // page_size
    off = slots % page_size
    return (layer_i * num_pages + page) * page_size + off


def kv_page_row(layer_i, page, page_size: int, num_pages: int):
    """First row of a page's 2*page_size-row K+V block in `data`."""
    return (layer_i * num_pages + page) * 2 * page_size


def scale_page_row(layer_i, page, page_size: int, num_pages: int):
    """First row of a page's page_size-row scale block in `scales`."""
    return (layer_i * num_pages + page) * page_size


def _absmax_quant(x):
    """x: [T, Hkv, D] -> (q [T, Hkv*D] int8, scale f32[T, Hkv])."""
    t, hkv, d = x.shape
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)              # [T, Hkv]
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    # Round the scale THROUGH its storage dtype before dividing, so q is
    # exact w.r.t. the scale the reader will see.
    scale = scale.astype(SCALE_DTYPE).astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return q.reshape(t, hkv * d), scale


def quantize_kv_rows(k, v):
    """Per-(token, head) absmax INT8 quantization of a step's K and V.

    k, v: [T, Hkv, D] -> (kq [T, Hkv*D] int8, vq [T, Hkv*D] int8,
    scale_rows [T, SCALE_LANES] bf16 with K scales at lanes [0, Hkv) and V
    scales at lanes [Hkv, 2*Hkv), 1.0 in unused lanes)."""
    t, hkv, d = k.shape
    kq, ks = _absmax_quant(k)
    vq, vs = _absmax_quant(v)
    rows = jnp.ones((t, SCALE_LANES), SCALE_DTYPE)
    rows = rows.at[:, :hkv].set(ks.astype(SCALE_DTYPE))
    rows = rows.at[:, hkv:2 * hkv].set(vs.astype(SCALE_DTYPE))
    return kq, vq, rows


def write_kv(cache: dict, layer_i, k, v, slot_mapping, num_slots: int,
             num_layers: int, page_size: int) -> dict:
    """Scatter new K/V rows for one layer into the paged cache (the XLA
    write path, used by prefill and the reference backend; the Pallas
    kernels can also write the rows themselves via in-kernel DMA).

    cache: see create_kv_cache (donated; leading-dim row scatter is
    in-place). k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold
    num_slots — redirected past the array and dropped).
    """
    data = cache["data"]
    t, hkv, d = k.shape
    num_pages = num_slots // page_size
    valid = slot_mapping < num_slots
    total = data.shape[0]
    slots = jnp.minimum(slot_mapping, num_slots - 1)
    k_rows = jnp.where(valid, kv_rows(layer_i, 0, slots, page_size,
                                      num_pages), total)  # [T]
    v_rows = jnp.where(valid, kv_rows(layer_i, 1, slots, page_size,
                                      num_pages), total)
    rows = jnp.concatenate([k_rows, v_rows])
    if data.dtype == jnp.int8:
        kq, vq, sc = quantize_kv_rows(k, v)
        data = data.at[rows].set(jnp.concatenate([kq, vq]), mode="drop",
                                 unique_indices=True)
        s_rows = jnp.where(valid, scale_rows(layer_i, slots, page_size,
                                             num_pages),
                           cache["scales"].shape[0])
        scales = cache["scales"].at[s_rows].set(sc, mode="drop",
                                                unique_indices=True)
        return {"data": data, "scales": scales}
    upd = jnp.concatenate(
        [k.reshape(t, hkv * d), v.reshape(t, hkv * d)]).astype(data.dtype)
    data = data.at[rows].set(upd, mode="drop", unique_indices=True)
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
    d = data.shape[1] // num_kv_heads
    num_pages = num_slots // page_size
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    slots = (tables[:, :, None] * page_size
             + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
    k_rows = kv_rows(layer_i, 0, slots, page_size, num_pages)
    v_rows = kv_rows(layer_i, 1, slots, page_size, num_pages)
    if data.dtype == jnp.int8:
        sc = cache["scales"][scale_rows(layer_i, slots, page_size,
                                        num_pages)]  # [S, K, SCALE_LANES]

    # [S, K, Hkv*D] -> [S, K, Hkv, D] -> [S, Hkv, K, D]
    def fetch(rows, lane0):
        x = data[rows].reshape(s, -1, num_kv_heads, d)
        if data.dtype == jnp.int8:
            x = (x.astype(jnp.float32)
                 * sc[..., lane0:lane0 + num_kv_heads]
                 .astype(jnp.float32)[..., None])
        return jnp.moveaxis(x, 1, 2)
    return fetch(k_rows, 0), fetch(v_rows, num_kv_heads)
