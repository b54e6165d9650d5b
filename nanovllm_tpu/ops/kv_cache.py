"""Paged KV-cache creation and the KV write/gather ops.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE 2-D array with all KV heads contiguous in the lane (minor) dim,
and each page's V rows directly after its K rows:

    data[((layer * num_pages + page) * 2 + kv) * page_size + offset, Hkv * D]

where slot = page_id * page_size + offset. (Token-plane INT4 packs 8 tokens
per int32 row at the same full lane width — see the packing notes below —
so its row index is offset // 8 within a page_size/8-row block.) INT8 mode
keeps per-(token, head)
absmax scales in a parallel bf16 array holding one TRANSPOSED block per page
(tokens along lanes, heads along sublanes):

    scales[(layer * num_pages + page) * RPP + row, offset]

with row h = head h's K scales, row Hkv + h = head h's V scales, and
RPP = ceil(2*Hkv / 16) * 16 rows per page block (16 = the bf16 sublane
tile, so every block is tile-aligned). One [RPP, page_size] block costs
4 KiB vs the 32 KiB of the earlier row-per-slot layout — scale traffic is
pure overhead on top of the int8 payload and the decode kernel is
HBM-bandwidth-bound: 1.6% instead of 12.5%. Token-major lanes also make the
read-side dequant a broadcast/tiny-dot fold instead of per-column
multiplies. The cost is the write side: a decode step updates ONE LANE of a
block, which XLA cannot scatter in place — the Pallas decode kernel merges
the lane into its streamed copy of the block in VMEM and DMAs the block
back (attention_pallas.py); the XLA fallback (reference backend, tests)
uses a scalar (row, lane) scatter. One extra dump block sits at the END of
the array as the write-back target for pad sequences.

bf16 scales keep the relative error ~0.4% vs the ~0.8% int8 quantization
error.

Why this exact data shape (each point learned on TPU hardware; see git
history for the earlier head-major and split-K/V layouts and their measured
costs):
- A page is ONE contiguous [2 * page_size, Hkv*D] run carrying K then V for
  every head: the Pallas kernels stream a page's ENTIRE KV in a single DMA
  plus one [RPP, page_size] scale-block copy when INT8 — DMA-issue rate,
  not HBM bandwidth, was the decode kernel's measured bottleneck at every
  step of this evolution.
- New KV rows are leading-dim row scatters ([T, Hkv*D]): the one scatter
  pattern XLA performs in place on a donated buffer with no operand
  relayout.
- Scatters at (layer, :, head, slot) on a >2-D cache trigger an operand
  RELAYOUT copy on TPU; per-layer slicing of a stacked cache materializes a
  full layer copy per step. Both are avoided by the flat 2-D form.
- In-kernel, per-head tiles are static lane slices [:, h*D:(h+1)*D] — no
  reshape of the minor dim (Mosaic rejects those) and no in-VMEM transposes
  of the streamed data.
- Tensor parallelism shards the lane dim head-aligned: P(None, "tp") puts
  Hkv/tp full heads (and, for scales, a full page_size-lane block window
  per shard) on each device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_DTYPE = jnp.bfloat16
_SUBLANE = 16  # bf16 sublane tile: scale blocks are padded to this


# --- INT4 nibble packing -----------------------------------------------
# TOKEN-PLANE packing: the int4 cache stores int32 lanes holding EIGHT
# TOKENS' nibbles at the same (head, dim) position — packed row j, lane c,
# nibble r (bits [4r, 4r+4), two's-complement int4 in [-7, 7]) is token
# 8j + r's element c. A page's K block is [page_size/8, Hkv*D] int32: same
# bytes as the int8 form halved, but the packed LANE width stays the full
# Hkv*D, so per-head tiles remain static lane slices and a tensor-parallel
# lane shard owns whole heads with no pairing constraint. Unpacking is two
# int32 shifts per plane STRAIGHT FROM int32 lanes — the native VMEM
# register width — where the earlier head-pair int8 form paid an
# int8->int32 widening relayout per streamed element (the same fix the
# weight kernel's nibble-plane layout applied, ops/qmm_pallas.py).
#
# Plane extraction yields 8 row-planes (plane r = tokens r, 8+r, 16+r, ...);
# the kernels concatenate them per page in PLANE-MAJOR order, so unpacked
# row u of a page holds token 8*(u % g) + u//g (g = page_size/8). Masks use
# that permuted position iota, and the per-page transposed scale blocks
# store their token LANES in the same permuted order so the score/prob
# scale folds line up with no in-kernel gathers. The per-(token, head)
# scale machinery is otherwise the int8 one with qmax=7.

TOKENS_PER_I32 = 8


def pack_tokens_int4(q):
    """q: int8[..., T, W] in [-7, 7], T % 8 == 0 -> int32[..., T//8, W]
    (token 8j + r in nibble r of packed row j)."""
    t = q.shape[-2]
    assert t % TOKENS_PER_I32 == 0, q.shape
    x = jnp.bitwise_and(q.astype(jnp.int32), 15)
    x = x.reshape(*q.shape[:-2], t // TOKENS_PER_I32, TOKENS_PER_I32,
                  q.shape[-1])
    out = jnp.zeros((*q.shape[:-2], t // TOKENS_PER_I32, q.shape[-1]),
                    jnp.int32)
    for r in range(TOKENS_PER_I32):
        out = jnp.bitwise_or(out, jnp.left_shift(x[..., r, :], 4 * r))
    return out


def int4_plane(x, r: int, out_dtype=jnp.int32):
    """Sign-extended nibble r of int32 lanes (shift-up / arithmetic
    shift-down — runs inside the Pallas kernels too). Pass the consuming
    dot's dtype (bf16) to convert once."""
    return jnp.right_shift(jnp.left_shift(x, 28 - 4 * r), 28).astype(
        out_dtype)


def unpack_tokens_int4(x, out_dtype=jnp.int32):
    """int32[..., R, W] -> out_dtype[..., R*8, W] in NATURAL token order
    (row 8j + r = nibble r of packed row j). XLA-level helper for the dense
    reference read path; the kernels keep plane-major order instead."""
    planes = jnp.stack([int4_plane(x, r, out_dtype)
                        for r in range(TOKENS_PER_I32)], axis=-2)
    return planes.reshape(*x.shape[:-2], x.shape[-2] * TOKENS_PER_I32,
                          x.shape[-1])


def plane_lane(off, page_size: int):
    """Scale-block lane holding token offset `off`'s scale in the
    plane-permuted int4 layout (elementwise on arrays and ints)."""
    g = page_size // TOKENS_PER_I32
    return (off % TOKENS_PER_I32) * g + off // TOKENS_PER_I32


def plane_lane_tokens(page_size: int):
    """token_of_lane[u] for the permuted scale-block lanes: lane u holds the
    scale of token 8*(u % g) + u//g. (Its own functional inverse is
    plane_lane.)"""
    import numpy as np
    u = np.arange(page_size)
    g = page_size // TOKENS_PER_I32
    return TOKENS_PER_I32 * (u % g) + u // g


def scale_rows_per_page(num_kv_heads: int) -> int:
    """Rows of one page's transposed scale block (K rows, V rows, padding up
    to the bf16 sublane tile so every block DMA is tile-aligned)."""
    return -(-2 * num_kv_heads // _SUBLANE) * _SUBLANE


def create_kv_cache(num_layers: int, num_kv_heads: int, num_pages: int,
                    page_size: int, head_dim: int, dtype,
                    num_shards: int = 1, kv_bits: int = 0) -> dict:
    """Returns {"data": [L*2*num_slots, Hkv*D], "scales":
    bf16[(L*num_pages + 1) * RPP, page_size * num_shards] (int8) |
    f32[1, 1] (dummy otherwise)}. The final RPP rows are the dump block for
    pad-sequence write-backs.

    num_shards > 1 gives every tensor-parallel shard its own full
    page_size-lane block window (shard s owns lanes [s*page_size,
    (s+1)*page_size)), with rows indexed by LOCAL head: a lane-sharded
    [rows, page_size] array would hand each shard a sub-tile window Mosaic
    cannot DMA. num_kv_heads is global; rows are sized for the per-shard
    head count."""
    num_slots = num_pages * page_size
    width = num_kv_heads * head_dim
    if kv_bits == 4:
        # Token-plane int4: int32 rows of 8 tokens each, full lane width
        # (same bytes as int8 halved; see the packing notes above).
        assert dtype == jnp.int8 and page_size % TOKENS_PER_I32 == 0
        data = jnp.zeros((num_layers * 2 * num_slots // TOKENS_PER_I32,
                          width), jnp.int32)
    else:
        data = jnp.zeros((num_layers * 2 * num_slots, width), dtype=dtype)
    rpp = scale_rows_per_page(num_kv_heads // num_shards)
    scales = (jnp.ones(((num_layers * num_pages + 1) * rpp,
                        page_size * num_shards), SCALE_DTYPE)
              if dtype == jnp.int8 else jnp.ones((1, 1), jnp.float32))
    return {"data": data, "scales": scales}


def kv_rows(layer_i, is_v, slots, page_size: int, num_pages: int):
    """Row indices of (layer, k|v, slot) in `data` under the
    page-interleaved layout (works elementwise on traced arrays and ints)."""
    page = slots // page_size
    off = slots % page_size
    return ((layer_i * num_pages + page) * 2 + is_v) * page_size + off


def kv_page_row(layer_i, page, page_size: int, num_pages: int):
    """First row of a page's 2*page_size-row K+V block in `data`."""
    return (layer_i * num_pages + page) * 2 * page_size


def kv_rows_packed(layer_i, is_v, slots, page_size: int, num_pages: int):
    """Packed-row index of (layer, k|v, slot) in the token-plane int4 `data`
    (the slot's nibble within the row is slot % 8)."""
    page = slots // page_size
    off = slots % page_size
    prows = page_size // TOKENS_PER_I32
    return (((layer_i * num_pages + page) * 2 + is_v) * prows
            + off // TOKENS_PER_I32)


def data_kv_bits(data) -> int:
    """0 (un-quantized), 8 (int8 rows), or 4 (token-plane int32 rows) —
    decided purely by dtype (the shape-based detection died with head-pair
    packing)."""
    if data.dtype == jnp.int32:
        return 4
    return 8 if data.dtype == jnp.int8 else 0


def scale_block_row(layer_i, page, num_pages: int, rpp: int):
    """First row of a page's [rpp, page_size] scale block in `scales`."""
    return (layer_i * num_pages + page) * rpp


def _absmax_quant(x, qmax: float = 127.0):
    """x: [T, Hkv, D] -> (q [T, Hkv*D] int8 in [-qmax, qmax],
    scale f32[T, Hkv])."""
    t, hkv, d = x.shape
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)              # [T, Hkv]
    scale = jnp.maximum(absmax / qmax, 1e-8)
    # Round the scale THROUGH its storage dtype before dividing, so q is
    # exact w.r.t. the scale the reader will see.
    scale = scale.astype(SCALE_DTYPE).astype(jnp.float32)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -qmax, qmax)
    return q.astype(jnp.int8).reshape(t, hkv * d), scale


def quantize_kv_rows(k, v, kv_bits: int = 8):
    """Per-(token, head) absmax INT8/INT4 quantization of a step's K and V.

    k, v: [T, Hkv, D] -> (kq [T, Hkv*D] int8 (in [-7, 7] UNPACKED when
    kv_bits == 4 — the decode path shifts nibbles per slot itself), vq
    likewise, scale columns [T, 2*Hkv] bf16: K scales at [:, :Hkv], V at
    [:, Hkv:]). The column form is the decode-kernel input (it merges one
    token's lane into a page's scale block)."""
    qmax = 7.0 if kv_bits == 4 else 127.0
    kq, ks = _absmax_quant(k, qmax)
    vq, vs = _absmax_quant(v, qmax)
    cols = jnp.concatenate([ks, vs], axis=1).astype(SCALE_DTYPE)
    return kq, vq, cols


def quantize_kv_blocks(k, v, page_size: int, num_kv_heads: int,
                       kv_bits: int = 8):
    """Prefill-shaped quantization: K/V rows plus TRANSPOSED per-page scale
    blocks ready for whole-block write-through.

    k, v: [T, Hkv, D] with T % page_size == 0 (the prefill layout pads each
    sequence's segment to the q-tile, and the int8 path requires
    q_tile % page_size == 0). Returns (kq, vq, blocks
    [T // page_size * RPP, page_size] bf16): block i rows [0, Hkv) = K
    scales of tokens [i*ps, (i+1)*ps), rows [Hkv, 2*Hkv) = V scales,
    padding rows hold 1.0."""
    t = k.shape[0]
    assert t % page_size == 0
    nb = t // page_size
    rpp = scale_rows_per_page(num_kv_heads)
    kq, vq, cols = quantize_kv_rows(k, v, kv_bits)      # cols [T, 2*Hkv]
    blocks = jnp.ones((nb, rpp, page_size), SCALE_DTYPE)
    per_page = cols.reshape(nb, page_size, 2 * num_kv_heads)
    blocks = blocks.at[:, : 2 * num_kv_heads, :].set(
        jnp.swapaxes(per_page, 1, 2))
    if kv_bits == 4:
        # Pack rows token-plane (page-aligned: t % ps == 0 and ps % 8 == 0)
        # and permute the scale-block lanes into the plane-major token order
        # the kernels unpack in (lane u <- token 8*(u % g) + u//g).
        kq, vq = pack_tokens_int4(kq), pack_tokens_int4(vq)
        blocks = jnp.take(blocks, jnp.asarray(plane_lane_tokens(page_size)),
                          axis=-1)
    return kq, vq, blocks.reshape(nb * rpp, page_size)


def write_kv(cache: dict, layer_i, k, v, slot_mapping, num_slots: int,
             num_layers: int, page_size: int,
             write_scales: bool = True) -> dict:
    """Scatter new K/V rows for one layer into the paged cache (the XLA
    write path, used by the reference backend and tests; the Pallas kernels
    write rows and scale blocks themselves).

    cache: see create_kv_cache (donated; leading-dim row scatter is
    in-place). k, v: [T, Hkv, D]; slot_mapping: i32[T] (pad tokens hold
    num_slots — redirected past the array and dropped). With
    write_scales=False only the int8 data rows are written (the Pallas
    decode kernel merges the scale lane in-kernel).

    INT8 scale writes here are per-(row, lane) SCALAR scatters into the
    transposed blocks — correct but slow; acceptable because only the
    dense reference backend and CPU tests take this path.
    """
    data = cache["data"]
    t, hkv, d = k.shape
    kv_bits = data_kv_bits(data)
    num_pages = num_slots // page_size
    valid = slot_mapping < num_slots
    total = data.shape[0]
    slots = jnp.minimum(slot_mapping, num_slots - 1)
    if kv_bits == 4:
        # Token-plane rows: each token owns nibble slot%8 of packed row
        # slot//8. Nibbles are independent base-16 digits of the int32, so a
        # read-modify scatter-ADD of (new_bits - old_bits) << 4r replaces
        # exactly that digit with no carry into neighbours — and duplicate
        # row indices (tokens sharing a packed row) sum independent digits,
        # which a plain .at[].set could not do.
        kq, vq, cols = quantize_kv_rows(k, v, 4)
        k_rows = jnp.where(valid, kv_rows_packed(layer_i, 0, slots,
                                                 page_size, num_pages), total)
        v_rows = jnp.where(valid, kv_rows_packed(layer_i, 1, slots,
                                                 page_size, num_pages), total)
        rows = jnp.concatenate([k_rows, v_rows])
        shift = (4 * (slots % TOKENS_PER_I32))[:, None]
        shift2 = jnp.concatenate([shift, shift])
        new_bits = jnp.bitwise_and(
            jnp.concatenate([kq, vq]).astype(jnp.int32), 15)
        cur = data[jnp.minimum(rows, total - 1)]
        old_bits = jnp.bitwise_and(jnp.right_shift(cur, shift2), 15)
        delta = jnp.left_shift(new_bits - old_bits, shift2)
        data = data.at[rows].add(delta, mode="drop")
        if not write_scales:
            return {"data": data, "scales": cache["scales"]}
        scales = cache["scales"]
        rpp = scale_rows_per_page(hkv)
        base = scale_block_row(layer_i, slots // page_size, num_pages, rpp)
        srows = base[:, None] + jnp.arange(2 * hkv, dtype=jnp.int32)[None, :]
        srows = jnp.where(valid[:, None], srows, scales.shape[0])
        # Plane-permuted scale lanes (see the packing notes).
        lanes = jnp.broadcast_to(
            plane_lane(slots % page_size, page_size)[:, None], srows.shape)
        scales = scales.at[srows, lanes].set(
            cols.astype(SCALE_DTYPE), mode="drop", unique_indices=True)
        return {"data": data, "scales": scales}
    k_rows = jnp.where(valid, kv_rows(layer_i, 0, slots, page_size,
                                      num_pages), total)  # [T]
    v_rows = jnp.where(valid, kv_rows(layer_i, 1, slots, page_size,
                                      num_pages), total)
    rows = jnp.concatenate([k_rows, v_rows])
    if data.dtype == jnp.int8:
        kq, vq, cols = quantize_kv_rows(k, v, kv_bits)
        data = data.at[rows].set(jnp.concatenate([kq, vq]), mode="drop",
                                 unique_indices=True)
        cols = cols.astype(SCALE_DTYPE)
        if not write_scales:
            return {"data": data, "scales": cache["scales"]}
        scales = cache["scales"]
        rpp = scale_rows_per_page(hkv)
        base = scale_block_row(layer_i, slots // page_size, num_pages, rpp)
        # (row, lane) scalar scatter: rows [T, 2*Hkv], lanes broadcast.
        srows = base[:, None] + jnp.arange(2 * hkv, dtype=jnp.int32)[None, :]
        srows = jnp.where(valid[:, None], srows, scales.shape[0])
        lanes = jnp.broadcast_to((slots % page_size)[:, None], srows.shape)
        scales = scales.at[srows, lanes].set(cols, mode="drop",
                                             unique_indices=True)
        return {"data": data, "scales": scales}
    upd = jnp.concatenate(
        [k.reshape(t, hkv * d), v.reshape(t, hkv * d)]).astype(data.dtype)
    data = data.at[rows].set(upd, mode="drop", unique_indices=True)
    return {"data": data, "scales": cache["scales"]}


def gather_pages(cache: dict, layer_i, block_tables, num_gather_pages: int,
                 page_size: int, num_slots: int, num_kv_heads: int,
                 num_layers: int, head_dim: int = 0):
    """Dense gather of per-sequence KV from the paged cache (the XLA reference
    backend's read path; reference attention_sdpa.py:148-182 capability).
    Dequantizes int8 rows with their scales.

    Returns k, v: [S, Hkv, num_gather_pages * page_size, D] (fp32 if int8).

    head_dim: pass explicitly when the lane width alone can't determine it;
    token-plane INT4 rows are unpacked (and their permuted scale lanes
    un-permuted) after the gather.
    """
    data = cache["data"]
    s = block_tables.shape[0]
    d = head_dim or data.shape[1] // num_kv_heads
    kv_bits = data_kv_bits(data)
    quantized = kv_bits in (4, 8)
    num_pages = num_slots // page_size
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    if kv_bits == 4:
        # Token-plane rows: gather each page's packed rows, then unpack to
        # natural token order.
        prows = page_size // TOKENS_PER_I32
        rowi = jnp.arange(prows, dtype=jnp.int32)[None, None, :]
        k_rows = (kv_rows_packed(layer_i, 0, tables * page_size, page_size,
                                 num_pages)[:, :, None] + rowi)
        v_rows = (kv_rows_packed(layer_i, 1, tables * page_size, page_size,
                                 num_pages)[:, :, None] + rowi)
        k_rows = k_rows.reshape(s, num_gather_pages * prows)
        v_rows = v_rows.reshape(s, num_gather_pages * prows)
    else:
        slots = (tables[:, :, None] * page_size
                 + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
        slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
        k_rows = kv_rows(layer_i, 0, slots, page_size, num_pages)
        v_rows = kv_rows(layer_i, 1, slots, page_size, num_pages)
    if quantized:
        rpp = scale_rows_per_page(num_kv_heads)
        base = scale_block_row(layer_i, tables, num_pages, rpp)  # [S, Pk]
        brows = base[:, :, None] + jnp.arange(rpp, dtype=jnp.int32)
        blocks = cache["scales"][brows]          # [S, Pk, RPP, ps]
        if kv_bits == 4:
            # Undo the plane-major lane permutation (lane u <- token order).
            inv = jnp.asarray(plane_lane(jnp.arange(page_size), page_size))
            blocks = jnp.take(blocks, inv, axis=-1)
        # -> per-slot scale columns [S, K, RPP]
        sc = jnp.swapaxes(blocks, 2, 3).reshape(
            s, num_gather_pages * page_size, rpp)

    # [S, K, Hkv*D] -> [S, K, Hkv, D] -> [S, Hkv, K, D]
    def fetch(rows, row0):
        x = data[rows]
        if kv_bits == 4:
            # [S, Pk*prows, W] packed -> per-page natural token order.
            x = x.reshape(s, num_gather_pages, prows, x.shape[-1])
            x = unpack_tokens_int4(x).reshape(
                s, num_gather_pages * page_size, x.shape[-1])
        x = x.reshape(s, -1, num_kv_heads, d)
        if quantized:
            x = (x.astype(jnp.float32)
                 * sc[..., row0:row0 + num_kv_heads]
                 .astype(jnp.float32)[..., None])
        return jnp.moveaxis(x, 1, 2)
    return fetch(k_rows, 0), fetch(v_rows, num_kv_heads)
