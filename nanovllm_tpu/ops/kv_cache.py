"""Paged KV-cache creation and the KV write/gather ops.

Reference equivalents: the `store_kvcache` Triton kernels
(nanovllm/layers/attention.py:19-55, attention_triton.py:9-59).

Layout: ONE 2-D array with all KV heads contiguous in the lane (minor) dim,
and each page's V rows directly after its K rows:

    data[((layer * num_pages + page) * 2 + kv) * page_size + offset, Hkv * D]

where slot = page_id * page_size + offset. INT8 mode keeps per-(token, head)
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
# HEAD-PAIR packing: packed lane p*D + j (one D-wide block per head pair p)
# holds head 2p's element j in the LOW nibble and head 2p+1's in the HIGH
# nibble. Unpacking is two shifts plus a concat of D-wide (128-lane,
# tile-aligned) slices — no lane interleaving, which Mosaic can't do
# cheaply — and a tensor-parallel shard of the packed lanes still owns
# whole heads (requires Hkv / tp even). Values are symmetric int4 in
# [-7, 7]; the per-(token, head) scale machinery is the int8 one with
# qmax=7 (scale blocks, selector folds — unchanged).

def pack_int4(q, d: int):
    """q: int8[..., Hkv*D] in [-7, 7] -> int8[..., Hkv*D//2]."""
    pairs = q.shape[-1] // (2 * d)
    blocks = []
    for p in range(pairs):
        lo = jnp.bitwise_and(q[..., (2 * p) * d:(2 * p + 1) * d], 15)
        hi = jnp.left_shift(q[..., (2 * p + 1) * d:(2 * p + 2) * d], 4)
        blocks.append(jnp.bitwise_or(hi, lo))
    return jnp.concatenate(blocks, axis=-1).astype(jnp.int8)


def unpack_int4(b, d: int, out_dtype=jnp.int8):
    """int8[..., Hkv*D//2] -> out_dtype[..., Hkv*D] (sign-extended nibbles,
    heads back in order). Nibble arithmetic runs in int32: Mosaic has no
    int8 vector shifts (arith.shli fails to legalize), and this also runs
    inside the Pallas kernels. Pass the consuming dot's dtype (bf16) to
    skip the int32->int8->bf16 conversion round-trip."""
    x = b.astype(jnp.int32)
    pairs = b.shape[-1] // d
    blocks = []
    for p in range(pairs):
        blk = x[..., p * d:(p + 1) * d]
        # lo nibble sign-extended via shift-up/arithmetic-shift-down.
        blocks.append(jnp.right_shift(jnp.left_shift(blk, 28), 28))
        blocks.append(jnp.right_shift(blk, 4))                     # hi
    return jnp.concatenate(blocks, axis=-1).astype(out_dtype)


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
    if kv_bits == 4:  # nibble-packed int4: two original lanes per int8 byte
        assert dtype == jnp.int8
        width //= 2
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

    k, v: [T, Hkv, D] -> (kq [T, Hkv*D] int8 (or nibble-packed
    [T, Hkv*D/2] when kv_bits == 4), vq likewise, scale columns
    [T, 2*Hkv] bf16: K scales at [:, :Hkv], V at [:, Hkv:]).
    The column form is the decode-kernel input (it merges one token's lane
    into a page's scale block)."""
    qmax = 7.0 if kv_bits == 4 else 127.0
    kq, ks = _absmax_quant(k, qmax)
    vq, vs = _absmax_quant(v, qmax)
    if kv_bits == 4:
        d = k.shape[-1]
        kq, vq = pack_int4(kq, d), pack_int4(vq, d)
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
    kv_bits = 4 if data.shape[1] == hkv * d // 2 else 8
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

    head_dim: pass explicitly for the nibble-packed INT4 cache (the packed
    lane width no longer determines it); rows are unpacked after the gather.
    """
    data = cache["data"]
    s = block_tables.shape[0]
    d = head_dim or data.shape[1] // num_kv_heads
    kv_bits = 4 if data.shape[1] == num_kv_heads * d // 2 else 8
    num_pages = num_slots // page_size
    tables = block_tables[:, :num_gather_pages]  # [S, Pk]
    slots = (tables[:, :, None] * page_size
             + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    slots = slots.reshape(s, num_gather_pages * page_size)  # [S, K]
    k_rows = kv_rows(layer_i, 0, slots, page_size, num_pages)
    v_rows = kv_rows(layer_i, 1, slots, page_size, num_pages)
    if data.dtype == jnp.int8:
        rpp = scale_rows_per_page(num_kv_heads)
        base = scale_block_row(layer_i, tables, num_pages, rpp)  # [S, Pk]
        brows = base[:, :, None] + jnp.arange(rpp, dtype=jnp.int32)
        blocks = cache["scales"][brows]          # [S, Pk, RPP, ps]
        # -> per-slot scale columns [S, K, RPP]
        sc = jnp.swapaxes(blocks, 2, 3).reshape(
            s, num_gather_pages * page_size, rpp)

    # [S, K, Hkv*D] -> [S, K, Hkv, D] -> [S, Hkv, K, D]
    def fetch(rows, row0):
        x = data[rows]
        if kv_bits == 4:
            x = unpack_int4(x, d)
        x = x.reshape(s, -1, num_kv_heads, d)
        if data.dtype == jnp.int8:
            x = (x.astype(jnp.float32)
                 * sc[..., row0:row0 + num_kv_heads]
                 .astype(jnp.float32)[..., None])
        return jnp.moveaxis(x, 1, 2)
    return fetch(k_rows, 0), fetch(v_rows, num_kv_heads)
