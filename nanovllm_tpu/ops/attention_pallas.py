"""Pallas paged-attention backend.

TPU-native re-design of the reference's from-scratch Triton backend
(nanovllm/layers/attention_triton.py): both kernels stream block-table-
indexed KV pages HBM→VMEM with double-buffered async DMA and an online
softmax (the capability of attention_triton.py:101-343, but page-wise DMA
streaming instead of scalar per-token loads).

The cache is the 2-D row layout of ops/kv_cache.py: one page is ONE
contiguous [2*page_size, Hkv*D] block carrying every KV head's K rows then V
rows. Both kernels stream pages in multi-page CHUNKS (default 512 tokens)
into a K/V-SPLIT VMEM buffer — page i's K half at rows [i*ps, (i+1)*ps), V
half at [chunk + i*ps, ...) — so a chunk's scores are computed by ONE MXU
dot per contraction instead of per-page dot/concat chains (per-chunk fixed
cost, not HBM bandwidth, was the measured limit at every step of this
design's evolution; see git history for the scalar-loop, head-major,
interleaved-chunk and 1-ahead-prefetch predecessors and their measured
costs). Page copies past a range's last needed page are predicated off.
Decode pipelines the chunk stream ACROSS sequences with an SMEM issue
cursor running NBUF-1 = 3 chunks ahead of compute, hiding per-DMA latency
that a 1-ahead prefetch exposed. Per-head tiles are static lane slices (no
minor-dim reshapes, no in-VMEM transposes of the stream). Decode computes
all heads per chunk in a single MXU dot via a block-diagonal Q
([Hq, Hkv*D], row i nonzero only in head i//g's lane block); prefill q
blocks are large, so per-head dots stay (already MXU-sized, no 8x wasted
FLOPs).

INT8 scales live in TRANSPOSED per-page blocks (tokens along lanes, K rows
then V rows — ops/kv_cache.py): reads fold them into scores/probs with tiny
[Hq, RPP] selector dots (decode) or [1, chunk] broadcast rows (prefill);
writes are whole-block DMAs. A decode step updates ONE LANE of its page's
block, which XLA cannot scatter in place — the decode kernel merges the
lane into its streamed VMEM copy of the block (jnp.where on the lane iota)
and DMAs the merged block back, with the write-back waited lazily via an
SMEM counter chain so its latency hides behind the next sequence's compute.

Decode-step KV data writes also happen IN-KERNEL: the new token's rows
arrive as VMEM input blocks, get merged into the streamed chunk copy when
its chunk lands (so this step's attention sees them), and the containing
sublane-tile-aligned [win, Hkv*D] windows are DMA'd back — Mosaic rejects
unaligned 1-row HBM slices, and the XLA row-scatter alternative lowers to
a sequential per-row loop (~0.5 ms/step at 28 layers x 192 rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.kv_cache import (SCALE_DTYPE, TOKENS_PER_I32,
                                        data_kv_bits, int4_plane, plane_lane,
                                        quantize_kv_blocks, quantize_kv_rows,
                                        scale_rows_per_page)

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _unpack_pages(x, npages: int, prows: int, dtype):
    """Token-plane INT4 unpack of `npages` page blocks, PER-PAGE PLANE-MAJOR:
    x int32 [npages*prows, W] -> dtype [npages*8*prows, W] where page i's
    unpacked row u = r*prows + j (r = u // prows) holds token 8j + r — the
    same permuted in-page order the scale blocks store their lanes in
    (kv_cache.plane_lane), so score lanes and scale lanes line up with no
    gathers. Two int32 shifts per plane straight from int32 lanes (no
    int8->int32 widening relayout — the point of the token-plane layout)."""
    pieces = []
    for i in range(npages):
        blk = x[i * prows:(i + 1) * prows]
        for r in range(TOKENS_PER_I32):
            pieces.append(int4_plane(blk, r, dtype))
    return jnp.concatenate(pieces, axis=0)


def _plane_pos(w, prows: int, page_size: int):
    """Token offset of permuted row/lane index `w` (works on iotas): row w
    of a page-major, per-page plane-major unpacked chunk holds token
    (w - w%ps) + 8*((w%ps) % prows) + (w%ps) // prows."""
    inpage = lax.rem(w, page_size)
    return (w - inpage + TOKENS_PER_I32 * lax.rem(inpage, prows)
            + lax.div(inpage, prows))


def _mk_split_chunk_copies(data_ref, scales_ref, bt_ref, ppc, page_size,
                           rpp, li, num_pages, pps, kv_buf, s_buf, sems,
                           quantized, prows):
    """Per-chunk page-copy descriptors with a K/V-SPLIT VMEM destination:
    page i's K rows land at kv_buf[slot, i*prows:(i+1)*prows] and its V rows
    at kv_buf[slot, chunk_rows + i*prows : ...], so a chunk's scores need
    ONE MXU dot per contraction (and probs x V one more) instead of per-page
    dot/concat chains — the kernels' measured limit is per-chunk fixed cost,
    not HBM bandwidth. `prows` = data rows per page (page_size, or
    page_size/8 packed int32 rows for token-plane INT4). Scale blocks land
    LANE-MAJOR for the INT4 kernels: page i's [RPP, ps] block at
    s_buf[slot, :, i*ps:(i+1)*ps] (a 128-lane-aligned window), so the whole
    chunk's scale fold is ONE [2Hq, RPP] selector dot against [RPP, chunk]
    instead of a dot per page — the per-page tiny dots were a measured
    per-chunk fixed cost (int4 decode 277.7 -> 263.6 us same-session at
    bs=64/ctx=1536). The INT8 kernels keep the ROW-MAJOR [ppc*RPP, ps]
    buffer: the lane-windowed DMA dest (VMEM tile-strided rows) REGRESSED
    the DMA-bound int8 decode 228.8 -> 290.9 us in the same A/B, costing
    more than the dot/concat savings. Each copy carries a PREDICATE (page
    start < `limit` tokens): the caller starts/waits it under pl.when, so a
    range's last chunk skips pages past ceil(limit/ps) entirely (no
    masked-read DMA waste). Predicates are pure functions of
    (si, chunk_idx, i, limit), so starts and waits always match."""
    chunk_rows = ppc * prows
    lane_major = prows != page_size  # int4's packed rows mark the kernel

    def chunk_copies(si, chunk_idx, slot, limit):
        copies = []
        for i in range(ppc):
            pg_idx = chunk_idx * ppc + i
            pred = pg_idx * page_size < limit
            page = bt_ref[si, jnp.minimum(pg_idx, pps - 1)]
            src = (li * num_pages + page) * 2 * prows
            copies.append((pred, pltpu.make_async_copy(
                data_ref.at[pl.ds(src, prows)],
                kv_buf.at[slot, pl.ds(i * prows, prows)], sems.at[slot])))
            copies.append((pred, pltpu.make_async_copy(
                data_ref.at[pl.ds(src + prows, prows)],
                kv_buf.at[slot, pl.ds(chunk_rows + i * prows, prows)],
                sems.at[slot])))
            if quantized:
                sdst = (s_buf.at[slot, :, pl.ds(i * page_size, page_size)]
                        if lane_major
                        else s_buf.at[slot, pl.ds(i * rpp, rpp)])
                copies.append((pred, pltpu.make_async_copy(
                    scales_ref.at[pl.ds((li * num_pages + page) * rpp, rpp)],
                    sdst, sems.at[slot])))
        return copies

    return chunk_copies


def _decode_chunk_update(carry, q_bd, sel_k, sel_v, kv_slot, s_slot, mask,
                         scale, ppc, ps, rpp, d, quantized, int4,
                         dot_dtype):
    """One online-softmax update over a KV chunk for decode, all heads in one
    MXU dot per page. q_bd: [Hq, Hkv*D] block-diagonal (row i nonzero only in
    its kv-head's lane block) so a single contraction over Hkv*D computes
    every head's scores at once — PREBUILT outside the kernel by the wrapper
    (the in-kernel iota/where construction was ~5 us of per-sequence
    prologue, the measured fixed cost of the whole kernel).
    INT8 per-token scales are never multiplied into the K/V streams: they
    fold into scores (K) and probs (V) through sel_k/sel_v ([Hq, RPP], row i
    nonzero only at block-row i // g resp. Hkv + i // g), tiny MXU dots
    against the transposed [RPP, ps] scale blocks whose contraction has
    exactly one nonzero term — exact. On the int8-dots path sel_k's nonzeros
    carry the per-row Q quantization scale x the softmax scale (the path is
    already lossy); on the bf16 path both selectors are exact 1.0 indicators
    and the f32 softmax scale multiplies s directly.
    carry: (m [Hq,1], l [Hq,1], acc [Hq, Hkv*D] full-width; per-head lanes
    extracted once at the end). Dots run in `dot_dtype` (bf16 on the
    production path — int8→bf16 casts are exact, f32 accumulation; f32 only
    when both q and the cache are f32).

    The chunk buffer is K/V-SPLIT (_mk_split_chunk_copies): K rows of the
    whole chunk are contiguous at kv_slot[:chunk], V at kv_slot[chunk:], so
    scores and probs·V are ONE MXU dot each over the full chunk — the
    per-page dot/concat chains were the kernel's measured per-chunk fixed
    cost. Only a tiny [2*Hq, RPP] scale-selector dot stays per-page (its
    output lanes are per-page token windows); it produces the score-scale
    and prob-scale rows together."""
    m, l, acc = carry
    chunk = ppc * ps
    int8_dots = q_bd.dtype == jnp.int8
    if int4:
        # Concat-form INT4 fallback (planes_dots=False): materialize the
        # unpacked chunk in page-major plane order, then the one-dot path
        # below; the caller's mask uses the matching permuted positions.
        prows = ps // TOKENS_PER_I32
        chunk_rows = ppc * prows
        kv_dt = jnp.int8 if int8_dots else dot_dtype
        k_chunk = _unpack_pages(kv_slot[:chunk_rows], ppc, prows, kv_dt)
        v_chunk = _unpack_pages(kv_slot[chunk_rows:2 * chunk_rows], ppc,
                                prows, kv_dt)
    else:
        k_chunk = kv_slot[:chunk]
        v_chunk = kv_slot[chunk:2 * chunk]
    if quantized:
        sel_kv = jnp.concatenate([sel_k, sel_v], axis=0)
        hq = sel_k.shape[0]
        if int4:
            # ONE [2*Hq, RPP] selector dot against the lane-major
            # [RPP, chunk] scale buffer yields BOTH scale rows (score rows
            # on top, prob rows below) for the whole chunk. Output lanes =
            # buffer lanes = (page, plane-permuted in-page token), matching
            # _unpack_pages' chunk lanes — no re-slicing.
            skv = lax.dot_general(
                sel_kv, s_slot, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [2*Hq, chunk]
        else:
            # INT8 keeps the row-major buffer (see _mk_split_chunk_copies):
            # one [2*Hq, RPP] selector dot per page, concatenated.
            skv_parts = [lax.dot_general(
                sel_kv, s_slot[i * rpp:(i + 1) * rpp],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) for i in range(ppc)]
            skv = (skv_parts[0] if ppc == 1
                   else jnp.concatenate(skv_parts, axis=1))  # [2*Hq, chunk]
    if int8_dots:
        # q_bd is per-row absmax-quantized int8 (sel_k carries its scale ×
        # the softmax scale): the dots run on the MXU's int8 path (2× the
        # bf16 rate on v5e) and the int32 result is rescaled exactly.
        s = lax.dot_general(
            q_bd, k_chunk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
    else:
        s = lax.dot_general(
            q_bd, k_chunk.astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
    if quantized:
        s = s * skv[:hq]
    s = jnp.where(mask, s, MASK_VALUE)
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m, m_curr)
    alpha = jnp.exp(m - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    if quantized:
        p = p * skv[hq:]
    if int8_dots:
        # p ∈ [0, max]: per-row absmax int8 quantization of the probs (the
        # V-side scales are already folded into p above).
        pmax = jnp.max(p, axis=-1, keepdims=True)
        psc = jnp.maximum(pmax, 1e-20) / 127.0
        pd = jnp.round(p / psc).astype(jnp.int8)
        o = lax.dot_general(
            pd, v_chunk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32) * psc
    else:
        o = lax.dot_general(
            p.astype(dot_dtype), v_chunk.astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (m_next, l_next, acc * alpha + o)


def _decode_chunk_planes(carry, q_bd, sel_k, sel_v, k_packed, v_packed,
                         s_slot, rem, scale, ppc, ps, rpp, d, dot_dtype):
    """Token-plane INT4 variant of _decode_chunk_update over one GROUP of
    `ppc` pages (the caller splits a streamed chunk into <=8-page groups
    and lax.cond-skips groups wholly above the live context): every dot
    consumes an extracted plane DIRECTLY, so the unpacked [chunk, Hkv*D]
    bf16 array is never materialized (the concat-then-one-dot form spent
    more VPU time copying than the halved HBM traffic saved — measured 444
    us vs int8's 265 us at bs=64/ctx=1536; dropping the concat keeps only
    the 2-shift plane extract + convert, and MXU pass count is unchanged:
    8 plane dots of [.., chunk/8] ≡ 1 dot of [.., chunk]).

    k_packed/v_packed: [ppc*prows, W] int32 group rows; s_slot:
    [RPP, ppc*ps] lane-major group scale window.

    Scores build in GROUP-PLANE-MAJOR order (piece r = tokens ≡ r mod 8
    across the group, lanes [r*rows/8, ...)); the selector dot's output
    lanes are (page, plane-permuted in-page token), re-sliced per piece
    ([2Hq, prows] sub-lane slices — tiny, [32, 16] each). rem = ctx -
    group_base: piece r's mask is just 8*j + r < rem, a [1, rows] iota
    compare. `quantized` is implied (int4 always carries scale blocks).

    int8 MXU dots (q_bd int8): the planes extract to int8 (nibbles [-7,7]
    fit exactly) and every dot runs on the MXU's 2x-rate int8 path — the
    lever that matters HERE and not for the int8 cache: int4's halved HBM
    stream leaves the block-diagonal GQA dots (16 of 128 MXU rows useful)
    as the kernel floor. sel_k carries qs*scale as in _decode_chunk_update;
    probs are absmax-int8 per row per plane piece (each plane dot rescales
    its own int32 partial exactly, so per-piece scales compose additively)."""
    m, l, acc = carry
    prows = ps // TOKENS_PER_I32
    chunk_rows = ppc * prows
    hq = sel_k.shape[0]
    int8_dots = q_bd.dtype == jnp.int8
    plane_dt = jnp.int8 if int8_dots else dot_dtype
    sel_kv = jnp.concatenate([sel_k, sel_v], axis=0)
    # ONE selector dot for the group (lane-major scale buffer); its lanes
    # are (page, plane-permuted in-page token) — per-piece re-slicing below
    # picks plane r's 16-lane window out of each page.
    skv = lax.dot_general(
        sel_kv, s_slot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [2Hq, group]
    jiota = lax.broadcasted_iota(jnp.int32, (1, chunk_rows), 1)
    s_pieces, vs_pieces = [], []
    for r in range(TOKENS_PER_I32):
        kp = int4_plane(k_packed, r, plane_dt)           # [chunk/8, W]
        if int8_dots:
            sr = lax.dot_general(
                q_bd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            sr = lax.dot_general(
                q_bd, kp, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # [Hq, chunk/8]
        skv_r = (skv[:, r * prows:(r + 1) * prows] if ppc == 1
                 else jnp.concatenate(
                     [skv[:, p * ps + r * prows:p * ps + (r + 1) * prows]
                      for p in range(ppc)], axis=1))     # [2Hq, chunk/8]
        sr = sr * skv_r[:hq]
        sr = jnp.where(TOKENS_PER_I32 * jiota + r < rem, sr, MASK_VALUE)
        s_pieces.append(sr)
        vs_pieces.append(skv_r[hq:])
    s = jnp.concatenate(s_pieces, axis=1)                # [Hq, chunk]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m, m_curr)
    alpha = jnp.exp(m - m_next)
    p = jnp.exp(s - m_next)
    l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.zeros_like(acc)
    for r in range(TOKENS_PER_I32):
        vp = int4_plane(v_packed, r, plane_dt)
        pr = p[:, r * chunk_rows:(r + 1) * chunk_rows] * vs_pieces[r]
        if int8_dots:
            pmax = jnp.max(pr, axis=-1, keepdims=True)
            psc = jnp.maximum(pmax, 1e-20) / 127.0
            pd = jnp.round(pr / psc).astype(jnp.int8)
            o = o + lax.dot_general(
                pd, vp, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * psc
        else:
            o = o + lax.dot_general(
                pr.astype(dot_dtype), vp,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return (m_next, l_next, acc * alpha + o)


def _flash_heads_chunk(carry, q_heads, kv_slot, s_slot, mask, ppc, ps, rpp,
                       hkv, d, quantized, int4, dot_dtype):
    """One online-softmax update over a KV chunk, per-head statically
    unrolled (prefill: q blocks are large, so per-head dots are already
    MXU-sized). carry: tuple over heads of (m, l, acc); q_heads: per-head
    [rows, d] in dot_dtype with the softmax scale PRE-FOLDED (one multiply
    on [rows, d] per tile instead of one on every [rows, chunk] score
    block); kv_slot/s_slot: K/V-SPLIT chunk buffers
    (_mk_split_chunk_copies): the chunk's K rows contiguous at
    kv_slot[:chunk], V at kv_slot[chunk:], so each head's scores and
    probs·V are ONE dot over the full chunk (the per-page dot/concat chains
    were the measured per-chunk fixed cost); mask: [rows, chunk] bool, or
    None for chunks that are provably fully valid (every streamed page
    strictly below the tile's pos0 — the mask where/iota were ~2 of the ~6
    VPU ops per score element). INT8 scales fold into scores/probs as
    [1, chunk] broadcast rows sliced from the transposed scale blocks
    (token-major lanes) — cheaper than dequantizing the K/V tiles."""
    chunk = ppc * ps
    if int4:
        prows = ps // TOKENS_PER_I32
        chunk_rows = ppc * prows
        k_chunk = _unpack_pages(kv_slot[:chunk_rows], ppc, prows, dot_dtype)
        v_chunk = _unpack_pages(kv_slot[chunk_rows:2 * chunk_rows], ppc,
                                prows, dot_dtype)
    else:
        k_chunk = kv_slot[:chunk]
        v_chunk = kv_slot[chunk:2 * chunk]
    out = []
    for h in range(hkv):
        m, l, acc = carry[h]
        hs = slice(h * d, (h + 1) * d)
        s = lax.dot_general(
            q_heads[h], k_chunk[:, hs].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [rows, chunk]
        if quantized:
            # int4: lane-major scale buffer — head h's K scales for the
            # whole chunk are ONE row slice (the per-page concat chain was
            # fixed cost). int8: row-major buffer, per-page row concat.
            krow = (s_slot[h:h + 1, :] if int4 else jnp.concatenate(
                [s_slot[i * rpp + h:i * rpp + h + 1, :] for i in range(ppc)],
                axis=1)).astype(jnp.float32)                 # [1, chunk]
            s = s * krow
        if mask is not None:
            s = jnp.where(mask, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            vrow = (s_slot[hkv + h:hkv + h + 1, :] if int4
                    else jnp.concatenate(
                        [s_slot[i * rpp + hkv + h:i * rpp + hkv + h + 1, :]
                         for i in range(ppc)], axis=1)).astype(jnp.float32)
            p = p * vrow
        o_curr = lax.dot_general(
            p.astype(dot_dtype), v_chunk[:, hs].astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out.append((m_next, l_next, acc * alpha + o_curr))
    return tuple(out)


def _decode_kernel(
    # scalar prefetch
    layer_ref,      # i32[1]
    ctx_ref,        # i32[S]
    bt_ref,         # i32[S, pages_per_seq]
    slot_ref,       # i32[S]  (num_slots for pad/no-write seqs)
    nibsh_ref,      # i32[S]: 4*(slot % 8) nibble shift (token-plane INT4
    #                 merge; zeros otherwise)
    # inputs
    q_ref,          # [1, Hq, Hkv*D] VMEM block: PREBUILT block-diagonal q
    #                 (row i nonzero only in head i//g's lane block), bf16 or
    #                 int8 (int8_dots)
    kr_ref,         # [1, 1, Hkv*D] VMEM block: the seq's new K row (cache
    #                 dtype) — merged into the streamed chunk and written
    #                 back through an aligned sublane window. Token-plane
    #                 INT4: int32 nibble values PRE-SHIFTED to 4*(slot%8).
    vr_ref,         # [1, 1, Hkv*D] VMEM block
    scol_ref,       # [1, RPP, ps] VMEM block: the seq's new-token scale
    #                 column broadcast across lanes (row r = scale for
    #                 block-row r, rows >= 2*Hkv hold 1.0); the kernel
    #                 merges lane slot%ps of it into the page's streamed
    #                 scale block. Dummy [1, 1, 1] in ANY when not quantized.
    data_in_ref,    # HBM (aliased with data_out)
    scales_in_ref,  # HBM (aliased with scales_out)
    selk_ref,       # [1|S, Hq, RPP] bf16 selector: 1.0 at block-row i//g of
    #                 row i (per-row q-quant scale x softmax scale there
    #                 when int8_dots); dummy [1, 1, 1] in ANY when not
    #                 quantized
    selv_ref,       # [1, Hq, RPP] bf16 indicator selector at block-row
    #                 Hkv + i//g (dummy)
    # outputs
    o_ref,          # [1, Hq, D]
    data_ref,       # HBM [L*num_pages*2*page_size, Hkv*D] (the cache; aliased)
    scales_ref,     # HBM [(L*num_pages+1)*RPP, ps] bf16 (aliased; final RPP
    #                 rows = pad-seq write-back dump block)
    # scratch
    kv_buf,         # VMEM [NBUF, 2*chunk, Hkv*D], K/V-SPLIT: the chunk's K
    #                 rows at [:chunk] (page i at i*ps), V rows at [chunk:]
    s_buf,          # VMEM scale blocks: int4 lane-major [NBUF, RPP, ppc*ps]
    #                 (page i's transposed block in lanes [i*ps, (i+1)*ps));
    #                 int8 row-major [NBUF, ppc*RPP, ps]
    wb_s,           # VMEM [RPP, ps] bf16: merged scale block staged for
    #                 write-back
    wb_kv,          # VMEM [2*win, Hkv*D] cache dtype: merged K window (rows
    #                 [0,win)) and V window (rows [win,2win)) staged
    sems,           # DMA sems [NBUF]
    wbsem,          # DMA sem for the write-back chain
    gctr,           # SMEM i32[5] persisting across the grid: [0] computed-
    #                 chunk counter, [1] write-back-outstanding flag,
    #                 [2]/[3] issue cursor (seq, chunk), [4] issued-chunk
    #                 counter
    *,
    scale: float,
    page_size: int,
    ppc: int,
    rpp: int,
    win: int,
    prows: int,   # data rows per page: page_size, or page_size/8 for INT4
    hkv: int,
    g: int,
    d: int,
    num_slots: int,
    nbuf: int,
    quantized: bool,
    int4: bool,
    planes_dots: bool,
    dot_dtype,
):
    """The kernel owns ALL KV writes for the step (XLA's row scatter lowers
    to a sequential per-row loop; its scale-lane update can't be expressed
    at all): when the chunk holding position ctx-1 streams in, the new K/V
    rows (VMEM input blocks) and the scale lane are merged into the VMEM
    copy — so this step's attention sees them — and the containing
    sublane-tile-aligned windows ([win, Hkv*D] data rows; the [RPP, ps]
    scale block) are DMA'd back to the cache. Write-backs are staged
    through dedicated scratch and waited LAZILY one sequence later (SMEM
    flag chain), so their latency hides behind a whole sequence of compute;
    the final grid step drains the last outstanding set."""
    del data_in_ref, scales_in_ref
    si = pl.program_id(0)
    li = layer_ref[0]
    ctx = ctx_ref[si]
    slot = slot_ref[si]
    chunk = ppc * page_size
    chunk_rows = ppc * prows
    n_chunks = lax.div(ctx + chunk - 1, chunk)
    num_pages = num_slots // page_size
    ps = page_size

    chunk_copies = _mk_split_chunk_copies(
        data_ref, scales_ref, bt_ref, ppc, page_size, rpp, li,
        num_pages, bt_ref.shape[1], kv_buf, s_buf, sems, quantized, prows)
    s_total = ctx_ref.shape[0]

    # Cross-sequence pipelining, depth NBUF-1: chunks are consumed in one
    # GLOBAL seq-major order (pads contribute none); an SMEM issue cursor
    # walks the same order NBUF-1 chunks ahead of compute, so every wait
    # finds its DMA issued several chunks of compute earlier — a 1-ahead
    # prefetch left each chunk exposed to DMA latency whenever transfer
    # time exceeded one chunk's compute. Buffer slot = counter % NBUF on
    # both sides (the streams count identically).
    def issue_next():
        def skip(st):
            isi, _ = st
            nc = lax.div(ctx_ref[jnp.minimum(isi, s_total - 1)] + chunk - 1,
                         chunk)
            return (isi < s_total) & (st[1] >= nc)

        isi, ici = lax.while_loop(skip, lambda st: (st[0] + 1, 0),
                                  (gctr[2], gctr[3]))
        live = isi < s_total
        isafe = jnp.minimum(isi, s_total - 1)
        for pred, c in chunk_copies(isafe, ici, lax.rem(gctr[4], nbuf),
                                    ctx_ref[isafe]):
            @pl.when(live & pred)
            def _():
                c.start()
        gctr[2] = jnp.minimum(isi, s_total)
        gctr[3] = jnp.where(live, ici + 1, 0)
        gctr[4] = gctr[4] + jnp.where(live, 1, 0)

    @pl.when(si == 0)
    def _():
        for i in range(5):
            gctr[i] = 0
        for _ in range(nbuf - 1):
            issue_next()

    hq = hkv * g
    # Block-diagonal Q and the scale selectors are prebuilt outside the
    # kernel: the in-kernel iota + where + tile construction was ~5 us of
    # per-sequence prologue — with a 64-seq grid that fixed cost (~320 us)
    # dominated the whole kernel.
    q_bd = q_ref[0]                                   # [Hq, Hkv*D]
    sel_k = sel_v = None
    if quantized:
        sel_k = selk_ref[0]                           # [Hq, RPP]
        sel_v = selv_ref[0]

    # New-token merge bookkeeping: position ctx-1 lives in chunk ltc at
    # in-chunk page pic, token offset `off` = data row `rib` within the
    # page block (off // 8 for token-plane INT4); its physical page is
    # slot // ps. Pads (slot == num_slots) never merge.
    lpos = ctx - 1
    wvalid = (slot < num_slots) & (ctx > 0)
    ltc = jnp.where(wvalid, lax.div(lpos, chunk), -1)
    pic = lax.rem(lax.div(jnp.maximum(lpos, 0), ps), ppc)
    off = lax.rem(jnp.maximum(lpos, 0), ps)
    rib = lax.div(off, TOKENS_PER_I32) if int4 else off

    def wb_copies():
        """The write-back set, in a fixed order (starts and waits must
        match 1:1 on the shared semaphore)."""
        woff = lax.div(rib, win)
        kdst = ((li * num_pages + lax.div(slot, ps)) * (2 * prows // win)
                + woff) * win
        cs = [pltpu.make_async_copy(
                  wb_kv.at[pl.ds(0, win)], data_ref.at[pl.ds(kdst, win)],
                  wbsem),
              pltpu.make_async_copy(
                  wb_kv.at[pl.ds(win, win)],
                  data_ref.at[pl.ds(kdst + (prows // win) * win, win)],
                  wbsem)]
        if quantized:
            sdst = (li * num_pages + lax.div(slot, ps)) * rpp
            cs.append(pltpu.make_async_copy(
                wb_s, scales_ref.at[pl.ds(sdst, rpp)], wbsem))
        return cs

    def merge_new_token(slot_buf):
        # Wait the PREVIOUS sequence's write-backs first (they read from
        # the wb scratch this merge is about to overwrite); a whole
        # sequence of compute has hidden their latency.
        @pl.when(gctr[1] == 1)
        def _():
            for c in wb_copies():
                c.wait()
        # K/V rows into the aligned [win, LW] windows of the streamed
        # chunk copy (this step's attention reads the merged values). The
        # chunk buffer is K/V-split: page pic's K rows at [pic*prows,
        # +prows), its V rows at [chunk_rows + pic*prows, +prows). The
        # merge operates on PACKED rows (token-plane INT4: clear nibble
        # 4*(slot%8) of row rib, OR in the pre-shifted new nibbles);
        # unpacking happens only at compute.
        lw = hkv * d
        sub = lax.broadcasted_iota(jnp.int32, (win, lw), 0)
        woff = lax.div(rib, win)
        kbase = (pic * (prows // win) + woff) * win
        vbase = chunk_rows + kbase
        mrow = sub == rib - woff * win

        def merged_window(old, new_row):
            if int4:
                keep = jnp.bitwise_not(jnp.left_shift(15, nibsh_ref[si]))
                return jnp.where(
                    mrow, jnp.bitwise_or(jnp.bitwise_and(old, keep),
                                         jnp.broadcast_to(new_row,
                                                          (win, lw))), old)
            return jnp.where(mrow, jnp.broadcast_to(new_row, (win, lw)), old)

        wk = merged_window(kv_buf[slot_buf, pl.ds(kbase, win), :], kr_ref[0])
        kv_buf[slot_buf, pl.ds(kbase, win), :] = wk
        wb_kv[pl.ds(0, win), :] = wk
        wv = merged_window(kv_buf[slot_buf, pl.ds(vbase, win), :], vr_ref[0])
        kv_buf[slot_buf, pl.ds(vbase, win), :] = wv
        wb_kv[pl.ds(win, win), :] = wv
        if quantized:
            blk = (s_buf[slot_buf, :, pl.ds(pic * ps, ps)] if int4
                   else s_buf[slot_buf, pl.ds(pic * rpp, rpp), :])  # [RPP, ps]
            lane = lax.broadcasted_iota(jnp.int32, (rpp, ps), 1)
            slane = plane_lane(off, ps) if int4 else off
            merged = jnp.where(lane == slane, scol_ref[0], blk)
            if int4:
                s_buf[slot_buf, :, pl.ds(pic * ps, ps)] = merged
            else:
                s_buf[slot_buf, pl.ds(pic * rpp, rpp), :] = merged
            wb_s[...] = merged
        for c in wb_copies():
            c.start()
        gctr[1] = 1

    def body(ci, carry):
        gi = gctr[0]                      # global index of (si, ci)
        slot_buf = lax.rem(gi, nbuf)

        issue_next()                      # keep the pipeline NBUF-1 deep

        for pred, c in chunk_copies(si, ci, slot_buf, ctx):
            @pl.when(pred)
            def _():
                c.wait()

        # Sub-chunk GROUPS (token-plane path): compute in <=8-page groups
        # and skip groups wholly above the live context. Engine dispatches
        # carry the full max_model_len-wide block table, so the last chunk
        # usually holds dead pages whose plane-extract + dots would
        # otherwise run anyway (engine-shaped bench: 314 vs 234 us at
        # ctx=1536 under a 16-page chunk — the dead quarter is pure waste).
        # Group = 1024 tokens (128 aligned rows at ps=128); chunks that
        # don't split evenly stay whole (a 12-page tight-table chunk is
        # already fully live — groups would only add per-group cost).
        gtok = max(1024 // ps, 1)
        gp = gtok if (int4 and planes_dots and ppc % gtok == 0
                      and ppc > gtok) else ppc
        n_groups = ppc // gp
        rem_chunk = ctx - ci * chunk

        # Pages predicated off (past ceil(ctx/ps)) leave stale VMEM. Their
        # score lanes are masked (so K garbage is harmless), but the V dot
        # multiplies p=0 against the buffer — 0 * NaN = NaN — so zero the V
        # region (and the scale block: its NaN would ride into p via the
        # selector dot before the mask). Only a sequence's LAST chunk ever
        # takes these branches; pages in fully-skipped groups need no
        # zeroing (their group's compute never runs).
        n_need = lax.div(ctx + ps - 1, ps)
        for i in range(ppc):
            dead = ci * ppc + i >= n_need
            if n_groups > 1:
                dead &= rem_chunk > (i // gp) * gp * ps
            @pl.when(dead)
            def _():
                kv_buf[slot_buf, pl.ds(chunk_rows + i * prows, prows), :] = \
                    jnp.zeros((prows, kv_buf.shape[2]), kv_buf.dtype)
                if quantized and int4:
                    s_buf[slot_buf, :, pl.ds(i * ps, ps)] = jnp.zeros(
                        (rpp, ps), s_buf.dtype)
                elif quantized:
                    s_buf[slot_buf, pl.ds(i * rpp, rpp), :] = jnp.zeros(
                        (rpp, ps), s_buf.dtype)

        @pl.when(ci == ltc)
        def _():
            merge_new_token(slot_buf)
        if int4 and planes_dots:
            gsize = gp * prows
            for g in range(n_groups):
                def upd(c, g=g):
                    return _decode_chunk_planes(
                        c, q_bd, sel_k, sel_v,
                        kv_buf[slot_buf, pl.ds(g * gsize, gsize), :],
                        kv_buf[slot_buf,
                               pl.ds(chunk_rows + g * gsize, gsize), :],
                        s_buf[slot_buf, :, pl.ds(g * gp * ps, gp * ps)],
                        rem_chunk - g * gp * ps, scale, gp, page_size, rpp,
                        d, dot_dtype)
                carry = upd(carry) if g == 0 else lax.cond(
                    rem_chunk > g * gp * ps, upd, lambda c: c, carry)
        else:
            w = lax.broadcasted_iota(jnp.int32, (hq, chunk), 1)
            tok = _plane_pos(w, prows, ps) if int4 else w
            carry = _decode_chunk_update(
                carry, q_bd, sel_k, sel_v, kv_buf[slot_buf],
                s_buf[slot_buf] if quantized else None,
                ci * chunk + tok < ctx, scale, ppc, page_size, rpp, d,
                quantized, int4, dot_dtype)
        gctr[0] = gi + 1
        return carry

    init = (jnp.full((hq, 1), MASK_VALUE, jnp.float32),
            jnp.zeros((hq, 1), jnp.float32),
            jnp.zeros((hq, hkv * d), jnp.float32))
    m, l, acc = lax.fori_loop(0, n_chunks, body, init)

    @pl.when((si == s_total - 1) & (gctr[1] == 1))
    def _():
        for c in wb_copies():
            c.wait()
        gctr[1] = 0

    out = acc / jnp.where(l == 0.0, 1.0, l)            # [Hq, Hkv*D]
    for h in range(hkv):
        o_ref[0, h * g:(h + 1) * g, :] = out[
            h * g:(h + 1) * g, h * d:(h + 1) * d].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "pages_per_chunk", "int8_dots", "kv_bits", "planes_dots",
                     "interpret"))
def paged_decode_attention(q, k_rows, v_rows, kv_scales, data,
                           scales, layer_i, context_lens, block_tables,
                           slot_mapping, *, scale: float, page_size: int,
                           num_slots: int, num_layers: int,
                           pages_per_chunk: int = 0,
                           # int8 MXU dots (q + probs absmax-quantized per
                           # row): measured NO speedup over bf16 dots on v5e
                           # (the kernel is not MXU-rate-bound), so accuracy
                           # wins by default; kept for other TPU generations.
                           int8_dots: bool = False,
                           kv_bits: int = 8,
                           # INT4 chunk compute form: per-plane dots (no
                           # unpacked-chunk materialization) vs concat-then-
                           # one-dot. See _decode_chunk_planes.
                           planes_dots: bool = True,
                           interpret: bool = False):
    """q: [S, Hq, D]; k_rows/v_rows: [S, Hkv*D] new rows (int8-quantized
    when the cache is int8; UNPACKED int8 nibble values in [-7, 7] for the
    token-plane INT4 cache) — the KERNEL writes them into the cache (merge
    into the streamed chunk + aligned-window write-back); kv_scales:
    [S, 2*Hkv] new-token scale columns (K then V; see quantize_kv_rows) or
    a [S, 1] dummy when not quantized — merged the same way; data:
    [L*2*num_slots, Hkv*D] (int32 [L*2*num_slots/8, Hkv*D] for INT4);
    scales: bf16[(L*num_pages+1)*RPP, ps] | f32[1, 1]; layer_i: i32 scalar;
    context_lens: i32[S]; block_tables: i32[S, pages_per_seq]; slot_mapping:
    i32[S] (the new token's slot; num_slots for pads/no-write). Returns
    (out [S, Hq, D], data, scales) — cache arrays aliased in place."""
    s, hq, d = q.shape
    int4 = kv_bits == 4
    assert not int4 or data.dtype == jnp.int32, (
        "token-plane INT4 cache must be int32", data.dtype)
    hkv = k_rows.shape[1] // d
    lw = hkv * d
    g = hq // hkv
    quantized = data.dtype == jnp.int8 or int4
    prows = page_size // TOKENS_PER_I32 if int4 else page_size
    rpp = scale_rows_per_page(hkv)
    pages_per_seq = block_tables.shape[1]
    auto_chunk = pages_per_chunk <= 0
    if auto_chunk:
        # Per-chunk fixed cost (DMA issue + dot latency), not HBM bandwidth,
        # is the measured kernel limit, so chunk width is a per-dtype tuned
        # choice (bench_kernels, bs=64 ctx=1536, one session):
        #   int8: 1024-token chunks stream at 799 GB/s ≈ HBM peak (251.9 us;
        #         2048-token chunks REGRESS to 330 us — bigger buffers hurt
        #         the DMA overlap before bandwidth is the limit).
        #   int4: the halved stream leaves fixed cost dominant — 2048-token
        #         chunks win (227.4 us vs 277.6 at 1024; 4096 regresses to
        #         303.5; page_size 256 regresses to 410).
        # Page copies past ceil(ctx/ps) are predicated off, so big chunks
        # cost no masked-read DMA waste. hq>16 shapes (Qwen3-4B/8B) used to
        # be gated to 512 by Mosaic's default 16 MiB scoped-vmem budget;
        # the explicit vmem_limit_bytes below lifts that (and the
        # token-plane INT4 buffers are half the int8 size anyway).
        pages_per_chunk = max(1, (2048 if int4 else 1024) // page_size)
    ppc = min(pages_per_chunk, pages_per_seq)
    if auto_chunk:
        # Balance chunk widths over the page budget: pages_per_seq=20 with
        # a 16-page cap would split 16+4, and the int4 plane extract (and
        # V/scale zeroing) processes the FULL chunk buffer regardless of
        # how few tokens the tail chunk holds — the measured kv4 dip at the
        # sweep's len=2048 cell (2869 tok/s vs kv8's 3333; neighbors win).
        # ceil-balancing gives 2x10 pages: same chunk count, no oversized
        # tail buffer. An EXPLICIT pages_per_chunk is dispatched verbatim
        # (it is an A/B knob; silently rewriting it would measure a
        # configuration that was never requested).
        ppc = -(-pages_per_seq // (-(-pages_per_seq // ppc)))
    chunk = ppc * page_size
    ps = page_size

    # Production inputs are bf16/int8: run the MXU dots in bf16 (int8→bf16
    # casts are exact, f32 accumulation). Keep f32 dots only when both q and
    # the cache are f32 (the CPU parity-test path).
    dot_dtype = (jnp.float32 if (q.dtype == jnp.float32
                                 and data.dtype == jnp.float32)
                 else jnp.bfloat16)
    # int8 MXU dots: no win for the int8 cache (the kernel is DMA-bound
    # there — 799 GB/s ≈ HBM peak), but the INT4 cache halves the stream and
    # leaves the block-diagonal GQA dots as the floor (~2.7 us/chunk, 16 of
    # 128 MXU rows useful), which the MXU's 2x int8 rate directly halves.
    int8_dots = int8_dots and quantized

    # Prebuild the block-diagonal Q (and scale selectors) in XLA: one fused
    # elementwise kernel over the whole batch, instead of ~5 us of iota/
    # where/tile prologue per sequence inside the kernel grid.
    lane = lax.broadcasted_iota(jnp.int32, (hq, hkv * d), 1)
    head = lax.broadcasted_iota(jnp.int32, (hq, hkv * d), 0) // g
    blockdiag = (lane // d == head)[None]             # [1, Hq, Hkv*D]
    if int8_dots:
        qf = q.astype(jnp.float32)                    # [S, Hq, D]
        qmax = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
        qs = jnp.maximum(qmax, 1e-20) / 127.0         # [S, Hq, 1]
        q_i8 = jnp.round(qf / qs).astype(jnp.int8)
        q_bd = jnp.where(blockdiag, jnp.tile(q_i8, (1, 1, hkv)),
                         jnp.zeros((), jnp.int8))
    else:
        q_bd = jnp.where(blockdiag,
                         jnp.tile(q.astype(dot_dtype), (1, 1, hkv)),
                         jnp.zeros((), dot_dtype))
    if quantized:
        # New-token scale columns -> [S, RPP, ps] lane-broadcast blocks for
        # the in-kernel merge (rows >= 2*Hkv are 1.0, matching the array's
        # init so pad rows stay neutral).
        cols = jnp.ones((s, rpp), SCALE_DTYPE)
        cols = cols.at[:, :2 * hkv].set(kv_scales.astype(SCALE_DTYPE))
        scol = jnp.broadcast_to(cols[:, :, None], (s, rpp, ps))
        scol_spec = pl.BlockSpec((1, rpp, ps), lambda si, *_: (si, 0, 0))
        lane_i = lax.broadcasted_iota(jnp.int32, (hq, rpp), 1)
        row_h = lax.broadcasted_iota(jnp.int32, (hq, rpp), 0) // g
        ind_k = lane_i == row_h            # K scales at block-row h
        ind_v = lane_i == hkv + row_h      # V scales at block-row Hkv + h
        sel_v = ind_v.astype(SCALE_DTYPE)[None]       # [1, Hq, RPP]
        if int8_dots:
            sel_k = jnp.where(ind_k[None], (qs * scale).astype(SCALE_DTYPE),
                              jnp.zeros((), SCALE_DTYPE))  # [S, Hq, RPP]
            selk_spec = pl.BlockSpec((1, hq, rpp),
                                     lambda si, *_: (si, 0, 0))
        else:
            sel_k = ind_k.astype(SCALE_DTYPE)[None]
            selk_spec = pl.BlockSpec((1, hq, rpp),
                                     lambda si, *_: (0, 0, 0))
        selv_spec = pl.BlockSpec((1, hq, rpp),
                                 lambda si, *_: (0, 0, 0))
    else:
        scol = jnp.zeros((1, 1, 1), SCALE_DTYPE)
        sel_k = sel_v = jnp.zeros((1, 1, 1), SCALE_DTYPE)
        scol_spec = selk_spec = selv_spec = pl.BlockSpec(memory_space=pl.ANY)

    # Token-plane INT4: ship the new rows as int32 nibble values pre-shifted
    # to the slot's nibble position (the kernel ORs them into the cleared
    # digit of the packed row); nibsh carries the per-seq shift for the
    # clear mask via scalar prefetch.
    if int4:
        nibsh = (4 * (slot_mapping % TOKENS_PER_I32)).astype(jnp.int32)
        sh = nibsh[:, None]
        k_rows = jnp.left_shift(
            jnp.bitwise_and(k_rows.astype(jnp.int32), 15), sh)
        v_rows = jnp.left_shift(
            jnp.bitwise_and(v_rows.astype(jnp.int32), 15), sh)
    else:
        nibsh = jnp.zeros((s,), jnp.int32)
        k_rows = k_rows.astype(data.dtype)
        v_rows = v_rows.astype(data.dtype)

    # Aligned write-back window: Mosaic DMA row slices must start at a
    # multiple of the dtype's sublane tile.
    win = {1: 32, 2: 16, 4: 8}[jnp.dtype(data.dtype).itemsize]
    chunk_rows = ppc * prows
    nbuf = 4  # pipeline depth: see _decode_kernel's issue cursor
    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=page_size, ppc=ppc, rpp=rpp,
        win=win, prows=prows, hkv=hkv, g=g, d=d, num_slots=num_slots,
        nbuf=nbuf, quantized=quantized, int4=int4, planes_dots=planes_dots,
        dot_dtype=dot_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hq, hkv * d), lambda si, *_: (si, 0, 0)),
            # [S, 1, LW] with a unit middle dim: the (1, LW) trailing
            # block equals the array's trailing dims, satisfying the TPU
            # (8, 128) block-tiling rule.
            pl.BlockSpec((1, 1, lw), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec((1, 1, lw), lambda si, *_: (si, 0, 0)),
            scol_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            selk_spec,
            selv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, hq, d), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((nbuf, 2 * chunk_rows, lw), data.dtype),
            pltpu.VMEM((nbuf, rpp, ppc * ps) if int4
                       else (nbuf, ppc * rpp, ps), SCALE_DTYPE),
            pltpu.VMEM((rpp, ps), SCALE_DTYPE),
            pltpu.VMEM((2 * win, lw), data.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SMEM((5,), jnp.int32),
        ],
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_i, jnp.int32), (1,))
    out, data, scales = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((s, hq, d), q.dtype),
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        grid_spec=grid_spec,
        # Operand numbering includes the 5 scalar-prefetch args: data is
        # operand 9 -> output 1, scales operand 10 -> output 2.
        input_output_aliases={9: 1, 10: 2},
        # Mosaic's default 16 MiB scoped-vmem cap rejected hq>16 shapes at
        # 1024-token chunks; v5e carries far more VMEM (the prefill kernel
        # has shipped with a raised cap since round 2).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(layer_arr, context_lens, block_tables, slot_mapping, nibsh,
      q_bd, k_rows[:, None, :], v_rows[:, None, :], scol, data, scales,
      sel_k, sel_v)
    return out, data, scales


def _diag_heads(carry, q_heads, kr, vr, sc_ref, mask, tq, npw, rpp, ps, hkv,
                d, quantized, int4, dot_dtype):
    """Online-softmax update over the tile's OWN (diagonal) K/V block,
    sourced from the VMEM input blocks rather than the cache — the tile
    never reads its freshly-written pages back from HBM, so the write DMAs
    need no wait before compute. kr/vr: [tq, Hkv*D] values (cache dtype;
    token-plane INT4: packed int32 [tq/8, Hkv*D], unpacked here per page in
    plane-major order — the caller's mask uses the matching permuted
    positions); sc_ref: the tile's [npw*RPP, ps] transposed scale blocks
    (or None); mask: [rows, tq]. q_heads carry the softmax scale
    pre-folded."""
    if int4:
        prows = ps // TOKENS_PER_I32
        kr = _unpack_pages(kr, npw, prows, dot_dtype)
        vr = _unpack_pages(vr, npw, prows, dot_dtype)
    out = []
    for h in range(hkv):
        m, l, acc = carry[h]
        hs = slice(h * d, (h + 1) * d)
        s = lax.dot_general(
            q_heads[h], kr[:, hs].astype(dot_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # [rows, tq]
        if quantized:
            krow = jnp.concatenate(
                [sc_ref[p * rpp + h:p * rpp + h + 1, :] for p in range(npw)],
                axis=1).astype(jnp.float32)                 # [1, tq]
            s = s * krow
        s = jnp.where(mask, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            vrow = jnp.concatenate(
                [sc_ref[p * rpp + hkv + h:p * rpp + hkv + h + 1, :]
                 for p in range(npw)], axis=1).astype(jnp.float32)
            p = p * vrow
        o_curr = lax.dot_general(
            p.astype(dot_dtype), vr[:, hs].astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out.append((m_next, l_next, acc * alpha + o_curr))
    return tuple(out)


def _prefill_kernel(
    # scalar prefetch
    layer_ref,      # i32[1]
    tile_seq_ref,   # i32[NT]
    tile_pos0_ref,  # i32[NT]
    ctx_ref,        # i32[S+1]  (padded with 0 for the dump seq)
    bt_ref,         # i32[S, pages_per_seq]
    # inputs
    q_ref,          # [TQ, Hq, D] q-tile (all heads; Hq spans the full axis
    #                 to satisfy the TPU (8,128) block-tiling constraint)
    kr_ref,         # [TQ, Hkv*D] VMEM block: the tile's new K rows (cache
    #                 dtype) — the diagonal compute source AND the
    #                 write-through DMA source
    vr_ref,         # [TQ, Hkv*D] VMEM block
    sc_ref,         # [npw*RPP, ps] VMEM block: the tile's TRANSPOSED
    #                 per-page scale blocks (quantize_kv_blocks; dummy ANY
    #                 [1, 1] when not int8)
    data_in_ref,    # HBM (aliased with data_ref)
    scales_in_ref,  # HBM (aliased with scales_ref)
    # outputs
    o_ref,          # [TQ, Hq, D]
    data_ref,       # HBM [L*num_pages*2*page_size, Hkv*D] (the cache; aliased)
    scales_ref,     # HBM [(L*num_pages+1)*RPP, ps] bf16 (dummy when not
    #                 quantized)
    # scratch
    kv_buf,         # VMEM [2, ppc*2*page_size, Hkv*D] (per page: K rows, V rows)
    s_buf,          # VMEM scale blocks: int4 lane-major [2, RPP, ppc*ps],
    #                 int8 row-major [2, ppc*RPP, ps]
    sems,           # DMA sems [2]
    wsem,           # DMA sem for the tile's row writes
    *,
    scale: float,
    page_size: int,
    ppc: int,
    rpp: int,
    tq: int,
    hkv: int,
    g: int,
    d: int,
    num_slots: int,
    quantized: bool,
    int4: bool,
    dot_dtype,
):
    """Per-tile schedule (designed so no DMA wait is ever exposed — the
    donated-cache probe showed the old write-then-read-own-pages round trip
    cost ~20 us/tile, 26x the streaming time):

    1. issue the tile's write-through DMAs (VMEM block -> its own pages);
    2. compute the DIAGONAL block from the VMEM inputs (never re-reading
       the written pages) while prefix chunk 0 — prefetched by the
       PREVIOUS grid step — lands;
    3. stream prefix chunks [0, pos0) double-buffered, masked kv < pos0
       (the tail of the last chunk may overlap the write region: those
       lanes are masked, so the read value — old bytes or new — is
       irrelevant and the race is harmless);
    4. wait the write DMAs (issued a whole tile of work ago — free), then
       prefetch the NEXT tile's chunk 0 (only safe after the wait: its
       chunk 0 can contain THIS tile's page).
    """
    del data_in_ref, scales_in_ref
    nt = tile_seq_ref.shape[0]
    ti = pl.program_id(0)
    li = layer_ref[0]
    si = tile_seq_ref[ti]
    pos0 = tile_pos0_ref[ti]
    is_real = pos0 >= 0
    ctx = jnp.where(is_real, ctx_ref[si], 0)
    chunk = ppc * page_size
    # Prefix chunks cover kv positions [0, pos0); the diagonal block
    # [pos0, min(pos0+tq, ctx)) comes from the VMEM inputs.
    n_pre = jnp.where(is_real, lax.div(pos0 + chunk - 1, chunk), 0)
    num_pages = num_slots // page_size
    ps = page_size

    # Write-through: this tile's K/V rows land in its own page(s) as aligned
    # row-run DMAs straight from the VMEM input blocks — the XLA row scatter
    # lowers to a sequential per-row loop (measured 93 ms for an 8k-token
    # prefill; these DMAs are ~0.3 ms). Tiles are page-aligned: pos0 % tq
    # == 0 and pages hold ps tokens with tq % ps == 0 or ps % tq == 0, so
    # each covered page gets one contiguous run of wr rows at a
    # sublane-aligned offset. INT8 scale blocks are whole-page [RPP, ps]
    # DMAs (quantized requires tq % ps == 0, so token-plane INT4 writes are
    # always whole [prows, Hkv*D] packed page blocks).
    wr = min(tq, ps)
    npw = max(1, tq // ps)
    prows = ps // TOKENS_PER_I32
    wrows = prows if int4 else wr  # data rows per write run

    def write_copies():
        cs = []
        for i in range(npw):
            pos_i = pos0 + i * wr
            valid = is_real & (pos_i < ctx)
            page = bt_ref[si, lax.div(pos_i, ps)]
            if int4:
                base = (li * num_pages + page) * 2 * prows
                voff = prows
            else:
                # Offset written as (…)*wr so Mosaic can prove sublane-tile
                # alignment of the dynamic row start (pos0 % wr == 0 by the
                # tiling contract, but that's invisible to the prover).
                off = lax.rem(lax.div(pos_i, wr), ps // wr) * wr
                base = (li * num_pages + page) * 2 * ps + off
                voff = ps
            src = pl.ds(i * wrows, wrows)
            cs.append((valid, pltpu.make_async_copy(
                kr_ref.at[src], data_ref.at[pl.ds(base, wrows)], wsem)))
            cs.append((valid, pltpu.make_async_copy(
                vr_ref.at[src], data_ref.at[pl.ds(base + voff, wrows)],
                wsem)))
            if quantized:
                sbase = (li * num_pages + page) * rpp
                cs.append((valid, pltpu.make_async_copy(
                    sc_ref.at[pl.ds(i * rpp, rpp)],
                    scales_ref.at[pl.ds(sbase, rpp)], wsem)))
        return cs

    for valid, c in write_copies():
        @pl.when(valid)
        def _():
            c.start()

    chunk_copies = _mk_split_chunk_copies(data_ref, scales_ref, bt_ref, ppc,
                                          page_size, rpp, li, num_pages,
                                          bt_ref.shape[1], kv_buf, s_buf,
                                          sems, quantized,
                                          prows if int4 else ps)
    chunk_rows = ppc * (prows if int4 else ps)
    lim = jnp.where(is_real, pos0, 0)

    # Chunk 0 is prefetched by the previous grid step (after ITS write
    # wait); only the very first grid step issues its own.
    first = (ti == 0) & (n_pre > 0)
    for pred, c in chunk_copies(si, 0, 0, lim):
        @pl.when(first & pred)
        def _():
            c.start()

    rows = tq * g
    # Row r of head-group h corresponds to query token r // g. The softmax
    # scale is folded into q here (one [rows, d] multiply per tile) instead
    # of into every [rows, chunk] score block.
    q_heads = [
        (q_ref[:, h * g:(h + 1) * g, :].reshape(rows, d)
         .astype(jnp.float32) * scale).astype(dot_dtype)
        for h in range(hkv)
    ]
    init = tuple((jnp.full((rows, 1), MASK_VALUE, jnp.float32),
                  jnp.zeros((rows, 1), jnp.float32),
                  jnp.zeros((rows, d), jnp.float32)) for _ in range(hkv))

    # Diagonal first: overlaps prefix chunk 0's DMA. Pad tiles self-
    # neutralize (all-masked softmax hits the p=1 degenerate case, but
    # their V block is input padding = zeros, so acc stays 0).
    q_pos_d = pos0 + lax.broadcasted_iota(jnp.int32, (rows, tq), 0) // g
    kvw = lax.broadcasted_iota(jnp.int32, (rows, tq), 1)
    kv_pos_d = pos0 + (_plane_pos(kvw, prows, ps) if int4 else kvw)
    dmask = (kv_pos_d <= q_pos_d) & (kv_pos_d < ctx)
    carry = _diag_heads(init, q_heads, kr_ref[...], vr_ref[...],
                        sc_ref if quantized else None, dmask, tq, npw, rpp,
                        ps, hkv, d, quantized, int4, dot_dtype)

    def make_body(masked):
        def body(ci, carry):
            slot = lax.rem(ci, 2)

            have_next = ci + 1 < n_pre
            for pred, c in chunk_copies(si, ci + 1, lax.rem(ci + 1, 2), lim):
                @pl.when(have_next & pred)
                def _():
                    c.start()

            for pred, c in chunk_copies(si, ci, slot, lim):
                @pl.when(pred)
                def _():
                    c.wait()

            if not masked:
                # Every page of this chunk is strictly below pos0: no mask
                # ops at all (saves the iota + where on every score block).
                return _flash_heads_chunk(
                    carry, q_heads, kv_buf[slot],
                    s_buf[slot] if quantized else None, None, ppc,
                    page_size, rpp, hkv, d, quantized, int4, dot_dtype)

            # Pages predicated off (at/past pos0 — the tile's own write
            # region, never read: the diagonal block covers it from VMEM
            # inputs) leave stale VMEM; zero their V region and scale block
            # so p=0 lanes never multiply NaN (see the decode kernel's
            # matching note).
            n_need = lax.div(lim + ps - 1, ps)
            crows = prows if int4 else ps
            for i in range(ppc):
                @pl.when(ci * ppc + i >= n_need)
                def _():
                    kv_buf[slot, pl.ds(chunk_rows + i * crows, crows), :] = \
                        jnp.zeros((crows, kv_buf.shape[2]), kv_buf.dtype)
                    if quantized and int4:
                        s_buf[slot, :, pl.ds(i * ps, ps)] = jnp.zeros(
                            (rpp, ps), s_buf.dtype)
                    elif quantized:
                        s_buf[slot, pl.ds(i * rpp, rpp), :] = jnp.zeros(
                            (rpp, ps), s_buf.dtype)

            kvw2 = lax.broadcasted_iota(jnp.int32, (rows, chunk), 1)
            kv_pos = ci * chunk + (_plane_pos(kvw2, prows, ps) if int4
                                   else kvw2)
            # kv >= pos0 is this tile's own freshly-written region: masked
            # out (the diagonal covered it); its pages are not streamed.
            mask = kv_pos < pos0
            return _flash_heads_chunk(carry, q_heads, kv_buf[slot],
                                      s_buf[slot] if quantized else None,
                                      mask, ppc, page_size, rpp, hkv, d,
                                      quantized, int4, dot_dtype)
        return body

    # Chunks fully below pos0 need no masking; at most one boundary chunk
    # (pos0 % chunk != 0) runs the masked body.
    n_full = lax.div(lim, chunk)
    carry = lax.fori_loop(0, n_full, make_body(False), carry)
    carry = lax.fori_loop(n_full, n_pre, make_body(True), carry)

    # Retire the write DMAs (issued a whole tile ago), then prefetch the
    # successor's chunk 0 — strictly after the wait, because that chunk can
    # include this tile's just-written page.
    for valid, c in write_copies():
        @pl.when(valid)
        def _():
            c.wait()
    nti = jnp.minimum(ti + 1, nt - 1)
    next_needs = (ti + 1 < nt) & (tile_pos0_ref[nti] > 0)
    nlim = jnp.where(next_needs, tile_pos0_ref[nti], 0)
    for pred, c in chunk_copies(tile_seq_ref[nti], 0, 0, nlim):
        @pl.when(next_needs & pred)
        def _():
            c.start()

    for h in range(hkv):
        m, l, acc = carry[h]
        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[:, h * g:(h + 1) * g, :] = out.reshape(tq, g, d).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "q_tile", "pages_per_chunk", "kv_bits", "interpret"))
def ragged_prefill_attention(q, k_rows, v_rows, kv_scales, data,
                             scales, layer_i, tile_seq, tile_pos0,
                             context_lens, block_tables, *, scale: float,
                             page_size: int, num_slots: int, num_layers: int,
                             q_tile: int, pages_per_chunk: int = 0,
                             kv_bits: int = 8, interpret: bool = False):
    """Ragged varlen causal prefill over the paged cache (cached prefixes
    included — the reference's flash_attn_varlen_func with block_table,
    attention.py:93-96, and the Triton prefill kernel capability,
    attention_triton.py:101-183), with write-through: each tile writes its
    own K/V rows (k_rows/v_rows [T, Hkv*D], int8-quantized with transposed
    per-page scale blocks kv_scales [T // page_size * RPP, page_size] from
    quantize_kv_blocks when the cache is int8) into its pages before reading
    them back.

    q: [T, Hq, D] flat tokens, each sequence's segment aligned to q_tile;
    tile_seq/tile_pos0: i32[T // q_tile]. Returns (out [T, Hq, D], data,
    scales) — cache arrays aliased in place."""
    t, hq, d = q.shape
    int4 = kv_bits == 4
    assert not int4 or data.dtype == jnp.int32, (
        "token-plane INT4 cache must be int32", data.dtype)
    quantized = data.dtype == jnp.int8 or int4
    hkv = data.shape[1] // d
    lw = hkv * d
    g = hq // hkv
    rpp = scale_rows_per_page(hkv)
    nt = t // q_tile
    if quantized:
        # Scale blocks are whole-page writes: tiles must cover whole pages.
        assert q_tile % page_size == 0
    else:
        assert page_size % q_tile == 0 or q_tile % page_size == 0
    pages_per_seq = block_tables.shape[1]
    if pages_per_chunk <= 0:
        # 1024-token chunks (measured: +1.1 prefill-MFU pts and the best
        # headline run vs 512 — wider chunks amortize per-chunk fixed costs;
        # ~2 MiB int8 KV per buffer at Hkv*D=1024, well under the VMEM
        # limit). Page copies past pos0 are predicated off. hq>16 shapes
        # (4B/8B) needed the vmem cap raised 32 -> 64 MiB to compile here.
        pages_per_chunk = max(1, 1024 // page_size)
    ppc = min(pages_per_chunk, pages_per_seq)
    chunk = ppc * page_size
    dot_dtype = (jnp.float32 if (q.dtype == jnp.float32
                                 and data.dtype == jnp.float32)
                 else jnp.bfloat16)

    # ctx_ref padded with a dump row so pad tiles (tile_seq == S) index it.
    ctx_pad = jnp.concatenate(
        [context_lens, jnp.zeros(1, context_lens.dtype)])

    kernel = functools.partial(
        _prefill_kernel, scale=scale, page_size=page_size, ppc=ppc, rpp=rpp,
        tq=q_tile, hkv=hkv, g=g, d=d, num_slots=num_slots,
        quantized=quantized, int4=int4, dot_dtype=dot_dtype)
    npw = max(1, q_tile // page_size)
    sc_spec = (pl.BlockSpec((npw * rpp, page_size), lambda ti, *_: (ti, 0))
               if quantized else pl.BlockSpec(memory_space=pl.ANY))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
            # kr/vr are VMEM blocks: the diagonal compute source and the
            # write-through DMA source (one read of the new rows, not two).
            # Token-plane INT4: packed int32 rows, 8 tokens each.
            pl.BlockSpec((q_tile // TOKENS_PER_I32 if int4 else q_tile, lw),
                         lambda ti, *_: (ti, 0)),
            pl.BlockSpec((q_tile // TOKENS_PER_I32 if int4 else q_tile, lw),
                         lambda ti, *_: (ti, 0)),
            sc_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2 * (chunk // TOKENS_PER_I32 if int4 else chunk),
                        lw), data.dtype),
            pltpu.VMEM((2, rpp, ppc * page_size) if int4
                       else (2, ppc * rpp, page_size), SCALE_DTYPE),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_i, jnp.int32), (1,))
    out, data, scales = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((t, hq, d), q.dtype),
            jax.ShapeDtypeStruct(data.shape, data.dtype),
            jax.ShapeDtypeStruct(scales.shape, scales.dtype),
        ],
        grid_spec=grid_spec,
        # Operand numbering includes the 5 scalar-prefetch args: data is
        # operand 9 -> output 1, scales operand 10 -> output 2.
        input_output_aliases={9: 1, 10: 2},
        # The blocked kr/vr inputs (diagonal source) push past the default
        # 16 MiB scoped-vmem limit by ~64 KiB at tq=128/bf16; v5e has far
        # more VMEM than the conservative default allows. 64 MiB admits the
        # hq>16 (4B/8B) shapes at 1024-token chunks.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(layer_arr, tile_seq, tile_pos0, ctx_pad, block_tables,
      q, k_rows, v_rows, kv_scales, data, scales)
    return out, data, scales


def pallas_attention(q, k, v, cache, layer_i, meta, *, scale, is_prefill,
                     max_q_len, num_gather_pages, page_size, num_slots,
                     num_layers, q_tile=128, pages_per_chunk=0,
                     decode_pages_per_chunk=0, planes_dots: bool = True,
                     interpret: bool = False):
    """Backend entry. Both kernels own their KV writes: prefill
    writes-through rows and scale blocks per tile; decode merges the new
    token's rows and scale lane into the streamed chunk and writes back
    aligned windows (the XLA row scatter this replaces lowered to a
    sequential per-row loop; the scale-lane update can't be expressed as a
    scatter at all)."""
    t, hkv, d = k.shape
    # Token-plane INT4 cache stores int32 packed rows (kv_cache.py).
    kv_bits = data_kv_bits(cache["data"])
    quantized = kv_bits in (4, 8)
    if is_prefill:
        if quantized:
            k_rows, v_rows, kv_scales = quantize_kv_blocks(
                k, v, page_size, hkv, kv_bits)
        else:
            k_rows = k.reshape(t, hkv * d).astype(cache["data"].dtype)
            v_rows = v.reshape(t, hkv * d).astype(cache["data"].dtype)
            kv_scales = jnp.ones((1, 1), SCALE_DTYPE)
        out, data, scales = ragged_prefill_attention(
            q, k_rows, v_rows, kv_scales, cache["data"],
            cache["scales"], layer_i, meta.tile_seq, meta.tile_pos0,
            meta.context_lens, meta.block_tables, scale=scale,
            page_size=page_size, num_slots=num_slots, num_layers=num_layers,
            q_tile=q_tile, pages_per_chunk=pages_per_chunk, kv_bits=kv_bits,
            interpret=interpret)
        return out, {"data": data, "scales": scales}
    if quantized:
        k_rows, v_rows, kv_scales = quantize_kv_rows(k, v, kv_bits)
    else:
        k_rows = k.reshape(t, hkv * d).astype(cache["data"].dtype)
        v_rows = v.reshape(t, hkv * d).astype(cache["data"].dtype)
        kv_scales = jnp.ones((t, 1), jnp.float32)
    out, data, scales = paged_decode_attention(
        q, k_rows, v_rows, kv_scales, cache["data"], cache["scales"],
        layer_i, meta.context_lens, meta.block_tables, meta.slot_mapping,
        scale=scale, page_size=page_size, num_slots=num_slots,
        num_layers=num_layers, pages_per_chunk=decode_pages_per_chunk,
        kv_bits=kv_bits, planes_dots=planes_dots, interpret=interpret)
    return out, {"data": data, "scales": scales}
