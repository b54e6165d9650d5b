"""Pallas paged-attention backend.

TPU-native re-design of the reference's from-scratch Triton backend
(nanovllm/layers/attention_triton.py): both kernels stream block-table-
indexed KV pages HBM→VMEM with double-buffered async DMA and an online
softmax (the capability of attention_triton.py:101-343, but page-wise DMA
streaming instead of scalar per-token loads).

The cache is the 2-D row layout of ops/kv_cache.py: one page is ONE
contiguous [page_size, Hkv*D] block carrying every KV head, so a 2-page
chunk costs 4 data DMAs (+4 scale-row DMAs when INT8) — DMA issue rate was
the measured decode bottleneck, not HBM bandwidth. Per-head tiles are static
lane slices (no minor-dim reshapes, no in-VMEM transposes of the stream);
the per-head Q·Kᵀ / P·V dots are statically unrolled (Mosaic lowers batched
dots to the same per-head loop).

Decode-step KV writes are XLA row scatters on this layout (a handful of
[T, Hkv*D] rows — cheap, unlike the old head-major layout's 1024 tiny rows
at 165 us/layer/step). The kernel can also write the rows itself
(enable_write=True: in-kernel DMA on the aliased cache, waited before the
last chunk's reads), but real TPUs reject the 1-row HBM slice (Mosaic DMA
slices must be sublane-tile aligned), so that path is interpret/testing-only
until an aligned read-modify-write variant exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.kv_cache import (SCALE_DTYPE, SCALE_LANES,
                                        quantize_rows, write_kv)

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _mk_chunk_copies(data_ref, scales_ref, bt_ref, si, ppc, page_size, li,
                     num_slots, k_buf, v_buf, ks_buf, vs_buf, sems,
                     quantized):
    """Per-chunk page-copy descriptors (shared by both kernels): one
    contiguous [page_size, Hkv*D] DMA per page (all heads at once), plus its
    [page_size, Hkv] scale rows when INT8."""
    k_base = (li * 2) * num_slots
    v_base = k_base + num_slots

    def chunk_copies(chunk_idx, slot):
        kcopies, vcopies = [], []
        for i in range(ppc):
            page = bt_ref[si, chunk_idx * ppc + i]
            dst = pl.ds(i * page_size, page_size)
            kcopies.append(pltpu.make_async_copy(
                data_ref.at[pl.ds(k_base + page * page_size, page_size)],
                k_buf.at[slot, dst], sems.at[slot, 0]))
            vcopies.append(pltpu.make_async_copy(
                data_ref.at[pl.ds(v_base + page * page_size, page_size)],
                v_buf.at[slot, dst], sems.at[slot, 1]))
            if quantized:
                kcopies.append(pltpu.make_async_copy(
                    scales_ref.at[pl.ds(k_base + page * page_size,
                                        page_size)],
                    ks_buf.at[slot, dst], sems.at[slot, 0]))
                vcopies.append(pltpu.make_async_copy(
                    scales_ref.at[pl.ds(v_base + page * page_size,
                                        page_size)],
                    vs_buf.at[slot, dst], sems.at[slot, 1]))
        return kcopies, vcopies

    return chunk_copies


def _flash_heads_chunk(carry, q_heads, k_buf_slot, v_buf_slot, ks, vs, mask,
                       hkv, d, quantized):
    """One online-softmax update over a KV chunk, per-head statically
    unrolled. carry: tuple over heads of (m, l, acc); q_heads: per-head
    [rows, d] f32 (pre-scaled); k/v_buf_slot: [chunk, Hkv*D]; ks/vs:
    [chunk, Hkv] f32; mask: [rows, chunk] bool."""
    out = []
    for h in range(hkv):
        m, l, acc = carry[h]
        k_h = k_buf_slot[:, h * d:(h + 1) * d].astype(jnp.float32)
        if quantized:
            k_h = k_h * ks[:, h:h + 1].astype(jnp.float32)
        s = lax.dot_general(
            q_heads[h], k_h, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, chunk]
        s = jnp.where(mask, s, MASK_VALUE)
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        v_h = v_buf_slot[:, h * d:(h + 1) * d].astype(jnp.float32)
        if quantized:
            v_h = v_h * vs[:, h:h + 1].astype(jnp.float32)
        o_curr = lax.dot_general(
            p, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [rows, d]
        out.append((m_next, l_next, acc * alpha + o_curr))
    return tuple(out)


def _decode_kernel(
    # scalar prefetch
    layer_ref,      # i32[1]
    ctx_ref,        # i32[S]
    bt_ref,         # i32[S, pages_per_seq]
    slot_ref,       # i32[S]  (num_slots for pad seqs)
    # inputs
    q_ref,          # [1, Hq, D] VMEM block for this seq
    kr_ref,         # HBM [S, Hkv*D] new K rows (quantized when int8);
    #                 row si is DMA'd straight HBM->HBM into the cache
    #                 (a (1, Hkv*D) VMEM block would violate the (8, 128)
    #                 block-tiling rule on real TPUs)
    vr_ref,         # HBM [S, Hkv*D]
    ksc_ref,        # HBM f32[S, Hkv] (dummy [S, 1] when not quantized)
    vsc_ref,        # HBM f32[S, Hkv]
    data_in_ref,    # HBM (aliased with data_out)
    scales_in_ref,  # HBM (aliased with scales_out)
    # outputs
    o_ref,          # [1, Hq, D]
    data_ref,       # HBM [L*2*num_slots, Hkv*D] (the cache; aliased)
    scales_ref,     # HBM [rows, Hkv] f32
    # scratch
    k_buf,          # VMEM [2, chunk, Hkv*D]
    v_buf,
    ks_buf,         # VMEM [2, chunk, SCALE_LANES] bf16 (lane h = head h)
    vs_buf,
    sems,           # DMA sems [2, 2]
    wsem,           # DMA sem for the row writes
    *,
    scale: float,
    page_size: int,
    ppc: int,
    hkv: int,
    g: int,
    d: int,
    num_slots: int,
    quantized: bool,
    enable_write: bool,
):
    del data_in_ref, scales_in_ref
    si = pl.program_id(0)
    li = layer_ref[0]
    ctx = ctx_ref[si]
    slot = slot_ref[si]
    chunk = ppc * page_size
    n_chunks = lax.div(ctx + chunk - 1, chunk)
    k_base = (li * 2) * num_slots
    v_base = k_base + num_slots

    def write_copies():
        cs = [pltpu.make_async_copy(kr_ref.at[pl.ds(si, 1)],
                                    data_ref.at[pl.ds(k_base + slot, 1)],
                                    wsem),
              pltpu.make_async_copy(vr_ref.at[pl.ds(si, 1)],
                                    data_ref.at[pl.ds(v_base + slot, 1)],
                                    wsem)]
        if quantized:
            cs.append(pltpu.make_async_copy(
                ksc_ref.at[pl.ds(si, 1)],
                scales_ref.at[pl.ds(k_base + slot, 1)], wsem))
            cs.append(pltpu.make_async_copy(
                vsc_ref.at[pl.ds(si, 1)],
                scales_ref.at[pl.ds(v_base + slot, 1)], wsem))
        return cs

    valid_write = (slot < num_slots) if enable_write else False

    if enable_write:
        @pl.when(valid_write)
        def _():
            for c in write_copies():
                c.start()

    chunk_copies = _mk_chunk_copies(data_ref, scales_ref, bt_ref, si, ppc,
                                    page_size, li, num_slots, k_buf, v_buf,
                                    ks_buf, vs_buf, sems, quantized)

    def start_chunk(chunk_idx, slot_buf):
        if enable_write:
            # The step's own K/V row lands in the LAST page: its write must
            # complete before that page is read back.
            @pl.when((chunk_idx == n_chunks - 1) & valid_write)
            def _():
                for c in write_copies():
                    c.wait()
        kcopies, vcopies = chunk_copies(chunk_idx, slot_buf)
        for c in kcopies + vcopies:
            c.start()

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    q = q_ref[0].astype(jnp.float32) * scale          # [Hq, D]
    q_heads = [q[h * g:(h + 1) * g] for h in range(hkv)]

    def body(ci, carry):
        slot_buf = lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk(ci + 1, lax.rem(ci + 1, 2))

        kcopies, vcopies = chunk_copies(ci, slot_buf)
        for c in kcopies + vcopies:
            c.wait()
        pos = ci * chunk + lax.broadcasted_iota(jnp.int32, (g, chunk), 1)
        mask = pos < ctx
        ks = ks_buf[slot_buf] if quantized else None
        vs = vs_buf[slot_buf] if quantized else None
        return _flash_heads_chunk(carry, q_heads, k_buf[slot_buf],
                                  v_buf[slot_buf], ks, vs, mask, hkv, d,
                                  quantized)

    init = tuple((jnp.full((g, 1), MASK_VALUE, jnp.float32),
                  jnp.zeros((g, 1), jnp.float32),
                  jnp.zeros((g, d), jnp.float32)) for _ in range(hkv))
    carry = lax.fori_loop(0, n_chunks, body, init)

    for h in range(hkv):
        m, l, acc = carry[h]
        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, h * g:(h + 1) * g, :] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "pages_per_chunk", "enable_write", "interpret"))
def paged_decode_attention(q, k_rows, v_rows, k_scales, v_scales, data,
                           scales, layer_i, context_lens, block_tables,
                           slot_mapping, *, scale: float, page_size: int,
                           num_slots: int, num_layers: int,
                           pages_per_chunk: int = 0,
                           enable_write: bool = False,
                           interpret: bool = False):
    """q: [S, Hq, D]; k_rows/v_rows: [S, Hkv*D] new rows (int8-quantized when
    the cache is int8); k_scales/v_scales: f32[S, Hkv] (dummy [S, 1] when
    not); data: [L*2*num_slots, Hkv*D]; scales: f32[rows, Hkv] | f32[1, 1];
    layer_i: i32 scalar; context_lens: i32[S]; block_tables:
    i32[S, pages_per_seq]; slot_mapping: i32[S]. Returns
    (out [S, Hq, D], data, scales) — cache arrays aliased in place."""
    s, hq, d = q.shape
    hkv = k_rows.shape[1] // d
    g = hq // hkv
    quantized = data.dtype == jnp.int8
    pages_per_seq = block_tables.shape[1]
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, 256 // page_size)
    ppc = pages_per_chunk
    while pages_per_seq % ppc:
        ppc -= 1
    chunk = ppc * page_size

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=page_size, ppc=ppc,
        hkv=hkv, g=g, d=d, num_slots=num_slots, quantized=quantized,
        enable_write=enable_write)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, hq, d), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hkv * d), data.dtype),
            pltpu.VMEM((2, chunk, hkv * d), data.dtype),
            pltpu.VMEM((2, chunk, SCALE_LANES), SCALE_DTYPE),
            pltpu.VMEM((2, chunk, SCALE_LANES), SCALE_DTYPE),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
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
        # Operand numbering includes the 4 scalar-prefetch args: data is
        # operand 9 -> output 1, scales operand 10 -> output 2.
        input_output_aliases={9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(layer_arr, context_lens, block_tables, slot_mapping,
      q, k_rows, v_rows, k_scales, v_scales, data, scales)
    return out, data, scales


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
    data_ref,       # HBM [L*2*num_slots, Hkv*D]
    scales_ref,     # HBM f32[rows, Hkv] (dummy when not quantized)
    # output
    o_ref,          # [TQ, Hq, D]
    # scratch
    k_buf,          # VMEM [2, chunk, Hkv*D]
    v_buf,
    ks_buf,         # VMEM [2, chunk, SCALE_LANES] bf16 (lane h = head h)
    vs_buf,
    sems,           # DMA sems [2, 2]
    *,
    scale: float,
    page_size: int,
    ppc: int,
    tq: int,
    hkv: int,
    g: int,
    d: int,
    num_slots: int,
    quantized: bool,
):
    ti = pl.program_id(0)
    li = layer_ref[0]
    si = tile_seq_ref[ti]
    pos0 = tile_pos0_ref[ti]
    is_real = pos0 >= 0
    ctx = jnp.where(is_real, ctx_ref[si], 0)
    # Causal flash: this tile attends kv positions [0, min(pos0 + TQ, ctx)).
    kv_hi = jnp.minimum(pos0 + tq, ctx)
    chunk = ppc * page_size
    n_chunks = jnp.where(is_real, lax.div(kv_hi + chunk - 1, chunk), 0)
    chunk_copies = _mk_chunk_copies(data_ref, scales_ref, bt_ref, si, ppc,
                                    page_size, li, num_slots, k_buf, v_buf,
                                    ks_buf, vs_buf, sems, quantized)

    def start_chunk(chunk_idx, slot):
        kcopies, vcopies = chunk_copies(chunk_idx, slot)
        for c in kcopies + vcopies:
            c.start()

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    rows = tq * g
    # Row r of head-group h corresponds to query token r // g.
    q_heads = [
        q_ref[:, h * g:(h + 1) * g, :].reshape(rows, d).astype(jnp.float32)
        * scale
        for h in range(hkv)
    ]
    q_pos = pos0 + lax.broadcasted_iota(jnp.int32, (rows, chunk), 0) // g

    def body(ci, carry):
        slot = lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk(ci + 1, lax.rem(ci + 1, 2))

        kcopies, vcopies = chunk_copies(ci, slot)
        for c in kcopies + vcopies:
            c.wait()
        kv_pos = ci * chunk + lax.broadcasted_iota(jnp.int32, (rows, chunk),
                                                   1)
        mask = (kv_pos <= q_pos) & (kv_pos < ctx)
        ks = ks_buf[slot] if quantized else None
        vs = vs_buf[slot] if quantized else None
        return _flash_heads_chunk(carry, q_heads, k_buf[slot], v_buf[slot],
                                  ks, vs, mask, hkv, d, quantized)

    init = tuple((jnp.full((rows, 1), MASK_VALUE, jnp.float32),
                  jnp.zeros((rows, 1), jnp.float32),
                  jnp.zeros((rows, d), jnp.float32)) for _ in range(hkv))
    carry = lax.fori_loop(0, n_chunks, body, init)

    for h in range(hkv):
        m, l, acc = carry[h]
        out = acc / jnp.where(l == 0.0, 1.0, l)
        o_ref[:, h * g:(h + 1) * g, :] = out.reshape(tq, g, d).astype(
            o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "q_tile", "pages_per_chunk", "interpret"))
def ragged_prefill_attention(q, data, scales, layer_i, tile_seq, tile_pos0,
                             context_lens, block_tables, *, scale: float,
                             page_size: int, num_slots: int, num_layers: int,
                             q_tile: int, pages_per_chunk: int = 0,
                             interpret: bool = False):
    """Ragged varlen causal prefill over the paged cache (cached prefixes
    included — the reference's flash_attn_varlen_func with block_table,
    attention.py:93-96, and the Triton prefill kernel capability,
    attention_triton.py:101-183).

    q: [T, Hq, D] flat tokens, each sequence's segment aligned to q_tile;
    tile_seq/tile_pos0: i32[T // q_tile]. Returns [T, Hq, D]."""
    t, hq, d = q.shape
    quantized = data.dtype == jnp.int8
    hkv = data.shape[1] // d
    g = hq // hkv
    nt = t // q_tile
    pages_per_seq = block_tables.shape[1]
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, 256 // page_size)
    ppc = pages_per_chunk
    while pages_per_seq % ppc:
        ppc -= 1
    chunk = ppc * page_size

    # ctx_ref padded with a dump row so pad tiles (tile_seq == S) index it.
    ctx_pad = jnp.concatenate(
        [context_lens, jnp.zeros(1, context_lens.dtype)])

    kernel = functools.partial(
        _prefill_kernel, scale=scale, page_size=page_size, ppc=ppc,
        tq=q_tile, hkv=hkv, g=g, d=d, num_slots=num_slots,
        quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, hkv * d), data.dtype),
            pltpu.VMEM((2, chunk, hkv * d), data.dtype),
            pltpu.VMEM((2, chunk, SCALE_LANES), SCALE_DTYPE),
            pltpu.VMEM((2, chunk, SCALE_LANES), SCALE_DTYPE),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_i, jnp.int32), (1,))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((t, hq, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(layer_arr, tile_seq, tile_pos0, ctx_pad, block_tables, q, data, scales)


def pallas_attention(q, k, v, cache, layer_i, meta, *, scale, is_prefill,
                     max_q_len, num_gather_pages, page_size, num_slots,
                     num_layers, q_tile=128, in_kernel_write: bool = False,
                     interpret: bool = False):
    """Backend entry. Prefill: XLA row-scatter write-through, then the ragged
    prefill kernel.

    Decode: by default the new K/V rows are written with the same XLA row
    scatter (on this layout that is a handful of [T, Hkv*D] rows — the
    embedding-update pattern, in place on the donated cache) and the kernel
    only reads. With in_kernel_write=True the kernel DMAs the rows itself;
    real TPUs reject the unaligned 1-row HBM slice (Mosaic tiling requires
    sublane-aligned DMA slices), so this path is interpret/testing-only until
    an aligned read-modify-write variant exists."""
    if is_prefill:
        cache = write_kv(cache, layer_i, k, v, meta.slot_mapping, num_slots,
                         num_layers)
        out = ragged_prefill_attention(
            q, cache["data"], cache["scales"], layer_i, meta.tile_seq,
            meta.tile_pos0, meta.context_lens, meta.block_tables, scale=scale,
            page_size=page_size, num_slots=num_slots, num_layers=num_layers,
            q_tile=q_tile, interpret=interpret)
        return out, cache
    t, hkv, d = k.shape
    if in_kernel_write:
        if cache["data"].dtype == jnp.int8:
            k_rows, k_scales = quantize_rows(k)
            v_rows, v_scales = quantize_rows(v)
        else:
            k_rows = k.reshape(t, hkv * d).astype(cache["data"].dtype)
            v_rows = v.reshape(t, hkv * d).astype(cache["data"].dtype)
            k_scales = jnp.ones((t, 1), jnp.float32)
            v_scales = k_scales
        slot_mapping = meta.slot_mapping
        data, scales = cache["data"], cache["scales"]
        out, data, scales = paged_decode_attention(
            q, k_rows, v_rows, k_scales, v_scales, data, scales, layer_i,
            meta.context_lens, meta.block_tables, slot_mapping, scale=scale,
            page_size=page_size, num_slots=num_slots, num_layers=num_layers,
            enable_write=True, interpret=interpret)
        return out, {"data": data, "scales": scales}
    cache = write_kv(cache, layer_i, k, v, meta.slot_mapping, num_slots,
                     num_layers)
    data, scales = cache["data"], cache["scales"]
    k_rows = jnp.zeros((t, hkv * d), data.dtype)
    v_rows = k_rows
    k_scales = jnp.ones((t, 1), jnp.float32)
    v_scales = k_scales
    slot_mapping = jnp.full((t,), num_slots, jnp.int32)  # no kernel write
    out, data, scales = paged_decode_attention(
        q, k_rows, v_rows, k_scales, v_scales, data, scales, layer_i,
        meta.context_lens, meta.block_tables, slot_mapping, scale=scale,
        page_size=page_size, num_slots=num_slots, num_layers=num_layers,
        interpret=interpret)
    return out, {"data": data, "scales": scales}
