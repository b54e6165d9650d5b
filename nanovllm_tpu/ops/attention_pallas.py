"""Pallas paged-attention backend.

TPU-native re-design of the reference's from-scratch Triton backend
(nanovllm/layers/attention_triton.py): both kernels stream block-table-
indexed KV pages HBM→VMEM with double-buffered async DMA and an online
softmax (the capability of attention_triton.py:101-343, but tile-wise DMA
streaming instead of scalar per-token loads).

The cache is the 2-D row layout of ops/kv_cache.py: one page is ONE
contiguous [page_size, Hkv*D] block, so each chunk needs only
2*pages_per_chunk DMAs covering every KV head, and the kernels never slice
the cache per layer (a scalar-prefetched layer index offsets the rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nanovllm_tpu.ops.attention_ref import ref_attention
from nanovllm_tpu.ops.kv_cache import write_kv

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _mk_chunk_copies(cache_ref, scales_ref, bt_ref, si, ppc, page_size, li,
                     hkv, num_layers, num_slots, k_buf, v_buf, ks_buf, vs_buf,
                     sems, quantized):
    """Per-chunk page-copy descriptors (shared by both kernels): one
    contiguous [page_size, D] DMA per (kv head, page) — pages land directly
    in [Hkv, ppc, page_size, D] buffers, no in-VMEM transpose. INT8 mode
    additionally streams the per-row scales."""
    def chunk_copies(chunk_idx, slot):
        kcopies, vcopies = [], []
        for h in range(hkv):
            k_base = ((h * num_layers + li) * 2) * num_slots
            v_base = k_base + num_slots
            for i in range(ppc):
                page = bt_ref[si, chunk_idx * ppc + i]
                kcopies.append(pltpu.make_async_copy(
                    cache_ref.at[pl.ds(k_base + page * page_size, page_size)],
                    k_buf.at[slot, h, i], sems.at[slot, 0]))
                vcopies.append(pltpu.make_async_copy(
                    cache_ref.at[pl.ds(v_base + page * page_size, page_size)],
                    v_buf.at[slot, h, i], sems.at[slot, 1]))
                if quantized:
                    # scales_ref is the 2-D [rows//128, 128] view; with
                    # page_size % 128 == 0 a page is whole scale rows.
                    rows = page_size // 128
                    kcopies.append(pltpu.make_async_copy(
                        scales_ref.at[pl.ds((k_base + page * page_size)
                                            // 128, rows)],
                        ks_buf.at[slot, h,
                                  pl.ds(i * rows, rows)],
                        sems.at[slot, 0]))
                    vcopies.append(pltpu.make_async_copy(
                        scales_ref.at[pl.ds((v_base + page * page_size)
                                            // 128, rows)],
                        vs_buf.at[slot, h,
                                  pl.ds(i * rows, rows)],
                        sems.at[slot, 1]))
        return kcopies, vcopies
    return chunk_copies


def _decode_kernel(
    # scalar prefetch
    layer_ref,      # i32[1]
    ctx_ref,        # i32[S]
    bt_ref,         # i32[S, pages_per_seq]
    # inputs
    q_ref,          # [1, Hq, D] (VMEM block for this seq)
    cache_ref,      # [Hkv*L*2*num_slots, D] (HBM)
    scales_ref,     # f32[rows] (HBM; dummy [1] when not quantized)
    # output
    o_ref,          # [1, Hq, D]
    # scratch
    k_buf,          # VMEM [2, Hkv, ppc, page_size, D]
    v_buf,
    ks_buf,         # VMEM [2, Hkv, ppc, page_size] f32 (scales)
    vs_buf,
    sems,           # DMA sems [2, 2]
    *,
    scale: float,
    page_size: int,
    ppc: int,
    hkv: int,
    g: int,
    d: int,
    num_slots: int,
    num_layers: int,
    quantized: bool,
):
    si = pl.program_id(0)
    li = layer_ref[0]
    ctx = ctx_ref[si]
    chunk = ppc * page_size
    n_chunks = lax.div(ctx + chunk - 1, chunk)
    chunk_copies = _mk_chunk_copies(cache_ref, scales_ref, bt_ref, si, ppc,
                                    page_size, li, hkv, num_layers, num_slots,
                                    k_buf, v_buf, ks_buf, vs_buf, sems,
                                    quantized)

    def start_chunk(chunk_idx, slot):
        kcopies, vcopies = chunk_copies(chunk_idx, slot)
        for c in kcopies + vcopies:
            c.start()

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    q = q_ref[0].astype(jnp.float32).reshape(hkv, g, d) * scale

    def body(ci, carry):
        m, l, acc = carry
        slot = lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk(ci + 1, lax.rem(ci + 1, 2))

        kcopies, vcopies = chunk_copies(ci, slot)
        for c in kcopies:
            c.wait()
        k = k_buf[slot].reshape(hkv, chunk, d)
        s = lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [Hkv, G, chunk]
        if quantized:
            # Fold K row scales into the scores (chunk-size work, not D x).
            sc = s.reshape(s.shape[0], s.shape[1], -1, 128)
            s = (sc * ks_buf[slot][:, None, :, :]).reshape(s.shape)
        pos = ci * chunk + lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos < ctx, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)

        for c in vcopies:
            c.wait()
        v = v_buf[slot].reshape(hkv, chunk, d)
        if quantized:
            # Fold V row scales into the probabilities.
            pv = p.reshape(p.shape[0], p.shape[1], -1, 128)
            p = (pv * vs_buf[slot][:, None, :, :]).reshape(p.shape)
        o_curr = lax.dot_general(
            p, v.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [Hkv, G, D]
        acc = acc * alpha + o_curr
        return m_next, l_next, acc

    m0 = jnp.full((hkv, g, 1), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((hkv, g, 1), jnp.float32)
    acc0 = jnp.zeros((hkv, g, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    out = acc / jnp.where(l == 0.0, 1.0, l)
    o_ref[0] = out.reshape(hkv * g, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "pages_per_chunk", "interpret"))
def paged_decode_attention(q, cache, scales, layer_i, context_lens,
                           block_tables, *, scale: float, page_size: int,
                           num_slots: int, num_layers: int,
                           pages_per_chunk: int = 0,
                           interpret: bool = False):
    """q: [S, Hq, D]; cache: [Hkv*L*2*num_slots, D] (+ f32 row scales when
    int8); layer_i: i32 scalar; context_lens: i32[S];
    block_tables: i32[S, pages_per_seq]. Returns [S, Hq, D]."""
    s, hq, d = q.shape
    hkv = cache.shape[0] // (num_layers * 2 * num_slots)
    g = hq // hkv
    quantized = cache.dtype == jnp.int8
    if quantized:
        assert page_size % 128 == 0, "int8 KV needs page_size % 128 == 0"
        scales = scales.reshape(-1, 128)
    pages_per_seq = block_tables.shape[1]
    if pages_per_chunk <= 0:
        # Target ~256-token chunks (fewer, larger DMA rounds).
        pages_per_chunk = max(1, 256 // page_size)
    ppc = pages_per_chunk
    while pages_per_seq % ppc:
        ppc -= 1

    kernel = functools.partial(
        _decode_kernel, scale=scale, page_size=page_size, ppc=ppc,
        hkv=hkv, g=g, d=d, num_slots=num_slots, num_layers=num_layers,
        quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda si, *_: (si, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, ppc, page_size, d), cache.dtype),
            pltpu.VMEM((2, hkv, ppc, page_size, d), cache.dtype),
            pltpu.VMEM((2, hkv, ppc * page_size // 128, 128), jnp.float32),
            pltpu.VMEM((2, hkv, ppc * page_size // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    layer_arr = jnp.reshape(jnp.asarray(layer_i, jnp.int32), (1,))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(layer_arr, context_lens, block_tables, q, cache, scales)


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
    cache_ref,      # [Hkv*L*2*num_slots, D] (HBM)
    scales_ref,     # f32[rows] (HBM; dummy [1] when not quantized)
    # output
    o_ref,          # [TQ, Hq, D]
    # scratch
    k_buf,          # VMEM [2, Hkv, ppc, page_size, D]
    v_buf,
    ks_buf,         # VMEM [2, Hkv, ppc, page_size] f32 (scales)
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
    num_layers: int,
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
    chunk_copies = _mk_chunk_copies(cache_ref, scales_ref, bt_ref, si, ppc,
                                    page_size, li, hkv, num_layers, num_slots,
                                    k_buf, v_buf, ks_buf, vs_buf, sems,
                                    quantized)

    def start_chunk(chunk_idx, slot):
        kcopies, vcopies = chunk_copies(chunk_idx, slot)
        for c in kcopies + vcopies:
            c.start()

    @pl.when(n_chunks > 0)
    def _():
        start_chunk(0, 0)

    rows = tq * g
    # [TQ, Hq, D] -> [Hkv, TQ*G, D] (row r of a head-group = query r // G).
    q = q_ref[...].astype(jnp.float32).reshape(tq, hkv, g, d)
    q = jnp.transpose(q, (1, 0, 2, 3)).reshape(hkv, rows, d) * scale
    q_pos = pos0 + lax.broadcasted_iota(jnp.int32, (1, rows, chunk), 1) // g

    def body(ci, carry):
        m, l, acc = carry
        slot = lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            start_chunk(ci + 1, lax.rem(ci + 1, 2))

        kcopies, vcopies = chunk_copies(ci, slot)
        for c in kcopies:
            c.wait()
        k = k_buf[slot].reshape(hkv, chunk, d)
        s = lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [Hkv, rows, chunk]
        if quantized:
            sc = s.reshape(s.shape[0], s.shape[1], -1, 128)
            s = (sc * ks_buf[slot][:, None, :, :]).reshape(s.shape)
        kv_pos = ci * chunk + lax.broadcasted_iota(jnp.int32, s.shape, 2)
        mask = (kv_pos <= q_pos) & (kv_pos < ctx)
        s = jnp.where(mask, s, MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)

        for c in vcopies:
            c.wait()
        v = v_buf[slot].reshape(hkv, chunk, d)
        if quantized:
            pv = p.reshape(p.shape[0], p.shape[1], -1, 128)
            p = (pv * vs_buf[slot][:, None, :, :]).reshape(p.shape)
        o_curr = lax.dot_general(
            p, v.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [Hkv, rows, D]
        acc = acc * alpha + o_curr
        return m_next, l_next, acc

    m0 = jnp.full((hkv, rows, 1), MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((hkv, rows, 1), jnp.float32)
    acc0 = jnp.zeros((hkv, rows, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    out = acc / jnp.where(l == 0.0, 1.0, l)
    out = out.reshape(hkv, tq, g, d).transpose(1, 0, 2, 3)
    o_ref[...] = out.reshape(tq, hkv * g, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "page_size", "num_slots", "num_layers",
                     "q_tile", "pages_per_chunk", "interpret"))
def ragged_prefill_attention(q, cache, scales, layer_i, tile_seq, tile_pos0,
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
    hkv = cache.shape[0] // (num_layers * 2 * num_slots)
    g = hq // hkv
    quantized = cache.dtype == jnp.int8
    if quantized:
        assert page_size % 128 == 0, "int8 KV needs page_size % 128 == 0"
        scales = scales.reshape(-1, 128)
    nt = t // q_tile
    pages_per_seq = block_tables.shape[1]
    if pages_per_chunk <= 0:
        pages_per_chunk = max(1, 256 // page_size)
    ppc = pages_per_chunk
    while pages_per_seq % ppc:
        ppc -= 1

    # ctx_ref padded with a dump row so pad tiles (tile_seq == S) index it.
    ctx_pad = jnp.concatenate(
        [context_lens, jnp.zeros(1, context_lens.dtype)])

    kernel = functools.partial(
        _prefill_kernel, scale=scale, page_size=page_size, ppc=ppc,
        tq=q_tile, hkv=hkv, g=g, d=d, num_slots=num_slots,
        num_layers=num_layers, quantized=quantized)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((q_tile, hq, d), lambda ti, *_: (ti, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, hkv, ppc, page_size, d), cache.dtype),
            pltpu.VMEM((2, hkv, ppc, page_size, d), cache.dtype),
            pltpu.VMEM((2, hkv, ppc * page_size // 128, 128), jnp.float32),
            pltpu.VMEM((2, hkv, ppc * page_size // 128, 128), jnp.float32),
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
    )(layer_arr, tile_seq, tile_pos0, ctx_pad, block_tables, q, cache, scales)


def pallas_attention(q, k, v, cache, layer_i, meta, *, scale, is_prefill,
                     max_q_len, num_gather_pages, page_size, num_slots,
                     num_layers, q_tile=128, interpret: bool = False):
    """Backend entry: write-through KV scatter, then the paged Pallas kernel
    (ragged prefill or decode)."""
    cache = write_kv(cache, layer_i, k, v, meta.slot_mapping, num_slots,
                     num_layers)
    if is_prefill:
        out = ragged_prefill_attention(
            q, cache["data"], cache["scales"], layer_i, meta.tile_seq,
            meta.tile_pos0, meta.context_lens, meta.block_tables, scale=scale,
            page_size=page_size, num_slots=num_slots, num_layers=num_layers,
            q_tile=q_tile, interpret=interpret)
    else:
        out = paged_decode_attention(
            q, cache["data"], cache["scales"], layer_i, meta.context_lens,
            meta.block_tables, scale=scale, page_size=page_size,
            num_slots=num_slots, num_layers=num_layers, interpret=interpret)
    return out, cache
