"""Backend-vs-backend equivalence: the Pallas paged kernels (run in TPU
interpreter mode on CPU) must match dense references — the reference's
implicit verification method made explicit (SURVEY §4).

Decode additionally verifies the kernel's in-kernel KV row write: the new
token's K/V rows are passed to the kernel (not pre-scattered), and the test
checks both the attention output and the final cache state against the XLA
write path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.attention_pallas import (
    paged_decode_attention, ragged_prefill_attention)
from nanovllm_tpu.ops.kv_cache import (
    create_kv_cache, data_kv_bits, gather_pages, kv_rows, quantize_kv_rows,
    write_kv)


def make_cache(key, num_layers, hkv, num_pages, page_size, d):
    shape = (num_layers * 2 * num_pages * page_size, hkv * d)
    return {"data": jax.random.normal(key, shape, jnp.float32),
            "scales": jnp.ones((1, 1), jnp.float32)}


def run_decode(q, k_new, v_new, cache, layer_i, context_lens, block_tables,
               slot_mapping, *, scale, page_size, num_slots, num_layers,
               int8_dots=False):
    """Mirror of pallas_attention's decode prep: build the new-row operands
    and invoke the kernel (interpret mode)."""
    t, hkv, d = k_new.shape
    kv_bits = data_kv_bits(cache["data"])
    if kv_bits:
        k_rows, v_rows, kv_scales = quantize_kv_rows(k_new, v_new, kv_bits)
    else:
        k_rows = k_new.reshape(t, hkv * d).astype(cache["data"].dtype)
        v_rows = v_new.reshape(t, hkv * d).astype(cache["data"].dtype)
        kv_scales = jnp.ones((t, 1), jnp.float32)
    out, data, scales = paged_decode_attention(
        q, k_rows, v_rows, kv_scales, cache["data"],
        cache["scales"], layer_i, context_lens, block_tables, slot_mapping,
        scale=scale, page_size=page_size, num_slots=num_slots,
        num_layers=num_layers, int8_dots=int8_dots, kv_bits=kv_bits or 8,
        interpret=True)
    return out, {"data": data, "scales": scales}


def slot_of(tables, si, pos, page_size):
    return int(tables[si][pos // page_size]) * page_size + pos % page_size


def ref_decode(q, cache, layer_i, context_lens, block_tables, page_size,
               num_slots, num_layers, scale):
    """Straightforward dense-gather reference for single-token decode
    (expects the new rows already written into `cache`)."""
    s, hq, d = q.shape
    hkv = cache["data"].shape[1] // d
    g = hq // hkv
    kd, vd = gather_pages(cache, layer_i, block_tables,
                          block_tables.shape[1], page_size, num_slots, hkv,
                          num_layers)
    kmax = kd.shape[2]
    qg = q.reshape(s, hkv, g, d).astype(jnp.float32)
    scores = jnp.einsum("shgd,shkd->shgk", qg, kd.astype(jnp.float32)) * scale
    mask = (jnp.arange(kmax)[None, :] < context_lens[:, None])[:, None, None, :]
    scores = jnp.where(mask, scores, -jnp.inf)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    p = jnp.exp(scores - smax)
    p = jnp.where(mask, p, 0.0)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-20)
    out = jnp.einsum("shgk,shkd->shgd", p / denom, vd.astype(jnp.float32))
    return out.reshape(s, hq, d)


@pytest.mark.parametrize("s,hq,hkv,page_size,pages_per_seq", [
    (4, 8, 4, 16, 8),
    (3, 4, 4, 16, 4),    # MHA
    (5, 16, 2, 32, 4),   # strong GQA
])
def test_paged_decode_matches_ref(s, hq, hkv, page_size, pages_per_seq):
    d = 128
    num_pages = s * pages_per_seq + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q = jax.random.normal(k1, (s, hq, d), jnp.float32)
    k_new = jax.random.normal(k3, (s, hkv, d), jnp.float32)
    v_new = jax.random.normal(k4, (s, hkv, d), jnp.float32)
    # 2-layer cache; exercise the scalar-prefetched layer index with layer 1.
    cache = make_cache(k2, 2, hkv, num_pages, page_size, d)
    layer_i = 1
    rng = np.random.default_rng(0)
    tables = rng.permutation(num_pages - 1)[: s * pages_per_seq].reshape(
        s, pages_per_seq).astype(np.int32) + 1
    max_ctx = pages_per_seq * page_size
    ctx = np.array([1 + rng.integers(0, max_ctx) for _ in range(s)], np.int32)
    ctx[0] = max_ctx       # full
    ctx[1] = page_size     # exactly one page
    # The step's new token sits at position ctx-1 (context_lens INCLUDE it).
    slots = np.array([slot_of(tables, si, int(ctx[si]) - 1, page_size)
                      for si in range(s)], np.int32)
    block_tables = jnp.asarray(tables)
    context_lens = jnp.asarray(ctx)
    slot_mapping = jnp.asarray(slots)
    scale = d ** -0.5

    out_pallas, cache_out = run_decode(
        q, k_new, v_new, cache, layer_i, context_lens, block_tables,
        slot_mapping, scale=scale, page_size=page_size, num_slots=num_slots,
        num_layers=2)
    # Reference: write through XLA, then dense attention.
    cache_ref = write_kv(dict(cache), layer_i, k_new, v_new, slot_mapping,
                         num_slots, 2, page_size)
    out_ref = ref_decode(q, cache_ref, layer_i, context_lens, block_tables,
                         page_size, num_slots, 2, scale)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    # The kernel's in-kernel row writes must equal the XLA scatter exactly.
    np.testing.assert_array_equal(np.asarray(cache_out["data"]),
                                  np.asarray(cache_ref["data"]))


def test_paged_decode_pad_seq_zero_context():
    d, s, hq, hkv, page_size, pages_per_seq = 128, 4, 4, 2, 16, 4
    num_pages = 8
    num_slots = num_pages * page_size
    q = jnp.ones((s, hq, d), jnp.float32)
    cache = {"data": jnp.ones((1 * 2 * num_slots, hkv * d), jnp.float32),
             "scales": jnp.ones((1, 1), jnp.float32)}
    k_new = jnp.ones((s, hkv, d), jnp.float32)
    block_tables = jnp.zeros((s, pages_per_seq), jnp.int32)
    context_lens = jnp.array([16, 0, 5, 0], jnp.int32)  # pad seqs ctx=0
    # Pad seqs carry slot == num_slots -> the kernel must skip their write.
    slot_mapping = jnp.array([15, num_slots, 4, num_slots], jnp.int32)
    out, cache_out = run_decode(
        q, k_new, k_new, cache, 0, context_lens, block_tables, slot_mapping,
        scale=0.1, page_size=page_size, num_slots=num_slots, num_layers=1)
    out = np.asarray(out)
    assert np.allclose(out[1], 0.0) and np.allclose(out[3], 0.0)
    assert np.allclose(out[0], 1.0, atol=1e-5)  # V all-ones -> weighted avg 1
    # No stray writes: cache was all-ones and new rows are ones.
    assert np.allclose(np.asarray(cache_out["data"]), 1.0)


def ref_prefill(q, cache, layer_i, tile_seq, tile_pos0, context_lens,
                block_tables, page_size, num_slots, num_layers, q_tile, scale):
    """Dense causal reference over the paged cache for the ragged layout."""
    t, hq, d = q.shape
    hkv = cache["data"].shape[1] // d
    g = hq // hkv
    kd, vd = gather_pages(cache, layer_i, block_tables,
                          block_tables.shape[1], page_size, num_slots, hkv,
                          num_layers)
    nt = t // q_tile
    out = np.zeros((t, hq, d), np.float32)
    kd, vd = np.asarray(kd, np.float32), np.asarray(vd, np.float32)
    qn = np.asarray(q, np.float32)
    for ti in range(nt):
        if int(tile_pos0[ti]) < 0:
            continue
        s_i = int(tile_seq[ti])
        ctx = int(context_lens[s_i])
        for r in range(q_tile):
            q_pos = int(tile_pos0[ti]) + r
            if q_pos >= ctx:
                continue
            row = ti * q_tile + r
            for h in range(hq):
                kh = kd[s_i, h // g]
                vh = vd[s_i, h // g]
                kv_lim = min(q_pos + 1, ctx)
                sc = (kh[:kv_lim] @ qn[row, h]) * scale
                p = np.exp(sc - sc.max())
                p /= p.sum()
                out[row, h] = p @ vh[:kv_lim]
    return out


@pytest.mark.parametrize("ppc", [0, 1, 3])
def test_ragged_prefill_matches_dense(ppc):
    # ppc=1: pos0=64 covers 4 fully-valid chunks (the mask-free fast path);
    # ppc=3 (chunk=48): pos0=64 -> 1 full + 1 boundary chunk (masked
    # epilogue). ppc=0 = default 512-token chunks (single boundary chunk).
    d, hq, hkv, page_size, pages_per_seq, q_tile = 128, 4, 2, 16, 8, 32
    # Two seqs: one with a cached prefix (pos0 > 0), one fresh + pad tiles.
    t = 128  # 4 tiles of 32
    num_pages = 32
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (t, hq, d), jnp.float32)
    cache = make_cache(k2, 2, hkv, num_pages, page_size, d)
    layer_i = 1
    rng = np.random.default_rng(1)
    tables = rng.permutation(num_pages)[: 2 * pages_per_seq].reshape(
        2, pages_per_seq).astype(np.int32)
    block_tables = jnp.asarray(tables)
    context_lens = jnp.asarray(np.array([72, 20], np.int32))
    tile_seq = jnp.asarray(np.array([0, 0, 1, 2], np.int32))  # 2 = pad seq
    tile_pos0 = jnp.asarray(np.array([32, 64, 0, -1], np.int32))
    scale = d ** -0.5

    # Write-through inputs: rows gathered back from the cache itself, so the
    # kernel's in-kernel page writes are idempotent and the read-path
    # comparison against the pre-populated cache stays valid.
    t_flat = q.shape[0]
    hkv_d = cache["data"].shape[1]
    k_rows = np.zeros((t_flat, hkv_d), np.float32)
    v_rows = np.zeros((t_flat, hkv_d), np.float32)
    data_np = np.asarray(cache["data"])
    num_pages_total = num_slots // page_size
    for r in range(t_flat):
        ti, off = r // q_tile, r % q_tile
        if int(tile_pos0[ti]) < 0:
            continue
        s_i, pos = int(tile_seq[ti]), int(tile_pos0[ti]) + off
        slot = slot_of(tables, s_i, pos, page_size)
        k_rows[r] = data_np[int(kv_rows(layer_i, 0, slot, page_size,
                                        num_pages_total))]
        v_rows[r] = data_np[int(kv_rows(layer_i, 1, slot, page_size,
                                        num_pages_total))]
    dummy = jnp.ones((1, 1), jnp.bfloat16)
    out, _, _ = ragged_prefill_attention(
        q, jnp.asarray(k_rows), jnp.asarray(v_rows), dummy,
        cache["data"], cache["scales"], layer_i, tile_seq, tile_pos0,
        context_lens, block_tables, scale=scale, page_size=page_size,
        num_slots=num_slots, num_layers=2, q_tile=q_tile,
        pages_per_chunk=ppc, interpret=True)
    ref = ref_prefill(q, cache, layer_i, np.asarray(tile_seq),
                      np.asarray(tile_pos0), np.asarray(context_lens),
                      block_tables, page_size, num_slots, 2, q_tile, scale)
    out = np.asarray(out)
    # Compare only real (attending) rows.
    for ti, (s_i, p0) in enumerate(zip([0, 0, 1], [32, 64, 0])):
        ctx = int(np.asarray(context_lens)[s_i])
        for r in range(q_tile):
            if p0 + r >= ctx:
                continue
            row = ti * q_tile + r
            np.testing.assert_allclose(out[row], ref[row], rtol=2e-5,
                                       atol=2e-5, err_msg=f"row {row}")


def test_write_kv_roundtrip():
    """write_kv rows land at the right (layer, k/v, slot); pads drop."""
    L, hkv, d, page_size, num_pages = 3, 2, 4, 8, 4
    num_slots = page_size * num_pages
    cache = {"data": jnp.zeros((L * 2 * num_slots, hkv * d), jnp.float32),
             "scales": jnp.ones((1, 1), jnp.float32)}
    t = 4
    k = jnp.arange(t * hkv * d, dtype=jnp.float32).reshape(t, hkv, d)
    v = -jnp.arange(t * hkv * d, dtype=jnp.float32).reshape(t, hkv, d)
    slots = jnp.array([5, 9, num_slots, 0], jnp.int32)  # 3rd is a pad token
    out = write_kv(cache, 1, k, v, slots, num_slots, L, page_size)
    out = np.asarray(out["data"])

    def row(is_v, slot):
        return int(kv_rows(1, is_v, slot, page_size, num_pages))

    for h in range(hkv):
        col = slice(h * d, (h + 1) * d)
        np.testing.assert_array_equal(out[row(0, 5), col], np.asarray(k[0, h]))
        np.testing.assert_array_equal(out[row(1, 9), col], np.asarray(v[1, h]))
        np.testing.assert_array_equal(out[row(0, 0), col], np.asarray(k[3, h]))
        # Pad token dropped: ensure k[2] did not corrupt the V region.
        assert not np.allclose(out[row(1, 0), col], np.asarray(k[2, h]))
    # Layers 0 and 2 untouched (each layer owns 2*num_slots contiguous rows).
    per_layer = 2 * num_slots
    assert np.all(out[0:per_layer] == 0)
    assert np.all(out[2 * per_layer:] == 0)


def test_int8_kv_quantized_decode_close_to_fp32():
    """INT8 KV with per-(token, head) scales: decode output within
    quantization noise of fp32 (scales folded into scores/probs, never into
    the KV stream); exercises both the quantized stream read and the
    in-kernel quantized row write."""
    s_, hq, hkv, d, page_size, pps = 3, 4, 2, 128, 128, 2
    num_pages = s_ * pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(3)
    kq, kk, kv_, kn = jax.random.split(key, 4)
    ctx_len = 200
    q = jax.random.normal(kq, (s_, hq, d), jnp.float32)
    rng = np.random.default_rng(3)
    tables = jnp.asarray(rng.permutation(num_pages - 1)[: s_ * pps].reshape(
        s_, pps).astype(np.int32) + 1)

    caches = {dt: create_kv_cache(1, hkv, num_pages, page_size, d, dt)
              for dt in (jnp.float32, jnp.int8)}
    # Write the prefix KV rows through write_kv for both dtypes.
    k_prefix = jax.random.normal(kk, (s_ * ctx_len, hkv, d), jnp.float32)
    v_prefix = jax.random.normal(kv_, (s_ * ctx_len, hkv, d), jnp.float32)
    pos = np.arange(ctx_len)
    slots = np.concatenate([
        np.asarray(tables[si])[pos // page_size] * page_size + pos % page_size
        for si in range(s_)]).astype(np.int32)
    for dt in caches:
        caches[dt] = write_kv(caches[dt], 0, k_prefix, v_prefix,
                              jnp.asarray(slots), num_slots, 1, page_size)

    # Decode step: new token at position ctx_len (context becomes ctx_len+1).
    k_new = jax.random.normal(kn, (s_, hkv, d), jnp.float32)
    context_lens = jnp.full((s_,), ctx_len + 1, jnp.int32)
    step_slots = jnp.asarray(np.array(
        [slot_of(np.asarray(tables), si, ctx_len, page_size)
         for si in range(s_)], np.int32))

    outs = {}
    for dt, cache in caches.items():
        out, _ = run_decode(
            q, k_new, k_new, cache, 0, context_lens, tables, step_slots,
            scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
            num_layers=1)
        outs[dt] = np.asarray(out)
    err = np.abs(outs[jnp.int8] - outs[jnp.float32]).max()
    assert err < 0.05, f"int8 KV error too large: {err}"
    assert not np.allclose(outs[jnp.int8], 0)
    # The optional int8-MXU-dot path (q + probs quantized per row) must stay
    # within slightly looser quantization noise.
    out8, _ = run_decode(
        q, k_new, k_new, caches[jnp.int8], 0, context_lens, tables,
        step_slots, scale=d ** -0.5, page_size=page_size,
        num_slots=num_slots, num_layers=1, int8_dots=True)
    err8 = np.abs(np.asarray(out8) - outs[jnp.float32]).max()
    assert err8 < 0.1, f"int8-dot error too large: {err8}"


def test_int4_kv_quantized_decode_close_to_fp32():
    """Token-plane INT4 KV (int32 rows of 8 tokens, per-(token, head)
    scales): decode output within int4 quantization noise of fp32; exercises
    the packed stream read, in-kernel nibble merge write, and the XLA
    delta-scatter write path."""
    s_, hq, hkv, d, page_size, pps = 3, 4, 2, 128, 128, 2
    num_pages = s_ * pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(3)
    kq, kk, kv_, kn = jax.random.split(key, 4)
    ctx_len = 200
    q = jax.random.normal(kq, (s_, hq, d), jnp.float32)
    rng = np.random.default_rng(3)
    tables = jnp.asarray(rng.permutation(num_pages - 1)[: s_ * pps].reshape(
        s_, pps).astype(np.int32) + 1)

    caches = {
        "f32": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.float32),
        "int4": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.int8,
                                kv_bits=4),
    }
    assert caches["int4"]["data"].dtype == jnp.int32
    assert caches["int4"]["data"].shape == (2 * num_slots // 8, hkv * d)
    k_prefix = jax.random.normal(kk, (s_ * ctx_len, hkv, d), jnp.float32)
    v_prefix = jax.random.normal(kv_, (s_ * ctx_len, hkv, d), jnp.float32)
    pos = np.arange(ctx_len)
    slots = np.concatenate([
        np.asarray(tables[si])[pos // page_size] * page_size + pos % page_size
        for si in range(s_)]).astype(np.int32)
    for name in caches:
        caches[name] = write_kv(caches[name], 0, k_prefix, v_prefix,
                                jnp.asarray(slots), num_slots, 1, page_size)

    k_new = jax.random.normal(kn, (s_, hkv, d), jnp.float32)
    context_lens = jnp.full((s_,), ctx_len + 1, jnp.int32)
    step_slots = jnp.asarray(np.array(
        [slot_of(np.asarray(tables), si, ctx_len, page_size)
         for si in range(s_)], np.int32))

    outs = {}
    for name, cache in caches.items():
        out, _ = run_decode(
            q, k_new, k_new, cache, 0, context_lens, tables, step_slots,
            scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
            num_layers=1)
        outs[name] = np.asarray(out)
    err = np.abs(outs["int4"] - outs["f32"]).max()
    assert err < 0.35, f"int4 KV error too large: {err}"
    assert not np.allclose(outs["int4"], 0)
    # int8-MXU-dot variant of the planes path (q and per-plane probs absmax-
    # int8): the nibble operands are exact in int8, so the added error over
    # the plain int4 path is only the q/probs rounding.
    out8, _ = run_decode(
        q, k_new, k_new, caches["int4"], 0, context_lens, tables, step_slots,
        scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
        num_layers=1, int8_dots=True)
    err8 = np.abs(np.asarray(out8) - outs["f32"]).max()
    assert err8 < 0.4, f"int4+int8-dots error too large: {err8}"
    assert not np.allclose(np.asarray(out8), 0)


def test_int4_prefill_matches_dense_within_noise():
    """INT4 ragged prefill vs the fp32 dense reference: the write-through
    packs rows per tile; prefix chunks unpack in-kernel."""
    from nanovllm_tpu.ops.attention_pallas import ragged_prefill_attention
    from nanovllm_tpu.ops.kv_cache import quantize_kv_blocks
    hq, hkv, d, page_size, q_tile = 4, 2, 128, 128, 128
    t = 3 * q_tile                      # one seq, 3 tiles
    pps = t // page_size
    num_pages = pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(5)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (t, hq, d), jnp.float32)
    k = jax.random.normal(kk, (t, hkv, d), jnp.float32)
    v = jax.random.normal(kv_, (t, hkv, d), jnp.float32)
    tables = jnp.arange(1, pps + 1, dtype=jnp.int32)[None, :]
    ctxs = jnp.full((1,), t, jnp.int32)
    nt = t // q_tile
    tile_seq = jnp.zeros(nt, jnp.int32)
    tile_pos0 = jnp.arange(nt, dtype=jnp.int32) * q_tile

    cache = create_kv_cache(1, hkv, num_pages, page_size, d, jnp.int8,
                            kv_bits=4)
    kq4, vq4, blocks = quantize_kv_blocks(k, v, page_size, hkv, kv_bits=4)
    out, _, _ = ragged_prefill_attention(
        q, kq4, vq4, blocks, cache["data"], cache["scales"], 0, tile_seq,
        tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=page_size,
        num_slots=num_slots, num_layers=1, q_tile=q_tile, kv_bits=4,
        interpret=True)

    # Dense causal reference on the ORIGINAL fp32 K/V.
    qf = q.astype(jnp.float32).reshape(t, hkv, hq // hkv, d)
    scores = jnp.einsum("thgd,shd->thgs", qf, k.astype(jnp.float32))
    scores = scores * d ** -0.5
    causal = jnp.tril(jnp.ones((t, t), bool))
    scores = jnp.where(causal[:, None, None, :], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    ref = jnp.einsum("thgs,shd->thgd", p, v.astype(jnp.float32))
    err = np.abs(np.asarray(out).reshape(t, hkv, hq // hkv, d)
                 - np.asarray(ref)).max()
    assert err < 0.35, f"int4 prefill error too large: {err}"


def test_int4_decode_wide_table_group_skip():
    """ENGINE-shaped dispatch: a 32-page block table (max_model_len wide)
    puts the int4 decode kernel at ppc=16 with sub-chunk GROUP predication
    (<=8-page groups, dead groups lax.cond-skipped). Mixed per-seq contexts
    hit every branch: ctx=900 skips chunk 1's second group, 1400 runs both,
    2100 takes two chunks with the second chunk's second group skipped.
    Output must stay within int4 noise of the fp32 cache run (which takes
    the ungrouped bf16/f32 path), proving skipped groups carry no live
    tokens and live groups mask exactly."""
    s_, hq, hkv, d, page_size, pps = 3, 4, 2, 128, 128, 32
    ctxs = [900, 1400, 2100]
    num_pages = s_ * pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(9)
    kq, kk, kv_, kn = jax.random.split(key, 4)
    q = jax.random.normal(kq, (s_, hq, d), jnp.float32)
    rng = np.random.default_rng(9)
    tables = jnp.asarray(rng.permutation(num_pages - 1)[: s_ * pps].reshape(
        s_, pps).astype(np.int32) + 1)

    caches = {
        "f32": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.float32),
        "int4": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.int8,
                                kv_bits=4),
    }
    slots, ks, vs = [], [], []
    for si, ctx in enumerate(ctxs):
        pos = np.arange(ctx - 1)
        slots.append(np.asarray(tables[si])[pos // page_size] * page_size
                     + pos % page_size)
        ks.append(jax.random.normal(kk, (ctx - 1, hkv, d), jnp.float32))
        vs.append(jax.random.normal(kv_, (ctx - 1, hkv, d), jnp.float32))
    slots = jnp.asarray(np.concatenate(slots).astype(np.int32))
    k_prefix = jnp.concatenate(ks)
    v_prefix = jnp.concatenate(vs)
    for name in caches:
        caches[name] = write_kv(caches[name], 0, k_prefix, v_prefix,
                                slots, num_slots, 1, page_size)

    k_new = jax.random.normal(kn, (s_, hkv, d), jnp.float32)
    context_lens = jnp.asarray(ctxs, jnp.int32)
    step_slots = jnp.asarray(np.array(
        [slot_of(np.asarray(tables), si, ctx - 1, page_size)
         for si, ctx in enumerate(ctxs)], np.int32))

    outs = {}
    for name, cache in caches.items():
        out, _ = run_decode(
            q, k_new, k_new, cache, 0, context_lens, tables, step_slots,
            scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
            num_layers=1)
        outs[name] = np.asarray(out)
    err = np.abs(outs["int4"] - outs["f32"]).max()
    assert err < 0.35, f"wide-table int4 decode error too large: {err}"
    assert not np.allclose(outs["int4"], 0)


def test_int4_decode_concat_form_matches_planes():
    """The concat-then-one-dot INT4 chunk form (planes_dots=False, the A/B
    knob config.int4_planes_dots) shares the lane-major scale buffer with
    the planes path since round 5 — both forms must match the fp32 run
    within int4 noise and each other closely (same quantized values, same
    scale folds; only dot grouping differs)."""
    s_, hq, hkv, d, page_size, pps = 2, 4, 2, 128, 128, 3
    num_pages = s_ * pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(5)
    kq, kk, kv_, kn = jax.random.split(key, 4)
    ctx = 300
    q = jax.random.normal(kq, (s_, hq, d), jnp.float32)
    rng = np.random.default_rng(5)
    tables = jnp.asarray(rng.permutation(num_pages - 1)[: s_ * pps].reshape(
        s_, pps).astype(np.int32) + 1)
    caches = {
        "f32": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.float32),
        "p": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.int8,
                             kv_bits=4),
        "c": create_kv_cache(1, hkv, num_pages, page_size, d, jnp.int8,
                             kv_bits=4),
    }
    pos = np.arange(ctx - 1)
    slots = np.concatenate([
        np.asarray(tables[si])[pos // page_size] * page_size
        + pos % page_size for si in range(s_)]).astype(np.int32)
    kp_ = jax.random.normal(kk, (s_ * (ctx - 1), hkv, d), jnp.float32)
    vp_ = jax.random.normal(kv_, (s_ * (ctx - 1), hkv, d), jnp.float32)
    for name in caches:
        caches[name] = write_kv(caches[name], 0, kp_, vp_,
                                jnp.asarray(slots), num_slots, 1, page_size)
    k_new = jax.random.normal(kn, (s_, hkv, d), jnp.float32)
    ctxs = jnp.full((s_,), ctx, jnp.int32)
    step_slots = jnp.asarray(np.array(
        [slot_of(np.asarray(tables), si, ctx - 1, page_size)
         for si in range(s_)], np.int32))

    def go(cache, planes):
        kr, vr, cols = quantize_kv_rows(k_new, k_new, 4) \
            if data_kv_bits(cache["data"]) else (None, None, None)
        if kr is None:
            kr = k_new.reshape(s_, hkv * d).astype(cache["data"].dtype)
            vr = kr
            cols = jnp.ones((s_, 1), jnp.float32)
        out, _, _ = paged_decode_attention(
            q, kr, vr, cols, cache["data"], cache["scales"], 0, ctxs,
            tables, step_slots, scale=d ** -0.5, page_size=page_size,
            num_slots=num_slots, num_layers=1,
            kv_bits=data_kv_bits(cache["data"]) or 8, planes_dots=planes,
            interpret=True)
        return np.asarray(out)

    o_f32 = go(caches["f32"], True)
    o_planes = go(caches["p"], True)
    o_concat = go(caches["c"], False)
    assert np.abs(o_planes - o_f32).max() < 0.35
    assert np.abs(o_concat - o_f32).max() < 0.35
    assert np.abs(o_concat - o_planes).max() < 0.05, \
        np.abs(o_concat - o_planes).max()
