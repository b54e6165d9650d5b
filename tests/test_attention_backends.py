"""Backend-vs-backend equivalence: the Pallas paged kernels (run in TPU
interpreter mode on CPU) must match dense references — the reference's
implicit verification method made explicit (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.attention_pallas import (
    paged_decode_attention, ragged_prefill_attention)
from nanovllm_tpu.ops.kv_cache import create_kv_cache, gather_pages


def make_cache(key, num_layers, hkv, num_pages, page_size, d):
    shape = (hkv * num_layers * 2 * num_pages * page_size, d)
    return {"data": jax.random.normal(key, shape, jnp.float32),
            "scales": jnp.ones(1, jnp.float32)}


def ref_decode(q, cache, layer_i, context_lens, block_tables, page_size,
               num_slots, num_layers, scale):
    """Straightforward dense-gather reference for single-token decode."""
    s, hq, d = q.shape
    hkv = cache["data"].shape[0] // (num_layers * 2 * num_slots)
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
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (s, hq, d), jnp.float32)
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
    block_tables = jnp.asarray(tables)
    context_lens = jnp.asarray(ctx)
    scale = d ** -0.5

    out_pallas = paged_decode_attention(
        q, cache["data"], cache["scales"], layer_i, context_lens,
        block_tables, scale=scale, page_size=page_size, num_slots=num_slots,
        num_layers=2, interpret=True)
    out_ref = ref_decode(q, cache, layer_i, context_lens, block_tables,
                         page_size, num_slots, 2, scale)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_pad_seq_zero_context():
    d, s, hq, hkv, page_size, pages_per_seq = 128, 4, 4, 2, 16, 4
    num_pages = 8
    num_slots = num_pages * page_size
    q = jnp.ones((s, hq, d), jnp.float32)
    cache = jnp.ones((hkv * 1 * 2 * num_slots, d), jnp.float32)
    block_tables = jnp.zeros((s, pages_per_seq), jnp.int32)
    context_lens = jnp.array([16, 0, 5, 0], jnp.int32)  # pad seqs ctx=0
    out = paged_decode_attention(q, cache, jnp.ones(1, jnp.float32), 0,
                                 context_lens, block_tables, scale=0.1,
                                 page_size=page_size, num_slots=num_slots,
                                 num_layers=1, interpret=True)
    out = np.asarray(out)
    assert np.allclose(out[1], 0.0) and np.allclose(out[3], 0.0)
    assert np.allclose(out[0], 1.0, atol=1e-5)  # V all-ones -> weighted avg 1


def ref_prefill(q, cache, layer_i, tile_seq, tile_pos0, context_lens,
                block_tables, page_size, num_slots, num_layers, q_tile, scale):
    """Dense causal reference over the paged cache for the ragged layout."""
    t, hq, d = q.shape
    hkv = cache["data"].shape[0] // (num_layers * 2 * num_slots)
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


def test_ragged_prefill_matches_dense():
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

    out = ragged_prefill_attention(
        q, cache["data"], cache["scales"], layer_i, tile_seq, tile_pos0,
        context_lens, block_tables, scale=scale, page_size=page_size,
        num_slots=num_slots, num_layers=2, q_tile=q_tile, interpret=True)
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
    """write_kv rows land at the right (head, layer, k/v, slot); pads drop."""
    from nanovllm_tpu.ops.kv_cache import write_kv, kv_row_base
    L, hkv, d, num_slots = 3, 2, 4, 32
    cache = {"data": jnp.zeros((hkv * L * 2 * num_slots, d), jnp.float32),
             "scales": jnp.ones(1, jnp.float32)}
    t = 4
    k = jnp.arange(t * hkv * d, dtype=jnp.float32).reshape(t, hkv, d)
    v = -jnp.arange(t * hkv * d, dtype=jnp.float32).reshape(t, hkv, d)
    slots = jnp.array([5, 9, num_slots, 0], jnp.int32)  # 3rd is a pad token
    out = write_kv(cache, 1, k, v, slots, num_slots, L)
    out = np.asarray(out["data"])
    for h in range(hkv):
        base_k = kv_row_base(h, 1, 0, L, num_slots)
        base_v = kv_row_base(h, 1, 1, L, num_slots)
        np.testing.assert_array_equal(out[base_k + 5], np.asarray(k[0, h]))
        np.testing.assert_array_equal(out[base_v + 9], np.asarray(v[1, h]))
        np.testing.assert_array_equal(out[base_k + 0], np.asarray(k[3, h]))
        # Pad token dropped: ensure k[2] did not corrupt the V region.
        assert not np.allclose(out[base_v + 0], np.asarray(k[2, h]))
        # This head, layers 0 and 2 untouched.
        assert np.all(out[kv_row_base(h, 0, 0, L, num_slots):
                          kv_row_base(h, 1, 0, L, num_slots)] == 0)
        assert np.all(out[kv_row_base(h, 2, 0, L, num_slots):
                          kv_row_base(h, 2, 2, L, num_slots)] == 0)


def test_int8_kv_quantized_decode_close_to_fp32():
    """INT8 KV with per-row scales: decode output within quantization noise
    of fp32 (scales folded into scores/probs, never into the KV stream)."""
    from nanovllm_tpu.ops.kv_cache import create_kv_cache, write_kv
    s_, hq, hkv, d, page_size, pps = 3, 4, 2, 128, 128, 2
    num_pages = s_ * pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(3)
    kq, kk, kv_ = jax.random.split(key, 3)
    ctx_len = 200
    q = jax.random.normal(kq, (s_, hq, d), jnp.float32)
    rng = np.random.default_rng(3)
    tables = jnp.asarray(rng.permutation(num_pages - 1)[: s_ * pps].reshape(
        s_, pps).astype(np.int32) + 1)
    context_lens = jnp.full((s_,), ctx_len, jnp.int32)

    caches = {dt: create_kv_cache(1, hkv, num_pages, page_size, d, dt)
              for dt in (jnp.float32, jnp.int8)}
    # Write the same KV rows through write_kv for both dtypes.
    for si in range(s_):
        for pos in range(ctx_len):
            pass
    k_new = jax.random.normal(kk, (s_ * ctx_len, hkv, d), jnp.float32)
    v_new = jax.random.normal(kv_, (s_ * ctx_len, hkv, d), jnp.float32)
    pos = np.arange(ctx_len)
    slots = np.concatenate([
        np.asarray(tables[si])[pos // page_size] * page_size + pos % page_size
        for si in range(s_)]).astype(np.int32)
    for dt in caches:
        caches[dt] = write_kv(caches[dt], 0, k_new, v_new,
                              jnp.asarray(slots), num_slots, 1)

    outs = {}
    for dt, cache in caches.items():
        outs[dt] = np.asarray(paged_decode_attention(
            q, cache["data"], cache["scales"], 0, context_lens, tables,
            scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
            num_layers=1, interpret=True))
    err = np.abs(outs[jnp.int8] - outs[jnp.float32]).max()
    assert err < 0.05, f"int8 KV error too large: {err}"
    assert not np.allclose(outs[jnp.int8], 0)
