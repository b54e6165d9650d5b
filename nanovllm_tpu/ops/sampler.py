"""On-device token sampling.

Reference: nanovllm/layers/sampler.py:10-18 — greedy argmax plus the
exponential-race (Gumbel-equivalent) trick for temperature sampling. Here the
Gumbel-max form is used directly on temperature-scaled logits:
argmax(logits/T + Gumbel(0,1)), which is distributionally identical to
multinomial sampling from softmax(logits/T). Per-sequence temperature==0
selects greedy. Runs inside the jitted step so logits never leave the device
(SURVEY §7.2)."""

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-1e30)


def sample(logits, temperatures, key, top_ks=None, top_ps=None):
    """logits: f32[S, V]; temperatures: f32[S]; returns i32[S].

    One fused argmax serves both modes: greedy rows (T == 0) zero out their
    Gumbel noise, so argmax(logits/max(T, eps) + 0) == argmax(logits) — a
    second [S, V] argmax pass would double the read of a 151k-wide logits
    buffer per decode step for nothing.

    top_ks (i32[S], 0 = off) / top_ps (f32[S], 1.0 = off): beyond-reference
    top-k / nucleus filtering. Passing either switches to a sort-based path
    (one descending [S, V] sort feeds both thresholds), so the runner only
    plumbs them into the compiled program when some scheduled request
    actually uses them — the default workload keeps the sort-free program.
    """
    logits = logits.astype(jnp.float32)
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    scaled = logits / temp
    if top_ks is not None or top_ps is not None:
        s, v = logits.shape
        desc = -jnp.sort(-scaled, axis=-1)          # [S, V] descending
        rows = jnp.arange(s)
        if top_ks is not None:
            # Keep the k highest logits; k<=0 keeps everything.
            k = jnp.where(top_ks > 0, jnp.clip(top_ks, 1, v), v)
            kth = desc[rows, k - 1]                  # [S]
            scaled = jnp.where(scaled < kth[:, None], NEG_INF, scaled)
        if top_ps is not None:
            # Nucleus: smallest prefix of the sorted softmax with mass
            # >= top_p. exclusive-cumsum < top_p marks the kept prefix;
            # the last kept logit is the admission threshold.
            probs = jax.nn.softmax(desc, axis=-1)
            cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive
            keep = cum < top_ps[:, None]              # always keeps rank 0
            nkeep = jnp.sum(keep, axis=-1)            # [S] >= 1
            pth = desc[rows, nkeep - 1]
            scaled = jnp.where(scaled < pth[:, None], NEG_INF, scaled)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    noise = jnp.where((temperatures == 0.0)[:, None], 0.0, gumbel)
    return jnp.argmax(scaled + noise, axis=-1).astype(jnp.int32)


VOCAB_TILE = 16384


def _slice_head(w, a, b):
    """Static vocab-column slice of a plain or quantized lm_head leaf."""
    if isinstance(w, dict):
        return {k: v[..., a:b] for k, v in w.items()}
    return w[:, a:b]


def _head_vocab(w):
    return w["s"].shape[-1] if isinstance(w, dict) else w.shape[-1]


def _head_mm(last, w_tile):
    """Local [S, H] @ head-tile matmul, fp32 out. Calls the kernels directly
    (not ops.quant.qmm): fused_sample may already be inside its own
    shard_map, where qmm's tp-mesh dispatch must not re-trigger."""
    if isinstance(w_tile, dict):
        if "q4p" in w_tile or "q4pr" in w_tile:
            from nanovllm_tpu.ops.qmm_pallas import qmm_int4_planes
            q = w_tile.get("q4p", w_tile.get("q4pr"))
            return qmm_int4_planes(last, q, w_tile["s"],
                                   out_dtype=jnp.float32)
        y = jnp.matmul(last, w_tile["q"].astype(last.dtype),
                       preferred_element_type=jnp.float32)
        return y * w_tile["s"][..., 0, :]
    return jnp.matmul(last, w_tile, preferred_element_type=jnp.float32)


def _fused_sample_local(last, lm_head, temperatures, key, base: int = 0):
    """Gumbel-max sampling fused with the LM head over static vocab tiles:
    each tile's logits [S, VOCAB_TILE] feed a running (max, argmax) carry
    and are then dead — the [S, V] fp32 logits (37 MiB at 64 x 151936, a
    write + read round-trip per decode step) never materialize. Tie-break:
    strict > keeps the earliest tile, and argmax keeps the first lane —
    together the plain argmax's first-maximum semantics.

    base offsets the returned indices (tensor-parallel vocab shards)."""
    s = last.shape[0]
    v = _head_vocab(lm_head)
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    greedy = (temperatures == 0.0)[:, None]
    best = jnp.full((s,), -jnp.inf, jnp.float32)
    idx = jnp.zeros((s,), jnp.int32)
    for i, a in enumerate(range(0, v, VOCAB_TILE)):
        b = min(a + VOCAB_TILE, v)
        z = _head_mm(last, _slice_head(lm_head, a, b))
        g = jax.random.gumbel(jax.random.fold_in(key, i), (s, b - a),
                              jnp.float32)
        y = z / temp + jnp.where(greedy, 0.0, g)
        m = jnp.max(y, axis=-1)
        arg = jnp.argmax(y, axis=-1).astype(jnp.int32) + (base + a)
        take = m > best
        best = jnp.where(take, m, best)
        idx = jnp.where(take, arg, idx)
    return best, idx


def fused_sample(last, lm_head, temperatures, key):
    """Sample next tokens straight from last-token hidden rows (see
    _fused_sample_local). Under a tensor-parallel mesh the head is
    vocab-sharded: each shard scans its local tiles under shard_map, then a
    pmax/pmin pair picks the global winner (lowest index on exact ties —
    the dense argmax's semantics). Sampling streams differ between tp
    degrees (per-shard fold_in) but are deterministic for a fixed config."""
    from nanovllm_tpu.parallel.mesh import current_tp_mesh
    mesh = current_tp_mesh()
    if mesh is None:
        return _fused_sample_local(last, lm_head, temperatures, key)[1]
    from jax.sharding import PartitionSpec as P

    from nanovllm_tpu.parallel.mesh import shard_map as _sm
    shard_map = _sm()

    def body(lastl, wl, temps, k):
        ax = jax.lax.axis_index("tp")
        vloc = _head_vocab(wl)
        kl = jax.random.fold_in(k, ax)
        best, idx = _fused_sample_local(lastl, wl, temps, kl,
                                        base=ax * vloc)
        m_all = jax.lax.pmax(best, "tp")
        cand = jnp.where(best == m_all, idx, jnp.int32(2 ** 31 - 1))
        return jax.lax.pmin(cand, "tp")

    # Every lm_head leaf (packed planes [H/8, V] | int8 [H, V] | plain, and
    # the [1, V] scales) shards on its vocab (last) dim.
    head_spec = (jax.tree.map(lambda _: P(None, "tp"), lm_head)
                 if isinstance(lm_head, dict) else P(None, "tp"))
    return shard_map(body, mesh=mesh,
                     in_specs=(P(), head_spec, P(), P()),
                     out_specs=P(), check_vma=False)(
        last, lm_head, temperatures, key)
