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
