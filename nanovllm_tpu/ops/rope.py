"""Non-interleaved (half-split) rotary embeddings.

Reference: nanovllm/layers/rotary_embedding.py:6-68. The reference gathers
from a precomputed [max_pos, head_dim] cos/sin cache; here angles are computed
directly from the position ids — a handful of VPU transcendentals that XLA
fuses into the surrounding ops, avoiding a gather and a persistent buffer.
Applied in fp32 (matching the reference's fp32 upcast).
"""

import jax.numpy as jnp


def apply_rope(q, k, positions, theta: float):
    """q: [T, Hq, D], k: [T, Hk, D], positions: i32[T] (0-based)."""
    head_dim = q.shape[-1]
    half = head_dim // 2
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, half]
    cos = jnp.cos(angles)[:, None, :]  # [T, 1, half]
    sin = jnp.sin(angles)[:, None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)
