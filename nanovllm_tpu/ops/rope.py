"""Non-interleaved (half-split) rotary embeddings.

Reference: nanovllm/layers/rotary_embedding.py:6-68. The reference gathers
from a precomputed [max_pos, head_dim] cos/sin cache; here angles are computed
directly from the position ids — a handful of VPU transcendentals that XLA
fuses into the surrounding ops, avoiding a gather and a persistent buffer.
Applied in fp32 (matching the reference's fp32 upcast).
"""

import jax.numpy as jnp


def rope_cos_sin(positions, head_dim: int, theta: float):
    """cos/sin tables for `positions` (i32[T]) — computed ONCE per step and
    closed over by every layer (positions are layer-invariant; computing them
    inside the layer scan would redo the transcendentals L times)."""
    half = head_dim // 2
    inv_freq = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.cos(angles)[:, None, :], jnp.sin(angles)[:, None, :]


def apply_rope(q, k, cos, sin):
    """q: [T, Hq, D], k: [T, Hk, D]; cos/sin: [T, 1, D//2] from
    rope_cos_sin. Applied in fp32 (matching the reference's upcast)."""
    half = q.shape[-1] // 2

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)
