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


def sample(logits, temperatures, key):
    """logits: f32[S, V]; temperatures: f32[S]; returns i32[S].

    One fused argmax serves both modes: greedy rows (T == 0) zero out their
    Gumbel noise, so argmax(logits/max(T, eps) + 0) == argmax(logits) — a
    second [S, V] argmax pass would double the read of a 151k-wide logits
    buffer per decode step for nothing."""
    logits = logits.astype(jnp.float32)
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    noise = jnp.where((temperatures == 0.0)[:, None], 0.0, gumbel)
    return jnp.argmax(logits / temp + noise, axis=-1).astype(jnp.int32)
