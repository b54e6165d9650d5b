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
    """logits: f32[S, V]; temperatures: f32[S]; returns i32[S]."""
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temperatures, 1e-6)[:, None]
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    sampled = jnp.argmax(logits / temp + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperatures == 0.0, greedy, sampled)
