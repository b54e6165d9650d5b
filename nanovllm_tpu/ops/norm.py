"""RMSNorm (reference: nanovllm/layers/layernorm.py:17-51).

The reference uses @torch.compile for fusion; under XLA the whole step is one
jitted program so plain jnp suffices — XLA fuses the fp32 upcast, reduction,
and rescale into the surrounding elementwise work (SURVEY §2.4).
"""

import jax.numpy as jnp
from jax import lax


def rms_norm(x, weight, eps: float = 1e-6):
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(orig_dtype)


def add_rms_norm(x, residual, weight, eps: float = 1e-6):
    """Fused residual-add + RMSNorm returning (normed, new_residual)
    (reference layernorm.py:29-51 residual-stream idiom)."""
    residual = x + residual
    return rms_norm(residual, weight, eps), residual
