"""INT4 Pallas dequant-matmul vs the plain dequantized reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.qmm_pallas import pack_rows_int4, qmm_int4
from nanovllm_tpu.ops.quant import qmm, quantize_weight


@pytest.mark.parametrize("t,k,n", [(8, 256, 384), (64, 1024, 512),
                                   (130, 512, 1030)])
def test_qmm_int4_matches_dequant_reference(t, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qw = quantize_weight(w, bits=4, pack=True)
    assert qw["q4"].shape == (k // 2, n) and qw["q4"].dtype == jnp.int8

    out = qmm_int4(x, qw["q4"], qw["s"], interpret=True)

    # Reference: explicit dequant matmul from the same int4 values.
    unpacked = quantize_weight(w, bits=4, pack=False)
    ref = (x @ unpacked["q"].astype(jnp.float32)) * unpacked["s"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.integers(-7, 8, (64, 128)), jnp.int8)
    p = pack_rows_int4(q)
    w = np.asarray(p).astype(np.int32)
    lo = (w << 28) >> 28
    hi = w >> 4
    np.testing.assert_array_equal(lo, np.asarray(q[:32]))
    np.testing.assert_array_equal(hi, np.asarray(q[32:]))


def test_qmm_dispatches_packed():
    """quant.qmm routes {"q4"} leaves through the Pallas kernel and honors
    the preferred-dtype convention."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    qw = quantize_weight(w, bits=4, pack=True)
    y = qmm(x, qw)
    assert y.dtype == jnp.bfloat16
    y32 = qmm(x, qw, preferred=jnp.float32)
    assert y32.dtype == jnp.float32
