"""INT4 Pallas dequant-matmul vs the plain dequantized reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu.ops.qmm_pallas import (pack_planes_int4, pack_rows_int4,
                                         qmm_int4, qmm_int4_planes)
from nanovllm_tpu.ops.quant import qmm, quantize_weight


@pytest.mark.parametrize("t,k,n", [(8, 256, 384), (64, 1024, 512),
                                   (130, 512, 1030)])
def test_qmm_int4_planes_matches_dequant_reference(t, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qw = quantize_weight(w, bits=4, pack=True, layout="planes")
    assert qw["q4p"].shape == (k // 8, n) and qw["q4p"].dtype == jnp.int32

    out = qmm_int4_planes(x, qw["q4p"], qw["s"], interpret=True)

    unpacked = quantize_weight(w, bits=4, pack=False)
    ref = (x @ unpacked["q"].astype(jnp.float32)) * unpacked["s"][0]
    # The rank-1 bias correction reorders the fp32 summation slightly.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=5e-4)


def test_pack_planes_roundtrip():
    """Nibble j of lane (r, n) holds row j*K/8 + r, biased +8."""
    rng = np.random.default_rng(3)
    q = np.asarray(rng.integers(-7, 8, (64, 128)), np.int8)
    p = np.asarray(pack_planes_int4(jnp.asarray(q)))
    assert p.shape == (8, 128) and p.dtype == np.int32
    for j in range(8):
        plane = ((p >> (4 * j)) & 15) - 8
        np.testing.assert_array_equal(plane, q[j * 8:(j + 1) * 8])


@pytest.mark.parametrize("t,k,n", [(8, 256, 384), (64, 1024, 512),
                                   (130, 512, 1030)])
def test_qmm_int4_matches_dequant_reference(t, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((t, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    qw = quantize_weight(w, bits=4, pack=True, layout="rows")
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
    qw = quantize_weight(w, bits=4, pack=True, layout="rows")
    y = qmm(x, qw)
    assert y.dtype == jnp.bfloat16
    y32 = qmm(x, qw, preferred=jnp.float32)
    assert y32.dtype == jnp.float32
