"""Pallas INT4 weight-only matmul: dequant fused in VMEM tiles.

Why a kernel instead of `jnp.matmul(x, w4.astype(bf16))`: this TPU runtime
cannot hold `jnp.int4` arrays as jit arguments at all (argument relayout to
the executable's S4 tiled layout recurses inside device_put — measured on
the v5e tunnel), and an XLA-level nibble unpack would materialize the wide
weights in HBM, forfeiting the very bandwidth the 4-bit storage buys. Here
the packed bytes stream HBM→VMEM and are unpacked on the VPU right before
the MXU dot, so weight HBM traffic is truly halved vs INT8 — the regime that
dominates low-batch decode (reference grid rows bs<=8, BASELINE.md).

Packing (row-block): W int4 [K, N] is stored as int8 [K//2, N] where byte
(r, n) holds W[r, n] in the LOW nibble and W[r + K//2, n] in the HIGH
nibble. Unpacking is two int32 shifts per tile — no lane interleaving (which
Mosaic cannot do cheaply) — and the matmul splits into two MXU dots:

    y = x[:, :K//2] @ lo + x[:, K//2:] @ hi

Nibble arithmetic runs in int32 (Mosaic has no int8 vector shifts, same
constraint as the old head-pair KV unpack). Per-output-channel scales multiply
the fp32 accumulator (mathematically identical to scaling the weights).

Grid: (n_tiles, t_tiles), t fastest — consecutive t steps keep the same
weight block resident in VMEM, so weights are read from HBM once per n tile
regardless of how many query-token tiles stream through (prefill T can be
8k+ while W is the big operand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pack_rows_int4(q):
    """q: int8 [..., K, N] in [-7, 7] -> packed int8 [..., K//2, N].
    Row r of the packed form holds original rows r (low nibble) and
    r + K//2 (high nibble)."""
    k = q.shape[-2]
    assert k % 2 == 0
    lo = q[..., : k // 2, :].astype(jnp.int32)
    hi = q[..., k // 2:, :].astype(jnp.int32)
    return jnp.bitwise_or(jnp.bitwise_and(lo, 15),
                          jnp.left_shift(hi, 4)).astype(jnp.int8)


def pack_planes_int4(q):
    """q: int8 [..., K, N] in [-8, 7] -> int32 [..., K//8, N] holding 8
    bias-8 nibbles per int32 lane.

    Plane j (nibble j, bits [4j, 4j+4)) stores the CONTIGUOUS row block
    [j*K/8, (j+1)*K/8), so the kernel's per-plane dot consumes a plain
    static slice of x. Values are stored biased (+8, so in [0, 15]): the
    kernel extracts with one shift + one mask per plane — no sign-extension
    chain — and removes the bias with a single rank-1 correction
    (-8 * rowsum(x)) after all eight dots. Weight bytes = K*N/2: exactly
    half the INT8 form's HBM traffic, same as the row-block packing, but
    extracted straight from int32 lanes (the native VMEM register width)
    instead of via an int8->int32 widening relayout."""
    k = q.shape[-2]
    assert k % 8 == 0, f"K={k} must be divisible by 8 for plane packing"
    kb = k // 8
    u = (q.astype(jnp.int32) + 8)
    out = jnp.zeros((*q.shape[:-2], kb, q.shape[-1]), jnp.int32)
    for j in range(8):
        out = jnp.bitwise_or(
            out, jnp.left_shift(u[..., j * kb:(j + 1) * kb, :], 4 * j))
    return out


def _planes_kernel(x_ref, w_ref, s_ref, o_ref, *, kb: int):
    v = w_ref[:]  # int32 [kb, tn], 8 biased nibbles per lane
    x = x_ref[:]
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for j in range(8):
        u = jnp.bitwise_and(jnp.right_shift(v, 4 * j), 15)
        acc = acc + jnp.dot(x[:, j * kb:(j + 1) * kb], u.astype(x.dtype),
                            preferred_element_type=jnp.float32)
    # Bias-8 removal for all planes at once: sum_j x_j @ (u_j - 8)
    #   = sum_j x_j @ u_j - 8 * rowsum(x).
    acc = acc - 8.0 * jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def qmm_int4_planes(x, planes, scales, out_dtype=None,
                    interpret: bool | None = None):
    """x: [T, K]; planes: int32 [K//8, N] (pack_planes_int4); scales: f32
    [1, N]. Same contract as qmm_int4, different storage layout."""
    t, k = x.shape
    kb, n = planes.shape
    assert k == 8 * kb, (x.shape, planes.shape)
    out_dtype = out_dtype or jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tt = min(t, 256)
    tn = 512 if kb <= 1024 else 256
    tn = min(tn, n)
    grid = (cdiv(n, tn), cdiv(t, tt))
    return pl.pallas_call(
        functools.partial(_planes_kernel, kb=kb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, k), lambda ni, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, tn), lambda ni, ti: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, ti: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda ni, ti: (ti, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), out_dtype),
        interpret=interpret,
    )(x, planes, scales)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, k2: int):
    w = w_ref[:].astype(jnp.int32)
    # Low nibble sign-extended via shift-up/arithmetic-shift-down; high
    # nibble by plain arithmetic shift.
    lo = jnp.right_shift(jnp.left_shift(w, 28), 28)
    hi = jnp.right_shift(w, 4)
    x = x_ref[:]
    acc = jnp.dot(x[:, :k2], lo.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(x[:, k2:], hi.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def qmm_int4(x, packed, scales, out_dtype=None, interpret: bool | None = None):
    """x: [T, K] bf16/f32; packed: int8 [K//2, N] (pack_rows_int4);
    scales: f32 [1, N] per-output-channel. Returns [T, N] out_dtype
    (defaults to fp32 — the LM-head convention; cast at the call site for
    activations)."""
    t, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (x.shape, packed.shape)
    out_dtype = out_dtype or jnp.float32
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tt = min(t, 256)
    # Unpack intermediates are int32 [K//2, TN]; keep them inside VMEM even
    # for the 8B shapes (K=12288 -> k2*256*4 = 6 MiB).
    tn = 512 if k2 <= 2048 else 256
    tn = min(tn, n)
    grid = (cdiv(n, tn), cdiv(t, tt))
    return pl.pallas_call(
        functools.partial(_kernel, k2=k2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tt, k), lambda ni, ti: (ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, tn), lambda ni, ti: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda ni, ti: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tt, tn), lambda ni, ti: (ti, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, n), out_dtype),
        interpret=interpret,
    )(x, packed, scales)
