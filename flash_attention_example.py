"""Pedagogical flash-attention v1 vs v2 in pure jnp, cross-checked.

Reference: flash_attention_example.py (pure-PyTorch FA-v1 KV-outer loop vs
FA-v2 Q-outer loop compared by max-abs error — the reference repo's only
numerical test). Same teaching exercise, NumPy/JAX edition, plus a dense
softmax ground truth. `tests/test_flash_pedagogy.py` runs this in CI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def dense_attention(q, k, v, scale):
    s = (q @ k.T) * scale
    mask = np.tril(np.ones(s.shape, bool))
    s = np.where(mask, s, -np.inf)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return p @ v


def flash_attention_v1(q, k, v, scale, block_q=32, block_k=32):
    """FA-v1: OUTER loop over KV blocks, inner over Q blocks — every Q block's
    statistics are revisited for each KV block (more HBM traffic for o/m/l)."""
    n, d = q.shape
    o = np.zeros((n, d))
    m = np.full((n, 1), -np.inf)
    l = np.zeros((n, 1))
    for ks in range(0, n, block_k):
        kb = k[ks:ks + block_k]
        vb = v[ks:ks + block_k]
        for qs in range(0, n, block_q):
            qb = q[qs:qs + block_q]
            s = (qb @ kb.T) * scale
            qpos = np.arange(qs, qs + len(qb))[:, None]
            kpos = np.arange(ks, ks + len(kb))[None, :]
            s = np.where(kpos <= qpos, s, -np.inf)
            m_blk = s.max(-1, keepdims=True)
            p = np.exp(s - np.where(np.isinf(m_blk), 0, m_blk))
            p = np.where(np.isinf(m_blk), 0, p)
            l_blk = p.sum(-1, keepdims=True)
            m_old = m[qs:qs + block_q]
            m_new = np.maximum(m_old, m_blk)
            a_old = np.exp(np.where(np.isinf(m_old), -np.inf, m_old - m_new))
            a_old = np.where(np.isinf(m_old), 0, a_old)
            a_blk = np.exp(np.where(np.isinf(m_blk), -np.inf, m_blk - m_new))
            a_blk = np.where(np.isinf(m_blk), 0, a_blk)
            l_new = a_old * l[qs:qs + block_q] + a_blk * l_blk
            o[qs:qs + block_q] = (
                a_old * l[qs:qs + block_q] * o[qs:qs + block_q]
                + a_blk * (p @ vb)
            ) / np.maximum(l_new, 1e-20)
            m[qs:qs + block_q] = m_new
            l[qs:qs + block_q] = l_new
    return o


def flash_attention_v2(q, k, v, scale, block_q=32, block_k=32):
    """FA-v2: OUTER loop over Q blocks — each Q block's o/m/l stay resident
    while KV streams past (the structure of our Pallas kernels), with one
    deferred normalization at the end."""
    n, d = q.shape
    o = np.zeros((n, d))
    for qs in range(0, n, block_q):
        qb = q[qs:qs + block_q]
        m = np.full((len(qb), 1), -np.inf)
        l = np.zeros((len(qb), 1))
        acc = np.zeros((len(qb), d))
        for ks in range(0, qs + block_q, block_k):
            kb = k[ks:ks + block_k]
            vb = v[ks:ks + block_k]
            s = (qb @ kb.T) * scale
            qpos = np.arange(qs, qs + len(qb))[:, None]
            kpos = np.arange(ks, ks + len(kb))[None, :]
            s = np.where(kpos <= qpos, s, -np.inf)
            m_new = np.maximum(m, s.max(-1, keepdims=True))
            alpha = np.exp(m - m_new)
            alpha = np.where(np.isinf(m), 0, alpha)
            p = np.exp(s - m_new)
            l = alpha * l + p.sum(-1, keepdims=True)
            acc = alpha * acc + p @ vb
            m = m_new
        o[qs:qs + block_q] = acc / np.maximum(l, 1e-20)
    return o


def main():
    rng = np.random.default_rng(0)
    n, d = 256, 64
    q, k, v = (rng.standard_normal((n, d)) for _ in range(3))
    scale = d ** -0.5
    ref = dense_attention(q, k, v, scale)
    v1 = flash_attention_v1(q, k, v, scale)
    v2 = flash_attention_v2(q, k, v, scale)
    print("max |v1 - dense|:", np.abs(v1 - ref).max())
    print("max |v2 - dense|:", np.abs(v2 - ref).max())
    print("max |v1 - v2|  :", np.abs(v1 - v2).max())
    # And the real thing: our XLA-jitted dense vs numpy.
    jref = np.asarray(jax.jit(
        lambda a, b, c: jnp.einsum(
            "qk,kd->qd",
            jax.nn.softmax(jnp.where(
                jnp.tril(jnp.ones((n, n), bool)),
                (a @ b.T) * scale, -jnp.inf), axis=-1), c)
    )(q, k, v))
    print("max |jax - dense|:", np.abs(jref - ref).max())


if __name__ == "__main__":
    main()
