"""Attention kernel micro-benchmark + crossover finder.

Reference equivalents: benchmark_prefilling.py (PyTorch vs naive vs flash
Triton prefill timing with crossover search) and Pytorch_SDPA_Backend.py
(backend micro-comparison). Here: XLA dense reference vs Pallas ragged
prefill across sequence lengths, and Pallas paged decode vs XLA dense gather
across batch x context, on whatever accelerator jax sees.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.ops.attention_pallas import (paged_decode_attention,
                                               ragged_prefill_attention)
from nanovllm_tpu.ops.kv_cache import create_kv_cache, write_kv


def timeit_chained(fn, q, *args, iters=20, **kw):
    """Time `iters` kernel invocations chained INSIDE one jitted lax.scan
    (each iteration's output feeds the next call's q), so device work
    serializes on-device and the per-dispatch tunnel round-trip (~55 ms)
    amortizes over the whole chain. Returns seconds per invocation."""
    import jax
    from jax import lax

    @jax.jit
    def chain(x):
        def body(c, _):
            o = fn(c, *args, **kw)
            return o.astype(c.dtype), ()
        y, _ = lax.scan(body, x, length=iters)
        return y

    np.asarray(chain(q))[0, 0, 0]  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(q))[0, 0, 0]
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_decode(bs, ctx, hq=16, hkv=8, d=128, page_size=128,
                 dtype=jnp.bfloat16, page_order="rand", int8_dots=False,
                 ppc=0, spare_pages=0, kv_bits=8, planes_dots=True,
                 pages_per_seq=0):
    """pages_per_seq widens the block table past ceil(ctx/ps) — the ENGINE
    dispatches with the full max_model_len-wide table (e.g. 32 pages at
    4096/128), which changes the auto chunk balancing; pass it to mirror a
    production shape exactly."""
    pps = max(-(-ctx // page_size), pages_per_seq)
    num_pages = bs * pps + 1 + spare_pages
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (bs, hq, d), jnp.bfloat16)
    cache = create_kv_cache(1, hkv, num_pages, page_size, d, dtype,
                            kv_bits=kv_bits if kv_bits == 4 else 0)
    rng = np.random.default_rng(0)
    if page_order == "seq":
        # The engine's prefill allocation: a sequence's pages contiguous.
        perm = (np.arange(pps)[None, :] + np.arange(bs)[:, None] * pps)
    elif page_order == "rr":
        # Decode growth: pages handed out one per seq per round.
        perm = np.arange(pps)[None, :] * bs + np.arange(bs)[:, None]
    else:
        perm = rng.permutation(num_pages - 1)[: bs * pps].reshape(bs, pps)
    tables = jnp.asarray(perm.astype(np.int32) + 1)
    ctxs = jnp.full((bs,), ctx, jnp.int32)
    k = jax.random.normal(key, (bs, hkv, d), jnp.bfloat16)
    # The step's new rows land at slot = last token; measured the way the
    # product path runs it (XLA row scatter + read-only kernel).
    last = ctx - 1
    step_slots = jnp.asarray(
        np.asarray(tables)[:, last // page_size] * page_size
        + last % page_size)
    interp = jax.devices()[0].platform == "cpu"

    # Back-to-back DONATED dispatches, per-iteration time = slope between two
    # iteration counts (the bench_prefill method). A lax.scan chain with the
    # cache threaded through the carry looked equivalent but XLA double-
    # buffers scan carries: every iteration paid a full hidden cache copy —
    # the --spare-pages detector measured the kernel at 310 GB/s when it
    # actually runs at ~780 GB/s (~95% of v5e HBM). Donation across separate
    # dispatches aliases for real; the data dependency through the cache
    # serializes iterations, and only the final block_until_ready syncs, so
    # the tunnel's per-dispatch round trip pipelines away.
    import functools as _ft

    from nanovllm_tpu.ops.kv_cache import quantize_kv_rows

    if dtype == jnp.int8:
        kq, vq, cols = quantize_kv_rows(q[:, :hkv, :], q[:, :hkv, :],
                                        kv_bits)
    else:
        kq = q[:, :hkv, :].reshape(bs, hkv * d).astype(dtype)
        vq = kq
        cols = jnp.ones((bs, 1), jnp.float32)

    @_ft.partial(jax.jit, donate_argnums=(1, 2))
    def run(qq, data, scales):
        o, data, scales = paged_decode_attention(
            qq, kq, vq, cols,
            data, scales, 0, ctxs, tables, step_slots,
            scale=d ** -0.5, page_size=page_size, num_slots=num_slots,
            num_layers=1, int8_dots=int8_dots, pages_per_chunk=ppc,
            kv_bits=kv_bits, planes_dots=planes_dots,
            interpret=interp)
        return o, data, scales

    data, scales = cache["data"], cache["scales"]
    o, data, scales = run(q, data, scales)  # compile + warmup
    jax.block_until_ready(o)
    times = {}
    for iters in (8, 32):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o, data, scales = run(q, data, scales)
            jax.block_until_ready((o, data, scales))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    dt = (times[32] - times[8]) / 24  # dispatch-overhead-free slope
    per_el = 0.5 if kv_bits == 4 else data.dtype.itemsize
    kv_bytes = int(2 * bs * ctx * hkv * d * per_el)
    return dt, kv_bytes / dt / 1e9


def bench_prefill(t, hq=16, hkv=8, d=128, page_size=128, q_tile=128,
                  dtype=jnp.bfloat16):
    pps = -(-t // page_size)
    num_pages = pps + 1
    num_slots = num_pages * page_size
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (t, hq, d), dtype)
    cache = create_kv_cache(1, hkv, num_pages, page_size, d, dtype)
    tables = jnp.arange(1, pps + 1, dtype=jnp.int32)[None, :]
    ctxs = jnp.full((1,), t, jnp.int32)
    nt = t // q_tile
    tile_seq = jnp.zeros(nt, jnp.int32)
    tile_pos0 = jnp.arange(nt, dtype=jnp.int32) * q_tile
    interp = jax.devices()[0].platform == "cpu"

    from nanovllm_tpu.ops.kv_cache import SCALE_DTYPE, scale_rows_per_page
    k_rows = jnp.zeros((t, hkv * d), dtype)
    rpp = scale_rows_per_page(hkv)
    kv_scales = (jnp.ones((t // page_size * rpp, page_size), SCALE_DTYPE)
                 if dtype == jnp.int8 else jnp.ones((1, 1), SCALE_DTYPE))

    # Back-to-back donated dispatches (per-iteration time = slope between
    # iteration counts): the cache must be DONATED for the aliased
    # write-through to be real — a chained-scan variant with the cache
    # captured as a constant measured 30x slower because XLA materializes
    # a fresh (unaliased) output buffer per iteration.
    import functools as _ft

    @_ft.partial(jax.jit, donate_argnums=(1, 2))
    def run(qq, data, scales):
        return ragged_prefill_attention(
            qq, k_rows, k_rows, kv_scales, data, scales, 0, tile_seq,
            tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=page_size,
            num_slots=num_slots, num_layers=1, q_tile=q_tile,
            interpret=interp)

    data, scales = cache["data"], cache["scales"]
    o, data, scales = run(q, data, scales)
    jax.block_until_ready(o)
    times = {}
    for iters in (4, 16):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o, data, scales = run(q, data, scales)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    dt = (times[16] - times[4]) / 12  # dispatch-overhead-free slope
    flops = 2 * 2 * hq * d * t * t / 2  # causal QK^T + PV
    return dt, flops / dt / 1e12


def bench_qmm(t, k, n, mode):
    """Weight-matmul micro-bench: XLA bf16 / XLA int8-dequant / Pallas
    int4-packed. Returns (sec/call, weight GB/s) — the weight read is the
    traffic that matters in low-batch decode."""
    from nanovllm_tpu.ops.quant import qmm, quantize_weight
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (t, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.float32)
    if mode == "bf16":
        wq = w.astype(jnp.bfloat16)
        wbytes = k * n * 2
    elif mode == "int8":
        wq = quantize_weight(w, bits=8)
        wbytes = k * n
    elif mode == "int4r":  # row-block packing (int8 pairs)
        wq = quantize_weight(w, bits=4, pack=True, layout="rows")
        wbytes = k * n // 2
    else:  # int4: int32 nibble planes (the default serving layout)
        wq = quantize_weight(w, bits=4, pack=True, layout="planes")
        wbytes = k * n // 2

    # Chain via a projection back to x's shape so iterations serialize.
    from jax import lax

    @jax.jit
    def chain(xx):
        def body(c, _):
            y = qmm(c, wq)
            # fold back to [t, k] so the next call consumes it
            return y[:, :k].astype(c.dtype), ()
        y, _ = lax.scan(body, xx, length=20)
        return y

    assert n >= k, "chain trick needs n >= k"
    np.asarray(chain(x))[0, 0]
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chain(x))[0, 0]
        best = min(best, time.perf_counter() - t0)
    dt = best / 20
    return dt, wbytes / dt / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--decode-bs", nargs="+", type=int, default=[16, 64, 256])
    p.add_argument("--hq", type=int, default=16)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--decode-ctx", nargs="+", type=int, default=[512, 2048])
    p.add_argument("--prefill-len", nargs="+", type=int,
                   default=[512, 2048, 8192])
    p.add_argument("--kv-dtype", default="bfloat16",
                   choices=["bfloat16", "int8", "int4"])
    p.add_argument("--page-size", nargs="+", type=int, default=[128])
    p.add_argument("--page-order", default="rand",
                   choices=["rand", "seq", "rr"])
    p.add_argument("--int8-dots", action="store_true")
    p.add_argument("--ppc", type=int, default=0)
    p.add_argument("--int4-concat", action="store_true",
                   help="INT4 concat-then-one-dot chunk form (A/B vs the "
                        "default per-plane dots)")
    p.add_argument("--pages-per-seq", type=int, default=0,
                   help="block-table width override (engine shapes use "
                        "max_model_len/page_size, wider than ceil(ctx/ps))")
    p.add_argument("--spare-pages", type=int, default=0,
                   help="extra never-read pages: detects per-iteration cache "
                        "copies in the timing harness (time must not grow)")
    p.add_argument("--skip-prefill", action="store_true")
    p.add_argument("--qmm", action="store_true",
                   help="weight-matmul micro-bench (bf16 / int8 / int4)")
    args = p.parse_args()
    print(f"device: {jax.devices()[0]}")
    if args.qmm:
        print("\n== weight matmul (x[t,k] @ w[k,n]) ==")
        for t in (8, 64, 256):
            for mode in ("bf16", "int8", "int4", "int4r"):
                dt, gbps = bench_qmm(t, 1024, 3072, mode)
                print(f"t={t:<4d} k=1024 n=3072 {mode:<5s} "
                      f"{dt*1e6:9.1f} us  {gbps:7.1f} GB/s weight-read",
                      flush=True)
        return
    import jax.numpy as _jnp
    kv_dtype = _jnp.bfloat16 if args.kv_dtype == "bfloat16" else _jnp.int8
    kv_bits = 4 if args.kv_dtype == "int4" else 8
    print(f"\n== paged decode kernel ({args.kv_dtype} KV) ==")
    for page in args.page_size:
        for bs in args.decode_bs:
            for ctx in args.decode_ctx:
                dt, gbps = bench_decode(bs, ctx, hq=args.hq,
                                        hkv=args.hkv, page_size=page,
                                        dtype=kv_dtype,
                                        page_order=args.page_order,
                                        int8_dots=args.int8_dots,
                                        ppc=args.ppc,
                                        spare_pages=args.spare_pages,
                                        kv_bits=kv_bits,
                                        planes_dots=not args.int4_concat,
                                        pages_per_seq=args.pages_per_seq)
                print(f"page={page:<4d} bs={bs:<4d} ctx={ctx:<6d} "
                      f"{dt*1e6:9.1f} us  {gbps:7.1f} GB/s KV-read",
                      flush=True)
    if args.skip_prefill:
        return
    print("\n== ragged prefill kernel (1 seq) ==")
    for t in args.prefill_len:
        dt, tflops = bench_prefill(t, hq=args.hq, hkv=args.hkv)
        print(f"T={t:<6d} {dt*1e3:9.2f} ms  {tflops:6.2f} TFLOP/s attention")


if __name__ == "__main__":
    main()
