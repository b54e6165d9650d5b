"""Pure-DMA ceiling probe for the paged decode access pattern.

Streams the same [2*page_size, Hkv*D] page blocks the decode kernel reads
(block-table indirection, NBUF-deep pipelining across the whole batch's
chunks) but does NO attention math — just a checksum add per chunk so
nothing elides. The measured GB/s is the hardware ceiling for this DMA
pattern at that depth; the decode kernel's gap to it is compute/overlap
loss.

Usage: python tools/probe_dma_ceiling.py [bs] [ctx] [page_size] [mode] [nbuf] [ppc] [order]
  mode: dma (checksum only) | dots (DMA + decode-shaped dots, no softmax)
  order: rand (default) | seq (block tables in allocation order — the real
         engine's common case: pages per seq are近-sequential)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(bs, pages_per_seq, page_size, hkv, d, dtype, ppc, mode, nbuf):
    chunk = ppc * page_size
    rows = 2 * page_size
    cps = pages_per_seq // ppc          # chunks per seq (uniform ctx)
    total = bs * cps

    def kernel(ctx_ref, bt_ref, q_ref, data_ref, o_ref, kv_buf, sems, gctr):
        si = pl.program_id(0)

        def start(g):
            sj, cj = lax.div(g, cps), lax.rem(g, cps)
            slot = lax.rem(g, nbuf)
            for i in range(ppc):
                page = bt_ref[sj, cj * ppc + i]
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(page * rows, rows)],
                    kv_buf.at[slot, pl.ds(i * rows, rows)],
                    sems.at[slot]).start()

        @pl.when(si == 0)
        def _():
            gctr[0] = 0
            for g in range(min(nbuf, total)):
                start(g)

        q = q_ref[0].astype(jnp.bfloat16)  # [16, Hkv*D]

        def body(ci, carry):
            gi = gctr[0]
            slot = lax.rem(gi, nbuf)
            for i in range(ppc):
                pltpu.make_async_copy(
                    data_ref.at[pl.ds(i * rows, rows)],
                    kv_buf.at[slot, pl.ds(i * rows, rows)],
                    sems.at[slot]).wait()
            buf = kv_buf[slot]
            if mode == "dma":
                carry = carry + sum(
                    jnp.sum(buf[i * rows:i * rows + 8].astype(jnp.float32))
                    for i in range(ppc))
            else:
                for i in range(ppc):
                    kp = buf[i * rows:i * rows + page_size]
                    vp = buf[i * rows + page_size:(i + 1) * rows]
                    s = lax.dot_general(q, kp.astype(jnp.bfloat16),
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    o = lax.dot_general(s.astype(jnp.bfloat16),
                                        vp.astype(jnp.bfloat16),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                    carry = carry + jnp.sum(o)

            @pl.when(gi + nbuf < total)
            def _():
                start(gi + nbuf)
            gctr[0] = gi + 1
            return carry

        tot = lax.fori_loop(0, cps, body, jnp.zeros((), jnp.float32))
        o_ref[0] = jnp.full((8, 128), tot, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, 16, hkv * d), lambda si, *_: (si, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda si, *_: (si, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, ppc * rows, hkv * d), dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    iters = 50

    # Chain iterations inside one jitted scan (output feeds next q) so the
    # axon tunnel's per-dispatch round trip amortizes to noise.
    @jax.jit
    def run(ctx, bt, q, data):
        def body(c, _):
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((bs, 8, 128), jnp.float32),
                grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(ctx, bt, c, data)
            return (c * 0.5 + jnp.tile(o, (1, 2, 8)).astype(c.dtype)
                    * jnp.asarray(1e-9, c.dtype)).astype(c.dtype), ()
        y, _ = jax.lax.scan(body, q, length=iters)
        return y

    return run, iters


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    page_size = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    mode = sys.argv[4] if len(sys.argv) > 4 else "dma"
    nbuf = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    ppc = (int(sys.argv[6]) if len(sys.argv) > 6
           else max(1, 256 // page_size))
    hkv, d = 8, 128
    dtype = jnp.int8
    pages_per_seq = ctx // page_size
    num_pages = bs * pages_per_seq + 1

    order = sys.argv[7] if len(sys.argv) > 7 else "rand"
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(-127, 127,
                                    (num_pages * 2 * page_size, hkv * d)),
                       jnp.int8)
    if order == "seq":
        # Prefill allocation: a sequence's pages are contiguous.
        perm = (np.arange(pages_per_seq)[None, :]
                + np.arange(bs)[:, None] * pages_per_seq)
    elif order == "rr":
        # Decode growth: one page per seq per round — seq i's page p at
        # p * bs + i (stride bs pages between a seq's consecutive pages).
        perm = (np.arange(pages_per_seq)[None, :] * bs
                + np.arange(bs)[:, None])
    else:
        perm = rng.permutation(bs * pages_per_seq).reshape(bs, pages_per_seq)
    bt = jnp.asarray(perm, jnp.int32)
    ctx_arr = jnp.full((bs,), ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(bs, 16, hkv * d)), jnp.bfloat16)

    run, iters = make_probe(bs, pages_per_seq, page_size, hkv, d, dtype,
                            ppc, mode, nbuf)
    np.asarray(run(ctx_arr, bt, q, data))[0, 0, 0]  # compile + warmup
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(run(ctx_arr, bt, q, data))[0, 0, 0]
        best = min(best, time.perf_counter() - t0)
    best /= iters
    nbytes = bs * pages_per_seq * 2 * page_size * hkv * d
    print(f"mode={mode} bs={bs} ctx={ctx} page={page_size} nbuf={nbuf} "
          f"ppc={ppc}: {best*1e6:.1f} us, {nbytes/best/1e9:.1f} GB/s")


if __name__ == "__main__":
    main()
