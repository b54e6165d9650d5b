"""Probe the ragged prefill kernel's real on-device time (usage:
python tools/probe_prefill.py [T] [nseqs]). Times N independent dispatches
back-to-back with one final block, so per-dispatch tunnel latency pipelines
away; compares against a chained-scan variant to expose scan-copy artifacts.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np
from nanovllm_tpu.ops.attention_pallas import ragged_prefill_attention
from nanovllm_tpu.ops.kv_cache import (create_kv_cache, SCALE_DTYPE,
                                       scale_rows_per_page)

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
NSEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 1
hq, hkv, d, ps = 16, 8, 128, 128
tq = int(os.environ.get("TQ", 128))
per = T // NSEQ
pps = -(-per // ps)
num_pages = int(os.environ.get("PAGES", NSEQ * pps + 1))
num_layers = int(os.environ.get("LAYERS", 1))
layer_i = int(os.environ.get("LI", 0))
num_slots = num_pages * ps
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (T, hq, d), jnp.bfloat16)
dtype = jnp.int8 if os.environ.get("KV", "bf16") == "int8" else jnp.bfloat16
cache = create_kv_cache(num_layers, hkv, num_pages, ps, d, dtype)
tables = jnp.arange(1, NSEQ * pps + 1, dtype=jnp.int32).reshape(NSEQ, pps)
ctxs = jnp.full((NSEQ,), per, jnp.int32)
nt = T // tq
tile_seq = jnp.repeat(jnp.arange(NSEQ, dtype=jnp.int32), per // tq)
tile_pos0 = jnp.tile(jnp.arange(per // tq, dtype=jnp.int32) * tq, NSEQ)
k_rows = jnp.zeros((T, hkv * d), dtype)
kv_scales = (jnp.ones((T // ps * scale_rows_per_page(hkv), ps), SCALE_DTYPE)
             if dtype == jnp.int8 else jnp.ones((1, 1), SCALE_DTYPE))
interp = jax.devices()[0].platform == "cpu"

def run(qq, data, scales):
    return ragged_prefill_attention(
        qq, k_rows, k_rows, kv_scales, data, scales, layer_i, tile_seq, tile_pos0,
        ctxs, tables, scale=d ** -0.5, page_size=ps, num_slots=num_slots,
        num_layers=num_layers, q_tile=tq, interpret=interp)

print(f"device={jax.devices()[0]} T={T} nseq={NSEQ} kv={dtype.__name__}")
data, scales = cache["data"], cache["scales"]
o, data, scales = run(q, data, scales)
np.asarray(o[:1, 0, 0])  # block_until_ready is a NO-OP through the tunnel
# back-to-back async dispatches: per-dispatch time = slope
for iters in (4, 16):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o, data, scales = run(q, data, scales)
        np.asarray(o[:1, 0, 0])
        best = min(best, time.perf_counter() - t0)
    print(f"iters={iters:<3d} total={best*1e3:8.2f} ms  "
          f"per={best/iters*1e3:8.3f} ms")

if os.environ.get("SCAN"):
    import functools
    from jax import lax
    L = num_layers

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def scan_run(qq, data, scales):
        def body(carry, li):
            data, scales = carry
            o, data, scales = ragged_prefill_attention(
                qq, k_rows, k_rows, kv_scales, data, scales, li, tile_seq,
                tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=ps,
                num_slots=num_slots, num_layers=L, q_tile=tq,
                interpret=interp)
            return (data, scales), o[0, 0, 0]
        (data, scales), os_ = lax.scan(body, (data, scales),
                                       jnp.arange(L, dtype=jnp.int32))
        return os_, data, scales

    o, data, scales = scan_run(q, data, scales)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o, data, scales = scan_run(q, data, scales)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(f"scan({L} layers): {best*1e3:.2f} ms total, "
          f"{best/L*1e3:.3f} ms/layer")

if os.environ.get("TRACEDLI"):
    import functools

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def run_li(qq, li, data, scales):
        return ragged_prefill_attention(
            qq, k_rows, k_rows, kv_scales, data, scales, li, tile_seq,
            tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=ps,
            num_slots=num_slots, num_layers=num_layers, q_tile=tq,
            interpret=interp)

    li_arr = jnp.asarray(layer_i, jnp.int32)
    o, data, scales = run_li(q, li_arr, data, scales)
    jax.block_until_ready(o)
    for iters in (4, 16):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o, data, scales = run_li(q, li_arr, data, scales)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        print(f"tracedli iters={iters:<3d} per={best/iters*1e3:8.3f} ms")

if os.environ.get("SCANC"):
    import functools
    from jax import lax
    L = num_layers

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def scan_c(qq, data, scales):
        def body(carry, li):
            data, scales = carry
            o, data, scales = ragged_prefill_attention(
                qq, k_rows, k_rows, kv_scales, data, scales, 0, tile_seq,
                tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=ps,
                num_slots=num_slots, num_layers=L, q_tile=tq,
                interpret=interp)
            return (data, scales), o[0, 0, 0]
        (data, scales), os_ = lax.scan(body, (data, scales),
                                       jnp.arange(L, dtype=jnp.int32))
        return os_, data, scales

    o, data, scales = scan_c(q, data, scales)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        o, data, scales = scan_c(q, data, scales)
        jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    print(f"scan-const-li({L} layers): {best*1e3:.2f} ms total, "
          f"{best/L*1e3:.3f} ms/layer")

if os.environ.get("DONATE"):
    import functools

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def run_don(qq, data, scales):
        return ragged_prefill_attention(
            qq, k_rows, k_rows, kv_scales, data, scales, 0, tile_seq,
            tile_pos0, ctxs, tables, scale=d ** -0.5, page_size=ps,
            num_slots=num_slots, num_layers=num_layers, q_tile=tq,
            interpret=interp)

    o, data, scales = run_don(q, data, scales)
    jax.block_until_ready(o)
    for iters in (4, 16):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                o, data, scales = run_don(q, data, scales)
            jax.block_until_ready(o)
            best = min(best, time.perf_counter() - t0)
        print(f"donate iters={iters:<3d} per={best/iters*1e3:8.3f} ms")
