"""Drive ragged_prefill_attention standalone with a multi-seq meta (the
shape ModelRunner dispatches) to isolate a device-side kernel hang.

Usage: python tools/probe_prefill_kernel.py [nseq] [len] [layers]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nanovllm_tpu.engine.batch import build_prefill_meta
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.ops.attention_pallas import ragged_prefill_attention
from nanovllm_tpu.ops.kv_cache import create_kv_cache, quantize_kv_blocks
from nanovllm_tpu.sampling_params import SamplingParams

NSEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 8
LEN = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
L = int(sys.argv[3]) if len(sys.argv) > 3 else 1
HQ, HKV, D, PS, TQ = 16, 8, 128, 128, 128
T = ((NSEQ * LEN + TQ - 1) // TQ) * TQ
T = max(T, 128)
PAGES = 1666

bm = BlockManager(PAGES, PS)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True), block_size=PS)
        for _ in range(NSEQ)]
for s in seqs:
    bm.allocate(s)
raw = build_prefill_meta(seqs, T, NSEQ, PS, 16, PAGES * PS, q_tile=TQ)

cache = create_kv_cache(L, HKV, PAGES, PS, D, jnp.int8)
cache = jax.device_put(cache)
q = jnp.asarray(rng.standard_normal((T, HQ, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((T, HKV, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((T, HKV, D)), jnp.bfloat16)
k_rows, v_rows, kv_scales = quantize_kv_blocks(k, v, PS, HKV, 8)
jax.block_until_ready((cache, q, k_rows))
donate = os.environ.get("NVT_DONATE", "0") == "1"
print(f"dispatch kernel: T={T} nseq={NSEQ} len={LEN} donate={donate}",
      flush=True)


def call(q, data, scales, kr, vr, ks, ts, tp, cl, bt):
    return ragged_prefill_attention(
        q, kr, vr, ks, data, scales, jnp.int32(0), ts, tp, cl, bt,
        scale=D ** -0.5, page_size=PS, num_slots=PAGES * PS, num_layers=L,
        q_tile=TQ)


fn = jax.jit(call, donate_argnums=(1, 2) if donate else (),
             static_argnames=())
t0 = time.time()
out, data, scales = fn(
    q, cache["data"], cache["scales"], k_rows, v_rows, kv_scales,
    jnp.asarray(raw["tile_seq"]), jnp.asarray(raw["tile_pos0"]),
    jnp.asarray(raw["context_lens"]), jnp.asarray(raw["block_tables"]))
jax.block_until_ready(out)
print(f"kernel ok in {time.time()-t0:.1f}s  |out|={float(jnp.abs(out).mean()):.4f}",
      flush=True)
