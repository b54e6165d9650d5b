"""Decode kernel on an all-pad batch (context_lens=0, slots=num_slots) —
the warmup ladder's input. Fetches with np.asarray (block_until_ready is a
no-op under the IFRT proxy). Usage: probe_decode_pad.py [bs] [pad|real]"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from nanovllm_tpu.ops.attention_pallas import paged_decode_attention
from nanovllm_tpu.ops.kv_cache import create_kv_cache, quantize_kv_rows

BS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
real = len(sys.argv) > 2 and sys.argv[2] == "real"
HQ, HKV, D, PS, L, PK = 16, 8, 128, 128, 1, 16
PAGES = max(300, BS + PK)  # distinct page per sequence in the "real" path
NUM_SLOTS = PAGES * PS

cache = jax.device_put(create_kv_cache(L, HKV, PAGES, PS, D, jnp.int8))
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((BS, HQ, D)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((BS, HKV, D)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((BS, HKV, D)), jnp.bfloat16)
k_rows, v_rows, kv_scales = quantize_kv_rows(k, v, 8)

if real:
    ctx = jnp.full(BS, 64, jnp.int32)
    # Sequence i owns pages [i, i+PK): page i matches its write slot below,
    # like a real dispatched batch (each sequence reads the page it writes).
    bt = (jnp.arange(PK, dtype=jnp.int32)[None, :]
          + jnp.arange(BS, dtype=jnp.int32)[:, None]) % PAGES
    slots = jnp.arange(BS, dtype=jnp.int32) * PS + 63
else:
    ctx = jnp.zeros(BS, jnp.int32)
    bt = jnp.zeros((BS, PK), jnp.int32)
    slots = jnp.full(BS, NUM_SLOTS, jnp.int32)

print(f"dispatch decode: bs={BS} real={real}", flush=True)
t0 = time.time()
out, data, scales = paged_decode_attention(
    q, k_rows, v_rows, kv_scales, cache["data"], cache["scales"],
    jnp.int32(0), ctx, bt, slots,
    scale=D ** -0.5, page_size=PS, num_slots=NUM_SLOTS, num_layers=L,
    kv_bits=8)
val = float(np.abs(np.asarray(out)).mean())
print(f"decode ok in {time.time()-t0:.1f}s |out|={val:.4f}", flush=True)
