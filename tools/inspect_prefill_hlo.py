"""AOT-compile the production prefill step against a v5e topology and
categorize the scheduled HLO: how many bytes of copy/transpose/fusion glue
surround the 28 per-layer Pallas attention calls (the ~24 ms/step of
non-kernel, non-quantize attention-package time the round-5 bisect left
unexplained: full 118.6 ms, noattn 74.4, noquant 116.7, standalone kernel
~0.66 ms x 28).

CPU-only (topology compile, never touches the tunnel).
Usage: python tools/inspect_prefill_hlo.py [kv_dtype]
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import topologies
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bench import QWEN3_0_6B
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.batch import BatchMeta, build_prefill_meta
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.ops.kv_cache import create_kv_cache
from nanovllm_tpu.parallel.sharding import kv_cache_sharding, param_shardings
from nanovllm_tpu.utils.loader import init_random_params

KVD = sys.argv[1] if len(sys.argv) > 1 else "int8"

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x4")
mesh = Mesh(np.array(topo.devices[:1]).reshape(1), ("tp",))
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             kv_cache_dtype=KVD, quant="none", max_num_seqs=64,
             kvcache_block_size=128, num_kvcache_blocks=400)

r = ModelRunner.__new__(ModelRunner)
r.config, r.mc, r.mesh = cfg, cfg.model_config, mesh
r.dtype = jnp.bfloat16
r.kv_dtype = {"int8": jnp.int8, "int4": jnp.int8,
              "bfloat16": jnp.bfloat16}[KVD]
r.kv_bits = 4 if KVD == "int4" else 8
r._step_fns = {}
r._rep = NamedSharding(mesh, P())
r.num_slots = 400 * 128

shard = lambda tree, sh: jax.tree.map(
    lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s), tree, sh)
params_abs = jax.eval_shape(lambda: init_random_params(r.mc, jnp.bfloat16, 0))
params_abs = shard(params_abs, param_shardings(mesh, params_abs))
cache_abs = jax.eval_shape(lambda: create_kv_cache(
    r.mc.num_hidden_layers, r.mc.num_key_value_heads, 400, 128,
    r.mc.head_dim, r.kv_dtype, kv_bits=r.kv_bits if r.kv_bits == 4 else 0))
cache_abs = shard(cache_abs, kv_cache_sharding(mesh))
key = (True, 8192, 8, 8192, cfg.pages_per_seq, 1, False)
raw = build_prefill_meta([], 8192, 8, 128, cfg.pages_per_seq, r.num_slots,
                         q_tile=128)
meta_abs = jax.tree.map(
    lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                   np.asarray(x).dtype,
                                   sharding=NamedSharding(mesh, P())),
    BatchMeta(**raw))
rng_abs = jax.ShapeDtypeStruct((2,), np.uint32,
                               sharding=NamedSharding(mesh, P()))
fn = r._get_step_fn(key)
compiled = fn.lower(params_abs, cache_abs, meta_abs, rng_abs).compile()
hlo = compiled.as_text()
print(f"HLO length: {len(hlo)} chars")

DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
      "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}
shape_re = re.compile(r"(\w+)\[([\d,]*)\]")


def op_bytes(line):
    # shape(s) sit between "= " and the op name: "%x = bf16[8,16]{...} op(..."
    total = 0
    head = line.split("(", 1)[0]
    head = head.split("= ", 1)[1] if "= " in head else ""
    for dt, dims in shape_re.findall(head):
        if dt in DT:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DT[dt]
    return total


cats = {}
big = []
comp = None
for line in hlo.splitlines():
    s = line.strip()
    if s.endswith("{") and "= " not in s and (s.startswith("%") or
                                              "ENTRY" in s):
        comp = s.split()[0].lstrip("%").split("(")[0]
        continue
    s_nolayout = re.sub(r"\{[^{}]*\}", "", s)
    if "= " not in s_nolayout or "(" not in s_nolayout:
        continue
    head = s_nolayout.split("(", 1)[0]
    if not head.split():
        continue
    op = head.split()[-1]
    # the 28-layer scan body executes per layer: weight its ops
    mult = 28 if comp and ("while" in comp or "body" in comp) else 1
    b = op_bytes(s_nolayout) * mult
    c = cats.setdefault(op, [0, 0])
    c[0] += mult
    c[1] += b
    if op in ("copy", "transpose", "bitcast-convert", "reshape",
              "custom-call") and b >= 8 << 20:
        big.append((b, op, s[:160]))

print("\n== op category totals (count, output GiB) ==")
for op, (n, b) in sorted(cats.items(), key=lambda kv: -kv[1][1])[:20]:
    print(f"{op:24s} n={n:5d}  out={b/2**30:8.3f} GiB")

print("\n== large copies/transposes/custom-calls (>=8 MiB out) ==")
for b, op, s in sorted(big, reverse=True)[:25]:
    print(f"{b/2**20:9.1f} MiB  {op:14s} {s}")
