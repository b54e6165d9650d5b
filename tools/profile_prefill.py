"""Capture + parse an XLA profile of the production prefill step.

Answers VERDICT r4 item 5's question directly: where do the ~37 ms of
per-layer non-kernel time in a 0.6B 8x1024 prefill step live — quantize
ops, pallas-call overhead, scheduling gaps, or something else. Runs the
REAL ModelRunner prefill bucket under jax.profiler, then converts the
xplane with xprof and prints the per-op time table (top N) plus a
category rollup (fusion / pallas / convert / transpose / ...).

Usage: python tools/profile_prefill.py [out_dir] [nseq] [len]
"""
import glob
import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nvt_prefill_prof"
NSEQ = int(sys.argv[2]) if len(sys.argv) > 2 else 8
LEN = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

import jax

from bench import QWEN3_0_6B
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.block_manager import BlockManager
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

kvd = os.environ.get("KV", "int4")
cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, attn_backend="pallas",
             load_format="random", decode_steps=32, kv_cache_dtype=kvd,
             quant=os.environ.get("QUANT", "int4"),
             max_num_seqs=64, kvcache_block_size=128,
             num_kvcache_blocks=int(os.environ.get("NVT_PAGES", "1200")))
runner = ModelRunner(cfg)
bm = BlockManager(cfg.num_kvcache_blocks, cfg.kvcache_block_size)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, LEN).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(NSEQ)]
for s in seqs:
    bm.allocate(s)

# Warm the bucket (compile outside the profile).
runner.run(seqs, True)
for s in seqs:
    s.num_cached_tokens = 0  # re-run the same prefill shape

t0 = time.perf_counter()
with jax.profiler.trace(OUT):
    for _ in range(4):
        out = runner.run(seqs, True)
        for s in seqs:
            s.num_cached_tokens = 0
print(f"profiled 4 prefill steps in {time.perf_counter()-t0:.2f}s -> {OUT}")

# ---- parse: op profile via xprof converter ----
from xprof.convert import raw_to_tool_data as conv

plane_files = sorted(glob.glob(os.path.join(OUT, "**", "*.xplane.pb"),
                               recursive=True), key=os.path.getmtime)
assert plane_files, f"no xplane.pb under {OUT}"
xspace = plane_files[-1:]
data, _ = conv.xspace_to_tool_data(xspace, "framework_op_stats", {})
if isinstance(data, bytes):
    data = data.decode()
rows = []
try:
    import gviz_api  # noqa: F401
except Exception:
    pass
# framework_op_stats returns a gviz JSON-ish; fall back to hlo_op_profile
try:
    parsed = json.loads(data)
    table = parsed[0] if isinstance(parsed, list) else parsed
    cols = [c.get("label", c.get("id", "")) for c in table["cols"]]
    for r in table["rows"]:
        rows.append({c: (cell or {}).get("v") for c, cell in
                     zip(cols, r["c"])})
except Exception as e:
    print("framework_op_stats parse failed:", e)

if rows:
    def f(x):
        try:
            return float(x)
        except Exception:
            return 0.0
    tcol = next((c for c in rows[0] if "total" in c.lower()
                 and "time" in c.lower() and "%" not in c), None)
    ncol = next((c for c in rows[0] if c.lower() in
                 ("operation", "op name", "name", "type")), None)
    rows.sort(key=lambda r: -f(r.get(tcol)))
    total = sum(f(r.get(tcol)) for r in rows)
    print(f"\n== framework op stats (total {total/1e6:.2f} ms summed) ==")
    for r in rows[:40]:
        print(f"{f(r.get(tcol))/1e6:9.3f} ms  {str(r.get(ncol))[:100]}")
else:
    print("no rows; dumping available tools output keys")
