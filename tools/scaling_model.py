"""Scaling-efficiency model: per-step collective-vs-compute time for tp=1..8.

The north star asks for >=85% tokens/s/chip efficiency from 1 chip to a
multi-chip slice. Real multi-chip hardware is absent here, so this tool makes
the measurement one command for the day it exists AND commits a modeled
prediction now (VERDICT r3 item 8):

  1. AOT-compiles the REAL fused-decode step (`ModelRunner._get_step_fn`,
     the exact program the engine dispatches) for each tp against a v5e
     topology description — no hardware attached — and reads the collective
     pattern out of the compiled HLO: which collectives exist in the layer
     scan body and at what byte sizes. (XLA's cost_analysis does not
     multiply while-loop bodies by trip count, so flops/bytes come from the
     analytic model below, which is the same arithmetic bench.py's MFU
     accounting uses.)
  2. Prices per-chip compute (roofline: max(flops/peak, hbm/bw)) and the
     HLO-verified collectives (bidirectional-ring model on v5e ICI
     constants) per decode step.
  3. Emits: modeled compute/HBM/collective ms, tokens/s, tokens/s/chip, and
     efficiency vs tp=1 — the committed prediction.

The measured path is `bench.py --tp N [--distributed]`, which prints
toks_per_chip in its JSON; efficiency = toks_per_chip(N) / toks_per_chip(1).

Reference capability anchor: the reference's TP covers one node via NCCL
all-reduces (nanovllm/layers/linear.py:158-190); a scaling-efficiency story
is a north-star addition with no reference counterpart.

Usage: python tools/scaling_model.py [--bs 64] [--ctx 1536] [--model-size
       0.6B] [--tp 1,2,4,8] [--report results/scaling_model.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Compile-only tool: force the CPU client so it never attaches to (or queues
# behind) the shared TPU tunnel. The topology-based AOT compile below does
# not need a real device.
jax.config.update("jax_platforms", "cpu")

# v5e per-chip constants (public: cloud.google.com/tpu/docs/v5e; scaling-book
# chapter "TPUs"). ICI: 2D torus, 45 GB/s one-way per link; a 1D ring uses 2
# links bidirectionally => 90 GB/s of ring bandwidth per chip. ~1 us/hop.
from nanovllm_tpu.parallel.scaling import (  # noqa: E402
    HBM_BW, ICI_HOP_LAT, ICI_RING_BW, PEAK_FLOPS, model_decode_step,
    ring_ag_time, ring_ar_time)

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
               "u8": 1, "pred": 1, "s16": 2, "u16": 2, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> float:
    total = 0.0
    for dt, dims in SHAPE_RE.findall(type_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


COLL_RE = re.compile(
    r"=\s+((?:\([^)]*\)|[\w\[\],]+(?:\{[^}]*\})?))\s+"
    r"(all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)(?:-start)?\(")


def hlo_collectives(hlo: str):
    """[(computation, op, bytes)] for every collective instruction."""
    out = []
    comp = None
    for line in hlo.splitlines():
        s = line.strip()
        if s.endswith("{") and "= " not in s and ("ENTRY" in s or
                                                  s.startswith("%")):
            comp = s.split()[0].lstrip("%").split("(")[0]
            continue
        m = COLL_RE.search(s)
        if m and "-done" not in s:
            out.append((comp or "?", m.group(2), shape_bytes(m.group(1))))
    return out


def model_tp(tp: int, bs: int, ctx: int, size: str, steps: int = 8,
             compile_check: bool = True):
    from bench import QWEN3_SIZES
    mc = QWEN3_SIZES[size]

    # Analytic per-chip per-decode-step costs: nanovllm_tpu/parallel/scaling
    # (bf16 weights + int8 KV — the program bench.py --tp without --quant
    # dispatches; same arithmetic as bench.py's MFU accounting).
    core = model_decode_step(mc, tp, bs, ctx)
    layer_ar = core["ar_bytes"]
    coll_detail = {"all-reduce": {"count": core["ar_count"],
                                  "MiB": round(core["ar_count"] * layer_ar
                                               / 2**20, 3),
                                  "ms": round(core["ar_count"] * ring_ar_time(
                                      layer_ar, tp) * 1e3, 3)}}

    # ---- verify the collective pattern against the real compiled HLO ----
    verified = None
    if compile_check and tp > 1:
        from tools.inspect_tp_overlap import build_compiled
        compiled, dt, _ = build_compiled(tp, bs, steps, size)
        colls = hlo_collectives(compiled.as_text())
        # The layer scan body carries the per-layer ARs; entry carries the
        # embedding AR + sampler gathers. Compare instruction counts and the
        # dominant AR byte size.
        ars = [c for c in colls if c[1] == "all-reduce"]
        big = [b for _, _, b in ars if b >= layer_ar / 2]
        verified = {
            "hlo_all_reduce_instrs": len(ars),
            "hlo_other_collectives": len(colls) - len(ars),
            "hlo_dominant_ar_bytes": max(big) if big else 0,
            "model_ar_bytes": layer_ar,
            "compile_s": round(dt, 1),
        }

    out = dict(core)
    del out["ar_count"], out["ar_bytes"]
    out["collectives"] = coll_detail
    out["hlo_verify"] = verified
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--ctx", type=int, default=1536,
                   help="mean decode context (1536 = midpoint of the "
                        "1024in/1024out workload)")
    p.add_argument("--model-size", default="0.6B")
    p.add_argument("--tp", default="1,2,4,8")
    p.add_argument("--no-compile-check", action="store_true",
                   help="skip the AOT HLO pattern verification")
    p.add_argument("--report", default="")
    args = p.parse_args()

    rows = []
    for tp in [int(x) for x in args.tp.split(",")]:
        rows.append(model_tp(tp, args.bs, args.ctx, args.model_size,
                             compile_check=not args.no_compile_check))
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]
    lines = [
        f"Modeled decode scaling — Qwen3-{args.model_size}, bs={args.bs}, "
        f"ctx={args.ctx}, bf16 weights + int8 KV (the program bench.py --tp "
        f"dispatches), v5e constants: {PEAK_FLOPS/1e12:.0f} TF/s, "
        f"{HBM_BW/1e9:.0f} GB/s HBM, ring ICI {ICI_RING_BW/1e9:.0f} GB/s, "
        f"{ICI_HOP_LAT*1e6:.0f} us/hop.",
        "Roofline: step = max(flops/peak, hbm/bw) + ring-priced collectives "
        "(pattern + sizes verified against the AOT-compiled HLO). Absolute "
        "tok/s is optimistic (no dispatch/host time); the efficiency column "
        "divides out the common bias and is the committed prediction.",
        "",
        "| tp | compute ms | HBM ms | collective ms | step ms | tok/s "
        "| tok/s/chip | efficiency |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        eff = (r["toks_per_s"] / r["tp"]) / (base["toks_per_s"] / base["tp"])
        lines.append(
            f"| {r['tp']} | {r['compute_ms']} | {r['hbm_ms']} | "
            f"{r['collective_ms']} | {r['step_ms']} | {r['toks_per_s']} | "
            f"{round(r['toks_per_s'] / r['tp'], 1)} | {eff:.1%} |")
    lines.append("")
    lines.append("Measured path (real multi-chip hardware): `python bench.py "
                 "--tp N [--distributed]` — efficiency = toks_per_chip(N) / "
                 "toks_per_chip(1), same session.")
    report = "\n".join(lines)
    print()
    print(report)
    if args.report:
        with open(args.report, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write("\n" + report + "\n")


if __name__ == "__main__":
    main()
