"""Analytic decode-scaling model (pure arithmetic, no jax).

Per-chip roofline + ring-priced collectives for a tensor-parallel decode
step on v5e. The HLO-verified harness around this lives in
tools/scaling_model.py (it AOT-compiles the real step and checks the
collective pattern); this module is the importable core so the bench can
price a requested (model, tp) cell without touching a device.

Reference capability anchor: the reference's TP is one NCCL node
(nanovllm/layers/linear.py:158-190); the scaling-efficiency story is a
north-star addition with no reference counterpart.

v5e constants (public: cloud.google.com/tpu/docs/v5e; scaling-book "TPUs"):
197 TF/s bf16, 819 GB/s HBM; ICI 2D torus at 45 GB/s one-way per link — a
1D ring uses 2 links bidirectionally => 90 GB/s ring bandwidth per chip,
~1 us/hop.
"""

from __future__ import annotations

PEAK_FLOPS = 197e12
HBM_BW = 819e9
ICI_RING_BW = 2 * 45e9
ICI_HOP_LAT = 1e-6

# North-star bar: tokens/s/chip efficiency vs tp=1 for the same workload.
EFFICIENCY_BAR = 0.85


def ring_ar_time(nbytes: float, tp: int) -> float:
    """Bidirectional-ring all-reduce: 2*B*(tp-1)/tp over ring bw + hop lat."""
    if tp == 1:
        return 0.0
    return 2 * nbytes * (tp - 1) / tp / ICI_RING_BW + (tp - 1) * ICI_HOP_LAT


def ring_ag_time(nbytes: float, tp: int) -> float:
    if tp == 1:
        return 0.0
    return nbytes * (tp - 1) / tp / ICI_RING_BW + (tp - 1) * ICI_HOP_LAT


def model_decode_step(mc, tp: int, bs: int, ctx: int,
                      kv_bytes_per_elt: float = 1.0,
                      weight_bytes_per_param: float = 2.0) -> dict:
    """Modeled per-chip decode-step time for ModelConfig `mc` at tensor
    parallelism `tp`. Defaults price bf16 weights + int8 KV (the program
    `bench.py --tp` without --quant dispatches); pass 0.5/4.5e-1 style
    overrides for quantized forms. Matches bench.py's MFU arithmetic."""
    L, H = mc.num_hidden_layers, mc.hidden_size
    hq, hkv, d = (mc.num_attention_heads, mc.num_key_value_heads,
                  mc.head_dim)
    inter, vocab = mc.intermediate_size, mc.vocab_size

    mm_params = L * (H * (hq + 2 * hkv) * d + hq * d * H + 3 * H * inter) \
        + H * vocab
    flops = (2 * mm_params / tp) * bs + 4 * (hq / tp) * d * ctx * L * bs
    wbytes = mm_params * weight_bytes_per_param / tp
    kv_stream = 2 * L * (hkv / tp) * d * ctx * bs * kv_bytes_per_elt
    kv_stream *= 1.0 + 4.0 / 128            # scale rows on top of payload
    act_bytes = 12 * bs * H * L / tp
    hbm = wbytes + kv_stream + act_bytes

    # 2 ARs/layer (o_proj, down_proj partial sums) + 1 embedding AR + the
    # fused sampler's winner all-gathers, every decode step.
    layer_ar = bs * H * 2                   # bf16 [bs, H]
    coll_s = (2 * L + 1) * ring_ar_time(layer_ar, tp) \
        + 2 * ring_ag_time(bs * 4 * tp, tp)

    compute_s = flops / PEAK_FLOPS
    hbm_s = hbm / HBM_BW
    step_s = max(compute_s, hbm_s) + coll_s
    return {
        "tp": tp,
        "flops_per_chip_per_step": flops,
        "hbm_bytes_per_chip_per_step": hbm,
        "compute_ms": round(compute_s * 1e3, 3),
        "hbm_ms": round(hbm_s * 1e3, 3),
        "collective_ms": round(coll_s * 1e3, 3),
        "ar_count": 2 * L + 1,
        "ar_bytes": layer_ar,
        "step_ms": round(step_s * 1e3, 3),
        "toks_per_s": round(bs / step_s, 1),
    }


def modeled_efficiency(mc, tp: int, bs: int, ctx: int, **kw) -> float:
    """tokens/s/chip at `tp` over tokens/s at tp=1 (same workload)."""
    if tp <= 1:
        return 1.0
    base = model_decode_step(mc, 1, bs, ctx, **kw)
    this = model_decode_step(mc, tp, bs, ctx, **kw)
    return (this["toks_per_s"] / tp) / base["toks_per_s"]
