"""Weight-only quantization (INT8 / INT4) with dequant fused into matmuls.

North-star requirement (BASELINE.json): weight-only INT8/INT4 dequant fused
into every matmul. On TPU the fusion is expressed, not hand-written: weights
live in HBM as int8/int4, XLA fuses the widening convert into the matmul's
VMEM tiles (weights are never materialized wide in HBM), and the per-output-
channel scale multiplies the matmul result — mathematically identical to
scaling the weights, but scale-sized work instead of weight-sized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, bits: int = 8, pack: bool = False,
                    layout: str = "planes", row_shards: int = 1):
    """w: [..., in, out] -> {"q": int8|int4 [..., in, out],
    "s": f32 [..., 1, out]} with per-output-channel absmax scales.

    pack=True (bits=4 only) stores the Pallas dequant matmul's streaming
    form instead (this TPU runtime cannot pass jnp.int4 jit arguments; see
    ops/qmm_pallas.py): layout="planes" (default) puts 8 bias-8 nibbles per
    int32 lane under key "q4p" (cheapest VPU extraction); layout="rows"
    keeps the int8 [..., in//2, out] row-block form under "q4".

    row_shards > 1 (planes only) marks the weight ROW-PARALLEL under
    tensor parallelism and packs each input-dim shard's rows SEPARATELY
    (key "q4pr"): plane packing mixes row blocks K/8 apart, so a first-dim
    shard of a normally-packed array would not correspond to any row shard
    of W — per-shard packing makes shard s of the packed first dim exactly
    the packing of W's rows [s*K/rs, (s+1)*K/rs)."""
    assert bits in (8, 4)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)  # [..., 1, out]
    qmax = 127.0 if bits == 8 else 7.0
    s = jnp.maximum(absmax / qmax, 1e-10)
    q = jnp.clip(jnp.round(wf / s), -qmax, qmax)
    if pack:
        assert bits == 4
        if layout == "planes":
            from nanovllm_tpu.ops.qmm_pallas import pack_planes_int4
            q8 = q.astype(jnp.int8)
            if row_shards > 1:
                *lead, k, n = q8.shape
                assert k % (8 * row_shards) == 0, (k, row_shards)
                per = pack_planes_int4(
                    q8.reshape(*lead, row_shards, k // row_shards, n))
                return {"q4pr": per.reshape(*lead, k // 8, n), "s": s}
            return {"q4p": pack_planes_int4(q8), "s": s}
        assert row_shards == 1
        from nanovllm_tpu.ops.qmm_pallas import pack_rows_int4
        return {"q4": pack_rows_int4(q.astype(jnp.int8)), "s": s}
    dtype = jnp.int8 if bits == 8 else jnp.int4
    return {"q": q.astype(dtype), "s": s}


def _shard_map():
    from nanovllm_tpu.parallel.mesh import shard_map
    return shard_map()


def _qmm_int4_tp(x, planes, s, row_parallel, mesh, out_dtype):
    """Pallas int4 matmul under tensor parallelism: the kernel is opaque to
    GSPMD, so each shard runs it on its own weight shard via shard_map —
    column-parallel (wq/wk/wv/gate/up/lm_head: out-dim shard, replicated x)
    or row-parallel (o/down: in-dim shard of both x and the per-shard-packed
    planes, partial sums psum'd over ICI — the reference's RowParallelLinear
    all_reduce, layers/linear.py:186-190)."""
    from jax.sharding import PartitionSpec as P

    from nanovllm_tpu.ops.qmm_pallas import qmm_int4_planes
    if row_parallel:
        def body(xs, ws, ss):
            y = qmm_int4_planes(xs, ws, ss, out_dtype=jnp.float32)
            return jax.lax.psum(y, "tp").astype(out_dtype)
        return _shard_map()(
            body, mesh=mesh,
            in_specs=(P(None, "tp"), P("tp", None), P(None, None)),
            out_specs=P(), check_vma=False)(x, planes, s)

    def body(xs, ws, ss):
        return qmm_int4_planes(xs, ws, ss, out_dtype=out_dtype)
    return _shard_map()(
        body, mesh=mesh,
        in_specs=(P(), P(None, "tp"), P(None, "tp")),
        out_specs=P(None, "tp"), check_vma=False)(x, planes, s)


def qmm(x, w, preferred=None):
    """x @ w for plain or quantized weights.

    Quantized path: int weight widened to x.dtype inside the matmul fusion,
    fp32 accumulation on the MXU, then the per-channel scale.
    """
    if isinstance(w, dict):
        if "q4p" in w or "q4pr" in w:
            # int32 nibble planes: Pallas kernel, VMEM dequant. Under a tp
            # mesh the call is shard_mapped per weight shard.
            from nanovllm_tpu.ops.qmm_pallas import qmm_int4_planes
            from nanovllm_tpu.parallel.mesh import current_tp_mesh
            row = "q4pr" in w
            mesh = current_tp_mesh()
            if mesh is not None:
                return _qmm_int4_tp(x, w["q4pr" if row else "q4p"], w["s"],
                                    row, mesh, preferred or x.dtype)
            return qmm_int4_planes(x, w["q4pr" if row else "q4p"], w["s"],
                                   out_dtype=preferred or x.dtype)
        if "q4" in w:  # nibble-packed: Pallas kernel, dequant in VMEM tiles
            from nanovllm_tpu.ops.qmm_pallas import qmm_int4
            return qmm_int4(x, w["q4"], w["s"],
                            out_dtype=preferred or x.dtype)
        y = jnp.matmul(x, w["q"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        y = y * w["s"][..., 0, :]
        return y if preferred == jnp.float32 else y.astype(x.dtype)
    return jnp.matmul(x, w, preferred_element_type=preferred or x.dtype)


QUANT_WEIGHTS = ("wq", "wk", "wv", "o", "gate", "up", "down")


def quantize_embedding(w):
    """Embedding table [V, H] -> {"q": int8 [V, H], "s": f32 [V, 1]} with
    per-ROW (per-vocab-entry) absmax scales: the lookup gathers a row and
    multiplies by its one scale. Always int8 (a 4-bit embedding would need
    in-gather unpacking for ~0.3 GiB more saved on 8B — not worth it)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)  # [V, 1]
    s = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def embed_lookup(emb, ids, dtype):
    """Gather rows of a plain or row-quantized embedding table."""
    if isinstance(emb, dict):
        return (emb["q"][ids].astype(jnp.float32) * emb["s"][ids]).astype(dtype)
    return emb[ids]


ROW_PARALLEL_WEIGHTS = ("o", "down")  # in-dim sharded under tp


def quantize_params(params: dict, bits: int, pack: bool | None = None,
                    quant_embed: bool = False, tp: int = 1) -> dict:
    """Quantize the stacked layer matmuls + lm_head (norms stay fp; the
    embedding gather stays wide unless quant_embed). bits=4 defaults to the
    nibble-packed Pallas form (see quantize_weight); pass pack=False to keep
    jnp.int4 leaves (GSPMD-shardable, but unusable as jit arguments on the
    TPU runtime). tp > 1 packs the row-parallel weights per input shard
    ("q4pr") so qmm can shard_map them."""
    if pack is None:
        pack = bits == 4
    # jit per leaf shape: XLA fuses the absmax/round/nibble-pack pipeline
    # into one multithreaded pass over the weight instead of eager-op
    # materialization per step (~20 s -> ~2 s for a 0.6B int4 host-side
    # quantize; runs on whatever device the caller's default_device says —
    # the model runner pins CPU).
    qw = jax.jit(quantize_weight,
                 static_argnames=("bits", "pack", "layout", "row_shards"))
    out = dict(params)
    out["layers"] = dict(params["layers"])
    for name in QUANT_WEIGHTS:
        rs = tp if (pack and bits == 4 and tp > 1
                    and name in ROW_PARALLEL_WEIGHTS) else 1
        out["layers"][name] = qw(params["layers"][name], bits=bits,
                                 pack=pack, row_shards=rs)
    out["lm_head"] = qw(params["lm_head"], bits=bits, pack=pack)
    if quant_embed:
        out["embed"] = quantize_embedding(params["embed"])
    return out
