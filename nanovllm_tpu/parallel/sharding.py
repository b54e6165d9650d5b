"""Named shardings for params and KV cache over the ("tp",) mesh.

Mirrors the reference TP scheme (SURVEY §2.3) in GSPMD form:
- wq/wk/wv, gate/up: output-dim sharded  (ColumnParallelLinear,
  reference layers/linear.py:55-155)
- o, down: input-dim sharded; the partial-sum psum the compiler inserts is
  the reference's per-layer NCCL all_reduce (layers/linear.py:186-190)
- embed: vocab-dim sharded (VocabParallelEmbedding, embed_head.py:35-43)
- lm_head: vocab(out)-dim sharded; logits come back replicated (the
  reference's gather-to-rank0, embed_head.py:66-71)
- KV cache: sharded on the kv_heads axis (reference shards KV by head,
  engine/model_runner.py:135)
"""

from __future__ import annotations

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_shardings(mesh: Mesh, params: dict | None = None) -> dict:
    """Shardings matching the params pytree. Quantized leaves ({"q","s"})
    get the weight's spec for "q" and the output-channel part for "s"."""
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    rep = ns()
    base = {
        "embed": ns("tp", None),
        "layers": {
            "input_ln": rep,
            "wq": ns(None, None, "tp"),
            "wk": ns(None, None, "tp"),
            "wv": ns(None, None, "tp"),
            "q_norm": rep,
            "k_norm": rep,
            "o": ns(None, "tp", None),
            "post_ln": rep,
            "gate": ns(None, None, "tp"),
            "up": ns(None, None, "tp"),
            "down": ns(None, "tp", None),
        },
        "final_ln": rep,
        "lm_head": ns(None, "tp"),
    }
    if params is not None and "bq" in params["layers"]:
        # QKV biases shard with their matmul's output dim.
        base["layers"].update(bq=ns(None, "tp"), bk=ns(None, "tp"),
                              bv=ns(None, "tp"))
    if params is None:
        return base

    def adapt(spec_sh, leaf):
        if isinstance(leaf, dict):
            spec = spec_sh.spec
            if leaf["s"].shape[-1] == 1:
                # Row-quantized (embedding): {"q": [V, H], "s": [V, 1]} —
                # the scale shards with the ROW (vocab) dim.
                s_spec = P(*(list(spec[:-1]) + [None]))
            else:
                # Quantized matmul: {"q"|"q4"|"q4p": [..., in(/...), out],
                # "s": [..., 1, out]} — scale shards with the out dim.
                s_spec = P(*(list(spec[:-2]) + [None, spec[-1]]))
            out = {k: spec_sh for k in leaf if k != "s"}
            out["s"] = NamedSharding(mesh, s_spec)
            return out
        return spec_sh

    def walk(sh, pr):
        if isinstance(sh, dict):
            return {k: walk(sh[k], pr[k]) for k in sh}
        return adapt(sh, pr)

    return walk(base, params)


def kv_cache_sharding(mesh: Mesh) -> dict:
    # {"data": [L*2*num_slots, Hkv*D], "scales": f32[rows, Hkv]} — all KV
    # heads live in the lane dim, so TP shards the lane dim head-aligned:
    # each device holds Hkv/tp full heads (and their scale columns) for every
    # slot. (Dummy [1, 1] scales in bf16 mode are replicated by the caller.)
    return {"data": NamedSharding(mesh, P(None, "tp")),
            "scales": NamedSharding(mesh, P(None, "tp"))}
