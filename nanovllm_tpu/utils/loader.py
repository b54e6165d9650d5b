"""Weight loading: HF safetensors → stacked fused params pytree.

Reference equivalents: nanovllm/utils/loader.py:8-31 (safetensors iteration +
packed-weight remap) and the per-parameter TP shard loaders of
layers/linear.py:78-155. Here fusion (q/k/v → qkv, gate/up → gate_up) happens
at load time into the stacked [L, ...] layout the scanned model consumes, and
TP sharding is applied by `jax.device_put` with named shardings afterwards —
no per-rank manual narrowing.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import ModelConfig


def param_shapes(cfg: ModelConfig) -> dict:
    L = cfg.num_hidden_layers
    H = cfg.hidden_size
    D = cfg.head_dim
    Hq = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    I = cfg.intermediate_size
    V = cfg.vocab_size
    layers = {
        "input_ln": (L, H),
        "wq": (L, H, Hq * D),
        "wk": (L, H, Hkv * D),
        "wv": (L, H, Hkv * D),
        "q_norm": (L, D),
        "k_norm": (L, D),
        "o": (L, Hq * D, H),
        "post_ln": (L, H),
        "gate": (L, H, I),
        "up": (L, H, I),
        "down": (L, I, H),
    }
    if cfg.attention_bias:  # Qwen2/2.5-style QKV biases
        layers["bq"] = (L, Hq * D)
        layers["bk"] = (L, Hkv * D)
        layers["bv"] = (L, Hkv * D)
    return {
        "embed": (V, H),
        "layers": layers,
        "final_ln": (H,),
        "lm_head": (H, V),
    }


def init_random_params(cfg: ModelConfig, dtype=jnp.bfloat16, seed: int = 0):
    """Random-normal weights in the exact serving layout — used when no model
    files exist on disk (throughput benches don't depend on weight values).
    numpy host arrays: deterministic for a fixed seed, and ~20x faster than
    threefry on CPU (an 8B init dropped from ~11 min to seconds)."""
    import numpy as np
    shapes = param_shapes(cfg)
    norm_names = {"input_ln", "post_ln", "q_norm", "k_norm", "final_ln"}
    rng = np.random.default_rng(seed)
    npdtype = jnp.dtype(dtype)
    # Sample a fixed pool once (in the target dtype) and tile it per leaf
    # with a random phase: fresh standard_normal + f32->bf16 conversion for
    # every element was ~26 s of the 0.6B engine construction; tiling is a
    # memcpy (~1 s). 4M distinct values with per-leaf offsets keeps benches,
    # determinism tests, and backend-equivalence tests statistically sane
    # (weight VALUES never affect throughput, and both engines under test
    # draw the identical tree for a fixed seed). The ODD pool length is
    # load-bearing: a power-of-two pool tiles [V, 1024]-shaped leaves into
    # exactly repeated ROWS (4096 distinct lm_head rows), and the resulting
    # exact logit ties flip under different backends' float noise — caught
    # as greedy-token divergence in dryrun_multichip.
    pool = (rng.standard_normal((1 << 22) + 1, np.float32)
            * 0.02).astype(npdtype)

    def init_leaf(path, shape):
        name = path[-1]
        if name in norm_names:
            return np.ones(shape, npdtype)
        if name in ("bq", "bk", "bv"):
            return np.zeros(shape, npdtype)
        n = int(np.prod(shape))
        off = int(rng.integers(0, pool.size))
        return np.resize(np.roll(pool, -off), n).reshape(shape)

    def walk(tree, path=()):
        if isinstance(tree, tuple):
            return init_leaf(path, tree)
        return {k: walk(v, path + (k,)) for k, v in tree.items()}

    return walk(shapes)


def load_params(model_dir: str, cfg: ModelConfig, dtype=jnp.bfloat16):
    """Load HF Qwen3 safetensors into the stacked fused pytree (host numpy,
    then one device_put per leaf by the caller)."""
    import ml_dtypes
    from safetensors import safe_open

    np_dtype = ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.dtype(
        jnp.dtype(dtype).name)
    shapes = param_shapes(cfg)
    params = {
        "embed": None,
        "layers": {k: np.zeros(s, np_dtype)
                   for k, s in shapes["layers"].items()},
        "final_ln": None,
        "lm_head": None,
    }
    D = cfg.head_dim
    Hq, Hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    I = cfg.intermediate_size

    def to_np(t):
        return np.asarray(t).astype(np_dtype)

    files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    assert files, f"no *.safetensors under {model_dir}"
    for file in files:
        with safe_open(file, framework="numpy") as f:
            for name in f.keys():
                t = f.get_tensor(name)
                _place(params, name, to_np(t), cfg, D, Hq, Hkv, I)

    if params["lm_head"] is None:
        assert cfg.tie_word_embeddings
        params["lm_head"] = np.ascontiguousarray(params["embed"].T)
    assert params["embed"] is not None and params["final_ln"] is not None
    return params


def _place(params, name, t, cfg, D, Hq, Hkv, I):
    if name == "model.embed_tokens.weight":
        params["embed"] = t
        return
    if name == "model.norm.weight":
        params["final_ln"] = t
        return
    if name == "lm_head.weight":
        params["lm_head"] = np.ascontiguousarray(t.T)
        return
    if not name.startswith("model.layers."):
        return  # rotary inv_freq buffers etc.
    parts = name.split(".")
    layer = int(parts[2])
    rest = ".".join(parts[3:])
    lp = params["layers"]
    if rest == "input_layernorm.weight":
        lp["input_ln"][layer] = t
    elif rest == "post_attention_layernorm.weight":
        lp["post_ln"][layer] = t
    elif rest == "self_attn.q_norm.weight":
        lp["q_norm"][layer] = t
    elif rest == "self_attn.k_norm.weight":
        lp["k_norm"][layer] = t
    elif rest == "self_attn.q_proj.weight":
        lp["wq"][layer] = t.T
    elif rest == "self_attn.k_proj.weight":
        lp["wk"][layer] = t.T
    elif rest == "self_attn.v_proj.weight":
        lp["wv"][layer] = t.T
    elif rest == "self_attn.q_proj.bias" and "bq" in lp:
        lp["bq"][layer] = t
    elif rest == "self_attn.k_proj.bias" and "bk" in lp:
        lp["bk"][layer] = t
    elif rest == "self_attn.v_proj.bias" and "bv" in lp:
        lp["bv"][layer] = t
    elif rest == "self_attn.o_proj.weight":
        lp["o"][layer] = t.T
    elif rest == "mlp.gate_proj.weight":
        lp["gate"][layer] = t.T
    elif rest == "mlp.up_proj.weight":
        lp["up"][layer] = t.T
    elif rest == "mlp.down_proj.weight":
        lp["down"][layer] = t.T
    # silently skip biases Qwen3 doesn't have / unknown buffers
