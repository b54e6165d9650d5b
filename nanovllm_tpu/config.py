"""Engine + model configuration.

Unlike the reference (`/root/reference/nanovllm/config.py:9-38`), which
piggybacks runtime options onto the HuggingFace config object (documented
there as a pitfall), runtime config here is first-class: `Config` owns the
engine knobs and an explicit `ModelConfig` describes the architecture. Model
code never sees a mutated third-party object.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


@dataclass
class ModelConfig:
    """Architecture description (subset of HF config.json for Qwen3-style models)."""

    architecture: str = "Qwen3ForCausalLM"
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    vocab_size: int = 151936
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    max_position_embeddings: int = 40960
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    # Per-head q/k RMSNorm (the Qwen3 speciality, reference models/qwen3.py:96-97).
    qk_norm: bool = True
    eos_token_id: int = 151645
    bos_token_id: int = 151643

    @property
    def num_q_per_kv(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @staticmethod
    def from_hf_dir(path: str) -> "ModelConfig":
        with open(os.path.join(path, "config.json")) as f:
            hf = json.load(f)
        return ModelConfig.from_hf_dict(hf)

    @staticmethod
    def from_hf_dict(hf: dict) -> "ModelConfig":
        # Same constraint as the reference (rotary_embedding.py:58-68):
        # plain RoPE only. Llama-3-style rope_scaling would silently load
        # but produce wrong logits, so refuse loudly.
        assert not hf.get("rope_scaling"), (
            "rope_scaling is not supported (plain RoPE only)")
        eos = hf.get("eos_token_id", 151645)
        if isinstance(eos, list):
            eos = eos[0]
        head_dim = hf.get("head_dim") or (
            hf["hidden_size"] // hf["num_attention_heads"]
        )
        return ModelConfig(
            architecture=(hf.get("architectures") or ["Qwen3ForCausalLM"])[0],
            hidden_size=hf["hidden_size"],
            intermediate_size=hf["intermediate_size"],
            num_hidden_layers=hf["num_hidden_layers"],
            num_attention_heads=hf["num_attention_heads"],
            num_key_value_heads=hf.get(
                "num_key_value_heads", hf["num_attention_heads"]
            ),
            head_dim=head_dim,
            vocab_size=hf["vocab_size"],
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 10000.0),
            max_position_embeddings=hf.get("max_position_embeddings", 32768),
            tie_word_embeddings=hf.get("tie_word_embeddings", False),
            # Qwen2/2.5 hard-code QKV biases in their modeling code; the
            # config.json has no attention_bias field.
            attention_bias=hf.get(
                "attention_bias",
                (hf.get("architectures") or [""])[0].startswith("Qwen2")),
            qk_norm="Qwen3" in (hf.get("architectures") or ["Qwen3"])[0],
            eos_token_id=eos,
            bos_token_id=hf.get("bos_token_id", 151643),
        )


ATTN_BACKENDS = ("pallas", "ref")

# Reference backend names accepted as aliases (nanovllm/config.py:25-28
# validated {flash, sdpa, sdpa.math, triton}): the fast paged backends map to
# the Pallas kernels, the deliberately-slow SDPA baseline to the XLA
# reference backend.
ATTN_BACKEND_ALIASES = {
    "flash": "pallas",
    "triton": "pallas",
    "sdpa": "ref",
    "sdpa.math": "ref",
}

# kv_cache_dtype="auto" crossover (tokens of max context): INT8 KV at or
# below, token-plane INT4 KV above. Measured round-4 sweep, one session
# (results/r4_sweep_*, README regime table).
KV_AUTO_CTX_CROSSOVER = 1536


@dataclass
class Config:
    """Engine configuration (reference: nanovllm/config.py:9-38, rebuilt TPU-first).

    `kvcache_block_size` is the paged-KV page size in tokens. The reference
    fixes 256 (CUDA-friendly); on TPU a 128-token page makes every page DMA a
    whole (sublane x lane) tile block and one INT8 scale row, so the default
    is 128.
    """

    model: str = ""
    max_num_batched_tokens: int = 8192
    max_num_seqs: int = 256
    max_model_len: int = 4096
    # Like the reference's gpu_memory_utilization (config.py:16) but
    # deliberately lower: the tunnel runtime reports no memory_stats, and a
    # KV cache sized past the true free HBM hangs execution forever rather
    # than raising (see ModelRunner._hbm_budget).
    hbm_utilization: float = 0.85
    tensor_parallel_size: int = 1
    # Reference semantic (model_runner.py:26,43: skip CUDA-graph capture, run
    # one eager step per dispatch). TPU analog: force decode_steps=1 (no fused
    # multi-step scan) and skip construction-time auto-warmup — every step is
    # a plain one-shot jit dispatch.
    enforce_eager: bool = False
    kvcache_block_size: int = 128
    num_kvcache_blocks: int = -1
    attn_backend: str = "pallas"
    # Query-tile size for the ragged Pallas prefill kernel. Each sequence's
    # query segment is aligned to this in the flat token layout so every
    # q-tile belongs to exactly one sequence.
    prefill_q_tile: int = 128
    # KV pages streamed per prefix chunk in the prefill kernel (0 = the
    # kernel's default, 1024 tokens' worth). Larger chunks amortize
    # per-chunk fixed costs against more VMEM.
    prefill_pages_per_chunk: int = 0
    # Same for the decode kernel's KV chunks (0 = kernel default).
    decode_pages_per_chunk: int = 0
    # Decode steps fused into one on-device dispatch (lax.scan over forward +
    # sample + metadata advance). Amortizes host->TPU dispatch latency; the
    # TPU answer to the reference's CUDA-graph replay (model_runner.py:278-303)
    # plus multi-step scheduling. 1 = step-per-dispatch.
    decode_steps: int = 32
    # INT4 KV decode chunk-compute form: per-plane dots (True) vs
    # concat-then-one-dot (False). A/B knob; see attention_pallas.py
    # _decode_chunk_planes.
    int4_planes_dots: bool = True
    # Fuse the LM head with sampling over vocab tiles so [S, V] fp32 logits
    # never materialize (ops/sampler.fused_sample); requests using top-k /
    # top-p fall back to the full-logits sort path regardless.
    fused_sampler: bool = True
    # Pipeline consecutive prefill dispatches: the engine enqueues each
    # prefill step without fetching its sampled tokens and redeems all
    # pending fetches right before the first non-prefill step (sampled
    # prefill tokens are only consumed once decode starts). Back-to-back
    # prefill waves then overlap enqueue with device execution instead of
    # paying a full dispatch+sync round trip per step (23.6 ms fixed per
    # 8x1024 step measured through the tunnel).
    defer_prefill_fetch: bool = True
    dtype: str = "bfloat16"
    # auto | bfloat16 | float32 | int8 | int4. "auto" picks the MEASURED
    # best regime (the reference ships its best backend by default,
    # config.py:10-22): with quantized weights (a throughput-first config)
    # it resolves to int8 KV when max_model_len <= 1536 and int4 KV above —
    # the round-4 sweep crossover (README: len-512 cell kv8 7140 vs kv4
    # 5216 tok/s; len-3584 kv4 2431 vs kv8 2099; INT4 pays a fixed
    # per-chunk plane-extract cost and saves stream traffic, so it loses
    # short contexts and wins long ones). With unquantized weights
    # (quality-first) auto stays bf16.
    kv_cache_dtype: str = "auto"
    quant: str = "none"            # none | int8 | int4 (weight-only)
    # Also store the embedding table as int8 with per-row scales (the lookup
    # dequantizes the gathered rows). Saves vocab*hidden bytes of HBM — the
    # difference between Qwen3-8B w8 fitting one v5e chip with a useful KV
    # cache or not. Requires quant != "none".
    quant_embed: bool = False
    # "random" initializes weights from a PRNG instead of loading safetensors
    # (lets benches run without model files on disk).
    load_format: str = "auto"      # auto | safetensors | random
    # Pre-compile the saturated-serving step buckets (decode at max_num_seqs,
    # prefill at max_num_batched_tokens) at engine construction so the first
    # real request doesn't pay the jit compiles (the reference's warmup +
    # CUDA-graph capture at init, model_runner.py:40-44). None = on for TPU,
    # off on CPU (where interpret-mode warmup would execute real kernel work
    # with no compile latency to hide).
    auto_warmup: bool | None = None
    # Use the C++ engine core (csrc/engine_core.cpp) for the block manager /
    # prefix cache and decode batch prep; falls back to the pure-Python
    # implementations when the toolchain is unavailable.
    native_core: bool = True
    # Multi-host (pod slice): call jax.distributed.initialize() before device
    # use so the ("tp",) mesh spans every chip in the slice. Each host runs
    # the SAME engine loop; scheduling is deterministic given identical
    # add_request streams + seed, so no control plane is needed (the TPU
    # answer to the reference's SHM RPC, SURVEY §5.8). Hosts feed their local
    # shards of the replicated batch and read back the fully-replicated
    # sampled tokens.
    distributed: bool = False
    seed: int = 0
    eos: int = -1
    model_config: ModelConfig | None = None

    def __post_init__(self):
        if self.enforce_eager:
            self.decode_steps = 1
            self.auto_warmup = False
        self.attn_backend = ATTN_BACKEND_ALIASES.get(
            self.attn_backend, self.attn_backend)
        assert self.attn_backend in ATTN_BACKENDS, (
            f"attn_backend must be one of {ATTN_BACKENDS} "
            f"(or a reference alias {sorted(ATTN_BACKEND_ALIASES)}), "
            f"got {self.attn_backend!r}"
        )
        assert self.kvcache_block_size % 16 == 0, (
            "kvcache_block_size must be a multiple of 16 (TPU bf16 sublane tile)"
        )
        assert 1 <= self.tensor_parallel_size <= 64
        assert 1 <= self.decode_steps <= 512
        assert self.quant in ("none", "int8", "int4")
        assert self.kv_cache_dtype in ("auto", "bfloat16", "float32",
                                       "int8", "int4")
        if self.model_config is None:
            if self.model and os.path.isdir(self.model):
                self.model_config = ModelConfig.from_hf_dir(self.model)
            else:
                self.model_config = ModelConfig()
        mc = self.model_config
        self.max_model_len = min(self.max_model_len, mc.max_position_embeddings)
        if self.kv_cache_dtype == "auto":
            # Resolve the measured-regime pick here so every consumer
            # (runner, benches, logs) sees the concrete dtype. Quantized KV
            # needs whole-scale-block pages, so odd page sizes keep bf16.
            if self.quant != "none" and self.kvcache_block_size % 128 == 0:
                self.kv_cache_dtype = ("int8" if self.max_model_len
                                       <= KV_AUTO_CTX_CROSSOVER else "int4")
            else:
                self.kv_cache_dtype = self.dtype
        assert self.kv_cache_dtype not in ("int8", "int4") \
            or self.kvcache_block_size % 128 == 0, (
            "int8/int4 KV cache requires kvcache_block_size % 128 == 0 "
            "(page == whole scale rows)")
        # The scheduler budgets TILE-PADDED tokens, so the invariant that
        # keeps every valid-length request schedulable is on the padded
        # max length, not the raw one.
        padded_max = cdiv(self.max_model_len, self.prefill_q_tile) \
            * self.prefill_q_tile
        assert self.max_num_batched_tokens >= padded_max, (
            f"a single max-length prompt must fit in one prefill batch: "
            f"max_num_batched_tokens={self.max_num_batched_tokens} < "
            f"{padded_max} (max_model_len={self.max_model_len} padded to "
            f"prefill_q_tile={self.prefill_q_tile})"
        )
        # The runner's prefill bucket ladder rounds the padded token total UP
        # to a power of two (model_runner.bucket_key), so a non-pow2 budget
        # would let a legal batch dispatch up to ~2x the budgeted tokens —
        # past the activation headroom the HBM sizing reserves, and into an
        # unwarmed bucket (which the tunnel runtime hangs on rather than
        # OOMs). Round the budget up so the dispatch ceiling and the budget
        # coincide; the HBM sizing reads the rounded value.
        self.max_num_batched_tokens = next_pow2(self.max_num_batched_tokens)
        assert not self.quant_embed or self.quant != "none", (
            "quant_embed requires quant='int8' or 'int4' (the embedding is "
            "quantized alongside the matmul weights)"
        )
        if self.eos < 0:
            self.eos = mc.eos_token_id
        assert mc.num_key_value_heads % self.tensor_parallel_size == 0 or \
            self.tensor_parallel_size % mc.num_key_value_heads == 0, (
            "tensor_parallel_size must divide (or be divisible by) num_key_value_heads"
        )

    @property
    def pages_per_seq(self) -> int:
        return cdiv(self.max_model_len, self.kvcache_block_size)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def next_pow2(n: int, lo: int = 1) -> int:
    """Smallest power of two >= max(n, lo). THE single implementation: the
    scheduler's fused-step rounding, the runner's bucket ladder, and the
    budget rounding below must agree exactly or the dispatch-ceiling ==
    admission-budget invariant breaks."""
    return max(lo, 1 << max(0, n - 1).bit_length())
