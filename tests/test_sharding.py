"""Tensor-parallel correctness on the 8-virtual-CPU-device mesh: TP output
must equal single-device output exactly (greedy), for both backends."""

import jax
import numpy as np
import pytest

from nanovllm_tpu.config import Config, ModelConfig
from nanovllm_tpu.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams


def make_llm(tp, **over):
    mc = ModelConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=16,
        vocab_size=128, max_position_embeddings=512, eos_token_id=0,
    )
    kw = dict(
        model_config=mc, max_num_batched_tokens=512, max_num_seqs=8,
        max_model_len=256, kvcache_block_size=16, num_kvcache_blocks=64,
        attn_backend="ref", dtype="float32", load_format="random", seed=0,
        decode_steps=2, tensor_parallel_size=tp,
    )
    kw.update(over)
    return LLM("", **kw)


PROMPTS = [[5, 9, 23, 41, 77, 3, 2], list(range(1, 40))]
SP = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)


@pytest.fixture(scope="module")
def single_out():
    return [o["token_ids"] for o in
            make_llm(1).generate(PROMPTS, SP, use_tqdm=False)]


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_ref_backend_matches_single(tp, single_out):
    assert len(jax.devices()) >= tp
    outs = make_llm(tp).generate(PROMPTS, SP, use_tqdm=False)
    for o, ref in zip(outs, single_out):
        assert o["token_ids"] == ref


def test_tp_pallas_backend_matches_single(single_out):
    assert len(jax.devices()) >= 4
    outs = make_llm(4, attn_backend="pallas").generate(
        PROMPTS, SP, use_tqdm=False)
    for o, ref in zip(outs, single_out):
        assert o["token_ids"] == ref


def test_tp_int8_kv_pallas_matches_single():
    """INT8 KV cache under tensor parallelism (pallas interpret mode): the
    per-shard scale-block window layout (ops/kv_cache.create_kv_cache
    num_shards>1, model_runner._scale_shards) must reproduce the tp=1 int8
    tokens exactly — same quantization, only the psum placement differs."""
    assert len(jax.devices()) >= 2
    kw = dict(attn_backend="pallas", kv_cache_dtype="int8",
              kvcache_block_size=128, prefill_q_tile=128,
              max_model_len=256, num_kvcache_blocks=8)
    base = [o["token_ids"] for o in
            make_llm(1, **kw).generate(PROMPTS, SP, use_tqdm=False)]
    outs = make_llm(2, **kw).generate(PROMPTS, SP, use_tqdm=False)
    for o, ref in zip(outs, base):
        assert o["token_ids"] == ref


def test_tp_quant_embed_matches_single():
    """INT8 embedding (per-ROW scales) under tensor parallelism: the
    row-quantized dict leaf shards by vocab rows (q AND s together —
    parallel/sharding.adapt's s.shape[-1]==1 branch); tp=2 greedy tokens
    must equal tp=1 exactly (same quantization, sharding-invariant math)."""
    assert len(jax.devices()) >= 2
    kw = dict(quant="int8", quant_embed=True)
    base = [o["token_ids"] for o in
            make_llm(1, **kw).generate(PROMPTS, SP, use_tqdm=False)]
    outs = make_llm(2, **kw).generate(PROMPTS, SP, use_tqdm=False)
    for o, ref in zip(outs, base):
        assert o["token_ids"] == ref


def test_tp_int4_weights_and_kv_pallas_matches_single():
    """INT4 weights (shard_mapped Pallas plane matmuls, per-shard packing
    for the row-parallel o/down — ops/quant._qmm_int4_tp) + token-plane
    INT4 KV under tensor parallelism: tp=2 greedy tokens must equal tp=1
    bit-for-bit (same quantization, sharding-invariant math)."""
    assert len(jax.devices()) >= 2
    kw = dict(attn_backend="pallas", quant="int4", kv_cache_dtype="int4",
              kvcache_block_size=128, prefill_q_tile=128,
              max_model_len=256, num_kvcache_blocks=8)
    base = [o["token_ids"] for o in
            make_llm(1, **kw).generate(PROMPTS, SP, use_tqdm=False)]
    outs = make_llm(2, **kw).generate(PROMPTS, SP, use_tqdm=False)
    for o, ref in zip(outs, base):
        assert o["token_ids"] == ref
