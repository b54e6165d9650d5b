"""Llama-family support: the Qwen3 stack with qk_norm=False IS a Llama
decoder (GQA + RoPE + SiLU-mul MLP + RMSNorm, no per-head q/k norm, no
biases), and HF Llama checkpoints use the same parameter names the loader
maps — so LlamaForCausalLM works end to end. Beyond-reference capability:
the reference serves only Qwen3 (models/qwen3.py is its single model)."""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.config import ModelConfig
from nanovllm_tpu.engine.batch import BatchMeta
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.ops.attention_ref import ref_attention
from nanovllm_tpu.ops.kv_cache import create_kv_cache
from nanovllm_tpu.utils.loader import load_params


@pytest.fixture(scope="module")
def llama_dir(tmp_path_factory):
    torch = pytest.importorskip("torch")  # noqa: F841
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp("llama")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_llama_prefill_logits_match_hf(llama_dir):
    import torch
    d, hf_model = llama_dir
    mc = ModelConfig.from_hf_dir(d)
    assert mc.qk_norm is False
    params = load_params(d, mc, jnp.float32)

    T, page = 12, 16
    ids = np.arange(1, T + 1, dtype=np.int32)
    cache = create_kv_cache(mc.num_hidden_layers, mc.num_key_value_heads,
                            8, page, mc.head_dim, jnp.float32)
    attn = functools.partial(
        ref_attention, scale=mc.head_dim ** -0.5, max_q_len=16,
        num_gather_pages=2, page_size=page, num_slots=8 * page,
        num_layers=mc.num_hidden_layers)
    meta = BatchMeta(
        input_ids=jnp.asarray(ids),
        positions=jnp.arange(T, dtype=jnp.int32),
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        seq_idx=jnp.zeros(T, jnp.int32),
        q_offset=jnp.arange(T, dtype=jnp.int32),
        block_tables=jnp.arange(8, dtype=jnp.int32)[None, :],
        context_lens=jnp.full(1, T, jnp.int32),
        last_token_idx=jnp.asarray([T - 1], jnp.int32),
        temperatures=jnp.zeros(1, jnp.float32),
        tile_seq=jnp.zeros(1, jnp.int32),
        tile_pos0=jnp.zeros(1, jnp.int32))
    logits, _ = qwen3.forward(params, mc, cache, meta, attn)
    with torch.no_grad():
        ref = hf_model(torch.tensor(ids[None].astype(np.int64)))
    np.testing.assert_allclose(np.asarray(logits[0]),
                               ref.logits[0, -1].numpy(),
                               rtol=1e-4, atol=1e-4)


def test_llama_engine_generate(llama_dir):
    d, _ = llama_dir
    llm = LLM(d, max_model_len=128, max_num_batched_tokens=512,
              max_num_seqs=4, kvcache_block_size=16, num_kvcache_blocks=32,
              attn_backend="ref", dtype="float32")
    outs = llm.generate([[1, 2, 3], [5, 6, 7, 8]],
                        SamplingParams(max_tokens=8, ignore_eos=True),
                        use_tqdm=False)
    assert len(outs) == 2
    assert all(len(o["token_ids"]) == 8 for o in outs)


def test_rope_scaling_refused():
    with pytest.raises(AssertionError, match="rope_scaling"):
        ModelConfig.from_hf_dict({
            "architectures": ["LlamaForCausalLM"],
            "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "vocab_size": 128,
            "rope_scaling": {"rope_type": "llama3", "factor": 8.0},
        })
