"""Test config: run everything on CPU with 8 virtual devices so scheduler,
block-manager, model, and multi-chip sharding logic are CI-runnable without
TPU hardware (SURVEY §4 'implication for the TPU build')."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

from nanovllm_tpu.config import Config, ModelConfig  # noqa: E402


@pytest.fixture
def tiny_model_config():
    return ModelConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=128,
        rope_theta=10000.0,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        eos_token_id=0,
    )


@pytest.fixture
def tiny_config(tiny_model_config):
    return Config(
        model="",
        model_config=tiny_model_config,
        max_num_batched_tokens=512,
        max_num_seqs=16,
        max_model_len=256,
        kvcache_block_size=16,
        num_kvcache_blocks=64,
        attn_backend="ref",
        dtype="float32",
        load_format="random",
    )
