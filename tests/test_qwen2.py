"""Qwen2/2.5-family support: the Llama-style decoder plus QKV biases (the
HF Qwen2 modeling code hard-codes q/k/v biases on; its config.json has no
attention_bias field). Beyond-reference capability — the reference serves
only Qwen3."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import Qwen2Config, Qwen2ForCausalLM  # noqa: E402

from nanovllm_tpu import LLM, SamplingParams  # noqa: E402
from nanovllm_tpu.config import ModelConfig  # noqa: E402


@pytest.fixture(scope="module")
def qwen2_dir(tmp_path_factory):
    torch.manual_seed(0)
    cfg = Qwen2Config(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        vocab_size=128, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False)
    model = Qwen2ForCausalLM(cfg).eval().to(torch.float32)
    # transformers' _init_weights zeroes Linear biases; give them real
    # values so the parity test actually exercises the bias path.
    with torch.no_grad():
        for layer in model.model.layers:
            for proj in (layer.self_attn.q_proj, layer.self_attn.k_proj,
                         layer.self_attn.v_proj):
                proj.bias.normal_(0, 0.5)
    d = tmp_path_factory.mktemp("qwen2")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_qwen2_config_detects_biases(qwen2_dir):
    d, _ = qwen2_dir
    mc = ModelConfig.from_hf_dir(d)
    assert mc.attention_bias is True   # implied by the Qwen2 architecture
    assert mc.qk_norm is False
    assert mc.head_dim == 16           # hidden / heads (no head_dim field)


def test_qwen2_stepwise_logits_match_hf(qwen2_dir):
    """Greedy engine decode must follow HF's argmax sequence exactly —
    exercises bias loading, bias application, and the paged path."""
    d, hf = qwen2_dir
    # The HF checkpoint's biases must actually matter for this test to mean
    # anything (they are randomly initialized, so they do).
    assert float(hf.model.layers[0].self_attn.q_proj.bias.abs().sum()) > 0

    prompt = [3, 17, 42, 99, 5, 23, 77, 1]
    n_new = 6
    llm = LLM(d, max_model_len=128, max_num_batched_tokens=512,
              max_num_seqs=4, kvcache_block_size=16, num_kvcache_blocks=32,
              attn_backend="ref", dtype="float32")
    out = llm.generate([prompt],
                       SamplingParams(temperature=0.0, max_tokens=n_new,
                                      ignore_eos=True),
                       use_tqdm=False)[0]["token_ids"]

    ids = torch.tensor([prompt])
    for _ in range(n_new):
        with torch.no_grad():
            nxt = hf(ids).logits[0, -1].argmax().item()
        ids = torch.cat([ids, torch.tensor([[nxt]])], dim=1)
    assert out == ids[0, len(prompt):].tolist()
