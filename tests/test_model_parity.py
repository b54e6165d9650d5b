"""Numerical parity vs HuggingFace transformers Qwen3 (fp32, CPU).

The reference repo has no such test (SURVEY §4); this is the definitive check
for the RoPE convention, q/k-norm placement, 0-based decode positions (the
reference's off-by-one, SURVEY §2.5), and single scale application.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import Qwen3Config, Qwen3ForCausalLM  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nanovllm_tpu.config import ModelConfig  # noqa: E402
from nanovllm_tpu.engine.batch import BatchMeta, build_decode_meta, build_prefill_meta  # noqa: E402
from nanovllm_tpu.engine.block_manager import BlockManager  # noqa: E402
from nanovllm_tpu.engine.sequence import Sequence  # noqa: E402
from nanovllm_tpu.models import qwen3  # noqa: E402
from nanovllm_tpu.ops.attention_ref import ref_attention  # noqa: E402
from nanovllm_tpu.ops.kv_cache import create_kv_cache  # noqa: E402
from nanovllm_tpu.sampling_params import SamplingParams  # noqa: E402
from nanovllm_tpu.utils.loader import load_params  # noqa: E402

BS = 16  # page size


@pytest.fixture(scope="module")
def hf_model_dir(tmp_path_factory):
    torch.manual_seed(0)
    cfg = Qwen3Config(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        vocab_size=128,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    model = Qwen3ForCausalLM(cfg).eval().to(torch.float32)
    d = tmp_path_factory.mktemp("hf_qwen3")
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def run_ours(model_dir, token_chunks):
    """Feed token_chunks sequentially (first = prefill, rest = decode steps)
    through our paged path; return logits per chunk end."""
    mc = ModelConfig.from_hf_dir(model_dir)
    params = load_params(model_dir, mc, jnp.float32)
    params = {k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict)
                  else jnp.asarray(v)) for k, v in params.items()}
    num_pages, pages_per_seq = 32, 8
    cache = create_kv_cache(mc.num_hidden_layers, mc.num_key_value_heads,
                            num_pages, BS, mc.head_dim, jnp.float32)
    bm = BlockManager(num_pages, BS)
    seq = Sequence(list(token_chunks[0]), SamplingParams(), block_size=BS)
    bm.allocate(seq)
    num_slots = num_pages * BS
    scale = mc.head_dim ** -0.5

    import functools
    logits_out = []
    t_bucket = 32
    attn = functools.partial(ref_attention, scale=scale, max_q_len=t_bucket,
                             num_gather_pages=pages_per_seq, page_size=BS,
                             num_slots=num_slots,
                             num_layers=mc.num_hidden_layers)
    fwd_p = jax.jit(lambda p, c, m: qwen3.forward(p, mc, c, m, attn))
    raw = build_prefill_meta([seq], t_bucket, 2, BS, pages_per_seq, num_slots)
    meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})
    logits, cache = fwd_p(params, cache, meta)
    logits_out.append(np.asarray(logits[0]))

    attn_d = functools.partial(ref_attention, scale=scale, max_q_len=1,
                               num_gather_pages=pages_per_seq, page_size=BS,
                             num_slots=num_slots,
                             num_layers=mc.num_hidden_layers)
    fwd_d = jax.jit(lambda p, c, m: qwen3.forward(p, mc, c, m, attn_d))
    for chunk in token_chunks[1:]:
        for tok in chunk:
            seq.append_token(int(tok))
            bm.commit_token(seq)
            bm.reserve(seq, 1)
            raw = build_decode_meta([seq], 2, BS, pages_per_seq, num_slots)
            meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})
            logits, cache = fwd_d(params, cache, meta)
            logits_out.append(np.asarray(logits[0]))
    return logits_out


import jax  # noqa: E402


def test_prefill_and_decode_logits_match_hf(hf_model_dir):
    model_dir, hf = hf_model_dir
    prompt = [3, 17, 42, 99, 5, 23, 77, 1, 64, 100, 8, 55]  # 12 tokens
    extra = [7, 110, 31]

    ours = run_ours(model_dir, [prompt, extra])

    full = torch.tensor([prompt + extra])
    with torch.no_grad():
        hf_logits = hf(full).logits[0].float().numpy()

    # Prefill last-token logits vs HF position 11; decode steps vs 12, 13, 14.
    for i, pos in enumerate([len(prompt) - 1, 12, 13, 14]):
        np.testing.assert_allclose(
            ours[i], hf_logits[pos], rtol=2e-4, atol=2e-4,
            err_msg=f"logits mismatch at step {i} (hf pos {pos})")


def test_prefix_cached_prefill_matches_hf(hf_model_dir):
    """Second sequence sharing a 16-token (one-page) prefix: the cached-page
    prefill path (cu_seqlens_q != cu_seqlens_k analogue) must reproduce HF
    logits exactly."""
    model_dir, hf = hf_model_dir
    mc = ModelConfig.from_hf_dir(model_dir)
    params = load_params(model_dir, mc, jnp.float32)
    prefix = list(range(2, 18))  # one full page
    tail_a = [40, 41, 42]
    tail_b = [90, 91]

    num_pages, pages_per_seq = 32, 8
    cache = create_kv_cache(mc.num_hidden_layers, mc.num_key_value_heads,
                            num_pages, BS, mc.head_dim, jnp.float32)
    bm = BlockManager(num_pages, BS)
    import functools
    scale = mc.head_dim ** -0.5
    num_slots = num_pages * BS
    attn = functools.partial(ref_attention, scale=scale, max_q_len=32,
                             num_gather_pages=pages_per_seq, page_size=BS,
                             num_slots=num_slots,
                             num_layers=mc.num_hidden_layers)
    fwd = jax.jit(lambda p, c, m: qwen3.forward(p, mc, c, m, attn))

    sa = Sequence(prefix + tail_a, SamplingParams(), block_size=BS)
    bm.allocate(sa)
    raw = build_prefill_meta([sa], 32, 2, BS, pages_per_seq, num_slots)
    meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})
    _, cache = fwd(params, cache, meta)

    sb = Sequence(prefix + tail_b, SamplingParams(), block_size=BS)
    bm.allocate(sb)
    assert sb.num_cached_tokens == BS  # prefix page reused
    raw = build_prefill_meta([sb], 32, 2, BS, pages_per_seq, num_slots)
    meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})
    logits_b, cache = fwd(params, cache, meta)

    with torch.no_grad():
        hf_logits = hf(torch.tensor([prefix + tail_b])).logits[0, -1].float().numpy()
    np.testing.assert_allclose(np.asarray(logits_b[0]), hf_logits,
                               rtol=2e-4, atol=2e-4)


def test_int8_weight_only_close_to_fp32(hf_model_dir):
    """Weight-only INT8: logits close to fp32 on the tiny HF model (the
    north-star gate is <=0.1 ppl at real scale; here we check the dequant
    math is right, not the calibration)."""
    from nanovllm_tpu.ops.quant import quantize_params
    model_dir, hf = hf_model_dir
    prompt = [3, 17, 42, 99, 5, 23, 77, 1]

    mc = ModelConfig.from_hf_dir(model_dir)
    params = load_params(model_dir, mc, jnp.float32)
    qparams = quantize_params(
        {k: (dict(v) if isinstance(v, dict) else v) for k, v in params.items()},
        bits=8)

    num_pages, pages_per_seq = 32, 8
    num_slots = num_pages * BS
    import functools
    attn = functools.partial(
        ref_attention, scale=mc.head_dim ** -0.5, max_q_len=32,
        num_gather_pages=pages_per_seq, page_size=BS, num_slots=num_slots,
        num_layers=mc.num_hidden_layers)
    fwd = jax.jit(lambda p, c, m: qwen3.forward(p, mc, c, m, attn))

    bm = BlockManager(num_pages, BS)
    seq = Sequence(prompt, SamplingParams(), block_size=BS)
    bm.allocate(seq)
    raw = build_prefill_meta([seq], 32, 2, BS, pages_per_seq, num_slots)
    meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})

    outs = {}
    for name, pr in (("fp32", params), ("int8", qparams)):
        cache = create_kv_cache(mc.num_hidden_layers, mc.num_key_value_heads,
                                num_pages, BS, mc.head_dim, jnp.float32)
        logits, _ = fwd(pr, cache, meta)
        outs[name] = np.asarray(logits[0])
    # Same argmax and small absolute drift.
    assert outs["fp32"].argmax() == outs["int8"].argmax()
    err = np.abs(outs["fp32"] - outs["int8"]).max()
    assert err < 0.35, err
