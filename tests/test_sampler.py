"""Sampler: Gumbel-max temperature sampling + top-k / nucleus filtering."""

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.ops.sampler import sample


def _logits(s=4, v=64, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (s, v)) * 3.0


def test_greedy_ignores_filters():
    lg = _logits()
    t0 = jnp.zeros(4)
    base = sample(lg, t0, jax.random.PRNGKey(1))
    filt = sample(lg, t0, jax.random.PRNGKey(2),
                  jnp.full(4, 5, jnp.int32), jnp.full(4, 0.3))
    np.testing.assert_array_equal(base, np.argmax(np.asarray(lg), -1))
    np.testing.assert_array_equal(filt, base)


def test_top_k_one_is_greedy():
    lg = _logits()
    out = sample(lg, jnp.ones(4), jax.random.PRNGKey(3),
                 jnp.ones(4, jnp.int32), None)
    np.testing.assert_array_equal(out, np.argmax(np.asarray(lg), -1))


def test_top_k_confines_samples():
    lg = _logits(s=1, v=32)
    top5 = set(np.argsort(np.asarray(lg)[0])[-5:].tolist())
    ks = jnp.full(1, 5, jnp.int32)
    seen = set()
    for i in range(200):
        tok = int(sample(lg, jnp.full(1, 2.0), jax.random.PRNGKey(i),
                         ks, None)[0])
        seen.add(tok)
    assert seen <= top5
    assert len(seen) >= 3  # high temperature must actually spread


def test_top_p_confines_to_nucleus():
    # One dominant logit: tiny top_p must always pick it; the nucleus set
    # for moderate top_p must exclude the tail.
    lg = np.zeros((1, 16), np.float32)
    lg[0, 3] = 8.0
    lg[0, 7] = 7.0
    lg = jnp.asarray(lg)
    for i in range(50):
        tok = int(sample(lg, jnp.ones(1), jax.random.PRNGKey(i),
                         None, jnp.full(1, 0.1))[0])
        assert tok == 3
    seen = set()
    for i in range(200):
        seen.add(int(sample(lg, jnp.ones(1), jax.random.PRNGKey(1000 + i),
                            None, jnp.full(1, 0.9))[0]))
    assert seen <= {3, 7}


def test_per_seq_mixed_filters():
    """Row 0 greedy, row 1 top-k=1, row 2 unfiltered high temperature —
    one batch, one call."""
    lg = _logits(s=3, v=32, seed=5)
    temps = jnp.asarray([0.0, 1.0, 100.0])
    ks = jnp.asarray([0, 1, 0], jnp.int32)
    ps = jnp.asarray([1.0, 1.0, 1.0])
    argmax = np.argmax(np.asarray(lg), -1)
    outs = {int(sample(lg, temps, jax.random.PRNGKey(i), ks, ps)[2])
            for i in range(100)}
    one = sample(lg, temps, jax.random.PRNGKey(0), ks, ps)
    assert int(one[0]) == argmax[0]
    assert int(one[1]) == argmax[1]
    assert len(outs) > 5  # row 2 explores


def test_engine_top_p_generates(tmp_path):
    """End-to-end: filtered sampling through the engine compiles its own
    bucket and produces tokens."""
    from nanovllm_tpu import LLM, SamplingParams
    from nanovllm_tpu.config import ModelConfig
    mc = ModelConfig(hidden_size=64, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16, vocab_size=128,
                     max_position_embeddings=256, eos_token_id=0)
    llm = LLM("", model_config=mc, max_model_len=128,
              max_num_batched_tokens=512, max_num_seqs=4,
              kvcache_block_size=16, num_kvcache_blocks=32,
              attn_backend="ref", dtype="float32", load_format="random",
              decode_steps=4)
    sps = [SamplingParams(temperature=0.8, top_p=0.9, top_k=20, max_tokens=8,
                          ignore_eos=True),
           SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)]
    outs = llm.generate([[1, 2, 3], [4, 5]], sps, use_tqdm=False)
    assert all(len(o["token_ids"]) == 8 for o in outs)
    # The greedy request must not be perturbed by sharing a batch with a
    # filtered one.
    solo = llm.generate([[4, 5]],
                        SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True), use_tqdm=False)
    assert solo[0]["token_ids"] == outs[1]["token_ids"]


def test_fused_sample_greedy_matches_dense_argmax():
    """fused_sample (LM head + sampling over vocab tiles, no [S, V] logits)
    must reproduce argmax(last @ W) exactly for greedy rows, including
    first-maximum tie-breaking across tile boundaries."""
    import jax
    from nanovllm_tpu.ops.sampler import VOCAB_TILE, fused_sample
    s, h = 5, 64
    v = VOCAB_TILE * 2 + 300  # three tiles, ragged tail
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    last = jax.random.normal(k1, (s, h), jnp.float32)
    w = jax.random.normal(k2, (h, v), jnp.float32)
    temps = jnp.zeros(s, jnp.float32)
    dense = jnp.argmax(last @ w, axis=-1).astype(jnp.int32)
    out = fused_sample(last, w, temps, k3)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dense))


def test_fused_sample_quantized_head_and_temperature():
    """Quantized (int8 and packed int4) heads work tile-sliced, and T>0
    rows draw valid, non-degenerate tokens."""
    import jax
    from nanovllm_tpu.ops.quant import quantize_weight
    from nanovllm_tpu.ops.sampler import fused_sample
    s, h, v = 4, 64, 1000
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    last = jax.random.normal(k1, (s, h), jnp.float32)
    w = jax.random.normal(k2, (h, v), jnp.float32)
    temps = jnp.zeros(s, jnp.float32)
    from nanovllm_tpu.ops.quant import qmm
    for wq in (quantize_weight(w, 8),
               quantize_weight(w, 4, pack=True, layout="planes")):
        out = fused_sample(last, wq, temps, k3)
        # Exact oracle: dense argmax over the SAME quantized logits.
        dense_q = jnp.argmax(qmm(last, wq, preferred=jnp.float32), axis=-1)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(dense_q, np.int32))
    # Temperature sampling: tokens in range, not all identical across seeds.
    temps = jnp.full(s, 1.0, jnp.float32)
    outs = {tuple(np.asarray(fused_sample(last, w, temps,
                                          jax.random.PRNGKey(i))))
            for i in range(4)}
    assert len(outs) > 1
    for o in outs:
        assert all(0 <= t < v for t in o)
