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
