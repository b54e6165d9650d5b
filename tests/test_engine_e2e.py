"""End-to-end engine tests on CPU with a tiny random-weight model:
continuous batching, prefix-cache reuse across requests, preemption recovery,
greedy determinism (reference verification strategy was example/bench-driven,
SURVEY §4 — these are its test-suite form)."""

import numpy as np
import pytest

from nanovllm_tpu.config import Config, ModelConfig
from nanovllm_tpu.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams


def make_llm(**over):
    mc = ModelConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=128, max_position_embeddings=512, eos_token_id=0,
    )
    kw = dict(
        model_config=mc, max_num_batched_tokens=512, max_num_seqs=16,
        max_model_len=256, kvcache_block_size=16, num_kvcache_blocks=64,
        attn_backend="ref", dtype="float32", load_format="random", seed=0,
        decode_steps=4,  # exercise fused multi-step decode
    )
    kw.update(over)
    return LLM("", **kw)


@pytest.fixture(scope="module")
def llm():
    return make_llm()


def test_generate_batch(llm):
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 127, size=n).tolist() for n in (12, 40, 7)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert len(outs) == 3
    for o in outs:
        assert len(o["token_ids"]) == 8
        assert all(0 <= t < 128 for t in o["token_ids"])


def test_greedy_deterministic(llm):
    prompts = [[5, 9, 23, 41, 77]]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    a = llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    b = llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert a == b


def test_prefix_cache_reuse_same_output(llm):
    """Two requests sharing a long prefix: the second's prefill hits the
    prefix cache; greedy output must be identical to a fresh engine's."""
    prefix = list(range(1, 33))  # two full pages
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    first = llm.generate([prefix + [50]], sp, use_tqdm=False)[0]["token_ids"]
    hits0 = llm.scheduler.block_manager.cached_token_hits
    second = llm.generate([prefix + [50]], sp, use_tqdm=False)[0]["token_ids"]
    assert llm.scheduler.block_manager.cached_token_hits > hits0
    assert first == second


def test_sampling_respects_temperature(llm):
    prompts = [[3, 1, 4, 1, 5]]
    sp = SamplingParams(temperature=1.0, max_tokens=16, ignore_eos=True)
    outs = {tuple(llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"])
            for _ in range(3)}
    assert len(outs) > 1  # astronomically unlikely to collide 3x


def test_continuous_batching_mixed_lengths(llm):
    rng = np.random.default_rng(1)
    prompts = [rng.integers(1, 127, size=n).tolist()
               for n in (5, 60, 17, 33, 90, 2)]
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in (3, 10, 5, 7, 2, 20)]
    outs = llm.generate(prompts, sps, use_tqdm=False)
    for o, m in zip(outs, (3, 10, 5, 7, 2, 20)):
        assert len(o["token_ids"]) == m


def test_preemption_under_tight_memory():
    llm = make_llm(num_kvcache_blocks=10, max_num_seqs=4)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(1, 127, size=30).tolist() for _ in range(3)]
    sp = SamplingParams(temperature=0.0, max_tokens=40, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert all(len(o["token_ids"]) == 40 for o in outs)
    assert llm.scheduler.num_preempted_total > 0
    # All pages released at the end.
    assert llm.scheduler.block_manager.num_free_blocks == 10


def test_preemption_preserves_greedy_output():
    """Preempted seqs recompute from scratch; greedy output must be
    unaffected vs an uncontended engine."""
    sp = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(1, 127, size=25).tolist() for _ in range(3)]
    roomy = make_llm().generate(prompts, sp, use_tqdm=False)
    tight_llm = make_llm(num_kvcache_blocks=8, max_num_seqs=4)
    tight = tight_llm.generate(prompts, sp, use_tqdm=False)
    assert tight_llm.scheduler.num_preempted_total > 0
    for a, b in zip(roomy, tight):
        assert a["token_ids"] == b["token_ids"]


def test_multistep_matches_singlestep_greedy():
    """K fused decode steps must produce exactly the tokens K single steps
    produce (the on-device metadata advance is the correctness risk)."""
    sp = SamplingParams(temperature=0.0, max_tokens=13, ignore_eos=True)
    prompts = [[5, 9, 23, 41, 77], list(range(1, 30))]
    single = make_llm(decode_steps=1).generate(prompts, sp, use_tqdm=False)
    multi = make_llm(decode_steps=4).generate(prompts, sp, use_tqdm=False)
    for a, b in zip(single, multi):
        assert a["token_ids"] == b["token_ids"]


def test_eos_stops_generation():
    llm2 = make_llm(seed=7)
    # With random weights some token is argmax'd; set eos to whatever the
    # model emits first and re-run: generation must stop at 1 token.
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    first = llm2.generate([[10, 20, 30]], sp, use_tqdm=False)[0]["token_ids"]
    llm3 = make_llm(seed=7, eos=first[1])
    sp2 = SamplingParams(temperature=0.0, max_tokens=10)
    out = llm3.generate([[10, 20, 30]], sp2, use_tqdm=False)[0]["token_ids"]
    assert out[-1] == first[1]
    assert len(out) == 2


def test_pallas_backend_matches_ref_backend_e2e():
    """Full-engine greedy equivalence between the Pallas paged backend
    (interpreter mode on CPU) and the XLA reference backend — the
    reference's backend-vs-backend verification method (SURVEY §4)."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 127, size=n).tolist() for n in (12, 40)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    ref_out = make_llm().generate(prompts, sp, use_tqdm=False)
    pallas_out = make_llm(attn_backend="pallas").generate(
        prompts, sp, use_tqdm=False)
    for a, b in zip(ref_out, pallas_out):
        assert a["token_ids"] == b["token_ids"]


def test_int8_kv_cache_e2e_close_to_fp32():
    """Full engine with INT8 KV: greedy output should track fp32 closely on a
    tiny random model (exact match not guaranteed under quantization, but the
    engine must run and produce mostly-identical tokens)."""
    rng = np.random.default_rng(9)
    prompts = [rng.integers(1, 127, size=20).tolist()]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = make_llm(attn_backend="pallas").generate(prompts, sp,
                                                    use_tqdm=False)
    quant = make_llm(attn_backend="pallas", kv_cache_dtype="int8",
                     kvcache_block_size=128, num_kvcache_blocks=16).generate(
        prompts, sp, use_tqdm=False)
    matches = sum(a == b for a, b in zip(base[0]["token_ids"],
                                         quant[0]["token_ids"]))
    assert matches >= 6, (base[0]["token_ids"], quant[0]["token_ids"])

def test_pallas_prefix_cache_reuse_matches_ref():
    """Cached-prefix prefill through the Pallas ragged kernel (q tiles start
    at pos0 = cached length; the kernel reads prefix pages it did not write
    this step) must match the ref backend and the uncached first pass."""
    prefix = list(range(1, 33))  # two full 16-token pages
    prompts = [prefix + [50, 51]]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    ref_llm = make_llm()
    pal_llm = make_llm(attn_backend="pallas")
    ref1 = ref_llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    pal1 = pal_llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    hits0 = pal_llm.scheduler.block_manager.cached_token_hits
    pal2 = pal_llm.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert pal_llm.scheduler.block_manager.cached_token_hits > hits0
    assert ref1 == pal1 == pal2


def test_decode_token_metric_counts_only_emitted_tokens():
    """Fused K-step dispatches compute overshoot tokens past max_tokens that
    postprocess discards; metrics must count only emitted tokens. With
    heterogeneous max_tokens (none a multiple of K) every finishing dispatch
    has overshoot."""
    llm = make_llm(decode_steps=4)
    maxes = (3, 10, 5, 1)
    sps = [SamplingParams(temperature=0.0, max_tokens=m, ignore_eos=True)
           for m in maxes]
    outs = llm.generate([[7, 8], [9], [10, 11, 12], [13]], sps,
                        use_tqdm=False)
    emitted = sum(len(o["token_ids"]) for o in outs)
    assert emitted == sum(maxes)
    # Each seq's first completion token comes from its prefill step; the rest
    # are decode-phase tokens.
    assert llm.metrics.decode_tokens == emitted - len(maxes)


def test_enforce_eager_single_step_decode():
    """enforce_eager (reference model_runner.py:26,43) forces one-step
    dispatches: decode_steps is overridden to 1 and output is unchanged."""
    sp = SamplingParams(temperature=0.0, max_tokens=9, ignore_eos=True)
    prompts = [[5, 9, 23, 41, 77]]
    eager = make_llm(decode_steps=4, enforce_eager=True)
    assert eager.config.decode_steps == 1
    a = eager.generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    b = make_llm().generate(prompts, sp, use_tqdm=False)[0]["token_ids"]
    assert a == b
    # One dispatch per decode token (9 tokens: 1 from prefill, 8 decode).
    assert eager.metrics.num_steps == 1 + 8


def test_ttft_metric_recorded():
    """Every request gets exactly one TTFT sample (arrival -> first token),
    including requests finishing across different prefill steps."""
    llm = make_llm()
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    llm.generate([[1, 2, 3], [4, 5], [6, 7, 8, 9]], sp, use_tqdm=False)
    assert len(llm.metrics.ttft_s) == 3
    assert all(t > 0 for t in llm.metrics.ttft_s)
    summary = llm.metrics.summary()
    assert summary["ttft"]["p50_ms"] > 0


def test_warmup_is_inert():
    """auto_warmup pre-compiles and EXECUTES all-pad steps at construction
    (reference warmup_model + capture_cudagraph, model_runner.py:40-44);
    pad batches must not perturb serving state: greedy output of a warmed
    engine equals a lazy engine's, and the pad steps write no KV (a page
    served later reads exactly what the real request wrote)."""
    prompts = [[5, 9, 23, 41, 77], [3, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    lazy = make_llm().generate(prompts, sp, use_tqdm=False)
    warm_llm = make_llm(auto_warmup=True)
    warm = warm_llm.generate(prompts, sp, use_tqdm=False)
    assert [o["token_ids"] for o in lazy] == [o["token_ids"] for o in warm]
    # A second generate on the warmed engine reuses pages the pad steps
    # targeted (slot == num_slots): still deterministic.
    again = warm_llm.generate(prompts, sp, use_tqdm=False)
    assert [o["token_ids"] for o in again] == [o["token_ids"] for o in warm]


def test_overlong_prompt_raises_promptly():
    """Round-2 verdict repro: a prompt longer than max_model_len used to spin
    generate() forever (prefill admission failed every step, nothing ran).
    The contract is a loud ValueError at submission."""
    llm = make_llm(max_model_len=64, max_num_batched_tokens=512)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    with pytest.raises(ValueError, match="max_model_len"):
        llm.generate([list(range(1, 100))], sp, use_tqdm=False)
    # Exactly max_model_len - 1 tokens still fits (room for one new token).
    out = llm.generate([[1] * 63], sp, use_tqdm=False)
    assert out[0]["token_ids"]


def test_empty_prompt_raises():
    llm = make_llm()
    with pytest.raises(ValueError, match="empty"):
        llm.generate([[]], SamplingParams(max_tokens=4), use_tqdm=False)


def test_short_prompt_burst_stays_within_token_budget():
    """2x a prefill batch of one-token prompts: every dispatched prefill
    bucket T must stay within max_num_batched_tokens (padded budgeting)."""
    from nanovllm_tpu.engine.scheduler import StepStats  # noqa: F401
    llm = make_llm(max_num_batched_tokens=512, max_num_seqs=16,
                   prefill_q_tile=128)
    dispatched = []
    orig = llm.model_runner.bucket_key

    def spy(seqs, is_prefill, num_steps=1):
        key = orig(seqs, is_prefill, num_steps)
        if is_prefill:
            dispatched.append(key[1])
        return key

    llm.model_runner.bucket_key = spy
    prompts = [[i + 1] for i in range(8)]
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert len(outs) == 8 and all(len(o["token_ids"]) == 4 for o in outs)
    assert dispatched and max(dispatched) <= 512
    # 8 seqs x 128-token padded segments = 1024 > 512: must have split.
    assert len(dispatched) >= 2


def test_int4_weights_pallas_matches_ref_backend_e2e():
    """INT4 plane-packed weights (the Pallas dequant matmul) through the
    full engine: both attention backends must emit identical greedy tokens
    (the matmul path is shared, so any divergence isolates the attn/quant
    interaction)."""
    rng = np.random.default_rng(11)
    prompts = [rng.integers(1, 127, size=n).tolist() for n in (9, 33)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    ref_out = make_llm(quant="int4").generate(prompts, sp, use_tqdm=False)
    pallas_out = make_llm(quant="int4", attn_backend="pallas").generate(
        prompts, sp, use_tqdm=False)
    for a, b in zip(ref_out, pallas_out):
        assert a["token_ids"] == b["token_ids"]


def test_failed_batch_leaves_no_orphans():
    """A ValueError mid-batch must withdraw the batch's already-enqueued
    prompts — otherwise the next generate() silently spends steps finishing
    abandoned work."""
    llm = make_llm(max_model_len=64, max_num_batched_tokens=512)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    with pytest.raises(ValueError):
        llm.generate([[1, 2, 3], [4, 5, 6], list(range(1, 100))], sp,
                     use_tqdm=False)
    assert llm.scheduler.is_finished()  # nothing left behind
    out = llm.generate([[7, 8, 9]], sp, use_tqdm=False)
    assert len(out) == 1 and len(out[0]["token_ids"]) == 4


def test_deferred_prefill_fetch_matches_eager_fetch():
    """defer_prefill_fetch pipelines prefill dispatches and redeems the
    token fetches at the first non-prefill step; outputs must be identical
    to the synchronous path, including multi-wave prefill bursts (budget
    forces several waves), max_tokens=1 requests that finish AT the flush,
    and mixed lengths."""
    rng = np.random.default_rng(5)
    prompts = [rng.integers(1, 127, size=n).tolist()
               for n in (60, 31, 44, 52, 17, 38, 29, 61)]
    sps = [SamplingParams(temperature=0.0,
                          max_tokens=1 if i % 3 == 0 else 6,
                          ignore_eos=True)
           for i in range(len(prompts))]
    # budget 128 = one q_tile: every prompt pads to 128, one seq per wave.
    a = make_llm(max_num_batched_tokens=128, max_model_len=128,
                 defer_prefill_fetch=True).generate(prompts, sps,
                                                    use_tqdm=False)
    b = make_llm(max_num_batched_tokens=128, max_model_len=128,
                 defer_prefill_fetch=False).generate(prompts, sps,
                                                     use_tqdm=False)
    for i, (x, y) in enumerate(zip(a, b)):
        assert x["token_ids"] == y["token_ids"], i
        assert len(x["token_ids"]) == sps[i].max_tokens
    # The flush-only A/B knob (NANOVLLM_FLUSH_ONLY=1 skips the one-behind
    # redemption) must not change outputs either.
    import os
    os.environ["NANOVLLM_FLUSH_ONLY"] = "1"
    try:
        c = make_llm(max_num_batched_tokens=128, max_model_len=128,
                     defer_prefill_fetch=True).generate(prompts, sps,
                                                        use_tqdm=False)
    finally:
        del os.environ["NANOVLLM_FLUSH_ONLY"]
    for i, (x, y) in enumerate(zip(a, c)):
        assert x["token_ids"] == y["token_ids"], i


def test_deferred_prefill_all_single_token():
    """A workload that never decodes (every request max_tokens=1): the flush
    happens on the step after the waiting queue drains, and generate must
    still terminate with every output present."""
    rng = np.random.default_rng(6)
    prompts = [rng.integers(1, 127, size=20).tolist() for _ in range(5)]
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True)
    llm = make_llm(max_num_batched_tokens=128, max_model_len=128,
                   defer_prefill_fetch=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    assert len(outs) == 5
    assert all(len(o["token_ids"]) == 1 for o in outs)
    assert llm.scheduler.is_finished()
    assert not llm._pending_prefill


def test_deferred_prefill_with_midstream_add_request():
    """Manual step() driving with requests arriving between steps: deferral
    must flush before any decode step and newly added requests must still
    prefill (admissible check consults live waiting state)."""
    llm = make_llm(max_num_batched_tokens=128, max_model_len=128,
                   defer_prefill_fetch=True)
    eng = llm
    rng = np.random.default_rng(7)
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True)
    a = eng.add_request(rng.integers(1, 127, size=30).tolist(), sp)
    outs = {}
    steps = 0
    added_mid = False
    while not eng.is_finished() or not added_mid:
        done, stats = eng.step()
        for sid, toks in done:
            outs[sid] = toks
        steps += 1
        if steps == 2 and not added_mid:
            # Arrives while the first request is mid-decode.
            b = eng.add_request(rng.integers(1, 127, size=25).tolist(), sp)
            added_mid = True
        assert steps < 50
    assert len(outs) == 2
    assert all(len(t) == 4 for t in outs.values())
