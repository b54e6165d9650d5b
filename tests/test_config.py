"""Config resolution rules.

The reference piggybacks config on the HF object and validates little
(nanovllm/config.py:9-38); this build's Config is first-class — these tests
pin its load-bearing resolutions: the kv_cache_dtype="auto" regime pick,
backend aliasing, and the dispatch-ceiling == admission-budget invariant.
"""

import pytest

from nanovllm_tpu.config import KV_AUTO_CTX_CROSSOVER, Config


def mk(**kw):
    kw.setdefault("max_num_batched_tokens", 8192)
    return Config(**kw)


def test_kv_auto_unquantized_stays_model_dtype():
    assert mk(quant="none").kv_cache_dtype == "bfloat16"
    assert mk(quant="none", dtype="float32").kv_cache_dtype == "float32"


def test_kv_auto_quantized_picks_measured_regime():
    # Crossover measured by the round-4 sweep: int8 KV wins short max
    # contexts, token-plane int4 wins long ones.
    short = mk(quant="int4", max_model_len=KV_AUTO_CTX_CROSSOVER)
    long = mk(quant="int4", max_model_len=KV_AUTO_CTX_CROSSOVER + 1)
    assert short.kv_cache_dtype == "int8"
    assert long.kv_cache_dtype == "int4"
    assert mk(quant="int8", max_model_len=512).kv_cache_dtype == "int8"
    assert mk(quant="int8", max_model_len=4096).kv_cache_dtype == "int4"


def test_kv_auto_respects_page_size_compatibility():
    # Quantized KV needs whole-scale-block pages; odd page sizes keep bf16.
    c = mk(quant="int4", kvcache_block_size=16, max_model_len=4096)
    assert c.kv_cache_dtype == "bfloat16"


def test_explicit_kv_dtype_is_untouched():
    c = mk(quant="int4", kv_cache_dtype="bfloat16", max_model_len=4096)
    assert c.kv_cache_dtype == "bfloat16"
    c = mk(quant="none", kv_cache_dtype="int8")
    assert c.kv_cache_dtype == "int8"


def test_backend_aliases_and_validation():
    assert mk(attn_backend="flash").attn_backend == "pallas"
    assert mk(attn_backend="triton").attn_backend == "pallas"
    assert mk(attn_backend="sdpa").attn_backend == "ref"
    with pytest.raises(AssertionError):
        mk(attn_backend="cudnn")


def test_budget_rounds_to_pow2_and_admits_max_prompt():
    c = mk(max_num_batched_tokens=5000, max_model_len=4096)
    assert c.max_num_batched_tokens == 8192
    with pytest.raises(AssertionError):
        mk(max_num_batched_tokens=2048, max_model_len=4096)
