"""Isolate one bench_grid cell: per-run prefill/decode split via EngineMetrics.

Usage: python tools/probe_cell.py [bs] [input_len]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from nanovllm_tpu import LLM, SamplingParams  # noqa: E402
from nanovllm_tpu.utils.metrics import EngineMetrics  # noqa: E402
from bench import QWEN3_0_6B  # noqa: E402


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    input_len = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    max_len = 4096
    llm = LLM(
        "", model_config=QWEN3_0_6B, max_model_len=max_len,
        max_num_batched_tokens=max(8192, max_len), max_num_seqs=64,
        attn_backend="pallas", kv_cache_dtype="int8", quant="int8",
        decode_steps=64, load_format="random",
    )
    llm.generate([[1] * 16], SamplingParams(max_tokens=2, ignore_eos=True),
                 use_tqdm=False)
    rng = np.random.default_rng(0)
    vocab = llm.config.model_config.vocab_size
    sp = SamplingParams(temperature=0.0, max_tokens=input_len, ignore_eos=True)
    for run in range(3):
        prompts = [rng.integers(0, vocab, size=input_len).tolist()
                   for _ in range(bs)]
        llm.metrics = EngineMetrics()
        t0 = time.perf_counter()
        llm.generate(prompts, sp, use_tqdm=False)
        dt = time.perf_counter() - t0
        s = llm.metrics.summary()
        print(f"run{run}: {dt:.2f}s tok/s={bs*input_len/dt:.1f} "
              f"prefill={s['prefill_tokens']}tok@{s['prefill_tok_per_s']} "
              f"decode={s['decode_tokens']}tok@{s['decode_tok_per_s']} "
              f"steps={s['num_steps']} preempt={s['num_preempted']}",
              flush=True)
        print("  prefill_step:", json.dumps(s["prefill_step"]),
              "decode_step:", json.dumps(s["decode_step"]), flush=True)


if __name__ == "__main__":
    main()
