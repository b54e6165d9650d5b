"""First-request TTFT: cold vs warmed engine (VERDICT round-1 item 9).

The reference pays its compile/capture cost at construction unconditionally
(warmup_model + capture_cudagraph, nanovllm/engine/model_runner.py:40-44).
Here `auto_warmup` (on by default on TPU) pre-compiles the saturated-serving
buckets at construction; this tool measures what the first real request pays
in each mode:

  warm      auto_warmup=True  (construction absorbs the compiles)
  lazy      auto_warmup=False (first request pays any uncached compiles)

Each mode reports engine construction time and the first request's TTFT.
The persistent XLA compilation cache (~/.cache/nanovllm_tpu_xla) serves both
modes across process restarts; use --fresh-cache to measure a truly cold
first compile (new empty cache dir).

Prints one JSON line per mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_mode(args, warm: bool) -> dict:
    import numpy as np
    from nanovllm_tpu import LLM, SamplingParams
    from bench import QWEN3_SIZES

    t0 = time.perf_counter()
    llm = LLM(
        args.model,
        model_config=None if args.model else QWEN3_SIZES[args.model_size],
        max_model_len=args.input_len + args.output_len,
        max_num_batched_tokens=max(8192, args.input_len + args.output_len),
        max_num_seqs=args.num_seqs,
        attn_backend=args.attn_backend,
        kv_cache_dtype=args.kv_cache_dtype,
        quant=args.quant,
        decode_steps=args.decode_steps,
        load_format="auto" if args.model else "random",
        auto_warmup=warm,
    )
    t_build = time.perf_counter() - t0
    rng = np.random.default_rng(0)
    vocab = llm.config.model_config.vocab_size
    prompts = [rng.integers(0, vocab, size=args.input_len).tolist()
               for _ in range(args.num_seqs)]
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)
    t1 = time.perf_counter()
    llm.generate(prompts, sp, use_tqdm=False)
    gen_s = time.perf_counter() - t1
    ttft = llm.metrics.summary()["ttft"]
    return {
        "mode": "warm" if warm else "lazy",
        "build_s": round(t_build, 2),
        "ttft_p50_ms": ttft.get("p50_ms"),
        "ttft_max_ms": ttft.get("max_ms"),
        "first_generate_s": round(gen_s, 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="")
    p.add_argument("--model-size", default="0.6B")
    p.add_argument("--num-seqs", type=int, default=8)
    p.add_argument("--input-len", type=int, default=1024)
    p.add_argument("--output-len", type=int, default=32)
    p.add_argument("--attn-backend", default="pallas")
    p.add_argument("--kv-cache-dtype", default="int8")
    p.add_argument("--quant", default="int8")
    p.add_argument("--decode-steps", type=int, default=128)
    p.add_argument("--modes", nargs="+", default=["warm", "lazy"],
                   choices=["warm", "lazy"])
    p.add_argument("--fresh-cache", action="store_true",
                   help="empty XLA compilation cache: true cold compiles")
    args = p.parse_args()

    if args.fresh_cache:
        os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
            prefix="nanovllm_xla_cold_")
    # One mode per process would be cleaner isolation, but jit caches are
    # per-(fn, shapes) and each mode constructs a fresh LLM/ModelRunner, so
    # in-process buckets are NOT shared; only the persistent XLA disk cache
    # is — which is exactly the production condition being measured.
    for mode in args.modes:
        print(json.dumps(run_mode(args, warm=(mode == "warm"))), flush=True)


if __name__ == "__main__":
    main()
