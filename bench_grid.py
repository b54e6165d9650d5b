"""Backend crossover grid benchmark (reference: bench_my.py — backends x
batch-sizes x input-lens, output_len = input_len, decode-only tok/s, OOM
cells caught and tabulated)."""

from __future__ import annotations

import argparse
import gc
import json
import time

import numpy as np

from nanovllm_tpu import LLM, SamplingParams
from bench import QWEN3_0_6B


def run_cell(llm, bs: int, input_len: int, rng, output_len: int = 0) -> float | None:
    # `rng` is ONE stream across the whole grid (the reference seeds once at
    # bench_my.py startup): re-seeding per cell would replay the same token
    # stream at a different sequence length, and the resulting cross-cell
    # prefix-cache hits make the untimed warmup run compile different jit
    # buckets than the timed runs — which then pay the compiles.
    vocab = llm.config.model_config.vocab_size
    output_len = output_len or input_len
    sp = SamplingParams(temperature=0.0, max_tokens=output_len, ignore_eos=True)
    try:
        # First run compiles this cell's jit buckets (the reference's CUDA
        # warmup role); best of two timed runs survives stragglers (a tail
        # dispatch bucket can still compile inside the first timed run).
        best = float("inf")
        for timed in (False, True, True):
            prompts = [rng.integers(0, vocab, size=input_len).tolist()
                       for _ in range(bs)]
            t0 = time.perf_counter()
            llm.generate(prompts, sp, use_tqdm=False)
            dt = time.perf_counter() - t0
            if timed:
                best = min(best, dt)
        return bs * output_len / best
    except Exception as e:  # XLA OOM surfaces as RuntimeError
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            return None
        raise


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="")
    p.add_argument("--backends", nargs="+", default=["pallas", "ref"])
    p.add_argument("--batch-sizes", nargs="+", type=int, default=[16, 32, 64])
    p.add_argument("--input-lens", nargs="+", type=int,
                   default=[512, 1024, 2048])
    p.add_argument("--kv-cache-dtype", default="int8",
                   choices=["auto", "bfloat16", "int8", "int4"])
    # Weight-only INT8 (accuracy-gated by tests/test_model_parity.py): small
    # batches are weight-read-bound, so fused-dequant matmuls lift the
    # bs=16 column the most.
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--decode-steps", type=int, default=64)
    # 0 = output_len == input_len (the reference grid's convention); the
    # reference's bs=32 latency sweep instead holds output at 512 while
    # input grows (README.md:178-193 — elapsed * tok/s == 32*512 per row).
    p.add_argument("--output-len", type=int, default=0)
    args = p.parse_args()

    max_len = max(args.input_lens) + (args.output_len
                                      or max(args.input_lens))
    results: dict[str, dict] = {}
    for backend in args.backends:
        llm = LLM(
            args.model,
            model_config=None if args.model else QWEN3_0_6B,
            max_model_len=max_len,
            max_num_batched_tokens=max(8192, max_len),
            max_num_seqs=max(args.batch_sizes),
            attn_backend=backend,
            kv_cache_dtype=args.kv_cache_dtype,
            quant=args.quant,
            decode_steps=args.decode_steps,
            load_format="auto" if args.model else "random",
        )
        llm.generate([[1] * 16], SamplingParams(max_tokens=2, ignore_eos=True),
                     use_tqdm=False)  # warmup (the short-prompt bug path)
        rng = np.random.default_rng(0)
        for bs in args.batch_sizes:
            for ln in args.input_lens:
                tput = run_cell(llm, bs, ln, rng, args.output_len)
                results[f"{backend}/{bs}/{ln}"] = (
                    None if tput is None else round(tput, 1))
                print(f"{backend:8s} bs={bs:<4d} len={ln:<6d} "
                      f"{'OOM' if tput is None else f'{tput:9.1f} tok/s'}",
                      flush=True)
        del llm
        gc.collect()

    print("\n=== decode tok/s (output-only), rows=batch, cols=len ===")
    for backend in args.backends:
        print(f"\n[{backend}]")
        header = "batch | " + " | ".join(f"{l:>9d}" for l in args.input_lens)
        print(header)
        print("-" * len(header))
        for bs in args.batch_sizes:
            cells = [results[f"{backend}/{bs}/{l}"] for l in args.input_lens]
            print(f"{bs:5d} | " + " | ".join(
                f"{'OOM':>9s}" if c is None else f"{c:9.1f}" for c in cells))
    print(json.dumps({"grid": results}))


if __name__ == "__main__":
    main()
