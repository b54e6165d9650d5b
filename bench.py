"""Fixed-length throughput benchmark (reference: bench.py — de-randomized
64 × 1024in/1024out workload, README.md:59-60).

Prints a JSON result line {"metric", "value", "unit", "vs_baseline", ...}
after every timed pass (best-so-far; the LAST line is the result — two
passes by default, NANOVLLM_BENCH_RUNS overrides, guarding against the
tunnel's occasional multi-second single-dispatch stalls). vs_baseline is
against the reference's published flash-attn number for the same workload
(4085.22 tok/s, README.md:110-120 — unnamed cloud GPU, so a
cross-hardware ratio; see BASELINE.md row 2).

Runs with random-initialized Qwen3-0.6B-shaped weights when no model files
exist (throughput does not depend on weight values)."""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

logging.basicConfig(level=logging.INFO)

import numpy as np

from nanovllm_tpu import LLM, SamplingParams
from nanovllm_tpu.config import ModelConfig

BASELINE_FLASH_TOKS = 4085.22  # reference bench.py flash backend, 64x1024/1024

QWEN3_0_6B = ModelConfig(
    hidden_size=1024, intermediate_size=3072, num_hidden_layers=28,
    num_attention_heads=16, num_key_value_heads=8, head_dim=128,
    vocab_size=151936, rope_theta=1000000.0, max_position_embeddings=40960,
    tie_word_embeddings=True,
)

# The rest of the Qwen3 dense family (BASELINE.json config 5 asks for 8B with
# INT8 weights + INT8 KV; 8B int8 ≈ 8.2 GiB of weights — fits one v5e chip).
QWEN3_SIZES = {
    "0.6B": QWEN3_0_6B,
    "1.7B": ModelConfig(
        hidden_size=2048, intermediate_size=6144, num_hidden_layers=28,
        num_attention_heads=16, num_key_value_heads=8, head_dim=128,
        vocab_size=151936, rope_theta=1000000.0,
        max_position_embeddings=40960, tie_word_embeddings=True),
    "4B": ModelConfig(
        hidden_size=2560, intermediate_size=9728, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        vocab_size=151936, rope_theta=1000000.0,
        max_position_embeddings=40960, tie_word_embeddings=True),
    "8B": ModelConfig(
        hidden_size=4096, intermediate_size=12288, num_hidden_layers=36,
        num_attention_heads=32, num_key_value_heads=8, head_dim=128,
        vocab_size=151936, rope_theta=1000000.0,
        max_position_embeddings=40960, tie_word_embeddings=False),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=os.environ.get("NANOVLLM_MODEL", ""))
    p.add_argument("--model-size", default="0.6B", choices=sorted(QWEN3_SIZES),
                   help="Qwen3 shape when no --model dir is given")
    p.add_argument("--num-seqs", type=int, default=64)
    p.add_argument("--input-len", type=int, default=1024)
    p.add_argument("--output-len", type=int, default=1024)
    p.add_argument("--attn-backend", default="pallas", choices=["pallas", "ref"])
    # "auto" picks the MEASURED KV regime per max context (Config:
    # int8 <= 1536 tokens, token-plane int4 above — the round-4 sweep
    # crossover) whenever weights are quantized; with unquantized weights
    # it stays bf16. The random-weight throughput path defaults to
    # quant=int4 so auto engages; a REAL --model checkpoint defaults to
    # unquantized (pass --quant/--kv-cache-dtype explicitly to benchmark a
    # quantized real model). Accuracy for every shipped combo is CI-gated
    # at <= 0.1 ppl vs bf16 (tests/test_ppl_gate.py) — on a tiny
    # random-init model; full-size checkpoints are gated by
    # tools/eval_ppl.py. All quantized forms run under tensor parallelism
    # (shard_mapped Pallas kernels).
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "bfloat16", "int8", "int4"])
    p.add_argument("--quant", default=None, choices=["none", "int8", "int4"])
    p.add_argument("--quant-embed", action="store_true",
                   help="int8 embedding rows (frees vocab*hidden HBM bytes)")
    # 256 fused steps amortize the per-dispatch host round-trip to ~0.2 ms
    # (same-session A/B: 6056 vs 5960 tok/s over 128 at the default config).
    p.add_argument("--decode-steps", type=int, default=256)
    p.add_argument("--max-model-len", type=int, default=None)
    # Family-run knobs: bigger models need a smaller prefill token budget
    # (shrinks the activation headroom the HBM sizing reserves, freeing KV
    # pages) and may want a custom utilization on runtimes with real OOMs.
    p.add_argument("--max-batched-tokens", type=int, default=None)
    p.add_argument("--hbm-utilization", type=float, default=None)
    p.add_argument("--num-pages", type=int, default=None,
                   help="KV page count override (skips the HBM auto-sizing; "
                        "the tunnel runtime's usable ceiling varies by "
                        "session, so big-model runs pin their footprint)")
    # Prefill-MFU experiments (r2 verdict item 7): q-tile size and prefix
    # chunk width of the ragged Pallas prefill kernel.
    p.add_argument("--q-tile", type=int, default=None)
    p.add_argument("--pages-per-chunk", type=int, default=None)
    p.add_argument("--decode-pages-per-chunk", type=int, default=None)
    p.add_argument("--int4-concat", action="store_true",
                   help="INT4 decode concat chunk form (A/B vs per-plane)")
    p.add_argument("--no-fused-sampler", action="store_true",
                   help="materialize full logits + separate sampler (A/B)")
    p.add_argument("--no-defer-prefill", action="store_true",
                   help="fetch prefill tokens synchronously per step (A/B "
                        "vs the pipelined deferred-fetch default)")
    # Scaling-efficiency mode (north-star: >=85% tok/s efficiency 1 chip ->
    # 1 host -> >=2 hosts): --tp N shards the model over N local chips;
    # --distributed joins a pod slice first (jax.distributed.initialize) so
    # the mesh spans hosts. Efficiency = (tok/s at N) / (N * tok/s at 1).
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--distributed", action="store_true")
    args = p.parse_args()

    if args.quant is None:
        args.quant = "none" if args.model else "int4"
    max_model_len = args.max_model_len or (args.input_len + args.output_len)
    extra = {}
    if args.hbm_utilization is not None:
        extra["hbm_utilization"] = args.hbm_utilization
    if args.q_tile is not None:
        extra["prefill_q_tile"] = args.q_tile
    if args.pages_per_chunk is not None:
        extra["prefill_pages_per_chunk"] = args.pages_per_chunk
    if args.decode_pages_per_chunk is not None:
        extra["decode_pages_per_chunk"] = args.decode_pages_per_chunk
    if args.num_pages is not None:
        extra["num_kvcache_blocks"] = args.num_pages
    if args.int4_concat:
        extra["int4_planes_dots"] = False
    if args.no_fused_sampler:
        extra["fused_sampler"] = False
    if args.no_defer_prefill:
        extra["defer_prefill_fetch"] = False
    if args.tp > 1 and not args.model:
        # North-star gate: warn when the requested (model, tp) cell is
        # modeled below 85% tokens/s/chip efficiency (ICI-latency-bound
        # small-model cells; see README scaling table + parallel/scaling.py).
        from nanovllm_tpu.parallel.scaling import (EFFICIENCY_BAR,
                                                   modeled_efficiency)
        eff = modeled_efficiency(QWEN3_SIZES[args.model_size], args.tp,
                                 args.num_seqs,
                                 args.input_len + args.output_len // 2)
        if eff < EFFICIENCY_BAR:
            print(f"WARNING: Qwen3-{args.model_size} at tp={args.tp} "
                  f"bs={args.num_seqs} is modeled at {100*eff:.1f}% "
                  f"tokens/s/chip efficiency — below the {EFFICIENCY_BAR:.0%} "
                  f"bar (57+ per-step all-reduce latencies vs sub-ms/chip "
                  f"compute). Prefer a smaller tp or a larger batch/model "
                  f"for this cell.", flush=True)
    print(f"bench config: model={args.model or f'random-{args.model_size}'} "
          f"backend={args.attn_backend} quant={args.quant} "
          f"kv_cache_dtype={args.kv_cache_dtype} "
          f"quant_embed={args.quant_embed} tp={args.tp} "
          f"{args.num_seqs}x{args.input_len}/{args.output_len}", flush=True)
    llm = LLM(
        args.model,
        model_config=None if args.model else QWEN3_SIZES[args.model_size],
        max_model_len=max_model_len,
        max_num_batched_tokens=(args.max_batched_tokens
                                or max(8192, max_model_len)),
        **extra,
        max_num_seqs=min(args.num_seqs, 256),
        attn_backend=args.attn_backend,
        kv_cache_dtype=args.kv_cache_dtype,
        quant=args.quant,
        quant_embed=args.quant_embed,
        decode_steps=args.decode_steps,
        load_format="auto" if args.model else "random",
        tensor_parallel_size=args.tp,
        distributed=args.distributed,
        # The bench warms its exact workload buckets below; construction-time
        # auto-warmup would compile an extra general-purpose prefill bucket
        # (~minutes per model size on the tunnel) the workload never hits.
        auto_warmup=False,
    )

    if args.kv_cache_dtype == "auto":
        print(f"kv_cache_dtype auto -> {llm.config.kv_cache_dtype} "
              f"(max_model_len={max_model_len}, quant={args.quant})",
              flush=True)

    def vocab_of(llm):
        return llm.config.model_config.vocab_size

    vocab = vocab_of(llm)
    sp = SamplingParams(temperature=0.6, max_tokens=args.output_len,
                        ignore_eos=True)

    # Warmup: compile the exact buckets the workload will hit (CUDA-graph-
    # capture equivalent), excluded from timing like the reference's warmup
    # generate. The scheduler packs by TILE-PADDED tokens, so the warm shape
    # must use the padded per-seq length or it compiles a never-hit bucket.
    tq = llm.config.prefill_q_tile
    pad_len = -(-args.input_len // tq) * tq
    seqs_per_prefill = min(args.num_seqs,
                           max(1, llm.config.max_num_batched_tokens
                               // pad_len))
    llm.warmup(decode_bs=[args.num_seqs],
               prefill=[(seqs_per_prefill * pad_len, seqs_per_prefill)])
    # Warmup generate (excluded from timing, like the reference bench.py's):
    # different random prompts, same shapes — absorbs first-execution stalls
    # without seeding the prefix cache for the timed prompts.
    wrng = np.random.default_rng(1)
    wprompts = [wrng.integers(0, vocab_of(llm), size=args.input_len).tolist()
                for _ in range(args.num_seqs)]
    llm.generate(wprompts,
                 SamplingParams(temperature=0.6,
                                max_tokens=min(args.decode_steps,
                                               args.output_len),
                                ignore_eos=True),
                 use_tqdm=False)
    from nanovllm_tpu.utils.metrics import EngineMetrics

    # Two timed passes, best reported (both recorded in the JSON): the
    # tunnel occasionally wedges a single dispatch for many seconds
    # (measured 12 s once on an otherwise-healthy run), which would
    # misrepresent a single-shot measurement. Each pass uses fresh random
    # prompts so the prefix cache never serves a previous pass.
    total_out = args.num_seqs * args.output_len  # output-only, like reference
    n_runs = int(os.environ.get("NANOVLLM_BENCH_RUNS", "2"))
    tag = args.attn_backend
    kvd = llm.config.kv_cache_dtype  # "auto" resolved by Config
    if kvd == "int8":
        tag += "+kv8"
    elif kvd == "int4":
        tag += "+kv4"
    if args.quant != "none":
        tag += f"+w{args.quant[3:]}"
        if args.quant_embed:
            tag += "+qe"
    if args.tp > 1:
        tag += f"+tp{args.tp}"
    import sys

    # MFU (verdict r2 item 7): model FLOPs per token over the chip's bf16
    # peak. Matmul term = 2 * matmul params; attention term = 4*H*D*context
    # (QK^T + PV at 2 FLOPs/MAC), causal-averaged for prefill.
    mc2 = llm.config.model_config
    mm_params = (mc2.num_hidden_layers * (
        mc2.hidden_size * (mc2.num_attention_heads
                           + 2 * mc2.num_key_value_heads) * mc2.head_dim
        + mc2.num_attention_heads * mc2.head_dim * mc2.hidden_size
        + 3 * mc2.hidden_size * mc2.intermediate_size)
        + mc2.hidden_size * mc2.vocab_size)
    attn_per_tok = lambda ctx: (4 * mc2.num_attention_heads * mc2.head_dim
                                * ctx * mc2.num_hidden_layers)
    import jax
    kind = (getattr(jax.devices()[0], "device_kind", "") or "").lower()
    peak = next((v for k, v in {"v5 lite": 197e12, "v5e": 197e12,
                                "v5p": 459e12, "v6": 918e12, "v4": 275e12,
                                "v5": 459e12}.items() if k in kind), 0)

    def emit(toks, summary, runs):
        """One JSON result line for the CURRENT best — emitted after EVERY
        timed pass, so a harness that kills the bench mid-pass still finds
        the latest completed result as the last JSON line."""
        print("engine metrics (best run):", json.dumps(summary),
              file=sys.stderr)
        if len(runs) > 1:
            print("timed runs tok/s:", runs, file=sys.stderr)
        mfu = {}
        if peak:
            pf, dc = summary["prefill_tok_per_s"], summary["decode_tok_per_s"]
            mfu = {
                "prefill_mfu_pct": round(
                    100 * pf * (2 * mm_params + attn_per_tok(
                        args.input_len / 2)) / peak
                    / llm.config.tensor_parallel_size, 1),
                "decode_mfu_pct": round(
                    100 * dc * (2 * mm_params + attn_per_tok(
                        args.input_len + args.output_len / 2)) / peak
                    / llm.config.tensor_parallel_size, 1),
            }
            print("mfu:", json.dumps(mfu), file=sys.stderr)
        print(json.dumps({
            "metric": f"decode tok/s Qwen3-{args.model_size} "
                      f"{args.num_seqs}x{args.input_len}/"
                      f"{args.output_len} {tag}",
            "value": round(toks, 2),
            "unit": "tok/s",
            "vs_baseline": round(toks / BASELINE_FLASH_TOKS, 3),
            "ttft_p50_ms": summary["ttft"].get("p50_ms"),
            "runs": runs,
            # Scaling-efficiency measurement (north-star >=85%): efficiency
            # at tp=N is toks_per_chip(N) / toks_per_chip(1), same workload
            # and session. Modeled prediction: tools/scaling_model.py.
            "toks_per_chip": round(toks / llm.config.tensor_parallel_size,
                                   2),
            **mfu,
        }), flush=True)

    runs, best_toks, summary = [], 0.0, None
    for run_i in range(max(n_runs, 1)):
        prng = np.random.default_rng(100 + run_i)
        run_prompts = [prng.integers(0, vocab, size=args.input_len).tolist()
                       for _ in range(args.num_seqs)]
        llm.metrics = EngineMetrics()  # report only this timed region
        t0 = time.perf_counter()
        llm.generate(run_prompts, sp, use_tqdm=True)
        dt = time.perf_counter() - t0
        runs.append(round(total_out / dt, 2))
        if runs[-1] > best_toks:
            best_toks, summary = runs[-1], llm.metrics.summary()
        emit(best_toks, summary, runs)


if __name__ == "__main__":
    main()
