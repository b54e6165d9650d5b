"""Teacher-forced perplexity evaluation through the serving path.

North-star gate (BASELINE.md): <= 0.1 perplexity delta vs bf16 at matched
bit-width for INT8/INT4 weight-only and INT8 KV cache. The reference repo has
no accuracy evaluation at all (SURVEY §4) — its quality story is eyeballing
example.py output; this tool is the quantitative replacement.

The evaluation runs the REAL inference path, not a parallel eval graph: the
token stream is prefilled chunk by chunk through ModelRunner's attention
backend with the paged KV cache (later chunks read earlier KV through the
block table — the cached-prefix prefill path), so weight-only quantization,
KV-cache quantization, and the Pallas kernels are all measured exactly as
served. Only the LM-head row selection differs: logits are taken at every
query position instead of the last token, and the per-token NLL is reduced
in-jit (full [T, V] logits never leave the device).

Usage:
    python tools/eval_ppl.py --model /path/to/Qwen3-0.6B --text wiki.txt
    python tools/eval_ppl.py --model DIR --tokens toks.npy --sweep
    python tools/eval_ppl.py --sweep            # random weights: plumbing only

`--sweep` evaluates bf16, w8, w4, kv8, kv4, w8+kv8 and prints the delta
table plus the <= 0.1 gate verdict (one JSON line per config).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nanovllm_tpu.config import Config, ModelConfig, cdiv
from nanovllm_tpu.engine.batch import BatchMeta, build_prefill_meta
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.models import qwen3


@dataclasses.dataclass
class _Chunk:
    """Stand-in for engine.Sequence: one chunk of the eval stream, with all
    earlier chunks visible as cached prefix through the block table."""

    token_ids: list
    num_cached_tokens: int
    block_table: list
    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0

    def __len__(self):
        return len(self.token_ids)


def evaluate(config: Config, tokens, chunk: int = 512) -> dict:
    """Teacher-forced NLL of `tokens` (1-D int array) under `config`.

    Returns {"ppl", "nll_per_token", "tokens"} where `tokens` counts scored
    positions (total - 1: the first token is conditioned on, never scored).
    """
    tokens = np.asarray(tokens, np.int64)
    total = len(tokens)
    assert total >= 2, "need at least 2 tokens to score one prediction"
    runner = ModelRunner(config)
    cfg = runner.config
    page_size = cfg.kvcache_block_size
    q_tile = cfg.prefill_q_tile
    chunk = max(q_tile, (chunk // q_tile) * q_tile)
    assert total <= cfg.max_model_len, (
        f"{total} tokens > max_model_len {cfg.max_model_len}")
    n_pages = cdiv(total, page_size)
    assert n_pages <= cfg.num_kvcache_blocks
    block_table = list(range(n_pages))
    s_pad = 8  # padded seq-count bucket (shared by every chunk step)
    pk = cfg.pages_per_seq

    attn = runner._attn_fn(True, chunk, pk)
    mc = runner.mc

    def step(params, cache, meta, targets, mask):
        logits, cache = qwen3.forward(params, mc, cache, meta, attn)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        return cache, jnp.sum(nll * mask), jnp.sum(mask)

    step = jax.jit(step, donate_argnums=(1,))

    nll_sum, count = 0.0, 0.0
    cache = runner.kv_cache
    for c0 in range(0, total - 1, chunk):
        c1 = min(c0 + chunk, total)
        seq = _Chunk(tokens[:c1].tolist(), c0, block_table)
        raw = build_prefill_meta([seq], chunk, s_pad, page_size, pk,
                                 runner.num_slots, q_tile=q_tile)
        # Score EVERY query position, not just the last token: row j of the
        # flat layout is global position c0 + j.
        raw["last_token_idx"] = np.arange(chunk, dtype=np.int32)
        n_new = c1 - c0
        tgt = np.zeros(chunk, np.int32)
        msk = np.zeros(chunk, np.float32)
        j = np.arange(n_new)
        has_next = c0 + j + 1 < total
        tgt[:n_new] = np.where(has_next, tokens[np.minimum(c0 + j + 1,
                                                           total - 1)], 0)
        msk[:n_new] = has_next.astype(np.float32)
        meta = BatchMeta(**{k: jnp.asarray(v) for k, v in raw.items()})
        cache, s_nll, s_cnt = step(runner.params, cache, meta,
                                   jnp.asarray(tgt), jnp.asarray(msk))
        nll_sum += float(s_nll)
        count += float(s_cnt)
    nll = nll_sum / count
    return {"ppl": float(np.exp(nll)), "nll_per_token": nll,
            "tokens": int(count)}


# Sweep configs: (name, quant, kv_cache_dtype). "Matched bit-width" gate
# pairs: w8/kv8 vs bf16, w4/kv4 vs bf16.
SWEEP = [
    ("bf16", "none", "auto", False),
    ("w8", "int8", "auto", False),
    ("w4", "int4", "auto", False),
    ("kv8", "none", "int8", False),
    ("kv4", "none", "int4", False),
    ("w8+kv8", "int8", "int8", False),
    ("w8+kv8+qe", "int8", "int8", True),
    # The shipped composites: bench.py's default and the README 8B configs.
    ("w4+kv4", "int4", "int4", False),
    ("w4+kv4+qe", "int4", "int4", True),
    ("w8+kv4+qe", "int8", "int4", True),
]


def make_config(args, quant: str, kv_dtype: str,
                quant_embed: bool = False) -> Config:
    mc = None if args.model else ModelConfig()
    max_len = cdiv(args.n_tokens, 128) * 128
    return Config(
        args.model, model_config=mc,
        max_model_len=max_len,
        max_num_batched_tokens=max(max_len, args.chunk),
        max_num_seqs=8,
        attn_backend=args.backend,
        kvcache_block_size=args.page_size,
        prefill_q_tile=args.page_size,
        quant=quant, kv_cache_dtype=kv_dtype, quant_embed=quant_embed,
        load_format="auto" if args.model else "random",
        dtype=args.dtype,
    )


def load_tokens(args) -> np.ndarray:
    if args.tokens:
        toks = np.load(args.tokens)
    elif args.text:
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(args.model)
        toks = np.asarray(tok(open(args.text).read())["input_ids"])
    else:
        # Deterministic synthetic stream — plumbing/regression only (random
        # tokens give near-flat ppl; use --text/--tokens for real numbers).
        vocab = (ModelConfig.from_hf_dir(args.model).vocab_size
                 if args.model else ModelConfig().vocab_size)
        toks = np.random.default_rng(0).integers(0, vocab, args.n_tokens)
        print("WARNING: synthetic random tokens (pass --text or --tokens "
              "for a meaningful perplexity)", flush=True)
    return toks[: args.n_tokens]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="")
    p.add_argument("--tokens", default="", help=".npy int token file")
    p.add_argument("--text", default="", help="text file (uses model tokenizer)")
    p.add_argument("--n-tokens", type=int, default=4096)
    p.add_argument("--chunk", type=int, default=512)
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--backend", default="pallas", choices=["pallas", "ref"])
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quant", default="none", choices=["none", "int8", "int4"])
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "bfloat16", "int8", "int4"])
    p.add_argument("--quant-embed", action="store_true")
    p.add_argument("--sweep", action="store_true",
                   help="evaluate bf16 + all quant configs, print gate verdict")
    args = p.parse_args()

    toks = load_tokens(args)
    configs = SWEEP if args.sweep else [
        (f"{args.quant}/{args.kv_cache_dtype}", args.quant,
         args.kv_cache_dtype, args.quant_embed)]
    results = {}
    for name, quant, kvd, qe in configs:
        r = evaluate(make_config(args, quant, kvd, qe), toks, args.chunk)
        results[name] = r
        line = dict(config=name, quant=quant, kv_cache_dtype=kvd, **r)
        if "bf16" in results and name != "bf16":
            line["ppl_delta_vs_bf16"] = round(
                r["ppl"] - results["bf16"]["ppl"], 6)
        print(json.dumps(line), flush=True)
    if args.sweep:
        base = results["bf16"]["ppl"]
        worst = max((abs(r["ppl"] - base), n) for n, r in results.items()
                    if n != "bf16")
        verdict = "PASS" if worst[0] <= 0.1 else "FAIL"
        if not args.model:
            # Random weights: ppl ≈ vocab size (e^12 for Qwen3 shapes), so
            # a 0.1-ABSOLUTE-ppl delta is not a meaningful bar (the NLL
            # deltas are ~1e-3 nats). This mode only proves the plumbing;
            # the enforced gate runs in CI on a small model
            # (tests/test_ppl_gate.py) and on real checkpoints via --model.
            verdict = "PLUMBING-ONLY (random weights; gate needs --model)"
        print(json.dumps({"gate": "ppl_delta<=0.1", "verdict": verdict,
                          "worst_delta": round(worst[0], 6),
                          "worst_config": worst[1],
                          "bf16_ppl": round(base, 4)}))


if __name__ == "__main__":
    main()
