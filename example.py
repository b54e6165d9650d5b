"""Chat demo (reference: example.py). With a real model dir (safetensors +
tokenizer) it runs chat-template prompts; without one it demos the engine on
random weights with token-id prompts."""

import argparse
import os

from nanovllm_tpu import LLM, SamplingParams


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=os.environ.get("NANOVLLM_MODEL", ""))
    p.add_argument("--attn-backend", default="pallas", choices=["pallas", "ref"])
    p.add_argument("--temperature", type=float, default=0.6)
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--max-tokens", type=int, default=256)
    args = p.parse_args()

    if args.model:
        llm = LLM(args.model, max_model_len=4096, attn_backend=args.attn_backend)
        tok = llm.tokenizer
        prompts = [
            tok.apply_chat_template(
                [{"role": "user", "content": q}],
                tokenize=False, add_generation_prompt=True,
                enable_thinking=False)
            for q in ("introduce yourself", "list all prime numbers within 20")
        ]
        sp = SamplingParams(temperature=args.temperature,
                            max_tokens=args.max_tokens,
                            top_k=args.top_k, top_p=args.top_p)
        for prompt, out in zip(prompts, llm.generate(prompts, sp)):
            print(f"\n{'=' * 60}\nPrompt: {prompt!r}\nCompletion: {out['text']!r}")
    else:
        from bench import QWEN3_0_6B
        llm = LLM("", model_config=QWEN3_0_6B, max_model_len=2048,
                  attn_backend=args.attn_backend, load_format="random")
        sp = SamplingParams(temperature=args.temperature, max_tokens=32,
                            ignore_eos=True, top_k=args.top_k,
                            top_p=args.top_p)
        outs = llm.generate([[1, 2, 3, 4, 5], list(range(100, 164))], sp)
        for out in outs:
            print("tokens:", out["token_ids"])


if __name__ == "__main__":
    main()
