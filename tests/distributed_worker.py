"""Worker for the 2-process jax.distributed smoke test (run by
tests/test_distributed.py, one invocation per simulated host).

Each process owns 4 virtual CPU devices; jax.distributed.initialize stitches
them into one 8-device runtime, and the engine serves over a tp=8 mesh that
SPANS THE PROCESS BOUNDARY — the multi-host control-plane design
(replicated deterministic scheduling, Config.distributed) actually executed
across two OS processes rather than dry-run on one.
"""

import json
import os
import sys

# Repo root on the path without PYTHONPATH (which breaks the ambient TPU
# plugin registration — see .claude/skills/verify).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=proc_id)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from nanovllm_tpu.config import ModelConfig
    from nanovllm_tpu.llm import LLM
    from nanovllm_tpu.sampling_params import SamplingParams

    mc = ModelConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=16, num_key_value_heads=8, head_dim=32,
        vocab_size=256, max_position_embeddings=512, eos_token_id=0)
    llm = LLM(
        "", model_config=mc, max_num_batched_tokens=512, max_num_seqs=8,
        max_model_len=128, kvcache_block_size=16, num_kvcache_blocks=32,
        attn_backend="ref", dtype="float32", load_format="random",
        tensor_parallel_size=8, distributed=True, decode_steps=2, seed=0,
        native_core=False)
    prompts = [list(range(1, 20)), [7, 3, 11]]
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True)
    outs = llm.generate(prompts, sp, use_tqdm=False)
    print("TOKENS", json.dumps([o["token_ids"] for o in outs]), flush=True)


if __name__ == "__main__":
    main()
