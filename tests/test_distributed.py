"""Multi-host smoke test: TWO OS processes, each with 4 virtual CPU devices,
joined by jax.distributed into one 8-device runtime; the engine serves over a
tp=8 mesh spanning the process boundary (Config.distributed=True path,
reference control-plane counterpart: nanovllm/engine/model_runner.py:49-104).

Asserts both "hosts" finish, emit identical greedy tokens, and match the
single-process tp=8 run of the same model/seed — i.e. the replicated
no-control-plane scheduling design holds across real process boundaries.
"""

import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same model config / seed / prompts as the worker, tp=8 on this
    process's 8 virtual devices."""
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
        tensor_parallel_size=8, decode_steps=2, seed=0, native_core=False)
    outs = llm.generate(
        [list(range(1, 20)), [7, 3, 11]],
        SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True),
        use_tqdm=False)
    return [o["token_ids"] for o in outs]


def test_two_process_tp8_identical_tokens():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{stdout[-3000:]}"
        toks = [json.loads(l.split(" ", 1)[1]) for l in stdout.splitlines()
                if l.startswith("TOKENS ")]
        assert len(toks) == 1, stdout[-2000:]
        outs.append(toks[0])
    assert outs[0] == outs[1], f"hosts diverged: {outs}"
    # Cross-check vs the single-process tp=8 run (same model config, seed,
    # prompts as the worker): process boundaries must not change tokens.
    assert outs[0] == _single_process_reference()
