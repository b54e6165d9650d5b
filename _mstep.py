import logging; logging.basicConfig(level=logging.INFO)
import time, numpy as np
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_0_6B

cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, 
             attn_backend="pallas", load_format="random", decode_steps=32,
             kv_cache_dtype="int8", max_num_seqs=64, kvcache_block_size=128)
runner = ModelRunner(cfg)
print("pages:", cfg.num_kvcache_blocks, flush=True)
sch = Scheduler(cfg)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, 1024).tolist(),
                 SamplingParams(max_tokens=768, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(64)]
for s in seqs: sch.add(s)
t0 = time.perf_counter()
npre = 0
while sch.waiting:
    batch, stats = sch.schedule()
    toks = runner.run(batch, stats.is_prefill, stats.num_steps)
    sch.postprocess(batch, toks)
    npre += stats.num_scheduled_tokens
print(f"prefill: {npre} tok in {time.perf_counter()-t0:.2f}s (incl compile)", flush=True)
batch, stats = sch.schedule()
t0 = time.perf_counter()
toks = runner.run(batch, stats.is_prefill, stats.num_steps)
sch.postprocess(batch, toks)
print(f"decode compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
for trial in range(3):
    t0 = time.perf_counter(); n = 5; tok_count = 0; pre = 0
    for _ in range(n):
        batch, stats = sch.schedule()
        toks = runner.run(batch, stats.is_prefill, stats.num_steps)
        sch.postprocess(batch, toks)
        tok_count += stats.num_seqs * stats.num_steps
        pre += stats.num_preempted
    dt = time.perf_counter() - t0
    print(f"decode: {tok_count} tok in {dt:.2f}s -> {tok_count/dt:.0f} tok/s "
          f"(bs~{tok_count//n//stats.num_steps}, preempted {pre})", flush=True)
