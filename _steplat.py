import time, numpy as np, jax
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_0_6B

cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, max_num_seqs=64,
             attn_backend="pallas", load_format="random")
runner = ModelRunner(cfg)
sch = Scheduler(cfg)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, 1024).tolist(),
                 SamplingParams(max_tokens=512, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(64)]
for s in seqs: sch.add(s)
# prefill all
t0 = time.perf_counter()
n_prefill_tokens = 0
while sch.waiting:
    batch, stats = sch.schedule()
    toks = runner.run(batch, stats.is_prefill)
    sch.postprocess(batch, toks)
    n_prefill_tokens += stats.num_scheduled_tokens
t1 = time.perf_counter()
print(f"prefill: {n_prefill_tokens} tok in {t1-t0:.2f}s (incl compile)", flush=True)
# decode steps
for trial in range(3):
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        batch, stats = sch.schedule()
        toks = runner.run(batch, stats.is_prefill)
        sch.postprocess(batch, toks)
    dt = (time.perf_counter() - t0) / n
    print(f"decode step bs=64: {dt*1e3:.1f} ms -> {64/dt:.0f} tok/s", flush=True)
