import numpy as np, time, sys
from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from bench import QWEN3_0_6B

cfg = Config(model="", model_config=QWEN3_0_6B, max_model_len=2048,
             max_num_batched_tokens=8192, max_num_seqs=48,
             attn_backend="ref", load_format="random", decode_steps=32)
runner = ModelRunner(cfg)
print("pages:", cfg.num_kvcache_blocks,
      "cache GB:", cfg.num_kvcache_blocks * runner._kv_bytes_per_page() / 2**30,
      flush=True)
sch = Scheduler(cfg)
rng = np.random.default_rng(0)
seqs = [Sequence(rng.integers(0, 151936, 1024).tolist(),
                 SamplingParams(max_tokens=4, ignore_eos=True),
                 block_size=cfg.kvcache_block_size) for _ in range(8)]
for s in seqs: sch.add(s)
batch, stats = sch.schedule()
print("prefill batch", stats, flush=True)
t0 = time.perf_counter()
toks = runner.run(batch, stats.is_prefill)
print("prefill ok in", time.perf_counter()-t0, flush=True)
