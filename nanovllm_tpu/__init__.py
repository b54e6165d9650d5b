"""nanovllm_tpu: a TPU-native paged-KV continuous-batching inference engine.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
ztxdcyy/nano-vllm-learn (see SURVEY.md at the repo root)."""

from nanovllm_tpu.config import Config, ModelConfig
from nanovllm_tpu.llm import LLM
from nanovllm_tpu.sampling_params import SamplingParams

__all__ = ["LLM", "SamplingParams", "Config", "ModelConfig"]
__version__ = "0.1.0"
