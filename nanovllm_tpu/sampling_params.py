"""Per-request sampling knobs (reference: nanovllm/sampling_params.py:4-8,
which has only temperature/max_tokens/ignore_eos; top_k/top_p are
beyond-reference capability)."""

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    # Nucleus / top-k filtering (0 / 1.0 = off). Filtering runs in-jit on
    # sorted logits; requests that leave both off compile the unfiltered
    # sampler program (no per-step sort).
    top_k: int = 0
    top_p: float = 1.0

    def __post_init__(self):
        assert self.temperature >= 0.0
        assert self.max_tokens >= 1
        assert self.top_k >= 0
        assert 0.0 < self.top_p <= 1.0
