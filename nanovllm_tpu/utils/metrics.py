"""Serving metrics + optional profiler capture.

The reference's observability is a tqdm postfix and prints (SURVEY §5.1/§5.5:
tok/s postfix llm_engine.py:101-130, bench timers, one-shot debug prints).
Here: structured per-phase counters (prefill/decode token throughput, step
latency percentiles, prefix-cache hits, preemptions) plus an optional
`jax.profiler` trace window around N steps.
"""

from __future__ import annotations

import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class EngineMetrics:
    prefill_tokens: int = 0
    decode_tokens: int = 0
    prefill_time_s: float = 0.0
    decode_time_s: float = 0.0
    num_steps: int = 0
    num_preempted: int = 0
    step_times: dict = field(default_factory=lambda: defaultdict(list))
    ttft_s: list = field(default_factory=list)  # arrival → first token

    def record_step(self, stats, dt: float) -> None:
        self.num_steps += 1
        self.num_preempted += stats.num_preempted
        phase = "prefill" if stats.is_prefill else "decode"
        self.step_times[phase].append(dt)
        if stats.is_prefill:
            self.prefill_tokens += stats.num_scheduled_tokens
            self.prefill_time_s += dt
        else:
            self.decode_tokens += stats.num_scheduled_tokens
            self.decode_time_s += dt

    @staticmethod
    def _pcts(xs):
        if not xs:
            return {}
        xs = sorted(xs)
        at = lambda q: xs[min(len(xs) - 1, int(q * len(xs)))]
        return {"p50_ms": round(at(0.5) * 1e3, 2),
                "p90_ms": round(at(0.9) * 1e3, 2),
                "max_ms": round(xs[-1] * 1e3, 2)}

    def summary(self) -> dict:
        return {
            "prefill_tok_per_s": round(
                self.prefill_tokens / self.prefill_time_s, 1)
                if self.prefill_time_s else 0.0,
            "decode_tok_per_s": round(
                self.decode_tokens / self.decode_time_s, 1)
                if self.decode_time_s else 0.0,
            "prefill_tokens": self.prefill_tokens,
            "decode_tokens": self.decode_tokens,
            "num_steps": self.num_steps,
            "num_preempted": self.num_preempted,
            "prefill_step": self._pcts(self.step_times.get("prefill", [])),
            "decode_step": self._pcts(self.step_times.get("decode", [])),
            "ttft": self._pcts(self.ttft_s),
        }


class ProfilerWindow:
    """Capture a jax.profiler trace around a span of engine steps:

        with ProfilerWindow("/tmp/trace"):
            llm.generate(...)
    """

    def __init__(self, log_dir: str, enabled: bool = True):
        self.log_dir = log_dir
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            import jax
            jax.profiler.start_trace(self.log_dir)
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax
            jax.profiler.stop_trace()
        self.elapsed = time.perf_counter() - self.t0
        return False
