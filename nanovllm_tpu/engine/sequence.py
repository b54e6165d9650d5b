"""Per-request state machine.

Reference: nanovllm/engine/sequence.py. Differences by design:
- block_size is injected per-instance (the reference hard-codes 256 at class
  level while the config flows elsewhere — SURVEY §2.5); here the scheduler
  constructs sequences with the configured page size, one source of truth.
- No custom pickle wire format: TPU SPMD has no per-rank RPC plane, every
  host runs the same engine loop, so sequences never cross a process boundary.
"""

from __future__ import annotations

import time
from enum import Enum, auto
from itertools import count

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(
        self,
        token_ids: list[int],
        sampling_params: SamplingParams | None = None,
        block_size: int = 64,
    ):
        sampling_params = sampling_params or SamplingParams()
        self.seq_id = next(Sequence.counter)
        self.arrival_t = time.perf_counter()
        self.first_token_t: float | None = None
        self.status = SequenceStatus.WAITING
        self.token_ids = list(token_ids)
        self.last_token = token_ids[-1]
        self.num_tokens = len(self.token_ids)
        self.num_prompt_tokens = len(token_ids)
        self.num_cached_tokens = 0
        self.block_size = block_size
        self.block_table: list[int] = []
        self.temperature = sampling_params.temperature
        self.max_tokens = sampling_params.max_tokens
        self.ignore_eos = sampling_params.ignore_eos

    def __len__(self) -> int:
        return self.num_tokens

    def __getitem__(self, key):
        return self.token_ids[key]

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def num_completion_tokens(self) -> int:
        return self.num_tokens - self.num_prompt_tokens

    @property
    def prompt_token_ids(self) -> list[int]:
        return self.token_ids[: self.num_prompt_tokens]

    @property
    def completion_token_ids(self) -> list[int]:
        return self.token_ids[self.num_prompt_tokens:]

    @property
    def num_cached_blocks(self) -> int:
        return self.num_cached_tokens // self.block_size

    @property
    def num_blocks(self) -> int:
        return (self.num_tokens + self.block_size - 1) // self.block_size

    @property
    def last_block_num_tokens(self) -> int:
        return self.num_tokens - (self.num_blocks - 1) * self.block_size

    def block(self, i: int) -> list[int]:
        assert 0 <= i < self.num_blocks
        return self.token_ids[i * self.block_size:(i + 1) * self.block_size]

    def append_token(self, token_id: int) -> None:
        self.token_ids.append(token_id)
        self.last_token = token_id
        self.num_tokens += 1

    def reset_for_recompute(self) -> None:
        """Preemption drops all device state; the sequence re-prefills from
        scratch (prefix cache softens the recompute — reference
        scheduler.py:91-97 behavior)."""
        self.status = SequenceStatus.WAITING
        self.num_cached_tokens = 0
        self.block_table = []
