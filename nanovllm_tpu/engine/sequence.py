"""Per-request record: a growable token buffer + paging/serving state.

Fills the role of the reference's Sequence (nanovllm/engine/sequence.py) with
a different shape:
- Tokens live in ONE numpy buffer with amortized-doubling append; batch prep
  (engine/batch.py) and the C++ core (engine/native_core.py) slice it
  zero-copy instead of re-converting Python lists every step.
- The page size is injected per instance from the engine config — the
  reference hard-codes 256 at class level while the configurable value flows
  elsewhere (SURVEY §2.5); here there is one source of truth.
- No custom pickle wire format (reference sequence.py:77-90): TPU SPMD has no
  per-rank RPC plane, sequences never cross a process boundary.
- Only the members the engine actually consumes exist; derived views the
  reference carried but nothing read are gone.
"""

from __future__ import annotations

import time
from enum import Enum, auto
from itertools import count

import numpy as np

from nanovllm_tpu.sampling_params import SamplingParams


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    __slots__ = ("seq_id", "status", "arrival_t", "first_token_t",
                 "prompt_len", "num_cached_tokens", "block_table",
                 "temperature", "max_tokens", "ignore_eos", "top_k", "top_p",
                 "_page_size", "_toks", "_n")

    _ids = count()

    def __init__(self, token_ids, sampling_params: SamplingParams | None = None,
                 block_size: int = 64):
        sp = sampling_params or SamplingParams()
        n = len(token_ids)
        assert n > 0, "empty prompt"
        self.seq_id = next(Sequence._ids)
        self.status = SequenceStatus.WAITING
        self.arrival_t = time.perf_counter()
        self.first_token_t: float | None = None
        self.prompt_len = n
        # Paging state, owned jointly with the block manager: the pages
        # backing this sequence and how many leading tokens already have KV
        # in the cache (prefix hits + this dispatch's committed tokens).
        self.num_cached_tokens = 0
        self.block_table: list[int] = []
        self.temperature = sp.temperature
        self.max_tokens = sp.max_tokens
        self.ignore_eos = sp.ignore_eos
        self.top_k = sp.top_k
        self.top_p = sp.top_p
        self._page_size = block_size
        self._toks = np.empty(max(2 * n, 64), np.int64)
        self._toks[:n] = token_ids
        self._n = n

    def __len__(self) -> int:
        return self._n

    def append_token(self, token_id: int) -> None:
        if self._n == self._toks.shape[0]:
            grown = np.empty(2 * self._n, np.int64)
            grown[: self._n] = self._toks
            self._toks = grown
        self._toks[self._n] = token_id
        self._n += 1

    # ------------------------------------------------------------- views
    @property
    def token_ids(self) -> np.ndarray:
        """All tokens so far (zero-copy view — do not mutate)."""
        return self._toks[: self._n]

    @property
    def last_token(self) -> int:
        return int(self._toks[self._n - 1])

    @property
    def num_tokens(self) -> int:
        return self._n

    @property
    def num_completion_tokens(self) -> int:
        return self._n - self.prompt_len

    @property
    def completion_token_ids(self) -> list[int]:
        return self._toks[self.prompt_len: self._n].tolist()

    # --------------------------------------------------------- page views
    @property
    def num_blocks(self) -> int:
        """Pages needed to hold every token (last one may be partial)."""
        return -(-self._n // self._page_size)

    def block(self, i: int) -> np.ndarray:
        """Tokens living in page i of this sequence (zero-copy view)."""
        ps = self._page_size
        assert 0 <= i * ps < self._n
        return self._toks[i * ps: min((i + 1) * ps, self._n)]

    # ------------------------------------------------------------ control
    def reset_for_recompute(self) -> None:
        """Preemption drops all device state; the sequence re-prefills from
        scratch (prefix cache softens the recompute — reference
        scheduler.py:91-97 behavior)."""
        self.status = SequenceStatus.WAITING
        self.num_cached_tokens = 0
        self.block_table = []
