"""Continuous-batching scheduler: prefill-priority, FCFS decode,
preempt-from-tail with full recompute.

Behavior parity with reference nanovllm/engine/scheduler.py:22-110, with the
sign-encoded throughput hack replaced by a StepStats struct (SURVEY §2.5) and
the decode liveness edge (`assert scheduled_seqs`, reference scheduler.py:82)
handled: if the sole runnable sequence preempts itself, the step returns an
empty schedule instead of asserting, and the engine retries after the
waiting queue drains.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

from nanovllm_tpu.config import Config, next_pow2
from nanovllm_tpu.engine.native_core import make_block_manager
from nanovllm_tpu.engine.sequence import Sequence, SequenceStatus


@dataclass
class StepStats:
    is_prefill: bool
    num_scheduled_tokens: int  # uncached query tokens this step
    num_seqs: int
    num_preempted: int = 0
    num_steps: int = 1  # decode steps fused into this dispatch


class Scheduler:
    def __init__(self, config: Config):
        assert config.num_kvcache_blocks > 0, (
            "num_kvcache_blocks must be resolved (by the model runner) before "
            "the scheduler is constructed"
        )
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.max_model_len = config.max_model_len
        self.decode_steps = config.decode_steps
        self.prefill_q_tile = config.prefill_q_tile
        self.eos = config.eos
        self.block_manager = make_block_manager(
            config.num_kvcache_blocks, config.kvcache_block_size,
            native=config.native_core,
        )
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        self.num_preempted_total = 0
        # Sequences force-finished by schedule() (preempted past what the
        # page pool can ever re-admit); the engine drains these into outputs.
        self.force_finished: list[Sequence] = []

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    def add(self, seq: Sequence) -> None:
        self.waiting.append(seq)

    def prefill_admissible(self) -> bool:
        """True iff the next schedule() will schedule at least one prefill —
        exactly the prefill loop's first-iteration admission test. The engine
        uses this to decide when deferred prefill token fetches must be
        redeemed: any step that is not a prefill needs the pending tokens
        (decode metas read seq.last_token; page accounting reads the
        committed lengths) before schedule() runs."""
        if not self.waiting:
            return False
        seq = self.waiting[0]
        new_tokens = len(seq) - seq.num_cached_tokens
        padded = -(-new_tokens // self.prefill_q_tile) * self.prefill_q_tile
        return (padded <= self.max_num_batched_tokens
                and self.block_manager.can_allocate(seq))

    def schedule(self) -> tuple[list[Sequence], StepStats]:
        # Prefill first: drain `waiting` while the token budget, seq cap, and
        # page availability hold. The budget counts PADDED uncached tokens:
        # the dispatched program aligns every sequence's query segment to
        # prefill_q_tile (model_runner.bucket_key), so budgeting raw tokens
        # would let e.g. 256 one-token prompts compile a 32768-token step —
        # 4x the activation headroom the HBM budget reserved for
        # max_num_batched_tokens (and an unwarmed bucket that the tunnel
        # runtime would hang on rather than OOM).
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_batched_tokens = 0
        num_padded_tokens = 0
        tq = self.prefill_q_tile
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            new_tokens = len(seq) - seq.num_cached_tokens
            padded = -(-new_tokens // tq) * tq
            if (
                num_padded_tokens + padded > self.max_num_batched_tokens
                or not self.block_manager.can_allocate(seq)
            ):
                break
            num_seqs += 1
            self.block_manager.allocate(seq)
            num_batched_tokens += len(seq) - seq.num_cached_tokens
            num_padded_tokens += padded
            seq.status = SequenceStatus.RUNNING
            self.waiting.popleft()
            self.running.append(seq)
            scheduled.append(seq)
        if scheduled:
            return scheduled, StepStats(
                is_prefill=True,
                num_scheduled_tokens=num_batched_tokens,
                num_seqs=num_seqs,
            )
        if not self.running and self.waiting:
            # Nothing scheduled, nothing running: no future step can free
            # pages or budget, so the head of `waiting` is permanently
            # inadmissible. A PREEMPTED sequence that grew past what a small
            # page pool can ever re-allocate is finished with the tokens it
            # already produced (raising would discard the whole batch's
            # completed work); a fresh request is a pathological config
            # (add_request validates lengths), so raise loudly.
            seq = self.waiting[0]
            if seq.num_completion_tokens > 0:
                import logging
                logging.getLogger("nanovllm_tpu").warning(
                    "sequence %d (%d tokens) can no longer be scheduled "
                    "(free pages %d); returning its %d completed tokens — "
                    "raise num_kvcache_blocks (bench: --num-pages) to avoid "
                    "truncation", seq.seq_id, len(seq),
                    self.block_manager.num_free_blocks,
                    seq.num_completion_tokens)
                self.waiting.popleft()
                seq.status = SequenceStatus.FINISHED
                self.force_finished.append(seq)
                return [], StepStats(is_prefill=False,
                                     num_scheduled_tokens=0, num_seqs=0)
            raise RuntimeError(
                f"request of {len(seq)} tokens ({len(seq) - seq.num_cached_tokens}"
                f" uncached) can never be scheduled: padded budget "
                f"{self.max_num_batched_tokens}, free pages "
                f"{self.block_manager.num_free_blocks} — raise "
                f"num_kvcache_blocks (bench: --num-pages) or "
                f"max_num_batched_tokens")

        # Decode: FCFS over `running`; on page exhaustion preempt from the
        # tail (most recently admitted) until the head can reserve. K decode
        # steps run on-device per dispatch (TPU dispatch amortization —
        # replaces the reference's one-step CUDA-graph replay); each seq
        # reserves pages for K tokens ahead. Seqs that hit EOS/max_tokens
        # mid-dispatch are truncated in postprocess.
        k = self.decode_steps
        if self.running:
            # Never write KV past max_model_len capacity, and don't run fused
            # steps no sequence can use (every seq finishes at max_tokens;
            # overshoot past it is computed then discarded).
            cap = min(self.max_model_len - len(s) + 1 for s in self.running)
            # Round down to a power of two so the K-step jit bucket count
            # stays logarithmic as sequences approach max_model_len.
            k = max(1, min(k, cap))
            k = next_pow2(k + 1) // 2  # pow2 floor
            # Clamp by what any sequence can still use — rounded UP to the
            # next power of two (stays within the warmed bucket ladder;
            # overshoot is bounded by `useful` itself).
            useful = max(s.max_tokens - s.num_completion_tokens
                         for s in self.running)
            if useful < k:
                k = next_pow2(useful)
        num_preempted = 0
        while self.running and num_seqs < self.max_num_seqs:
            seq = self.running.popleft()
            while not self.block_manager.can_reserve(seq, k):
                if self.running:
                    num_preempted += self._preempt(self.running.pop())
                else:
                    num_preempted += self._preempt(seq)
                    seq = None
                    break
            if seq is not None:
                self.block_manager.reserve(seq, k)
                num_seqs += 1
                scheduled.append(seq)
        self.num_preempted_total += num_preempted
        # Put scheduled seqs back at the front, preserving order.
        self.running.extendleft(reversed(scheduled))
        return scheduled, StepStats(
            is_prefill=False,
            num_scheduled_tokens=len(scheduled) * k,
            num_seqs=len(scheduled),
            num_preempted=num_preempted,
            num_steps=k,
        )

    def _preempt(self, seq: Sequence) -> int:
        self.block_manager.deallocate(seq)
        seq.reset_for_recompute()
        self.waiting.appendleft(seq)
        return 1

    def postprocess(self, seqs: list[Sequence],
                    token_ids: list[list[int]] | list[int]) -> list[Sequence]:
        """token_ids: per-seq token list (one entry per fused decode step;
        prefill passes single-element lists). Tokens past EOS/max_tokens/
        max_model_len are overshoot from the fused dispatch and discarded."""
        finished = []
        for seq, tokens in zip(seqs, token_ids):
            if isinstance(tokens, int):
                tokens = [tokens]
            for token_id in tokens:
                seq.append_token(token_id)
                self.block_manager.commit_token(seq)
                if ((not seq.ignore_eos and token_id == self.eos)
                        or seq.num_completion_tokens >= seq.max_tokens
                        or len(seq) >= self.max_model_len):
                    seq.status = SequenceStatus.FINISHED
                    self.block_manager.deallocate(seq)
                    self.running.remove(seq)
                    finished.append(seq)
                    break
        return finished
