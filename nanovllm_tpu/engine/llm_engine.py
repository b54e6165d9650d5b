"""Top-level engine: tokenizer, scheduler, runner orchestration.

Reference: nanovllm/engine/llm_engine.py:17-143. Differences:
- No process spawning / SHM control plane: the TPU runtime is a single SPMD
  program (SURVEY §5.8); `exit()` is a no-op kept for API parity.
- `step()` returns (outputs, StepStats) instead of sign-encoding prefill vs
  decode in an int (SURVEY §2.5).
"""

from __future__ import annotations

import logging
import time
from dataclasses import fields

import jax

from nanovllm_tpu.config import Config
from nanovllm_tpu.engine.model_runner import ModelRunner
from nanovllm_tpu.engine.scheduler import Scheduler, StepStats
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams
from nanovllm_tpu.utils.metrics import EngineMetrics

logger = logging.getLogger("nanovllm_tpu")


class LLMEngine:
    def __init__(self, model: str = "", **kwargs):
        config_fields = {f.name for f in fields(Config)}
        config_kwargs = {k: v for k, v in kwargs.items() if k in config_fields}
        unknown = set(kwargs) - config_fields
        if unknown:
            raise TypeError(f"unknown engine arguments: {sorted(unknown)}")
        self.config = Config(model=model, **config_kwargs)

        self.tokenizer = None
        if model:
            from transformers import AutoTokenizer
            try:
                self.tokenizer = AutoTokenizer.from_pretrained(model)
            except Exception:  # missing/broken tokenizer files, any flavor
                # Weights-only checkpoint dir: token-id prompts still work
                # (string prompts assert in add_request).
                logger.warning("no tokenizer found under %s; "
                               "string prompts disabled", model)
            if self.tokenizer is not None \
                    and self.tokenizer.eos_token_id is not None:
                self.config.eos = self.tokenizer.eos_token_id

        self.model_runner = ModelRunner(self.config)
        # Runner resolves num_kvcache_blocks from the HBM budget first.
        self.scheduler = Scheduler(self.config)
        self.metrics = EngineMetrics()
        # Deferred prefill dispatches awaiting their token fetch:
        # [(seqs, stats, device_tokens)]. See Config.defer_prefill_fetch.
        self._pending_prefill: list = []
        self._prefill_last_t = 0.0
        auto = self.config.auto_warmup
        if auto is None:
            auto = self.model_runner.mesh.devices.flat[0].platform != "cpu"
        if auto:
            # Saturated-serving hot buckets; first-request TTFT then pays at
            # most a tail bucket compile (served by the persistent XLA cache
            # on repeat runs) instead of the full prefill+decode compile.
            # A prefill batch can hold at most budget/q_tile sequences (the
            # scheduler budgets tile-padded tokens), so warm that bucket —
            # warming s=max_num_seqs would compile a never-dispatched shape.
            max_prefill_seqs = min(
                self.config.max_num_seqs,
                self.config.max_num_batched_tokens // self.config.prefill_q_tile)
            self.warmup(
                decode_bs=[self.config.max_num_seqs],
                prefill=[(self.config.max_num_batched_tokens,
                          max_prefill_seqs)])

    def exit(self):  # API parity with the reference (llm_engine.py:47-60)
        pass

    def warmup(self, decode_bs=(), prefill=()):
        """Pre-compile step buckets before serving (the reference's warmup +
        CUDA-graph capture, model_runner.py:107-121, 317-370). prefill takes
        (total_tokens, num_seqs) pairs."""
        self.model_runner.warmup(decode_bs, prefill)

    def add_request(self, prompt, sampling_params: SamplingParams | None = None):
        if isinstance(prompt, str):
            assert self.tokenizer is not None, (
                "string prompts require a tokenizer (construct with a model path)"
            )
            prompt = self.tokenizer.encode(prompt)
        # Validate up front: an inadmissible request would otherwise sit at
        # the head of `waiting` forever and spin generate() (the reference
        # crashes late inside batch prep instead; this build's contract is a
        # loud error at submission time).
        if not prompt:
            raise ValueError("empty prompt")
        if len(prompt) + 1 > self.config.max_model_len:
            raise ValueError(
                f"prompt is {len(prompt)} tokens but max_model_len="
                f"{self.config.max_model_len} leaves no room to generate; "
                "raise max_model_len or truncate the prompt")
        seq = Sequence(prompt, sampling_params,
                       block_size=self.config.kvcache_block_size)
        self.scheduler.add(seq)
        return seq.seq_id

    def step(self) -> tuple[list[tuple[int, list[int]]], StepStats]:
        # Redeem deferred prefill fetches before any step that is not a
        # prefill: decode scheduling reads seq.last_token and the committed
        # lengths (and may free pages by finishing seqs, so it must run
        # BEFORE schedule()).
        flushed = []
        if self._pending_prefill and not self.scheduler.prefill_admissible():
            flushed = self._flush_prefill()
        seqs, stats = self.scheduler.schedule()
        forced = self.scheduler.force_finished
        if forced:
            # Permanently-inadmissible preempted sequences: return their
            # partial completions (scheduler.schedule documents the edge).
            self.scheduler.force_finished = []
            outs = flushed + [(s.seq_id, s.completion_token_ids)
                              for s in forced]
            return outs, stats
        if not seqs:
            # Liveness edge: the sole runnable seq preempted itself
            # (reference scheduler.py:78-82 assert) — nothing ran this step;
            # the next step re-admits it from `waiting`.
            return flushed, stats
        t0 = time.perf_counter()
        if stats.is_prefill and self.config.defer_prefill_fetch:
            tokens_dev = self.model_runner.run(seqs, True, stats.num_steps,
                                               defer=True)
            if not self._pending_prefill:
                self._prefill_last_t = t0
            self._pending_prefill.append((seqs, stats, tokens_dev))
            # ONE-BEHIND redemption: with this wave's dispatch enqueued, the
            # PREVIOUS wave is strictly ahead of it on the device stream, so
            # fetching it now waits only for its own completion while this
            # wave executes — first tokens land per wave (TTFT) without
            # stalling the pipeline (the flush-only policy deferred every
            # TTFT to the end of the whole prefill phase: p50 909 ms at
            # 64x1024, BENCH_r04).
            # NANOVLLM_FLUSH_ONLY=1 restores the round-4 flush-at-phase-end
            # policy (throughput A/B knob for the one-behind redemption).
            import os
            if len(self._pending_prefill) > 1 and \
                    not os.environ.get("NANOVLLM_FLUSH_ONLY"):
                flushed += self._redeem_oldest()
            return flushed, stats
        token_lists = self.model_runner.run(seqs, stats.is_prefill,
                                            stats.num_steps)
        t1 = time.perf_counter()
        before = sum(seq.num_tokens for seq in seqs)
        finished = self.scheduler.postprocess(seqs, token_lists)
        if not stats.is_prefill:
            # Honest decode accounting: a fused K-step dispatch may compute
            # tokens past EOS/max_tokens that postprocess discards; count only
            # the tokens that were actually emitted.
            stats.num_scheduled_tokens = \
                sum(seq.num_tokens for seq in seqs) - before
        self.metrics.record_step(stats, t1 - t0)
        for seq in seqs:
            if seq.first_token_t is None and seq.num_completion_tokens > 0:
                seq.first_token_t = t1
                self.metrics.ttft_s.append(t1 - seq.arrival_t)
        outputs = flushed + [(seq.seq_id, seq.completion_token_ids)
                             for seq in finished]
        return outputs, stats

    def _redeem_oldest(self) -> list[tuple[int, list[int]]]:
        """Fetch the OLDEST pending deferred prefill's tokens (waits only
        for that dispatch — later waves keep executing behind it),
        postprocess, and account its wall slice (time since the previous
        redemption, which in steady state is one pipelined wave)."""
        seqs, stats, tokens_dev = self._pending_prefill.pop(0)
        token_lists = self.model_runner.finalize_tokens(tokens_dev, len(seqs))
        finished = self.scheduler.postprocess(seqs, token_lists)
        t_end = time.perf_counter()
        self.metrics.record_step(
            stats, max(t_end - self._prefill_last_t, 1e-9))
        self._prefill_last_t = t_end
        for seq in seqs:
            if seq.first_token_t is None and seq.num_completion_tokens:
                seq.first_token_t = t_end
                self.metrics.ttft_s.append(t_end - seq.arrival_t)
        return [(s.seq_id, s.completion_token_ids) for s in finished]

    def _flush_prefill(self) -> list[tuple[int, list[int]]]:
        """Drain every still-pending deferred prefill (with one-behind
        redemption that is normally just the last wave) before decode
        scheduling reads the committed lengths."""
        outs = []
        while self._pending_prefill:
            outs += self._redeem_oldest()
        return outs

    def is_finished(self) -> bool:
        return self.scheduler.is_finished()

    def generate(self, prompts, sampling_params=None, use_tqdm: bool = True):
        """prompts: list of strings or token-id lists. Returns a list of
        {"text", "token_ids"} in submission order.

        Set NANOVLLM_PROFILE_DIR to capture a jax.profiler trace of the whole
        generate (viewable in XProf/TensorBoard) — the step-time breakdown
        the reference only had as tqdm postfix throughput (SURVEY §5.1)."""
        import contextlib
        import os
        profile_dir = os.environ.get("NANOVLLM_PROFILE_DIR")
        ctx = (jax.profiler.trace(profile_dir) if profile_dir
               else contextlib.nullcontext())
        with ctx:
            return self._generate(prompts, sampling_params, use_tqdm)

    def _generate(self, prompts, sampling_params, use_tqdm):
        if sampling_params is None:
            sampling_params = SamplingParams()
        if not isinstance(sampling_params, list):
            sampling_params = [sampling_params] * len(prompts)
        pbar = None
        if use_tqdm:
            from tqdm.auto import tqdm
            pbar = tqdm(total=len(prompts), desc="Generating", dynamic_ncols=True)

        seq_ids = []
        try:
            for p, sp in zip(prompts, sampling_params):
                seq_ids.append(self.add_request(p, sp))
        except ValueError:
            # Don't orphan the batch's already-enqueued prompts: they are
            # still WAITING (no step has run), so withdraw them rather than
            # leave the next generate() silently finishing abandoned work.
            added = set(seq_ids)
            self.scheduler.waiting = type(self.scheduler.waiting)(
                s for s in self.scheduler.waiting if s.seq_id not in added)
            raise
        order = {sid: i for i, sid in enumerate(seq_ids)}
        outputs: dict[int, list[int]] = {}
        prefill_tput = decode_tput = 0.0
        while not self.is_finished():
            t0 = time.perf_counter()
            done, stats = self.step()
            dt = time.perf_counter() - t0
            if stats.num_scheduled_tokens:
                if stats.is_prefill:
                    prefill_tput = stats.num_scheduled_tokens / dt
                else:
                    decode_tput = stats.num_scheduled_tokens / dt
            for sid, token_ids in done:
                outputs[sid] = token_ids
                if pbar:
                    pbar.set_postfix({
                        "prefill": f"{int(prefill_tput)}tok/s",
                        "decode": f"{int(decode_tput)}tok/s"})
                    pbar.update(1)
        if pbar:
            pbar.close()
        result = []
        for sid in seq_ids:
            token_ids = outputs[sid]
            text = (self.tokenizer.decode(token_ids, skip_special_tokens=True)
                    if self.tokenizer else "")
            result.append({"text": text, "token_ids": token_ids})
        del order
        return result
