"""Backend crossover grid benchmark (reference: bench_my.py — backends x
batch-sizes x input-lens, output_len = input_len, decode-only tok/s, OOM
cells caught and tabulated).

Per-cell watchdog: the reference catches torch.cuda.OutOfMemoryError per cell
(bench_my.py:13-24); XLA OOMs surface as RuntimeError and are caught the same
way — but the tunnel runtime's documented failure mode for an over-budget
program is an UNBOUNDED STALL, not an exception (engine/model_runner.py
_hbm_budget notes). So cells run inside a killable worker subprocess: the
parent enforces a per-cell deadline, kills the exact process group it spawned
on expiry, records the cell as HUNG, and respawns the worker for the
remaining cells. --cell-timeout 0 restores the in-process path."""

from __future__ import annotations

import argparse
import gc
import json
import os
import queue
import subprocess
import sys
import threading
import time

import numpy as np

CELL_TAG = "CELLRESULT "


def run_cell(llm, bs: int, input_len: int, rng, output_len: int = 0) -> float | None:
    # `rng` is ONE stream across the whole grid (the reference seeds once at
    # bench_my.py startup): re-seeding per cell would replay the same token
    # stream at a different sequence length, and the resulting cross-cell
    # prefix-cache hits make the untimed warmup run compile different jit
    # buckets than the timed runs — which then pay the compiles.
    from nanovllm_tpu import SamplingParams
    vocab = llm.config.model_config.vocab_size
    output_len = output_len or input_len
    sp = SamplingParams(temperature=0.0, max_tokens=output_len, ignore_eos=True)
    try:
        # First run compiles this cell's jit buckets (the reference's CUDA
        # warmup role); best of two timed runs survives stragglers (a tail
        # dispatch bucket can still compile inside the first timed run).
        best = float("inf")
        for timed in (False, True, True):
            prompts = [rng.integers(0, vocab, size=input_len).tolist()
                       for _ in range(bs)]
            t0 = time.perf_counter()
            llm.generate(prompts, sp, use_tqdm=False)
            dt = time.perf_counter() - t0
            if timed:
                best = min(best, dt)
        return bs * output_len / best
    except Exception as e:  # XLA OOM surfaces as RuntimeError
        if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
            return None
        raise


def add_args(p):
    p.add_argument("--model", default="")
    p.add_argument("--backends", nargs="+", default=["pallas", "ref"])
    p.add_argument("--batch-sizes", nargs="+", type=int, default=[16, 32, 64])
    p.add_argument("--input-lens", nargs="+", type=int,
                   default=[512, 1024, 2048])
    # "auto" resolves ONCE from the grid's max context (one engine serves
    # every cell): int8 KV for short max contexts, int4 for long
    # (config.KV_AUTO_CTX_CROSSOVER). Pin explicitly to sweep a regime.
    p.add_argument("--kv-cache-dtype", default="auto",
                   choices=["auto", "bfloat16", "int8", "int4"])
    # Weight-only quantization (accuracy-gated by tests/test_ppl_gate.py);
    # int4 matches bench.py's shipped default. Small batches are
    # weight-read-bound, so fused-dequant matmuls lift bs=16 the most.
    p.add_argument("--quant", default="int4", choices=["none", "int8", "int4"])
    p.add_argument("--decode-steps", type=int, default=64)
    # 0 = output_len == input_len (the reference grid's convention); the
    # reference's bs=32 latency sweep instead holds output at 512 while
    # input grows (README.md:178-193 — elapsed * tok/s == 32*512 per row).
    p.add_argument("--output-len", type=int, default=0)
    # Per-cell wall-clock budget. Generous because a clogged tunnel compile
    # queue alone can take 25+ minutes; 0 = no watchdog (in-process cells,
    # a stalling runtime then hangs the whole grid).
    p.add_argument("--cell-timeout", type=float, default=1800.0)


def run_cells(backend: str, cells, args, skip: int = 0, emit=print):
    """Construct one engine for `backend` and run `cells[skip:]`, emitting a
    CELLRESULT line per cell (the in-process body; also the worker mode)."""
    from nanovllm_tpu import LLM, SamplingParams
    from bench import QWEN3_0_6B
    max_len = max(args.input_lens) + (args.output_len
                                      or max(args.input_lens))
    llm = LLM(
        args.model,
        model_config=None if args.model else QWEN3_0_6B,
        max_model_len=max_len,
        max_num_batched_tokens=max(8192, max_len),
        max_num_seqs=max(args.batch_sizes),
        attn_backend=backend,
        kv_cache_dtype=args.kv_cache_dtype,
        quant=args.quant,
        decode_steps=args.decode_steps,
        load_format="auto" if args.model else "random",
    )
    llm.generate([[1] * 16], SamplingParams(max_tokens=2, ignore_eos=True),
                 use_tqdm=False)  # warmup (the short-prompt bug path)
    # Fresh engine => empty prefix cache, so a respawned worker's rng stream
    # needn't replay the skipped cells' draws.
    rng = np.random.default_rng(0)
    for i, (bs, ln) in enumerate(cells):
        if i < skip:
            continue
        tput = run_cell(llm, bs, ln, rng, args.output_len)
        emit(CELL_TAG + json.dumps({
            "cell": f"{backend}/{bs}/{ln}",
            "tput": None if tput is None else round(tput, 1)}), flush=True)
    del llm
    gc.collect()


def _watchdog_backend(backend: str, cells, args, results):
    """Run one backend's cells in a worker subprocess under a per-cell
    deadline; on expiry kill the worker's process group (the exact pgid we
    started — never a pattern kill) and respawn for the remaining cells."""
    done = 0
    while done < len(cells):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--worker-skip", str(done), "--backends", backend]
        cmd += ["--batch-sizes"] + [str(b) for b in args.batch_sizes]
        cmd += ["--input-lens"] + [str(l) for l in args.input_lens]
        cmd += ["--kv-cache-dtype", args.kv_cache_dtype,
                "--quant", args.quant,
                "--decode-steps", str(args.decode_steps),
                "--output-len", str(args.output_len)]
        if args.model:
            cmd += ["--model", args.model]
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True,
                                start_new_session=True)
        lines: queue.Queue = queue.Queue()

        def pump(stream=proc.stdout, q=lines):
            for line in stream:
                q.put(line)
            q.put(None)

        threading.Thread(target=pump, daemon=True).start()
        deadline = time.monotonic() + args.cell_timeout
        alive = True
        while alive and done < len(cells):
            try:
                line = lines.get(timeout=max(0.1, deadline - time.monotonic()))
            except queue.Empty:
                # Deadline passed with the current cell unfinished: the
                # stall-not-OOM failure mode. Kill exactly the worker's
                # process group and record the cell.
                bs, ln = cells[done]
                print(f"{backend:8s} bs={bs:<4d} len={ln:<6d}      HUNG "
                      f"(killed after {args.cell_timeout:.0f}s)", flush=True)
                try:
                    os.killpg(proc.pid, 9)
                except ProcessLookupError:
                    pass
                proc.wait()
                # Distinct from OOM in the table AND the JSON: a watchdog
                # kill means the stall-not-OOM runtime failure mode, and
                # misfiling it as OOM is exactly the misdiagnosis the
                # watchdog exists to prevent.
                results[f"{backend}/{bs}/{ln}"] = "HUNG"
                done += 1
                break
            if line is None:  # worker exited
                rc = proc.wait()
                if done < len(cells):
                    # Crash mid-cell (not an in-cell-caught OOM), or a clean
                    # exit without progress: record the cell and move on
                    # (never respawn at the same cell — that would loop).
                    bs, ln = cells[done]
                    print(f"{backend:8s} bs={bs:<4d} len={ln:<6d}      "
                          f"CRASH (rc={rc})", flush=True)
                    results[f"{backend}/{bs}/{ln}"] = f"CRASH(rc={rc})"
                    done += 1
                alive = False
                break
            if not line.startswith(CELL_TAG):
                sys.stdout.write(line)
                continue
            rec = json.loads(line[len(CELL_TAG):])
            results[rec["cell"]] = rec["tput"]
            _, bs, ln = rec["cell"].split("/")
            tput = rec["tput"]
            print(f"{backend:8s} bs={bs:<4s} len={ln:<6s} "
                  f"{'OOM' if tput is None else f'{tput:9.1f} tok/s'}",
                  flush=True)
            done += 1
            deadline = time.monotonic() + args.cell_timeout
        else:
            # All cells done — drain and reap the worker.
            try:
                os.killpg(proc.pid, 15)
            except ProcessLookupError:
                pass
            proc.wait()


def main():
    p = argparse.ArgumentParser()
    add_args(p)
    p.add_argument("--worker", action="store_true", help=argparse.SUPPRESS)
    p.add_argument("--worker-skip", type=int, default=0,
                   help=argparse.SUPPRESS)
    args = p.parse_args()

    cells = [(bs, ln) for bs in args.batch_sizes for ln in args.input_lens]
    if args.worker:
        assert len(args.backends) == 1
        run_cells(args.backends[0], cells, args, skip=args.worker_skip)
        return

    results: dict[str, float | None] = {}
    for backend in args.backends:
        if args.cell_timeout > 0:
            _watchdog_backend(backend, cells, args, results)
        else:
            def emit(line, flush=True):
                rec = json.loads(line[len(CELL_TAG):])
                results[rec["cell"]] = rec["tput"]
                _, bs, ln = rec["cell"].split("/")
                tput = rec["tput"]
                print(f"{backend:8s} bs={bs:<4s} len={ln:<6s} "
                      f"{'OOM' if tput is None else f'{tput:9.1f} tok/s'}",
                      flush=True)
            run_cells(backend, cells, args, emit=emit)

    print("\n=== decode tok/s (output-only), rows=batch, cols=len ===")
    for backend in args.backends:
        print(f"\n[{backend}]")
        header = "batch | " + " | ".join(f"{l:>9d}" for l in args.input_lens)
        print(header)
        print("-" * len(header))
        for bs in args.batch_sizes:
            cells_row = [results.get(f"{backend}/{bs}/{l}")
                         for l in args.input_lens]
            print(f"{bs:5d} | " + " | ".join(
                f"{'OOM':>9s}" if c is None
                else (f"{c:>9s}" if isinstance(c, str) else f"{c:9.1f}")
                for c in cells_row))
    print(json.dumps({"grid": results}))


if __name__ == "__main__":
    main()
