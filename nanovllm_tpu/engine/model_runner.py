"""Execution layer: params, paged KV cache, and the bucketed jit step cache.

Reference: nanovllm/engine/model_runner.py (per-rank CUDA worker with NCCL
init, warmup, KV sizing from allocator stats, CUDA-graph capture ladder,
pinned-mem H2D batch prep). TPU translation (SURVEY §7.2):
- CUDA graphs → a cache of jit-compiled executables keyed by padded static
  shapes (phase, token bucket, seq bucket, kv-page bucket); replay = calling
  a cached executable.
- Pinned-mem async H2D → numpy batch prep + jax.device_put of one small
  pytree per step.
- KV sizing from cudaMemGetInfo/allocator peak (model_runner.py:129-141) →
  HBM budget arithmetic from `device.memory_stats()` minus a static
  activation estimate.
- The whole forward + sampling is one jitted program; the KV cache is donated
  so page writes are in-place.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from nanovllm_tpu.config import Config, cdiv, next_pow2
from nanovllm_tpu.engine.batch import BatchMeta, build_decode_meta, build_prefill_meta
from nanovllm_tpu.models import qwen3
from nanovllm_tpu.ops.sampler import sample
from nanovllm_tpu.parallel.mesh import make_mesh
from nanovllm_tpu.parallel.sharding import kv_cache_sharding, param_shardings
from nanovllm_tpu.utils.loader import init_random_params, load_params

logger = logging.getLogger("nanovllm_tpu")

DECODE_BUCKETS = [8, 16, 32, 64, 128, 256, 512]


def next_bucket(n: int, ladder) -> int:
    for b in ladder:
        if n <= b:
            return b
    return ladder[-1]


def _enable_compilation_cache():
    """Persist compiled executables across processes (compiles dominate cold
    start; the CUDA-graph capture had the same role for the reference)."""
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/nanovllm_tpu_xla"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax
        pass


_enable_compilation_cache()


class ModelRunner:
    def __init__(self, config: Config, mesh=None, devices=None):
        self.config = config
        self.mc = config.model_config
        if config.distributed and jax.process_count() == 1:
            # Pod-slice runs: coordinator/process env comes from the TPU
            # runtime (or JAX_COORDINATOR_ADDRESS etc.); afterwards
            # jax.devices() is global and the tp mesh spans the slice.
            jax.distributed.initialize()
        self.mesh = mesh or make_mesh(config.tensor_parallel_size, devices)
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
        kvd = config.kv_cache_dtype
        self.kv_dtype = self.dtype if kvd == "auto" else (
            jnp.int8 if kvd in ("int8", "int4") else jnp.dtype(kvd))
        # Token-plane int4 packs 8 tokens per int32 row at the FULL lane
        # width (ops/kv_cache.py), so TP lane-sharding stays head-aligned
        # with no pairing constraint.
        self.kv_bits = 4 if kvd == "int4" else 8
        self._step_fns: dict = {}
        # RBG keys: the sampler draws |V| Gumbels per sequence per step;
        # threefry costs ~20 VPU ops/element (~0.2 ms/step at 64x151936),
        # the TPU's hardware RNG path is ~10x cheaper. Deterministic for a
        # fixed seed within a process, which is all the engine promises.
        try:
            self.rng_key = jax.random.key(config.seed, impl="rbg")
        except TypeError:  # pragma: no cover - older jax
            self.rng_key = jax.random.PRNGKey(config.seed)
        self._rep = NamedSharding(self.mesh, P())

        self._load_params()
        self._allocate_kv_cache()

    # ------------------------------------------------------------- weights
    def _load_params(self):
        cfg, mc = self.config, self.mc
        t0 = time.perf_counter()
        use_random = cfg.load_format == "random" or not cfg.model
        # Init/load AND quantize on the HOST: jnp math would otherwise run on
        # the accelerator — an 8B random init is 16.4 GiB of bf16 and the
        # quantize transients peak multi-GiB more, which the tunnel runtime
        # frees lazily enough to RESOURCE_EXHAUSTED either immediately or in
        # the first warmup step. Only the final sharded device_put below
        # should ever touch the accelerator.
        import contextlib
        try:
            cpu = jax.devices("cpu")
        except Exception:
            cpu = []
        ctx = jax.default_device(cpu[0]) if cpu else contextlib.nullcontext()
        with ctx:
            if use_random:
                host_params = init_random_params(mc, self.dtype, cfg.seed)
            else:
                host_params = load_params(cfg.model, mc, self.dtype)
            if cfg.quant != "none":
                from nanovllm_tpu.ops.quant import quantize_params
                # INT4 always packs for the Pallas dequant matmul; under
                # tensor parallelism qmm shard_maps the kernel per weight
                # shard, with the row-parallel weights (o/down) packed per
                # input shard (ops/quant._qmm_int4_tp).
                host_params = quantize_params(
                    host_params, 8 if cfg.quant == "int8" else 4,
                    quant_embed=cfg.quant_embed,
                    tp=cfg.tensor_parallel_size)
            jax.block_until_ready(host_params)
        shardings = param_shardings(self.mesh, host_params)
        # device_put directly on the host arrays: a jnp.asarray here would
        # materialize each full unsharded leaf on accelerator device 0
        # before resharding (multi-GiB transients for 8B at tp>1).
        self.params = jax.tree.map(jax.device_put, host_params, shardings)
        jax.block_until_ready(self.params)
        logger.info("weights %s in %.1fs",
                    "initialized" if use_random else "loaded",
                    time.perf_counter() - t0)

    # ------------------------------------------------------------ KV cache
    def _kv_bytes_per_page(self) -> int:
        mc = self.config.model_config
        ps = self.config.kvcache_block_size
        itemsize = jnp.dtype(self.kv_dtype).itemsize
        per_page = 2 * ps * mc.num_key_value_heads * mc.head_dim * itemsize
        if self.kv_bits == 4:
            per_page //= 2
        if self.kv_dtype == jnp.int8:
            # One transposed bf16 [RPP, page_size] scale block per page per
            # TP shard (ops/kv_cache.py) — 1.6% on top of the int8 payload.
            from nanovllm_tpu.ops.kv_cache import scale_rows_per_page
            shards = self._scale_shards()
            rpp = scale_rows_per_page(mc.num_key_value_heads // shards)
            per_page += rpp * ps * shards * 2
        return mc.num_hidden_layers * per_page

    def _scale_shards(self) -> int:
        """INT8 scale blocks get one full page_size-lane window PER TP SHARD
        (see ops/kv_cache.create_kv_cache); only the Pallas backend needs
        that."""
        if self.kv_dtype != jnp.int8:
            return 1
        return (self.config.tensor_parallel_size
                if self.config.attn_backend == "pallas" else 1)

    # Fallback HBM sizes when the runtime exposes no memory_stats (the axon
    # tunnel returns None). Matched by substring of device_kind.
    HBM_BY_KIND = {
        "v5 lite": 16 << 30, "v5e": 16 << 30,
        "v5p": 95 << 30, "v5": 95 << 30,
        "v4": 32 << 30,
        "v6 lite": 32 << 30, "v6e": 32 << 30,
        "v3": 16 << 30, "v2": 8 << 30,
    }

    def _params_bytes(self) -> int:
        return sum(x.size * x.dtype.itemsize
                   for x in jax.tree.leaves(self.params))

    def _hbm_budget(self) -> int:
        import os
        cfg = self.config
        dev = self.mesh.devices.flat[0]
        stats = None
        try:
            stats = dev.memory_stats()
        except Exception:
            pass
        env_gb = os.environ.get("NANOVLLM_HBM_GB")
        trusted = True  # runtime reports real limits and raises real OOMs
        if stats and "bytes_limit" in stats:
            limit = stats["bytes_limit"]
            in_use = stats.get("bytes_in_use", self._params_bytes())
        elif env_gb:
            # NANOVLLM_HBM_GB must be the MEASURED-USABLE HBM, not the chip's
            # nominal size: no haircut is applied here, so setting the nominal
            # 16 on the tunnel reconstructs the silent-stall the fallback
            # branch guards against (usable there measured ~11.3 of 16 GiB).
            limit = int(float(env_gb) * (1 << 30))
            in_use = self._params_bytes()
            trusted = False  # still the stall-not-OOM runtime: wide arena
        else:
            kind = getattr(dev, "device_kind", "") or ""
            limit = next((v for k, v in self.HBM_BY_KIND.items()
                          if k in kind.lower()), 0)
            if not limit:
                return 2 << 30  # CPU/test fallback: 2 GiB of pages
            # A runtime that hides memory_stats also hides its reservations.
            # Measured on the v5e tunnel: programs whose live footprint
            # passed ~11.3 GiB of the nominal 16 GiB hung forever in
            # execution (allocation is virtualized — device_put happily
            # "allocates" 24 GiB — so only execution faults, as an unbounded
            # stall). Keep 10% back on top of hbm_utilization.
            limit = int(limit * 0.90)
            in_use = self._params_bytes()
            trusted = False
        # Static activation headroom: prefill at the max token bucket
        # dominates (hidden + q/k/v + mlp intermediates + fp32 logits).
        mc = cfg.model_config
        t = cfg.max_num_batched_tokens
        act = t * (mc.hidden_size * 6 + 2 * mc.intermediate_size
                   + (mc.num_attention_heads + 2 * mc.num_key_value_heads)
                   * mc.head_dim) * 2
        act += cfg.max_num_seqs * mc.vocab_size * 4
        # Executable temp arenas (prefill + fused decode coexisting): 1 GiB
        # on runtimes that report memory_stats and raise real OOMs. On the
        # stall-not-OOM tunnel runtime the margin widens to 2.25 GiB — sized
        # from observed failures, not theory: 1 GiB worked in one session,
        # but a later runtime session hung FOREVER executing a step with an
        # 11.6 GiB cache on a 16 GiB chip (alloc retries forever instead of
        # raising RESOURCE_EXHAUSTED) while 10 GiB ran fine — over-budget is
        # catastrophic there, so only there does the margin stay wide.
        act = int(act * 1.5) + ((1024 if trusted else 2304) << 20)
        # Note: cfg.hbm_utilization's 0.85 default (vs the reference's 0.9)
        # applies on all runtimes — a deliberate cross-runtime safety choice;
        # pass hbm_utilization=0.9 explicitly on well-behaved runtimes.
        return int(limit * cfg.hbm_utilization) - in_use - act

    def _allocate_kv_cache(self):
        cfg, mc = self.config, self.mc
        if cfg.num_kvcache_blocks <= 0:
            budget = self._hbm_budget()
            # KV pages are sharded over tp: each device holds heads/tp, so the
            # per-chip budget supports tp× more pages.
            per_page = self._kv_bytes_per_page() // cfg.tensor_parallel_size
            cfg.num_kvcache_blocks = max(budget // per_page, cfg.pages_per_seq + 1)
        logger.info("kv cache: %d pages x %d tokens (%.2f GiB total)",
                    cfg.num_kvcache_blocks, cfg.kvcache_block_size,
                    cfg.num_kvcache_blocks * self._kv_bytes_per_page() / 2**30)
        self.num_slots = cfg.num_kvcache_blocks * cfg.kvcache_block_size
        from nanovllm_tpu.ops.kv_cache import create_kv_cache
        cache = create_kv_cache(
            mc.num_hidden_layers, mc.num_key_value_heads,
            cfg.num_kvcache_blocks, cfg.kvcache_block_size, mc.head_dim,
            self.kv_dtype, num_shards=self._scale_shards(),
            kv_bits=self.kv_bits if self.kv_bits == 4 else 0)
        shardings = kv_cache_sharding(self.mesh)
        if cache["scales"].shape[0] == 1:  # replicate the dummy
            shardings = dict(shardings,
                             scales=NamedSharding(self.mesh, P()))
        self.kv_cache = jax.device_put(cache, shardings)

    # ---------------------------------------------------------- step fns
    def _attn_fn(self, is_prefill: bool, max_q_len: int, num_gather_pages: int):
        mc = self.config.model_config
        scale = mc.head_dim ** -0.5
        page_size = self.config.kvcache_block_size
        if self.config.attn_backend == "pallas":
            from nanovllm_tpu.ops.attention_pallas import pallas_attention
            fn = functools.partial(
                pallas_attention, scale=scale, is_prefill=is_prefill,
                max_q_len=max_q_len, num_gather_pages=num_gather_pages,
                page_size=page_size, num_slots=self.num_slots,
                num_layers=mc.num_hidden_layers,
                q_tile=self.config.prefill_q_tile,
                pages_per_chunk=self.config.prefill_pages_per_chunk,
                decode_pages_per_chunk=self.config.decode_pages_per_chunk,
                planes_dots=self.config.int4_planes_dots,
                interpret=self.mesh.devices.flat[0].platform == "cpu")
            if self.config.tensor_parallel_size == 1:
                return fn
            # Pallas kernels are opaque to GSPMD: run them under shard_map —
            # each device streams its own KV heads' pages (the lane-dim
            # cache layout shards head-aligned: local row indexing is
            # unchanged, each device just sees a narrower Hkv_local*D row).
            from nanovllm_tpu.parallel.mesh import shard_map as _sm
            shard_map = _sm()
            hp = P(None, "tp", None)   # [T, heads, D]
            scales_spec = P(None, "tp") if self.kv_dtype == jnp.int8 else P()
            cache_spec = {"data": P(None, "tp"), "scales": scales_spec}
            meta_spec = jax.tree.map(
                lambda _: P(),
                BatchMeta(**{f: 0 for f in BatchMeta.__dataclass_fields__}))

            def tp_attn(q, k, v, cache, layer_i, meta):
                return shard_map(
                    fn, mesh=self.mesh,
                    in_specs=(hp, hp, hp, cache_spec, P(), meta_spec),
                    out_specs=(hp, cache_spec),
                    check_vma=False,
                )(q, k, v, cache, layer_i, meta)

            return tp_attn
        from nanovllm_tpu.ops.attention_ref import ref_attention
        return functools.partial(
            ref_attention, scale=scale, max_q_len=max_q_len,
            num_gather_pages=num_gather_pages, page_size=page_size,
            num_slots=self.num_slots, num_layers=mc.num_hidden_layers)

    def _get_step_fn(self, key):
        fn = self._step_fns.get(key)
        if fn is not None:
            return fn
        # The trace-time tp-mesh registry is scoped around the traced body
        # below (quantized matmuls + the fused sampler shard_map over it):
        # the set/restore side effects execute exactly when jit traces, so
        # THIS runner's mesh is active for its own traces and never leaks
        # into later qmm/fused_sample calls elsewhere in the process.
        from nanovllm_tpu.parallel.mesh import tp_mesh_scope
        is_prefill, t, s, qmax, pk, n_steps, filt = key
        # Sampling filters (top-k / top-p) compile in only when a scheduled
        # request uses them — the default program stays sort-free. Without
        # filters the LM head and the sampler fuse over vocab tiles
        # (ops/sampler.fused_sample): the [S, V] fp32 logits round-trip
        # (37 MiB/step at 64 x 151936) never touches HBM.
        fused = self.config.fused_sampler and not filt
        from nanovllm_tpu.ops.sampler import fused_sample
        sample_args = (lambda m: (m.top_ks, m.top_ps)) if filt else \
            (lambda m: (None, None))
        mc = self.mc
        attn_fn = self._attn_fn(is_prefill, qmax, pk)
        page_size = self.config.kvcache_block_size
        num_slots = self.num_slots

        def fwd_sample(params, kv_cache, meta, rng):
            if fused:
                last, kv_cache = qwen3.forward_hidden(params, mc, kv_cache,
                                                      meta, attn_fn)
                return kv_cache, fused_sample(last, params["lm_head"],
                                              meta.temperatures, rng)
            logits, kv_cache = qwen3.forward(params, mc, kv_cache, meta,
                                             attn_fn)
            return kv_cache, sample(logits, meta.temperatures, rng,
                                    *sample_args(meta))

        if is_prefill:
            def step(params, kv_cache, meta: BatchMeta, rng):
                kv_cache, tokens = fwd_sample(params, kv_cache, meta, rng)
                return kv_cache, tokens[None, :]
        else:
            # Fused multi-step decode: K forward+sample steps per dispatch,
            # sampled tokens fed back on-device, metadata (positions, slots,
            # context lens) advanced on-device. One host round-trip per K
            # tokens instead of per token.
            import dataclasses

            def step(params, kv_cache, meta: BatchMeta, rng):
                valid = meta.context_lens > 0
                seq_ar = jnp.arange(s, dtype=jnp.int32)

                def body(carry, _):
                    cache, m, key = carry
                    key, sub = jax.random.split(key)
                    cache, tokens = fwd_sample(params, cache, m, sub)
                    positions = jnp.where(valid, m.positions + 1, 0)
                    ctx = jnp.where(valid, m.context_lens + 1, 0)
                    slot = (m.block_tables[seq_ar, positions // page_size]
                            * page_size + positions % page_size)
                    slot = jnp.where(valid, slot, num_slots)
                    m2 = dataclasses.replace(
                        m, input_ids=tokens, positions=positions,
                        slot_mapping=slot, context_lens=ctx)
                    return (cache, m2, key), tokens

                (kv_cache, _, _), toks = jax.lax.scan(
                    body, (kv_cache, meta, rng), length=n_steps)
                return kv_cache, toks  # [K, S]

        inner_step = step

        def step_scoped(params, kv_cache, meta, rng):
            with tp_mesh_scope(self.mesh):
                return inner_step(params, kv_cache, meta, rng)

        fn = jax.jit(step_scoped, donate_argnums=(1,))
        self._step_fns[key] = fn
        logger.info("compiling step bucket %s", key)
        return fn

    def bucket_key(self, seqs, is_prefill: bool, num_steps: int = 1):
        """Fewer distinct buckets = fewer compiles. The block-table width is
        always the full pages_per_seq (the Pallas kernels mask by context
        length at zero cost), and prefill qmax only matters to the dense ref
        backend."""
        cfg = self.config
        pk = cfg.pages_per_seq
        filt = any(s2.top_k > 0 or s2.top_p < 1.0 for s2 in seqs)
        if is_prefill:
            tq = cfg.prefill_q_tile
            total = sum(cdiv(len(s) - s.num_cached_tokens, tq) * tq
                        for s in seqs)
            t = next_pow2(total, max(128, tq))
            s = min(next_pow2(len(seqs)), next_pow2(cfg.max_num_seqs))
            if cfg.attn_backend == "ref":
                qmax = min(next_pow2(max(len(s2) - s2.num_cached_tokens
                                         for s2 in seqs), 256), t)
            else:
                qmax = t  # unused by the Pallas ragged prefill
            return (True, t, s, qmax, pk, 1, filt)
        s = min(next_bucket(len(seqs), DECODE_BUCKETS),
                next_pow2(cfg.max_num_seqs))
        return (False, s, s, 1, pk, num_steps, filt)

    # --------------------------------------------------------------- run
    def run(self, seqs, is_prefill: bool, num_steps: int = 1,
            defer: bool = False):
        """Returns per-seq token lists: one token per fused decode step
        (prefill: single-token lists).

        defer=True (prefill only): skip the host fetch and return the
        device-resident token array instead — the caller redeems it later
        with finalize_tokens. Back-to-back prefill dispatches then pipeline
        through the runtime instead of paying a full dispatch+sync round
        trip each (measured 23.6 ms fixed per synced 8x1024 step on the
        tunnel, results/r4_prefill_overhead.log); sampled prefill tokens are
        only needed once decode starts."""
        cfg = self.config
        key = self.bucket_key(seqs, is_prefill, num_steps)
        _, t, s = key[:3]
        if is_prefill:
            raw = None
            if cfg.native_core:
                from nanovllm_tpu.engine.native_core import native_prefill_meta
                raw = native_prefill_meta(seqs, t, s, cfg.kvcache_block_size,
                                          cfg.pages_per_seq, self.num_slots,
                                          q_tile=cfg.prefill_q_tile)
            if raw is None:
                raw = build_prefill_meta(seqs, t, s, cfg.kvcache_block_size,
                                         cfg.pages_per_seq, self.num_slots,
                                         q_tile=cfg.prefill_q_tile)
        else:
            raw = None
            if cfg.native_core:
                from nanovllm_tpu.engine.native_core import native_decode_meta
                raw = native_decode_meta(seqs, s, cfg.kvcache_block_size,
                                         cfg.pages_per_seq, self.num_slots)
            if raw is None:
                raw = build_decode_meta(seqs, s, cfg.kvcache_block_size,
                                        cfg.pages_per_seq, self.num_slots)
        t0 = time.perf_counter()
        meta = jax.device_put(BatchMeta(**raw), self._rep)
        self.rng_key, sub = jax.random.split(self.rng_key)
        step_fn = self._get_step_fn(key)
        t1 = time.perf_counter()
        self.kv_cache, tokens = step_fn(self.params, self.kv_cache, meta, sub)
        t2 = time.perf_counter()
        if defer:
            return tokens
        out = np.asarray(tokens)[:, : len(seqs)].T.tolist()
        t3 = time.perf_counter()
        if t3 - t0 > 5.0:  # localize rare multi-second stalls (tunnel queue?)
            logger.info("slow step %s: put+getfn %.2fs dispatch %.2fs "
                        "sync %.2fs", key, t1 - t0, t2 - t1, t3 - t2)
        return out

    @staticmethod
    def finalize_tokens(tokens, num_seqs: int) -> list[list[int]]:
        """Redeem a deferred run(): fetch the device token array (the only
        synchronization point through the proxy runtime) to host lists."""
        return np.asarray(tokens)[:, :num_seqs].T.tolist()

    def warmup(self, decode_bs=(), prefill=(), num_steps: int = 0):
        """Pre-compile the hot step buckets with all-pad batches (the
        reference's CUDA-graph capture ladder, model_runner.py:317-370).
        Pad batches are inert: every token's slot is num_slots (scatter
        drops it) and every context length is 0 (kernels read nothing).

        Buckets COMPILE CONCURRENTLY (XLA compiles are thread-parallel;
        lowering reads only avals, so the shared params/cache are safe) and
        the compiled executables are installed as the step fns — then each
        runs one serial pad step to absorb first-execution stalls.

        decode_bs: iterable of decode batch sizes.
        prefill: iterable of (total_tokens, num_seqs) pairs.
        """
        cfg = self.config
        steps = num_steps or cfg.decode_steps
        pk = cfg.pages_per_seq
        t0 = time.perf_counter()
        jobs: list[tuple[tuple, dict]] = []
        for bs in decode_bs:
            s = min(next_bucket(bs, DECODE_BUCKETS),
                    next_pow2(cfg.max_num_seqs))
            raw = build_decode_meta([], s, cfg.kvcache_block_size, pk,
                                    self.num_slots)
            jobs.append(((False, s, s, 1, pk, steps, False), raw))
        for tokens, nseqs in prefill:
            tq = cfg.prefill_q_tile
            t = next_pow2(tokens, max(128, tq))
            s = min(next_pow2(max(nseqs, 1)), next_pow2(cfg.max_num_seqs))
            qmax = min(next_pow2(tokens, 256), t) if \
                cfg.attn_backend == "ref" else t
            raw = build_prefill_meta([], t, s, cfg.kvcache_block_size, pk,
                                     self.num_slots, q_tile=tq)
            jobs.append(((True, t, s, qmax, pk, 1, False), raw))
        # Distinct requested shapes can land in the same bucket (e.g.
        # decode_bs=[33, 48] both pad to s=64): dedupe by key or the pool
        # compiles the identical program twice and pad-steps it twice.
        seen: set[tuple] = set()
        jobs = [j for j in jobs if not (j[0] in seen or seen.add(j[0]))]
        if not jobs:
            return
        if len(jobs) > 1:
            try:
                self._compile_parallel(jobs)
            except Exception as e:  # pragma: no cover - AOT quirks
                logger.warning("parallel warmup compile failed (%s); "
                               "falling back to serial", e)
        for key, raw in jobs:
            self._run_pad_step(key, raw)
        logger.info("warmup compiled %d decode + %d prefill buckets "
                    "in %.1fs", len(tuple(decode_bs)),
                    len(tuple(prefill)), time.perf_counter() - t0)

    def _compile_parallel(self, jobs):
        """Lower+compile each bucket in a thread pool and install the AOT
        executables as the step fns (a later plain jit call would compile
        AGAIN — lower().compile() does not populate the jit call cache)."""
        from concurrent.futures import ThreadPoolExecutor
        metas = [jax.device_put(BatchMeta(**raw), self._rep)
                 for _, raw in jobs]
        fns = [self._get_step_fn(key) for key, _ in jobs]
        _, sub = jax.random.split(self.rng_key)

        def compile_one(i):
            return fns[i].lower(self.params, self.kv_cache, metas[i],
                                sub).compile()

        with ThreadPoolExecutor(max_workers=min(8, len(jobs))) as ex:
            compiled = list(ex.map(compile_one, range(len(jobs))))
        for (key, _), ex_ in zip(jobs, compiled):
            self._step_fns[key] = ex_

    def _run_pad_step(self, key, raw):
        meta = jax.device_put(BatchMeta(**raw), self._rep)
        self.rng_key, sub = jax.random.split(self.rng_key)
        fn = self._get_step_fn(key)
        self.kv_cache, tokens = fn(self.params, self.kv_cache, meta, sub)
        # Fetch, don't just block: under the IFRT proxy block_until_ready
        # returns immediately, so a wedged warmup execution would otherwise
        # go unnoticed and silently stall the first real dispatch instead.
        np.asarray(tokens)
