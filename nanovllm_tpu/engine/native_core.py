"""ctypes bindings for the C++ engine core (csrc/engine_core.cpp).

The native layer owns the host hot path: the paged-KV block allocator with
hash-chained prefix caching, and the per-dispatch decode batch-meta builder.
`NativeBlockManager` is drop-in API-compatible with the pure-Python
`BlockManager` (nanovllm_tpu/engine/block_manager.py) — which stays as the
behavioral reference; tests assert step-for-step equivalence.

The library is compiled on demand with g++ (no pip deps) and cached next to
the source; `available()` reports whether the toolchain/build worked so
callers can fall back to the Python implementation.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger("nanovllm_tpu")

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "engine_core.cpp")
_LIB = None
_TRIED = False


def _build_and_load():
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        "NANOVLLM_NATIVE_CACHE",
        os.path.expanduser("~/.cache/nanovllm_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, f"engine_core_{tag}.so")
    if not os.path.exists(so):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
               "-o", so + ".tmp", src]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        except (subprocess.SubprocessError, OSError) as e:
            logger.warning("native engine core build failed (%s); "
                           "using the Python block manager", e)
            return None
    lib = ctypes.CDLL(so)
    c_i64, c_i32, c_f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_float
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.bm_new.restype = ctypes.c_void_p
    lib.bm_new.argtypes = [c_i64, c_i64]
    lib.bm_delete.argtypes = [ctypes.c_void_p]
    lib.bm_num_free.restype = c_i64
    lib.bm_num_free.argtypes = [ctypes.c_void_p]
    lib.bm_cached_token_hits.restype = c_i64
    lib.bm_cached_token_hits.argtypes = [ctypes.c_void_p]
    lib.bm_compute_hash.restype = c_i64
    lib.bm_compute_hash.argtypes = [p_i64, c_i64, c_i64]
    lib.bm_allocate.restype = c_i64
    lib.bm_allocate.argtypes = [ctypes.c_void_p, p_i64, c_i64, p_i32]
    lib.bm_deallocate.argtypes = [ctypes.c_void_p, p_i32, c_i64]
    lib.bm_pages_needed.restype = c_i64
    lib.bm_pages_needed.argtypes = [ctypes.c_void_p, c_i64, c_i64, c_i64]
    lib.bm_reserve.argtypes = [ctypes.c_void_p, p_i32, c_i64]
    lib.bm_commit_token.argtypes = [ctypes.c_void_p, p_i32, c_i64, c_i64,
                                    p_i64]
    lib.bm_block_info.argtypes = [ctypes.c_void_p, c_i32,
                                  ctypes.POINTER(c_i32),
                                  ctypes.POINTER(c_i64)]
    lib.build_decode_meta.argtypes = [
        c_i64, c_i64, c_i64, c_i64, c_i64,
        p_i64, p_i64, p_i32, p_i64, p_f32,
        p_i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_f32]
    lib.build_prefill_meta.argtypes = [
        c_i64, c_i64, c_i64, c_i64, c_i64, c_i64, c_i64,
        p_i64, p_i64, p_i64, p_i32, p_i64, p_f32,
        p_i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_i32, p_f32,
        p_i32, p_i32]
    return lib


def get_lib():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        if os.environ.get("NANOVLLM_NO_NATIVE"):
            _LIB = None
        else:
            _LIB = _build_and_load()
    return _LIB


def available() -> bool:
    return get_lib() is not None


class NativeBlockManager:
    """C++-backed drop-in for BlockManager (same public surface the
    Scheduler and tests use)."""

    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self._lib = get_lib()
        assert self._lib is not None, "native engine core unavailable"
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._h = ctypes.c_void_p(self._lib.bm_new(num_blocks, block_size))

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.bm_delete(self._h)
            self._h = None

    @property
    def num_free_blocks(self) -> int:
        return self._lib.bm_num_free(self._h)

    @property
    def cached_token_hits(self) -> int:
        return self._lib.bm_cached_token_hits(self._h)

    def _table(self, seq) -> np.ndarray:
        return np.asarray(seq.block_table, np.int32)

    def can_allocate(self, seq) -> bool:
        return seq.num_blocks <= self.num_free_blocks

    def allocate(self, seq) -> None:
        assert not seq.block_table
        tokens = np.asarray(seq.token_ids, np.int64)
        table = np.empty(seq.num_blocks, np.int32)
        cached = self._lib.bm_allocate(self._h, tokens, len(tokens), table)
        assert cached >= 0, "allocate called without can_allocate"
        seq.num_cached_tokens = int(cached)
        seq.block_table = table.tolist()

    def deallocate(self, seq) -> None:
        if seq.block_table:
            self._lib.bm_deallocate(self._h, self._table(seq),
                                    len(seq.block_table))
        seq.num_cached_tokens = 0
        seq.block_table = []

    def pages_needed_for(self, seq, k: int) -> int:
        return self._lib.bm_pages_needed(self._h, len(seq), k,
                                         len(seq.block_table))

    def can_reserve(self, seq, k: int) -> bool:
        return self.pages_needed_for(seq, k) <= self.num_free_blocks

    def reserve(self, seq, k: int) -> None:
        add = self.pages_needed_for(seq, k)
        if add:
            buf = np.empty(add, np.int32)
            self._lib.bm_reserve(self._h, buf, add)
            seq.block_table.extend(buf.tolist())

    def commit_token(self, seq) -> None:
        idx = self._seal_idx(seq)
        if idx is None or idx >= len(seq.block_table):
            return
        page = np.asarray(seq.block(idx), np.int64)
        self._lib.bm_commit_token(self._h, self._table(seq),
                                  len(seq.block_table), len(seq), page)

    def _seal_idx(self, seq):
        pos = len(seq) % self.block_size
        filled = len(seq) // self.block_size
        if pos == 0 or (pos == 1 and filled >= 1):
            return filled - 1
        return None

    # Test introspection parity with the Python Block objects.
    def block_info(self, block_id: int) -> tuple[int, int]:
        rc = ctypes.c_int32()
        h = ctypes.c_int64()
        self._lib.bm_block_info(self._h, block_id, ctypes.byref(rc),
                                ctypes.byref(h))
        return rc.value, h.value


def make_block_manager(num_blocks: int, block_size: int, native: bool = True):
    """Factory: native C++ core when available, Python fallback otherwise."""
    if native and available():
        return NativeBlockManager(num_blocks, block_size)
    from nanovllm_tpu.engine.block_manager import BlockManager
    return BlockManager(num_blocks, block_size)


def native_prefill_meta(seqs, T: int, S: int, page_size: int,
                        pages_per_seq: int, num_slots: int,
                        q_tile: int = 1) -> dict | None:
    """C++ fast path for build_prefill_meta (same contract as
    engine/batch.py's; differentially tested). Returns None when the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(seqs)
    nt = T // q_tile
    suffix = (np.concatenate([np.asarray(s.token_ids[s.num_cached_tokens:],
                                         np.int64) for s in seqs])
              if n else np.empty(0, np.int64))
    lens = np.fromiter((len(s) for s in seqs), np.int64, n)
    cached = np.fromiter((s.num_cached_tokens for s in seqs), np.int64, n)
    tlens = np.fromiter((len(s.block_table) for s in seqs), np.int64, n)
    tables = np.concatenate(
        [np.asarray(s.block_table, np.int32) for s in seqs]) if n else \
        np.empty(0, np.int32)
    temps = np.fromiter((s.temperature for s in seqs), np.float32, n)
    input_ids = np.empty(T, np.int32)
    positions = np.empty(T, np.int32)
    slot_mapping = np.empty(T, np.int32)
    seq_idx = np.empty(T, np.int32)
    q_offset = np.empty(T, np.int32)
    block_tables = np.empty((S, pages_per_seq), np.int32)
    context_lens = np.empty(S, np.int32)
    last_token_idx = np.empty(S, np.int32)
    temperatures = np.empty(S, np.float32)
    tile_seq = np.empty(max(nt, 1), np.int32)
    tile_pos0 = np.empty(max(nt, 1), np.int32)
    lib.build_prefill_meta(
        n, T, S, page_size, pages_per_seq, num_slots, q_tile,
        suffix, lens, cached, tables, tlens, temps,
        input_ids, positions, slot_mapping, seq_idx, q_offset,
        block_tables.reshape(-1), context_lens, last_token_idx, temperatures,
        tile_seq, tile_pos0)
    if nt == 0:
        tile_seq = np.zeros(1, np.int32)
        tile_pos0 = np.full(1, -1, np.int32)
    return dict(
        input_ids=input_ids, positions=positions, slot_mapping=slot_mapping,
        seq_idx=seq_idx, q_offset=q_offset, block_tables=block_tables,
        context_lens=context_lens, last_token_idx=last_token_idx,
        temperatures=temperatures, tile_seq=tile_seq, tile_pos0=tile_pos0,
        **_filter_arrays(seqs, S),
    )


def _filter_arrays(seqs, S: int) -> dict:
    """Sampling-filter columns (filled host-side; the C++ ABI stays
    temperature-only — these are two [S] fills, not a hot loop)."""
    top_ks = np.zeros(S, np.int32)
    top_ps = np.ones(S, np.float32)
    for s, seq in enumerate(seqs):
        top_ks[s] = seq.top_k
        top_ps[s] = seq.top_p
    return dict(top_ks=top_ks, top_ps=top_ps)


def native_decode_meta(seqs, S: int, page_size: int, pages_per_seq: int,
                       num_slots: int) -> dict | None:
    """C++ fast path for build_decode_meta. Returns None when the native
    library is unavailable (caller falls back to the numpy loop)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(seqs)
    last = np.fromiter((s.last_token for s in seqs), np.int64, n)
    lens = np.fromiter((len(s) for s in seqs), np.int64, n)
    tlens = np.fromiter((len(s.block_table) for s in seqs), np.int64, n)
    tables = np.concatenate(
        [np.asarray(s.block_table, np.int32) for s in seqs]) if n else \
        np.empty(0, np.int32)
    temps = np.fromiter((s.temperature for s in seqs), np.float32, n)
    input_ids = np.empty(S, np.int32)
    positions = np.empty(S, np.int32)
    slot_mapping = np.empty(S, np.int32)
    seq_idx = np.empty(S, np.int32)
    block_tables = np.empty((S, pages_per_seq), np.int32)
    context_lens = np.empty(S, np.int32)
    temperatures = np.empty(S, np.float32)
    lib.build_decode_meta(n, S, page_size, pages_per_seq, num_slots,
                          last, lens, tables, tlens, temps,
                          input_ids, positions, slot_mapping, seq_idx,
                          block_tables.reshape(-1), context_lens, temperatures)
    return dict(
        input_ids=input_ids, positions=positions, slot_mapping=slot_mapping,
        seq_idx=seq_idx, q_offset=np.zeros(S, np.int32),
        block_tables=block_tables, context_lens=context_lens,
        last_token_idx=np.arange(S, dtype=np.int32),
        temperatures=temperatures,
        tile_seq=np.zeros(1, np.int32), tile_pos0=np.full(1, -1, np.int32),
        **_filter_arrays(seqs, S),
    )
