"""C++ engine core (csrc/engine_core.cpp) vs the pure-Python reference
implementation: hash parity, step-for-step allocator equivalence on a
randomized workload, and decode batch-meta builder equivalence."""

import numpy as np
import pytest

from nanovllm_tpu.engine import native_core
from nanovllm_tpu.engine.batch import build_decode_meta
from nanovllm_tpu.engine.block_manager import BlockManager, compute_hash
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

pytestmark = pytest.mark.skipif(
    not native_core.available(), reason="native engine core not built")

BS = 16


def make_seq(tokens, block_size=BS):
    return Sequence(list(tokens), SamplingParams(), block_size=block_size)


def _norm_hash(h: int) -> int:
    return h & 0xFFFFFFFFFFFFFFFF


def test_xxhash64_matches_python_xxhash():
    """The C++ xxh64 (implemented from spec) must agree with the xxhash
    library the Python reference uses — across all length branches (<32,
    8/4/1-byte tails)."""
    rng = np.random.default_rng(0)
    lib = native_core.get_lib()
    for n in [0, 1, 3, 7, 8, 15, 16, 31, 32, 33, 100, 128]:
        toks = rng.integers(0, 2**31, n).astype(np.int64)
        for prefix in (-1, 0, 12345):
            got = _norm_hash(lib.bm_compute_hash(toks, n, prefix))
            want = _norm_hash(compute_hash(toks.tolist(), prefix))
            assert got == want, (n, prefix)


def test_allocator_equivalence_randomized():
    """Drive both managers through an identical randomized workload of
    prompt allocations (with shared prefixes), decode appends with page
    sealing, reservations, and deallocations; state must match at every
    step."""
    rng = np.random.default_rng(42)
    py = BlockManager(64, BS)
    nat = native_core.NativeBlockManager(64, BS)
    prefix_pool = [rng.integers(0, 1000, BS * k).tolist() for k in (1, 2, 3)]
    live: list[tuple[Sequence, Sequence]] = []

    for step in range(300):
        op = rng.random()
        if op < 0.35 and len(live) < 12:
            base = prefix_pool[rng.integers(0, len(prefix_pool))]
            tail = rng.integers(0, 1000, rng.integers(1, 24)).tolist()
            tokens = (base if rng.random() < 0.7 else []) + tail
            s_py, s_nat = make_seq(tokens), make_seq(tokens)
            assert py.can_allocate(s_py) == nat.can_allocate(s_nat)
            if py.can_allocate(s_py):
                py.allocate(s_py)
                nat.allocate(s_nat)
                assert s_py.block_table == s_nat.block_table
                assert s_py.num_cached_tokens == s_nat.num_cached_tokens
                live.append((s_py, s_nat))
        elif op < 0.75 and live:
            i = rng.integers(0, len(live))
            s_py, s_nat = live[i]
            k = int(rng.integers(1, 5))
            assert py.can_reserve(s_py, k) == nat.can_reserve(s_nat, k)
            if py.can_reserve(s_py, k):
                py.reserve(s_py, k)
                nat.reserve(s_nat, k)
                assert s_py.block_table == s_nat.block_table
                for _ in range(k):
                    t = int(rng.integers(0, 1000))
                    s_py.append_token(t)
                    s_nat.append_token(t)
                    py.commit_token(s_py)
                    nat.commit_token(s_nat)
        elif live:
            i = rng.integers(0, len(live))
            s_py, s_nat = live.pop(i)
            py.deallocate(s_py)
            nat.deallocate(s_nat)
        assert py.num_free_blocks == nat.num_free_blocks, f"step {step}"
        assert py.cached_token_hits == nat.cached_token_hits, f"step {step}"
    # Per-block state parity at the end.
    for bid in range(64):
        rc, h = nat.block_info(bid)
        assert rc == py.blocks[bid].ref_count
        assert _norm_hash(h) == _norm_hash(py.blocks[bid].hash)


def test_short_prompt_boundary_parity():
    """The fork's bugfix scenario (prompt == one full page, first decode at
    len % bs == 1) through both implementations."""
    for mgr_cls in (BlockManager, native_core.NativeBlockManager):
        bm = mgr_cls(16, BS)
        seq = make_seq(range(BS))  # exactly one full page
        bm.allocate(seq)
        bm.reserve(seq, 2)         # positions 15,16 -> page 2 appears
        assert len(seq.block_table) == 2
        seq.append_token(7)        # len % BS == 1: sealed-or-backfilled here
        bm.commit_token(seq)
        seq2 = make_seq(list(range(BS)) + [9])
        bm.allocate(seq2)
        assert seq2.num_cached_tokens == BS  # page-1 hash is hit
        assert seq2.block_table[0] == seq.block_table[0]


def test_decode_meta_builder_matches_python():
    rng = np.random.default_rng(7)
    page, pps, S, num_slots = 16, 8, 8, 16 * 100
    seqs = []
    for i in range(5):
        n = int(rng.integers(2, page * pps - 4))
        s = make_seq(rng.integers(0, 1000, n).tolist(), block_size=page)
        s.block_table = rng.permutation(100)[: (n + page - 1) // page].tolist()
        s.temperature = float(rng.random())
        seqs.append(s)
    ref = build_decode_meta(seqs, S, page, pps, num_slots)
    nat = native_core.native_decode_meta(seqs, S, page, pps, num_slots)
    for key, val in ref.items():
        np.testing.assert_array_equal(val, nat[key], err_msg=key)


def test_engine_uses_native_core_when_enabled():
    from nanovllm_tpu.config import Config
    from nanovllm_tpu.engine.scheduler import Scheduler
    cfg = Config(model="", max_model_len=256, max_num_batched_tokens=8192,
                 num_kvcache_blocks=8, native_core=True)
    sch = Scheduler(cfg)
    assert isinstance(sch.block_manager, native_core.NativeBlockManager)


def test_prefill_meta_builder_matches_python():
    from nanovllm_tpu.engine.batch import build_prefill_meta, cdiv
    rng = np.random.default_rng(11)
    page, pps, num_slots, q_tile = 16, 8, 16 * 100, 32
    for trial in range(4):
        seqs = []
        total_tiles = 0
        for i in range(int(rng.integers(1, 6))):
            n = int(rng.integers(2, page * pps - 4))
            s = make_seq(rng.integers(0, 1000, n).tolist(), block_size=page)
            # random cached prefix (page-aligned, < n like the allocator
            # guarantees)
            s.num_cached_tokens = int(rng.integers(0, max(n // page, 1))) * page
            if s.num_cached_tokens >= n:
                s.num_cached_tokens = 0
            s.block_table = rng.permutation(100)[: cdiv(n, page)].tolist()
            s.temperature = float(rng.random())
            seqs.append(s)
            total_tiles += cdiv(n - s.num_cached_tokens, q_tile)
        T = max(q_tile, 1 << (total_tiles * q_tile - 1).bit_length())
        S = 8
        ref = build_prefill_meta(seqs, T, S, page, pps, num_slots,
                                 q_tile=q_tile)
        nat = native_core.native_prefill_meta(seqs, T, S, page, pps,
                                              num_slots, q_tile=q_tile)
        assert nat is not None
        for key, val in ref.items():
            np.testing.assert_array_equal(val, nat[key],
                                          err_msg=f"trial {trial}: {key}")
