"""Unit tests for the paged-KV allocator + prefix cache — the subsystem whose
one documented reference bug (short-prompt may_append, README.md:7-10) shapes
these cases."""

import pytest

from nanovllm_tpu.engine.block_manager import BlockManager, compute_hash
from nanovllm_tpu.engine.sequence import Sequence
from nanovllm_tpu.sampling_params import SamplingParams

BS = 16


def make_seq(tokens, block_size=BS):
    return Sequence(list(tokens), SamplingParams(), block_size=block_size)


def test_hash_deterministic_and_chained():
    a = compute_hash(range(16))
    assert a == compute_hash(range(16))
    assert a != compute_hash(range(16), prefix_hash=a)
    assert a != compute_hash(range(1, 17))


def test_allocate_and_deallocate_roundtrip():
    bm = BlockManager(8, BS)
    seq = make_seq(range(40))  # 3 pages (16+16+8)
    assert bm.can_allocate(seq)
    bm.allocate(seq)
    assert len(seq.block_table) == 3
    assert bm.num_free_blocks == 5
    bm.deallocate(seq)
    assert bm.num_free_blocks == 8
    assert seq.block_table == []


def test_prefix_cache_hit_shares_blocks():
    bm = BlockManager(16, BS)
    prompt = list(range(32))  # exactly 2 full pages
    s1 = make_seq(prompt + [100])
    bm.allocate(s1)
    s2 = make_seq(prompt + [200])
    bm.allocate(s2)
    # The two full prefix pages are shared; the tail page is distinct.
    assert s1.block_table[:2] == s2.block_table[:2]
    assert s1.block_table[2] != s2.block_table[2]
    assert s2.num_cached_tokens == 32
    assert bm.blocks[s1.block_table[0]].ref_count == 2
    bm.deallocate(s1)
    assert bm.blocks[s2.block_table[0]].ref_count == 1
    bm.deallocate(s2)


def test_fully_cached_prompt_keeps_one_query_token():
    bm = BlockManager(16, BS)
    prompt = list(range(32))
    s1 = make_seq(prompt)
    bm.allocate(s1)
    s2 = make_seq(prompt)
    bm.allocate(s2)
    # A fully-cached prompt must still schedule >= 1 token for logits.
    assert s2.num_cached_tokens < len(s2)


def test_cache_reactivation_after_free():
    bm = BlockManager(16, BS)
    prompt = list(range(32))
    s1 = make_seq(prompt + [1])
    bm.allocate(s1)
    table = list(s1.block_table)
    bm.deallocate(s1)
    # Freed pages keep their hash; a new seq with the same prefix re-activates
    # them without copying.
    s2 = make_seq(prompt + [2])
    bm.allocate(s2)
    assert s2.block_table[:2] == table[:2]
    assert s2.num_cached_tokens == 32


def test_may_append_page_boundary():
    bm = BlockManager(16, BS)
    seq = make_seq(range(15))  # 15 tokens: 1 page, unsealed
    bm.allocate(seq)
    assert len(seq.block_table) == 1
    # Token 16 fills the page -> may_append seals its hash.
    seq.append_token(15)
    bm.may_append(seq)
    assert bm.blocks[seq.block_table[0]].hash != -1
    # Token 17 starts a new page.
    seq.append_token(16)
    bm.may_append(seq)
    assert len(seq.block_table) == 2


def test_short_prompt_lazy_hash_backfill():
    """The fork's bugfix scenario (reference block_manager.py:136-146): a
    prompt of exactly one full page length is allocated WITHOUT its hash
    sealed when it is the last (partial-rule) page; first decode step must
    lazily backfill the hash instead of asserting."""
    bm = BlockManager(16, BS)
    seq = make_seq(range(16))  # exactly one full page
    bm.allocate(seq)
    # allocate() seals full pages, so emulate the unsealed path via a
    # 17-token prompt whose tail page fills on first decode:
    seq2 = make_seq(range(17))
    bm.allocate(seq2)
    tail = bm.blocks[seq2.block_table[-1]]
    assert tail.hash == -1
    for tok in (17, 18):
        seq2.append_token(tok)
        bm.may_append(seq2)  # len 18: pos%16==2 no-op; len 19: no-op
    # Drive to the boundary: fill to 32 then cross it.
    while len(seq2) < 32:
        seq2.append_token(len(seq2))
        bm.may_append(seq2)
    assert bm.blocks[seq2.block_table[-1]].hash != -1  # sealed at 32
    seq2.append_token(99)
    bm.may_append(seq2)  # 33 % 16 == 1 -> new page
    assert len(seq2.block_table) == 3


def test_one_full_page_prompt_first_decode():
    """Direct reproduction of the reference bug: prompt length == block_size,
    first decode lands at len % bs == 1 with the previous page unsealed."""
    bm = BlockManager(16, BS)
    seq = make_seq(range(16))
    bm.allocate(seq)
    # allocate seals the single full page (hash != -1) in our implementation,
    # but the lazy-backfill path must also work when it does not: simulate by
    # clearing the hash as the reference's partial-rule allocation would.
    blk = bm.blocks[seq.block_table[0]]
    bm.hash_to_block_id.pop(blk.hash, None)
    blk.hash = -1
    seq.append_token(42)
    bm.may_append(seq)  # must backfill, not assert
    assert bm.blocks[seq.block_table[0]].hash != -1
    assert len(seq.block_table) == 2


def test_can_append_only_needs_page_at_boundary():
    bm = BlockManager(2, BS)
    seq = make_seq(range(20))
    bm.allocate(seq)
    assert bm.num_free_blocks == 0
    # can_append is checked AFTER the sampled token is appended (postprocess
    # appends, next schedule() checks): at len 21, 21 % 16 != 1 -> no page.
    seq.append_token(0)
    assert bm.can_append(seq)
    bm.may_append(seq)
    while len(seq) < 32:
        seq.append_token(0)
        assert bm.can_append(seq)
        bm.may_append(seq)
    # 33rd token starts page 3 but none is free.
    seq.append_token(0)
    assert not bm.can_append(seq)


def test_exhaustion():
    bm = BlockManager(4, BS)
    s1 = make_seq(range(64))
    assert bm.can_allocate(s1)
    bm.allocate(s1)
    s2 = make_seq(range(100, 116))
    assert not bm.can_allocate(s2)
