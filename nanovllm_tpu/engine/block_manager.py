"""Paged-KV page allocator with hash-chained prefix caching.

Capability parity with the reference BlockManager
(nanovllm/engine/block_manager.py:8-159), rebuilt:
- O(1) free list (OrderedDict) instead of `deque.remove` (O(n), SURVEY §2.5).
- The short-prompt `may_append` lazy-hash compensation (the fork's bugfix,
  reference block_manager.py:136-146) is kept: when the previous page filled
  exactly at a boundary that was never sealed, its hash is backfilled before
  chaining continues.
- Hashing is deterministic across processes/hosts (xxhash64 over raw token
  bytes, never Python's randomized `hash`), so replicated multi-host
  schedulers compute identical prefix-cache decisions.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import xxhash

from nanovllm_tpu.engine.sequence import Sequence


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: tuple[int, ...] = ()

    def update(self, h: int, token_ids) -> None:
        self.hash = h
        self.token_ids = tuple(token_ids)

    def reset(self) -> None:
        self.ref_count = 1
        self.hash = -1
        self.token_ids = ()


def compute_hash(token_ids, prefix_hash: int = -1) -> int:
    """Chained page hash: H(parent_hash ‖ token_ids)."""
    h = xxhash.xxh64()
    h.update((prefix_hash & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"))
    h.update(np.asarray(token_ids, dtype=np.int64).tobytes())
    return h.intdigest()


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 0
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.blocks = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        # FIFO free list with O(1) targeted removal. A free page keeps its
        # hash/token_ids so it can be re-activated on a later prefix-cache hit
        # without any data copy.
        self.free_blocks: OrderedDict[int, None] = OrderedDict(
            (i, None) for i in range(num_blocks)
        )
        self.used_block_ids: set[int] = set()
        # Stats
        self.cached_token_hits = 0

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_blocks)

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        block.reset()
        del self.free_blocks[block_id]
        self.used_block_ids.add(block_id)
        return block

    def _deallocate_block(self, block_id: int) -> None:
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.discard(block_id)
        self.free_blocks[block_id] = None

    def can_allocate(self, seq: Sequence) -> bool:
        return seq.num_blocks <= self.num_free_blocks

    def allocate(self, seq: Sequence) -> None:
        """Allocate the full page table for a prompt, probing the prefix cache
        page by page (reference block_manager.py:62-115)."""
        assert not seq.block_table
        h = -1
        cache_miss = False
        for i in range(seq.num_blocks):
            token_ids = seq.block(i)
            full = len(token_ids) == self.block_size
            h = compute_hash(token_ids, h) if full else -1
            block_id = self.hash_to_block_id.get(h, -1)
            if block_id == -1 or self.blocks[block_id].token_ids != tuple(token_ids):
                cache_miss = True  # hash collision guarded by full comparison
            if cache_miss:
                block_id = next(iter(self.free_blocks))
                block = self._allocate_block(block_id)
            else:
                seq.num_cached_tokens += self.block_size
                self.cached_token_hits += self.block_size
                if block_id in self.used_block_ids:
                    block = self.blocks[block_id]
                    block.ref_count += 1
                else:
                    block = self._allocate_block(block_id)
            if h != -1:
                block.update(h, token_ids)
                self.hash_to_block_id[h] = block_id
            seq.block_table.append(block_id)
        # A fully-cached prompt must still recompute its last token's logits:
        # leave at least one token uncached so prefill has >=1 query.
        if seq.num_cached_tokens == seq.num_tokens:
            seq.num_cached_tokens -= 1

    def deallocate(self, seq: Sequence) -> None:
        for block_id in reversed(seq.block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
        seq.num_cached_tokens = 0
        seq.block_table = []

    # --- multi-step decode API: page reservation is decoupled from hash
    # sealing so K decode steps can run on-device per dispatch -------------

    def pages_needed_for(self, seq: Sequence, k: int) -> int:
        """Extra pages needed so KV slots exist for positions up to
        len(seq)+k-2 (step i of a K-step dispatch writes KV at position
        len+i-1), i.e. capacity len(seq)+k-1 tokens."""
        cap_tokens = len(seq) + k - 1
        need = (cap_tokens + self.block_size - 1) // self.block_size
        return max(0, need - len(seq.block_table))

    def can_reserve(self, seq: Sequence, k: int) -> bool:
        return self.pages_needed_for(seq, k) <= self.num_free_blocks

    def reserve(self, seq: Sequence, k: int) -> None:
        for _ in range(self.pages_needed_for(seq, k)):
            block_id = next(iter(self.free_blocks))
            self._allocate_block(block_id)
            seq.block_table.append(block_id)

    def commit_token(self, seq: Sequence) -> None:
        """Called after append_token: seal page hashes at boundaries.
        Handles both the just-filled page (pos % bs == 0) and the lazy
        backfill of a previous page that was never sealed (the short-prompt
        case, reference block_manager.py:136-146)."""
        pos = len(seq) % self.block_size
        filled_pages = len(seq) // self.block_size
        if pos == 0:
            idx = filled_pages - 1
        elif pos == 1 and filled_pages >= 1:
            idx = filled_pages - 1  # token started a new page; check previous
        else:
            return
        if idx >= len(seq.block_table):
            return
        block = self.blocks[seq.block_table[idx]]
        if block.hash != -1:
            return
        prefix_hash = (
            self.blocks[seq.block_table[idx - 1]].hash if idx > 0 else -1)
        h = compute_hash(seq.block(idx), prefix_hash)
        block.update(h, seq.block(idx))
        self.hash_to_block_id[h] = block.block_id

