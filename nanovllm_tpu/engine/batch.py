"""Explicit, immutable batch descriptor.

Replaces the reference's process-global mutable Context singleton
(nanovllm/utils/context.py:5-27) — globals don't survive XLA tracing; instead
all attention metadata is a static-shaped pytree passed as a jit argument
(SURVEY §7.2). All arrays are padded to the bucket's static shape.

Conventions:
- T = padded token count (flat ragged layout across sequences),
- S = padded sequence count,
- P = pages per sequence (static, from max_model_len / page_size).
- Pad tokens carry `slot_mapping == num_slots` (out-of-bounds; scatter drops
  them) and `seq_idx == S` (a dump row past the real sequences).
- `positions` are 0-based everywhere, including decode (the reference's
  decode off-by-one, SURVEY §2.5, is deliberately fixed).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BatchMeta:
    input_ids: jax.Array    # i32[T]
    positions: jax.Array    # i32[T]
    slot_mapping: jax.Array  # i32[T]  flat slot = page_id * page_size + offset
    seq_idx: jax.Array      # i32[T]  padded-seq slot owning each token
    q_offset: jax.Array     # i32[T]  token's offset within its seq's query run
    block_tables: jax.Array  # i32[S, P]
    context_lens: jax.Array  # i32[S]  kv length after this step (0 = pad seq)
    last_token_idx: jax.Array  # i32[S] flat index of each seq's final query token
    temperatures: jax.Array  # f32[S]
    # Prefill q-tiling (for the ragged Pallas prefill kernel; sequences are
    # aligned to the q-tile size in the flat layout so each tile maps to one
    # sequence). tile_pos0 == -1 marks a padding tile.
    tile_seq: jax.Array     # i32[NT]
    tile_pos0: jax.Array    # i32[NT]  global position of tile's first query
    # Sampling filters (beyond-reference): only plumbed into the compiled
    # step when some scheduled request enables them (ops/sampler.py).
    top_ks: jax.Array | None = None   # i32[S], 0 = off
    top_ps: jax.Array | None = None   # f32[S], 1.0 = off


def build_prefill_meta(seqs, T: int, S: int, page_size: int, pages_per_seq: int,
                       num_slots: int, q_tile: int = 1) -> dict:
    """Host-side (numpy) batch prep for a prefill step.

    Mirrors reference prepare_prefill (engine/model_runner.py:171-241): only
    the *uncached* suffix of each sequence becomes query tokens; cached pages
    are visible to attention through the block table / context_lens.

    Each sequence's query segment starts at a multiple of `q_tile` in the
    flat layout (padding between segments) so every q-tile belongs to exactly
    one sequence — the ragged Pallas prefill kernel's tiling contract.
    """
    assert T % q_tile == 0
    nt = T // q_tile
    input_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    slot_mapping = np.full(T, num_slots, np.int32)
    seq_idx = np.full(T, S, np.int32)
    q_offset = np.zeros(T, np.int32)
    block_tables = np.zeros((S, pages_per_seq), np.int32)
    context_lens = np.zeros(S, np.int32)
    last_token_idx = np.full(S, T - 1, np.int32)
    temperatures = np.zeros(S, np.float32)
    tile_seq = np.full(nt, S, np.int32)
    tile_pos0 = np.full(nt, -1, np.int32)

    top_ks = np.zeros(S, np.int32)
    top_ps = np.ones(S, np.float32)

    t = 0
    for s, seq in enumerate(seqs):
        cached = seq.num_cached_tokens
        n_new = len(seq) - cached
        ids = seq.token_ids[cached:]
        input_ids[t:t + n_new] = ids
        positions[t:t + n_new] = np.arange(cached, len(seq), dtype=np.int32)
        seq_idx[t:t + n_new] = s
        q_offset[t:t + n_new] = np.arange(n_new, dtype=np.int32)
        bt = np.asarray(seq.block_table, np.int32)
        # slot for global position p lives in page p // page_size at offset
        # p % page_size
        pos = np.arange(cached, len(seq))
        slot_mapping[t:t + n_new] = bt[pos // page_size] * page_size + pos % page_size
        block_tables[s, : len(bt)] = bt
        context_lens[s] = len(seq)
        last_token_idx[s] = t + n_new - 1
        temperatures[s] = seq.temperature
        top_ks[s] = seq.top_k
        top_ps[s] = seq.top_p
        n_tiles = cdiv(n_new, q_tile)
        t0 = t // q_tile
        tile_seq[t0:t0 + n_tiles] = s
        tile_pos0[t0:t0 + n_tiles] = cached + np.arange(n_tiles) * q_tile
        t += n_tiles * q_tile
    return dict(
        input_ids=input_ids, positions=positions, slot_mapping=slot_mapping,
        seq_idx=seq_idx, q_offset=q_offset, block_tables=block_tables,
        context_lens=context_lens, last_token_idx=last_token_idx,
        temperatures=temperatures, tile_seq=tile_seq, tile_pos0=tile_pos0,
        top_ks=top_ks, top_ps=top_ps,
    )


def build_decode_meta(seqs, S: int, page_size: int, pages_per_seq: int,
                      num_slots: int) -> dict:
    """Host-side batch prep for a decode step: one query token per sequence
    (reference prepare_decode, engine/model_runner.py:243-268, with 0-based
    positions)."""
    T = S
    input_ids = np.zeros(T, np.int32)
    positions = np.zeros(T, np.int32)
    slot_mapping = np.full(T, num_slots, np.int32)
    seq_idx = np.arange(T, dtype=np.int32)
    q_offset = np.zeros(T, np.int32)
    block_tables = np.zeros((S, pages_per_seq), np.int32)
    context_lens = np.zeros(S, np.int32)
    last_token_idx = np.arange(S, dtype=np.int32)
    temperatures = np.zeros(S, np.float32)
    top_ks = np.zeros(S, np.int32)
    top_ps = np.ones(S, np.float32)

    for s, seq in enumerate(seqs):
        input_ids[s] = seq.last_token
        pos = len(seq) - 1  # 0-based position of the token being decoded
        positions[s] = pos
        bt = np.asarray(seq.block_table, np.int32)
        slot_mapping[s] = bt[pos // page_size] * page_size + pos % page_size
        block_tables[s, : len(bt)] = bt
        context_lens[s] = len(seq)
        temperatures[s] = seq.temperature
        top_ks[s] = seq.top_k
        top_ps[s] = seq.top_p
    n = len(seqs)
    if n < S:
        seq_idx[n:] = S
    return dict(
        input_ids=input_ids, positions=positions, slot_mapping=slot_mapping,
        seq_idx=seq_idx, q_offset=q_offset, block_tables=block_tables,
        context_lens=context_lens, last_token_idx=last_token_idx,
        temperatures=temperatures,
        tile_seq=np.zeros(1, np.int32), tile_pos0=np.full(1, -1, np.int32),
        top_ks=top_ks, top_ps=top_ps,
    )
