"""Pallas paged-attention backend (ragged varlen prefill + paged decode).

Placeholder delegating to the XLA reference backend until the kernels land.
"""

from __future__ import annotations

from nanovllm_tpu.ops.attention_ref import ref_attention


def pallas_attention(q, k, v, layer_cache, meta, *, scale, is_prefill,
                     max_q_len, num_gather_pages):
    return ref_attention(q, k, v, layer_cache, meta, scale=scale,
                         max_q_len=max_q_len,
                         num_gather_pages=num_gather_pages)
