"""Multimodal token splicing under static shapes.

Replaces the reference's ragged Python splice
(llava/model/llava_arch.py:492-660: split input_ids on the X sentinels,
embed text chunks, concatenate visual features in between, truncate to the
model max length, re-pad) with a fully on-device scatter:

- every output buffer has fixed length ``max_len``;
- a row may contain up to K sentinels; the k-th sentinel is replaced by the
  k-th visual block (reference ``cur_x_idx`` walk, llava_arch.py:586-599);
- each text token i maps to output index
      i - (#sentinels before i) + (#valid visual tokens inserted before i);
- visual token (k, j) (valid) maps to
      pos(sentinel_k) - k + sum_{m<k} n_m + rank_j;
- indices >= max_len scatter out of bounds and are dropped, reproducing the
  reference truncation (llava_arch.py:610-613);
- labels for visual tokens are IGNORE_INDEX, padding labels IGNORE_INDEX,
  attention mask covers exactly the spliced prefix (right padding —
  reference default tokenizer_padding_side 'right').

Sentinels beyond the K provided blocks are dropped with zero inserted
tokens; blocks beyond the number of sentinels are ignored. This keeps the
whole train/prefill step inside one compiled XLA graph with no host
round-trip for per-sample visual token counts, and K is a shape bucket
rather than ragged Python state.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from videollamb_tpu.constants import IGNORE_INDEX


class SplicedBatch(NamedTuple):
    embeds: jax.Array  # (B, L, D)
    attention_mask: jax.Array  # (B, L) bool
    labels: jax.Array  # (B, L) int32 (IGNORE_INDEX where unsupervised)
    lengths: jax.Array  # (B,) int32 spliced lengths (post-truncation)


def _splice_one(
    input_ids: jax.Array,  # (T,) int32, up to K X sentinels (<0), right-padded
    text_valid: jax.Array,  # (T,) bool
    text_labels: jax.Array,  # (T,) int32
    text_embeds: jax.Array,  # (T, D)
    x_embeds: jax.Array,  # (K, N, D) visual blocks (padded)
    x_mask: jax.Array,  # (K, N) bool
    segment_ids: jax.Array,  # (T,) int32 (zeros when unpacked)
    max_len: int,
) -> tuple:
    t = input_ids.shape[0]
    k_max, n, _ = x_embeds.shape
    d = text_embeds.shape[-1]

    is_x = (input_ids < 0) & text_valid  # (T,)
    num_sent = jnp.sum(is_x).astype(jnp.int32)
    sent_cum = jnp.cumsum(is_x.astype(jnp.int32))  # inclusive count
    sent_rank = sent_cum - 1  # rank of the sentinel at i (valid where is_x)

    n_per_block = jnp.sum(x_mask, axis=-1).astype(jnp.int32)  # (K,)
    block_used = jnp.arange(k_max, dtype=jnp.int32) < num_sent  # (K,)
    n_used = jnp.where(block_used, n_per_block, 0)

    # Visual tokens inserted AT position i (0 unless i is a sentinel with a
    # backing block; extra sentinels insert nothing but are still removed).
    safe_rank = jnp.clip(sent_rank, 0, k_max - 1)
    nx_here = jnp.where(
        is_x & (sent_rank < k_max), n_used[safe_rank], 0
    ).astype(jnp.int32)
    cum_nx = jnp.cumsum(nx_here)
    cum_nx_before = cum_nx - nx_here  # exclusive prefix
    sent_before = sent_cum - is_x.astype(jnp.int32)

    pos = jnp.arange(t, dtype=jnp.int32)
    text_target = pos - sent_before + cum_nx_before
    text_drop = is_x | ~text_valid
    text_target = jnp.where(text_drop, max_len, text_target)

    # Position of the k-th sentinel (t if absent): scatter pos by rank.
    scatter_rank = jnp.where(is_x & (sent_rank < k_max), safe_rank, k_max)
    sent_pos = (
        jnp.full((k_max,), t, jnp.int32).at[scatter_rank].set(pos, mode="drop")
    )
    blk_cum = jnp.cumsum(n_used) - n_used  # visual tokens before block k
    base = sent_pos - jnp.arange(k_max, dtype=jnp.int32) + blk_cum  # (K,)

    x_rank = jnp.cumsum(x_mask.astype(jnp.int32), axis=-1) - 1  # (K, N)
    x_target = base[:, None] + x_rank
    x_ok = x_mask & block_used[:, None]
    x_target = jnp.where(x_ok, x_target, max_len)

    embeds = jnp.zeros((max_len, d), text_embeds.dtype)
    embeds = embeds.at[text_target].set(text_embeds, mode="drop")
    embeds = embeds.at[x_target.reshape(-1)].set(
        x_embeds.reshape(-1, d).astype(text_embeds.dtype), mode="drop"
    )

    labels = jnp.full((max_len,), IGNORE_INDEX, jnp.int32)
    labels = labels.at[text_target].set(text_labels.astype(jnp.int32), mode="drop")

    # Segment ids ride the same scatters: text tokens keep their segment,
    # visual block k inherits the segment of the sentinel it replaces
    # (packed-training support; all-zero for unpacked batches).
    seg_out = jnp.zeros((max_len,), jnp.int32)
    seg_out = seg_out.at[text_target].set(
        segment_ids.astype(jnp.int32), mode="drop"
    )
    sent_seg = segment_ids[jnp.clip(sent_pos, 0, t - 1)]  # (K,) seg of sentinel k
    x_seg = jnp.broadcast_to(sent_seg[:, None], x_target.shape)
    seg_out = seg_out.at[x_target.reshape(-1)].set(
        x_seg.reshape(-1), mode="drop"
    )

    total = (
        jnp.sum(text_valid.astype(jnp.int32)) - num_sent + jnp.sum(n_used)
    )
    length = jnp.minimum(total, max_len)
    attn = jnp.arange(max_len, dtype=jnp.int32) < length
    return embeds, attn, labels, length, seg_out


@partial(jax.jit, static_argnames=("max_len",))
def splice_multimodal(
    input_ids: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) bool/int
    labels: Optional[jax.Array],  # (B, T) or None
    text_embeds: jax.Array,  # (B, T, D)
    x_embeds: jax.Array,  # (B, N, D) or (B, K, N, D)
    x_mask: jax.Array,  # (B, N) or (B, K, N) bool
    max_len: int,
) -> SplicedBatch:
    """Batched splice (vmapped). ``input_ids`` may contain up to K X
    sentinels per row (IMAGE -200 / VIDEO -201); the k-th sentinel is
    replaced by visual block k. Rows without a sentinel pass through as
    plain text (their x_embeds are ignored). A 3-D ``x_embeds`` is treated
    as a single block per row (K=1)."""
    if labels is None:
        labels = jnp.where(
            attention_mask.astype(bool), input_ids, IGNORE_INDEX
        )
    if x_embeds.ndim == 3:
        x_embeds = x_embeds[:, None]
        x_mask = x_mask[:, None]
    embeds, attn, out_labels, lengths, _ = jax.vmap(
        _splice_one, in_axes=(0, 0, 0, 0, 0, 0, 0, None)
    )(
        input_ids.astype(jnp.int32),
        attention_mask.astype(bool),
        labels.astype(jnp.int32),
        text_embeds,
        x_embeds,
        x_mask.astype(bool),
        jnp.zeros_like(input_ids, dtype=jnp.int32),
        max_len,
    )
    return SplicedBatch(embeds=embeds, attention_mask=attn, labels=out_labels, lengths=lengths)


def packed_position_ids(segment_ids: jax.Array) -> jax.Array:
    """Per-segment position ids for packed rows: positions restart at 0 at
    the start of each contiguous segment run. (B, L) int32 -> (B, L)."""
    l = segment_ids.shape[-1]
    idx = jnp.arange(l, dtype=jnp.int32)
    prev = jnp.concatenate(
        [jnp.full_like(segment_ids[..., :1], -1), segment_ids[..., :-1]], -1
    )
    starts = jnp.where(segment_ids != prev, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, starts, axis=-1)
    return idx - run_start


@partial(jax.jit, static_argnames=("max_len",))
def splice_multimodal_packed(
    input_ids: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) bool/int
    labels: Optional[jax.Array],  # (B, T) or None
    segment_ids: jax.Array,  # (B, T) int32: 1..S per sample, 0 = padding
    text_embeds: jax.Array,  # (B, T, D)
    x_embeds: jax.Array,  # (B, K, N, D)
    x_mask: jax.Array,  # (B, K, N) bool
    max_len: int,
) -> tuple:
    """Packed-row splice: like ``splice_multimodal`` but each row carries
    several independent conversations distinguished by ``segment_ids``.
    Visual tokens inherit the segment of the sentinel they replace; output
    position ids restart at each segment (RoPE sees each conversation
    from position 0, exactly as if it were its own row).

    Returns (SplicedBatch, spliced_segment_ids (B, L), position_ids (B, L)).
    No reference counterpart: the reference pads every row to the batch max
    (train.py:827-872); packing is the TPU-side static-shape answer to the
    padding waste that padding-to-max creates.
    """
    if labels is None:
        labels = jnp.where(attention_mask.astype(bool), input_ids, IGNORE_INDEX)
    if x_embeds.ndim == 3:
        x_embeds = x_embeds[:, None]
        x_mask = x_mask[:, None]
    embeds, attn, out_labels, lengths, seg_out = jax.vmap(
        _splice_one, in_axes=(0, 0, 0, 0, 0, 0, 0, None)
    )(
        input_ids.astype(jnp.int32),
        attention_mask.astype(bool),
        labels.astype(jnp.int32),
        text_embeds,
        x_embeds,
        x_mask.astype(bool),
        segment_ids.astype(jnp.int32),
        max_len,
    )
    # Padding scatter slots keep segment 0; mask them out of attention via
    # the attn mask — but normalize: positions past `lengths` are seg 0.
    seg_out = jnp.where(attn, seg_out, 0)
    pos_out = packed_position_ids(seg_out)
    spliced = SplicedBatch(embeds=embeds, attention_mask=attn,
                           labels=out_labels, lengths=lengths)
    return spliced, seg_out, pos_out
