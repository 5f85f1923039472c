"""Multimodal token splicing under static shapes.

Replaces the reference's ragged Python splice
(llava/model/llava_arch.py:492-660: split input_ids on the X sentinel,
embed text chunks, concatenate visual features in between, truncate to the
model max length, re-pad) with a fully on-device scatter:

- every output buffer has fixed length ``max_len``;
- each text token i maps to output index  i            (i <  sentinel_pos)
                                          i - 1 + n_x  (i >  sentinel_pos)
  where n_x is the number of *valid* visual tokens (data-dependent, known
  only on device);
- visual token j (valid) maps to  sentinel_pos + rank_j;
- indices >= max_len scatter out of bounds and are dropped, reproducing the
  reference truncation (llava_arch.py:610-613);
- labels for visual tokens are IGNORE_INDEX, padding labels IGNORE_INDEX,
  attention mask covers exactly the spliced prefix (right padding —
  reference default tokenizer_padding_side 'right').

This keeps the whole train/prefill step inside one compiled XLA graph with
no host round-trip for the per-sample visual token count.
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
    input_ids: jax.Array,  # (T,) int32, one X sentinel (<0), right-padded
    text_valid: jax.Array,  # (T,) bool
    text_labels: jax.Array,  # (T,) int32
    text_embeds: jax.Array,  # (T, D)
    x_embeds: jax.Array,  # (N, D) visual tokens (padded)
    x_mask: jax.Array,  # (N,) bool
    max_len: int,
) -> tuple:
    t = input_ids.shape[0]
    n = x_embeds.shape[0]
    d = text_embeds.shape[-1]

    is_x = (input_ids < 0) & text_valid
    has_x = jnp.any(is_x)
    # Position of the sentinel (t if none — pure-text sample).
    sent_pos = jnp.where(has_x, jnp.argmax(is_x), t).astype(jnp.int32)
    n_x = jnp.where(has_x, jnp.sum(x_mask), 0).astype(jnp.int32)

    pos = jnp.arange(t, dtype=jnp.int32)
    text_target = jnp.where(pos < sent_pos, pos, pos - 1 + n_x)
    # Drop: the sentinel itself, invalid (padding) tokens, and overflow.
    text_drop = (pos == sent_pos) | ~text_valid
    text_target = jnp.where(text_drop, max_len, text_target)

    x_rank = jnp.cumsum(x_mask.astype(jnp.int32)) - 1
    x_target = sent_pos + x_rank
    x_target = jnp.where(x_mask & has_x, x_target, max_len)

    embeds = jnp.zeros((max_len, d), text_embeds.dtype)
    embeds = embeds.at[text_target].set(text_embeds, mode="drop")
    embeds = embeds.at[x_target].set(x_embeds.astype(text_embeds.dtype), mode="drop")

    labels = jnp.full((max_len,), IGNORE_INDEX, jnp.int32)
    labels = labels.at[text_target].set(text_labels.astype(jnp.int32), mode="drop")

    total = jnp.sum(text_valid.astype(jnp.int32)) - has_x.astype(jnp.int32) + n_x
    length = jnp.minimum(total, max_len)
    attn = jnp.arange(max_len, dtype=jnp.int32) < length
    return embeds, attn, labels, length


@partial(jax.jit, static_argnames=("max_len",))
def splice_multimodal(
    input_ids: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) bool/int
    labels: Optional[jax.Array],  # (B, T) or None
    text_embeds: jax.Array,  # (B, T, D)
    x_embeds: jax.Array,  # (B, N, D)
    x_mask: jax.Array,  # (B, N) bool
    max_len: int,
) -> SplicedBatch:
    """Batched splice (vmapped). ``input_ids`` may contain one X sentinel
    (IMAGE -200 / VIDEO -201) per row; rows without a sentinel pass through
    as plain text (their x_embeds are ignored)."""
    if labels is None:
        labels = jnp.where(
            attention_mask.astype(bool), input_ids, IGNORE_INDEX
        )
    embeds, attn, out_labels, lengths = jax.vmap(
        _splice_one, in_axes=(0, 0, 0, 0, 0, 0, None)
    )(
        input_ids.astype(jnp.int32),
        attention_mask.astype(bool),
        labels.astype(jnp.int32),
        text_embeds,
        x_embeds,
        x_mask.astype(bool),
        max_len,
    )
    return SplicedBatch(embeds=embeds, attention_mask=attn, labels=out_labels, lengths=lengths)
