"""RMT-loss ("retro") training path: backprop the LM loss through every
recurrent segment.

Counterpart of the reference LlavaLlamaForCausalLMRMT
(llava/model/language_model/llava_llama_retro.py:93-224 +
prepare_retro_inputs_labels_for_multimodal, llava_arch.py:663-824): for each
SceneTilling segment s, splice that segment's bridge tokens into the text
and run the LM; concatenate all segment logits/labels and take a single
shifted cross-entropy.

TPU redesign: the reference loops the LM once per segment
(llava_llama_retro.py:136-196); the forwards are independent, so we fold
the segment axis into the batch — ONE LM call over (S*B, L) instead of S
sequential calls. Per-segment sequences are fixed-length right-padded;
padding labels are IGNORE_INDEX so the concat-boundary shift positions
contribute no loss (the reference's variable-length concat has the same
masked boundaries for v1-style templates whose first label is masked).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.assembly import (
    MultimodalBatch,
    Params,
    causal_lm_loss,
    encode_videos_retro,
)
from videollamb_tpu.models.lm.llama import embed_tokens, llama_forward
from videollamb_tpu.models.splice import splice_multimodal


def videollamb_retro_forward(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """-> (logits (B, S*L, V), labels (B, S*L))."""
    assert batch.videos is not None, "retro path is video-only"
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    b = batch.input_ids.shape[0]

    # (B, S, N, lm_d), (B, S, N)
    all_tokens, all_masks = encode_videos_retro(
        params, cfg, batch.videos, deterministic=deterministic, rng=rng
    )
    s = all_tokens.shape[1]

    def splice_seg(x_emb, x_mask):
        return splice_multimodal(
            batch.input_ids, batch.attention_mask, batch.labels,
            text_embeds, x_emb, x_mask, cfg.max_length,
        )

    # vmap over the segment axis -> (S, B, L, ...)
    spliced = jax.vmap(splice_seg, in_axes=(1, 1))(all_tokens, all_masks)

    l = cfg.max_length
    d = text_embeds.shape[-1]
    embeds_sb = spliced.embeds.reshape(s * b, l, d)
    mask_sb = spliced.attention_mask.reshape(s * b, l)
    logits_sb = llama_forward(
        params["lm"], cfg.lm, embeds_sb, mask_sb, remat=remat,
        attn_impl=attn_impl,
    )
    v = logits_sb.shape[-1]
    # (S, B, L, V) -> (B, S*L, V): concat segments along the sequence.
    logits = logits_sb.reshape(s, b, l, v).transpose(1, 0, 2, 3).reshape(b, s * l, v)
    labels = spliced.labels.transpose(1, 0, 2).reshape(b, s * l)
    return logits, labels


def retro_loss(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = False,
    rng: Optional[jax.Array] = None,
    remat: bool = True,
    attn_impl: str = "chunked",
) -> Tuple[jax.Array, jax.Array]:
    logits, labels = videollamb_retro_forward(
        params, cfg, batch, deterministic=deterministic, rng=rng,
        remat=remat, attn_impl=attn_impl,
    )
    return causal_lm_loss(logits, labels)
