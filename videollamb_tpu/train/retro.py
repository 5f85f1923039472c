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


def init_lm_memory(rng: jax.Array, cfg: ModelConfig, embed_std: float = 0.02,
                   num_mem_tokens: int = 32, dtype=jnp.float32) -> jax.Array:
    """Learned LM-space memory tokens (reference
    llava_llama_retro_lm.py:63-71: randn * embedding std)."""
    return jax.random.normal(
        rng, (num_mem_tokens, cfg.lm.hidden_size), dtype
    ) * embed_std


def videollamb_retro_lm_forward(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """LM-memory retro variant (reference llava_llama_retro_lm.py:93-224):

    32 learned memory tokens live INSIDE the LLM. Each segment's spliced
    sequence is wrapped as [memory, segment, memory]; the write-position
    hidden states become the next segment's memory. Only the first
    hand-off keeps gradients (the reference detaches memory after i != 0).

    Requires ``params['lm_memory']`` of shape (M, D) (init_lm_memory).
    -> (logits (B, S*L, V), labels (B, S*L)) over the un-wrapped positions.
    """
    from videollamb_tpu.models.lm.llama import llama_forward_with_hidden

    assert batch.videos is not None
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    b = batch.input_ids.shape[0]
    memory = params["lm_memory"]
    m = memory.shape[0]

    all_tokens, all_masks = encode_videos_retro(
        params, cfg, batch.videos, deterministic=deterministic, rng=rng
    )
    s = all_tokens.shape[1]
    l = cfg.max_length

    memory_state = jnp.broadcast_to(memory[None], (b, m, memory.shape[-1]))
    seg_logits, seg_labels = [], []
    for seg in range(s):
        spliced = splice_multimodal(
            batch.input_ids, batch.attention_mask, batch.labels,
            text_embeds, all_tokens[:, seg], all_masks[:, seg], l,
        )
        wrapped = jnp.concatenate(
            [memory_state.astype(spliced.embeds.dtype), spliced.embeds,
             memory_state.astype(spliced.embeds.dtype)], axis=1,
        )
        ones = jnp.ones((b, m), spliced.attention_mask.dtype)
        wrapped_mask = jnp.concatenate([ones, spliced.attention_mask, ones], axis=1)
        logits, hidden = llama_forward_with_hidden(
            params["lm"], cfg.lm, wrapped, wrapped_mask, remat=remat,
            attn_impl=attn_impl,
        )
        memory_state = hidden[:, -m:].astype(memory_state.dtype)
        if seg != 0:
            memory_state = jax.lax.stop_gradient(memory_state)
        seg_logits.append(logits[:, m:-m])
        seg_labels.append(spliced.labels)

    logits = jnp.concatenate(seg_logits, axis=1)
    labels = jnp.concatenate(seg_labels, axis=1)
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
