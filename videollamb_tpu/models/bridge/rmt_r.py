"""RMT-R Memory Bridge: recurrent-memory projector with memory retrieval.

TPU-native re-design of the reference Memory Bridge
(llava/model/multimodal_projector/rmt_r_transformer_projector.py:186-402 and
self_retriever.py:188-248):

- SceneTilling boundaries are computed with fixed top-k (production k=3), so
  the whole video becomes a dense (S, F*P) token grid (S = k+1 segments,
  F = 8 frames, P = 144 pooled tokens/frame) plus validity masks — **no
  data-dependent shapes**;
- the segment recurrence (carry 32 memory tokens, append to a memory cache,
  refresh via retrieval cross-attention over the cache) is a single
  ``lax.scan``, compiled once regardless of video length;
- padded frame slots are excluded via additive attention masks, which is
  numerically identical to the reference's ragged per-segment tensors.

Semantics check-list vs the reference:
- first segment uses ``read_memory_emb`` as the initial memory (forward with
  read_memories=None, rmt_r_transformer_projector.py:236-237); later
  segments carry the raw memory output with **no** positional re-add
  (``ndim == 2`` branch not taken, :231-234);
- the memory cache entry is the *pre-retrieval* memory output (:392);
- retrieval cross-attends the current memory over the concatenated cache
  **including** the current entry (:394-397);
- the LLM consumes only the **final segment's** projected hidden states
  (llava_arch.py:331-338 uses ``video_features``, not the per-segment list).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig
from videollamb_tpu.models.bridge.layers import (
    _dense,
    _act,
    cross_only_layer,
    init_dense,
    init_retriever_layer,
    init_transformer_layer,
    transformer_layer,
)
from videollamb_tpu.ops.pooling import pool_frame_tokens
from videollamb_tpu.ops.scene_tilling import segment_plan, segment_topk

Params = Dict[str, Any]


class BridgeOutput(NamedTuple):
    """Static-shape bridge result for one video.

    tokens:      (F*P, lm_d)  final-segment projected tokens (LLM input).
    token_mask:  (F*P,)       validity of those tokens.
    all_tokens:  (S, F*P, lm_d) per-segment projected tokens (retro path).
    all_masks:   (S, F*P)     per-segment validity.
    memory:      (M, d)       final memory state (streaming reuse).
    """

    tokens: jax.Array
    token_mask: jax.Array
    all_tokens: jax.Array
    all_masks: jax.Array
    memory: jax.Array


def init_rmt_r_params(
    rng: jax.Array, cfg: BridgeConfig, lm_hidden_size: int, dtype=jnp.float32
) -> Params:
    """Initialize the full RMT-R bridge parameter tree.

    Layout mirrors reference state_dict keys under ``mm_projector.``:
    projector.layers.{i}.*, projector.proj.0, projector.read_memory_emb,
    projector.memory_tokens, retrieval.layers.0.crossattention.*.
    """
    d, inter = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, cfg.depth + 3)
    projector = {
        "layers": [
            init_transformer_layer(ks[i], d, inter, dtype) for i in range(cfg.depth)
        ],
        "proj": {"dense": init_dense(ks[cfg.depth], d, lm_hidden_size, dtype)},
        "read_memory_emb": jnp.zeros((cfg.num_memory_tokens, d), dtype),
        "memory_tokens": jax.random.normal(ks[cfg.depth + 1], (cfg.num_memory_tokens, d), dtype),
    }
    retrieval = {
        "layers": [init_retriever_layer(ks[cfg.depth + 2], d, dtype)],
    }
    return {"projector": projector, "retrieval": retrieval}


def projector_pass(
    params: Params,
    cfg: BridgeConfig,
    tokens: jax.Array,
    token_mask: Optional[jax.Array],
    read_memories: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """One bridge pass: pack [memories, tokens], run layers, unpack, project.

    Reference TransformerProjector.forward
    (rmt_r_transformer_projector.py:205-274).

    Args:
      tokens: (b, N, d) visual tokens.
      token_mask: (b, N) bool or None.
      read_memories: (b, M, d) memory input (already emb-adjusted by caller).
    Returns:
      (proj_tokens (b, N, lm_d), new_memories (b, M, d)).
    """
    b, n, d = tokens.shape
    m = cfg.num_memory_tokens
    x = jnp.concatenate([read_memories.astype(tokens.dtype), tokens], axis=1)
    if token_mask is not None:
        key_mask = jnp.concatenate(
            [jnp.ones((b, m), dtype=bool), token_mask.astype(bool)], axis=1
        )
    else:
        key_mask = None
    rngs = (
        list(jax.random.split(rng, len(params["layers"])))
        if rng is not None else [None] * len(params["layers"])
    )
    for layer_params, layer_rng in zip(params["layers"], rngs):
        x = transformer_layer(
            layer_params, x, num_heads=cfg.num_attention_heads,
            eps=cfg.layer_norm_eps, act=cfg.hidden_act, key_mask=key_mask,
            attn_dropout=cfg.attention_probs_dropout_prob,
            hidden_dropout=cfg.hidden_dropout_prob,
            rng=layer_rng, deterministic=deterministic,
        )
    new_memories, hidden = x[:, :m], x[:, m:]
    proj = _act(cfg.hidden_act, _dense(params["proj"]["dense"], hidden))
    return proj, new_memories


def retrieve(
    params: Params,
    cfg: BridgeConfig,
    memories: jax.Array,
    cache: jax.Array,
    cache_mask: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Memory retrieval: cross-attend memories over the (masked) cache.

    Reference TransformerRetriever (self_retriever.py:188-248) — one
    cross-attention-only layer, no FFN, no self-attention.

    Args:
      memories: (b, M, d); cache: (b, S*M, d); cache_mask: (b, S*M) bool.
    """
    x = memories
    for layer_params in params["layers"]:
        x = cross_only_layer(
            layer_params, x, num_heads=cfg.num_attention_heads,
            eps=cfg.layer_norm_eps, encoder_hidden=cache,
            encoder_key_mask=cache_mask,
            attn_dropout=cfg.attention_probs_dropout_prob,
            hidden_dropout=cfg.hidden_dropout_prob,
            rng=rng, deterministic=deterministic,
        )
    return x


def pool_and_split(
    features: jax.Array, cfg: BridgeConfig
) -> Tuple[jax.Array, jax.Array]:
    """Split CLS from patches and spatially pool each frame.

    Reference rmt_r_transformer_projector.py:304-319.

    Args:
      features: (t, n, d) tower features per frame, CLS at position 0.
    Returns:
      cls (t, d), pooled (t, P, d) with P = pool_h*pool_w.
    """
    cls_states = features[:, 0, :]
    patches = features[:, 1:, :]
    n = patches.shape[1]
    grid = int(round(n**0.5))
    pooled = pool_frame_tokens(patches, grid, cfg.pool_h, cfg.pool_w)
    return cls_states, pooled


def rmt_r_video_forward(
    params: Params,
    cfg: BridgeConfig,
    features: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> BridgeOutput:
    """Full Memory Bridge over one video's tower features.

    Args:
      features: (t, n, d) per-frame features (CLS + patches), t == number of
        decoded frames (multiple of 8, as produced by the video processor).
    """
    t = features.shape[0]
    d = cfg.hidden_size
    m = cfg.num_memory_tokens
    f = cfg.max_frames_per_segment
    p = cfg.tokens_per_frame
    s = cfg.max_segments

    cls_states, pooled = pool_and_split(features, cfg)

    bounds = segment_topk(cls_states, k=cfg.segment_topk)  # (S,)
    frame_idx, frame_mask = segment_plan(bounds, t, max_frames=f)  # (S, F)

    seg_tokens = pooled[frame_idx]  # (S, F, P, d)
    seg_tokens = seg_tokens.reshape(s, f * p, d)
    seg_mask = jnp.repeat(frame_mask, p, axis=1)  # (S, F*P)
    seg_tokens = jnp.where(seg_mask[..., None], seg_tokens, 0.0)

    read_memory_emb = params["projector"]["read_memory_emb"].astype(seg_tokens.dtype)

    scan_rngs = (
        jax.random.split(rng, s) if rng is not None else jnp.zeros((s, 2), jnp.uint32)
    )

    def body(carry, xs):
        mem, cache, step = carry
        tokens, tmask, step_rng = xs
        step_rng = step_rng if rng is not None else None
        # First segment reads the learned positional memory embedding
        # (reference: forward with read_memories=None).
        mem_in = jnp.where(step == 0, read_memory_emb[None], mem)
        proj, mem_out = projector_pass(
            params["projector"], cfg, tokens[None], tmask[None], mem_in,
            rng=step_rng, deterministic=deterministic,
        )
        cache = jax.lax.dynamic_update_slice_in_dim(cache, mem_out, step * m, axis=1)
        cache_mask = (jnp.arange(s * m) < (step + 1) * m)[None]
        mem_new = retrieve(
            params["retrieval"], cfg, mem_out, cache, cache_mask,
            rng=step_rng, deterministic=deterministic,
        )
        return (mem_new, cache, step + 1), proj[0]

    lm_d = params["projector"]["proj"]["dense"]["kernel"].shape[1]
    init = (
        jnp.zeros((1, m, d), seg_tokens.dtype),
        jnp.zeros((1, s * m, d), seg_tokens.dtype),
        jnp.asarray(0, jnp.int32),
    )
    (final_mem, _, _), all_proj = jax.lax.scan(
        body, init, (seg_tokens, seg_mask, scan_rngs)
    )

    return BridgeOutput(
        tokens=all_proj[-1],
        token_mask=seg_mask[-1],
        all_tokens=all_proj,
        all_masks=seg_mask,
        memory=final_mem[0],
    )


class StreamBridgeState(NamedTuple):
    """Carry for incremental (streaming) bridge evaluation: the recurrent
    memory, a bounded ring cache of past segment memories for retrieval,
    and the number of segments seen."""

    memory: jax.Array  # (1, M, d)
    cache: jax.Array  # (1, S_cache*M, d)
    count: jax.Array  # () int32 — segments processed so far


def init_stream_state(
    cfg: BridgeConfig, dtype=jnp.float32, cache_segments: int = 32
) -> StreamBridgeState:
    d, m = cfg.hidden_size, cfg.num_memory_tokens
    return StreamBridgeState(
        memory=jnp.zeros((1, m, d), dtype),
        cache=jnp.zeros((1, cache_segments * m, d), dtype),
        count=jnp.asarray(0, jnp.int32),
    )


def rmt_r_stream_step(
    params: Params,
    cfg: BridgeConfig,
    features: jax.Array,  # (F, n, d) ONE segment's tower features
    frame_mask: jax.Array,  # (F,) bool — valid frames in this segment
    state: StreamBridgeState,
) -> Tuple[jax.Array, jax.Array, StreamBridgeState]:
    """One segment of the Memory Bridge recurrence, with carried state.

    Identical math to one step of the rmt_r_video_forward scan body
    (reference rmt_r_transformer_projector.py:236-247 + :392-397), except
    the retrieval cache is a bounded ring: once full, the oldest segment
    memory is dropped (the reference caches every segment of a ≤15-segment
    video; a live stream needs constant HBM, so retrieval covers the most
    recent ``cache_segments`` memories).

    Returns (tokens (F*P, lm_d), token_mask (F*P,), new_state).
    """
    f = features.shape[0]
    m = cfg.num_memory_tokens
    p = cfg.tokens_per_frame
    d = cfg.hidden_size
    s_cache = state.cache.shape[1] // m

    _, pooled = pool_and_split(features, cfg)  # (F, P, d)
    tokens = pooled.reshape(1, f * p, d)
    tmask = jnp.repeat(frame_mask.astype(bool), p)[None]
    tokens = jnp.where(tmask[..., None], tokens, 0.0)

    read_memory_emb = params["projector"]["read_memory_emb"].astype(tokens.dtype)
    mem_in = jnp.where(state.count == 0, read_memory_emb[None], state.memory)
    proj, mem_out = projector_pass(
        params["projector"], cfg, tokens, tmask, mem_in, deterministic=True
    )

    # Ring append: shift left once full so the newest entry is always last.
    def append(cache):
        return jax.lax.dynamic_update_slice_in_dim(
            cache, mem_out, jnp.minimum(state.count, s_cache - 1) * m, axis=1
        )

    cache = jnp.where(
        state.count >= s_cache,
        jnp.roll(state.cache, -m, axis=1),
        state.cache,
    )
    cache = append(cache)
    n_valid = jnp.minimum(state.count + 1, s_cache)
    cache_mask = (jnp.arange(s_cache * m) < n_valid * m)[None]
    mem_new = retrieve(
        params["retrieval"], cfg, mem_out, cache, cache_mask, deterministic=True
    )
    new_state = StreamBridgeState(memory=mem_new, cache=cache, count=state.count + 1)
    return proj[0], tmask[0], new_state


def rmt_r_image_forward(
    params: Params,
    cfg: BridgeConfig,
    features: jax.Array,
    *,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Image path (t == 1): a single bridge pass over the pooled frame
    (reference rmt_r_transformer_projector.py:323-339).

    Args:
      features: (b, n, d) image tower features (CLS + patches).
    Returns:
      (b, P, lm_d) projected tokens and (b, M, d) memories.
    """
    b = features.shape[0]
    cls_states, pooled = pool_and_split(features, cfg)
    del cls_states
    read_memories = jnp.broadcast_to(
        params["projector"]["read_memory_emb"][None].astype(pooled.dtype),
        (b, cfg.num_memory_tokens, cfg.hidden_size),
    )
    return projector_pass(
        params["projector"], cfg, pooled, None, read_memories,
        rng=rng, deterministic=deterministic,
    )
