"""The non-RMT-R projector family.

JAX counterparts of the reference projector zoo
(llava/model/multimodal_projector/): identity, linear, mlp{N}x_gelu,
transformer{N}x (3-D pooled), mlp_transformer{N}x, rmt_transformer{N}x
(recurrence without retrieval), rmt_r_transformer cap variant (k=7, raw
patches, detached memory cache — the retro-training projector), and a
BLIP-2-style Q-Former.

All video entry points take (t, n, d) per-video tower features (CLS +
patches) and return (tokens, mask) with static shapes, matching the calling
convention of :mod:`videollamb_tpu.models.bridge.rmt_r`.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig
from videollamb_tpu.models.bridge.layers import (
    _act,
    _dense,
    init_dense,
    init_retriever_layer,
    init_transformer_layer,
    transformer_layer,
)
from videollamb_tpu.models.bridge.rmt_r import projector_pass, retrieve
from videollamb_tpu.ops.pooling import adaptive_avg_pool_2d, pool_frame_tokens
from videollamb_tpu.ops.scene_tilling import segment_plan, segment_topk

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Trivial projectors
# ---------------------------------------------------------------------------


def identity_forward(params: Params, cfg: BridgeConfig, x: jax.Array) -> jax.Array:
    del params, cfg
    return x


def init_linear_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    return {"dense": init_dense(rng, cfg.hidden_size, lm_d, dtype)}


def linear_forward(params: Params, cfg: BridgeConfig, x: jax.Array) -> jax.Array:
    del cfg
    return _dense(params["dense"], x)


def init_mlp_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    """mlp{N}x_gelu: Linear(mm->lm) then (N-1) x [GELU, Linear(lm->lm)]
    (reference multimodal_projector/builder.py:41-48)."""
    ks = jax.random.split(rng, cfg.mlp_depth)
    layers = [init_dense(ks[0], cfg.hidden_size, lm_d, dtype)]
    for i in range(1, cfg.mlp_depth):
        layers.append(init_dense(ks[i], lm_d, lm_d, dtype))
    return {"layers": layers}


def mlp_forward(params: Params, cfg: BridgeConfig, x: jax.Array) -> jax.Array:
    x = _dense(params["layers"][0], x)
    for lp in params["layers"][1:]:
        x = _dense(lp, jax.nn.gelu(x, approximate=False))
    return x


# ---------------------------------------------------------------------------
# Transformer projector (3-D pooled) — reference transformer_projector.py:183-273
# ---------------------------------------------------------------------------


def init_transformer_proj_params(rng, cfg: BridgeConfig, lm_d: int,
                                 dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, cfg.depth + 1)
    return {
        "layers": [init_transformer_layer(ks[i], cfg.hidden_size,
                                          cfg.intermediate_size, dtype)
                   for i in range(cfg.depth)],
        "proj": {"dense": init_dense(ks[-1], cfg.hidden_size, lm_d, dtype)},
    }


def _run_layers(params: Params, cfg: BridgeConfig, x: jax.Array,
                deterministic: bool = True) -> jax.Array:
    for lp in params["layers"]:
        x = transformer_layer(
            lp, x, num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps,
            act=cfg.hidden_act, deterministic=deterministic,
        )
    return x


def _strip_cls(features: jax.Array) -> jax.Array:
    """Drop CLS when tokens are 1 + k^2 (the reference transformer variants
    implicitly assume CLS-free inputs; we normalize)."""
    n = features.shape[-2]
    grid = int(round((n - 1) ** 0.5))
    if grid * grid == n - 1:
        return features[..., 1:, :]
    return features


def transformer_video_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True, pool_t: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Video: 3-D adaptive pool to (pool_t, 12, 12) tokens, transformer,
    proj (reference transformer_projector.py:226-240)."""
    patches = _strip_cls(features)  # (t, n, d)
    t, n, d = patches.shape
    grid = int(round(n**0.5))
    x = patches.reshape(t, grid, grid, d).transpose(3, 0, 1, 2)  # (d, t, g, g)
    # Adaptive 3-D pool = temporal pool then spatial pool (separable means).
    x = adaptive_avg_pool_2d(x.reshape(d, t, grid * grid), (pool_t, grid * grid))
    x = x.reshape(d, pool_t, grid, grid)
    x = adaptive_avg_pool_2d(x, (cfg.pool_h, cfg.pool_w))
    x = x.transpose(1, 2, 3, 0).reshape(1, pool_t * cfg.pool_h * cfg.pool_w, d)
    x = _run_layers(params, cfg, x, deterministic)
    tokens = _act(cfg.hidden_act, _dense(params["proj"]["dense"], x))[0]
    return tokens, jnp.ones(tokens.shape[:1], bool)


def transformer_image_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True,
) -> jax.Array:
    """Image: 2-D pool to 12x12 (reference :229-233)."""
    patches = _strip_cls(features)  # (b, n, d)
    pooled = pool_frame_tokens(patches, int(round(patches.shape[-2] ** 0.5)),
                               cfg.pool_h, cfg.pool_w)
    x = _run_layers(params, cfg, pooled, deterministic)
    return _act(cfg.hidden_act, _dense(params["proj"]["dense"], x))


# ---------------------------------------------------------------------------
# MLP-Transformer — reference mlp_transformer_projector.py:183-258
# ---------------------------------------------------------------------------


def init_mlp_transformer_params(rng, cfg: BridgeConfig, lm_d: int,
                                dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, cfg.depth + 3)
    return {
        "proj": {
            "fc1": init_dense(ks[0], cfg.hidden_size, lm_d, dtype),
            "fc2": init_dense(ks[1], lm_d, lm_d, dtype),
        },
        # Layers operate in the projected (LM) width.
        "layers": [init_transformer_layer(ks[2 + i], lm_d,
                                          cfg.intermediate_size, dtype)
                   for i in range(cfg.depth)],
    }


def mlp_transformer_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Per-frame: MLP to LM dim -> 12x12 pool -> transformer layers
    (reference :212-255). features: (t, n, d) -> ((t*144), lm_d)."""
    patches = _strip_cls(features)
    x = _dense(params["proj"]["fc2"],
               jax.nn.gelu(_dense(params["proj"]["fc1"], patches), approximate=False))
    pooled = pool_frame_tokens(x, int(round(x.shape[-2] ** 0.5)),
                               cfg.pool_h, cfg.pool_w)  # (t, 144, lm_d)
    lm_d = pooled.shape[-1]
    mt_cfg = cfg  # attention width == lm_d via layer params
    out = pooled
    for lp in params["layers"]:
        out = transformer_layer(
            lp, out, num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps,
            act=cfg.hidden_act, deterministic=deterministic,
        )
    tokens = out.reshape(-1, lm_d)
    return tokens, jnp.ones(tokens.shape[:1], bool)


# ---------------------------------------------------------------------------
# RMT (recurrence, no retrieval) — reference rmt_transformer_projector.py:273-404
# ---------------------------------------------------------------------------


def init_rmt_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params

    params = init_rmt_r_params(rng, cfg, lm_d, dtype)
    return {"projector": params["projector"]}


def rmt_video_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True, max_frames: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Memory recurrence without retrieval; <=4 frames/segment
    (reference :336-361). Returns the final segment's projected tokens."""
    from videollamb_tpu.models.bridge.rmt_r import pool_and_split

    t = features.shape[0]
    d = cfg.hidden_size
    p = cfg.tokens_per_frame
    s = cfg.max_segments

    cls_states, pooled = pool_and_split(features, cfg)
    bounds = segment_topk(cls_states, k=cfg.segment_topk)
    frame_idx, frame_mask = segment_plan(bounds, t, max_frames=max_frames)

    seg_tokens = pooled[frame_idx].reshape(s, max_frames * p, d)
    seg_mask = jnp.repeat(frame_mask, p, axis=1)
    seg_tokens = jnp.where(seg_mask[..., None], seg_tokens, 0.0)

    emb = params["projector"]["read_memory_emb"].astype(seg_tokens.dtype)

    def body(carry, xs):
        mem, step = carry
        tokens, tmask = xs
        mem_in = jnp.where(step == 0, emb[None], mem)
        proj, mem_out = projector_pass(
            params["projector"], cfg, tokens[None], tmask[None], mem_in,
            deterministic=deterministic,
        )
        return (mem_out, step + 1), proj[0]

    m = cfg.num_memory_tokens
    init = (jnp.zeros((1, m, d), seg_tokens.dtype), jnp.asarray(0, jnp.int32))
    _, all_proj = jax.lax.scan(body, init, (seg_tokens, seg_mask))
    return all_proj[-1], seg_mask[-1]


# ---------------------------------------------------------------------------
# RMT-R "cap" (retro training) — reference rmt_r_transformer_cap_projector.py
# ---------------------------------------------------------------------------


def init_rmt_r_cap_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params

    return init_rmt_r_params(rng, cfg, lm_d, dtype)


def rmt_r_cap_video_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True, topk: int = 7, max_frames: int = 4,
) -> Tuple[jax.Array, jax.Array]:
    """Caption/RMT-loss variant (reference :275-416): k=7 segments, RAW
    patches (no spatial pooling), <=4 frames/segment, memory cache entries
    and per-segment outputs detached (stop_gradient), retrieval refresh.
    Configure 128 memory tokens to match the reference
    (cap_projector.py:197 hard-codes num_memory_tokens=128).

    Quirk preserved: the reference reads CLS from index 1
    (cap_projector.py:326 ``hidden_states[:, 1, :]``).

    Returns (all_tokens (S, max_frames*N, lm_d), all_masks (S, ...)).
    """
    t, n, d = features.shape
    cls_states = features[:, 1, :]
    patches = features[:, 1:, :]
    p = n - 1
    s = topk + 1
    m = cfg.num_memory_tokens

    bounds = segment_topk(cls_states, k=topk)
    frame_idx, frame_mask = segment_plan(bounds, t, max_frames=max_frames)

    seg_tokens = patches[frame_idx].reshape(s, max_frames * p, d)
    seg_mask = jnp.repeat(frame_mask, p, axis=1)
    seg_tokens = jnp.where(seg_mask[..., None], seg_tokens, 0.0)

    emb = params["projector"]["read_memory_emb"].astype(seg_tokens.dtype)

    def body(carry, xs):
        mem, cache, step = carry
        tokens, tmask = xs
        mem_in = jnp.where(step == 0, emb[None], mem)
        proj, mem_out = projector_pass(
            params["projector"], cfg, tokens[None], tmask[None], mem_in,
            deterministic=deterministic,
        )
        cache = jax.lax.dynamic_update_slice_in_dim(
            cache, jax.lax.stop_gradient(mem_out), step * m, axis=1
        )
        cache_mask = (jnp.arange(s * m) < (step + 1) * m)[None]
        mem_new = retrieve(
            params["retrieval"], cfg, mem_out, cache, cache_mask,
            deterministic=deterministic,
        )
        return (mem_new, cache, step + 1), jax.lax.stop_gradient(proj[0])

    init = (
        jnp.zeros((1, m, d), seg_tokens.dtype),
        jnp.zeros((1, s * m, d), seg_tokens.dtype),
        jnp.asarray(0, jnp.int32),
    )
    _, all_proj = jax.lax.scan(body, init, (seg_tokens, seg_mask))
    return all_proj, seg_mask


# ---------------------------------------------------------------------------
# SpatialPool — reference spatial_pool_projector.py:6-53 (resampler-style
# stride pooling over the patch grid; 'average'/'max' modes)
# ---------------------------------------------------------------------------


def spatial_pool_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    mode: str = "average", stride: int = 2,
) -> Tuple[jax.Array, jax.Array]:
    """Stride-pool patch tokens on their 2-D grid. features: (t, n, d) or
    (n, d) -> ((t*g/s*g/s), d) tokens (no dim projection, like the
    reference's average/max modes)."""
    del params
    x = features if features.ndim == 3 else features[None]
    patches = _strip_cls(x)
    t, n, d = patches.shape
    grid = int(round(n**0.5))
    g = patches.reshape(t, grid // stride, stride, grid // stride, stride, d)
    if mode == "average":
        pooled = g.mean(axis=(2, 4))
    elif mode == "max":
        pooled = g.max(axis=(2, 4))
    else:
        raise ValueError(f"Unknown pooling mode: {mode}")
    tokens = pooled.reshape(-1, d)
    return tokens, jnp.ones(tokens.shape[:1], bool)


# ---------------------------------------------------------------------------
# Q-Former — reference qformer_projector.py:12-92 (BLIP-2 style)
# ---------------------------------------------------------------------------


def init_qformer_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, cfg.qformer_layers + 3)
    return {
        "query_tokens": jnp.zeros((cfg.qformer_queries, cfg.hidden_size), dtype),
        "layers": [init_transformer_layer(ks[i], cfg.hidden_size,
                                          cfg.intermediate_size, dtype)
                   for i in range(cfg.qformer_layers)],
        "proj": {
            "fc1": init_dense(ks[-2], cfg.hidden_size, lm_d, dtype),
            "fc2": init_dense(ks[-1], lm_d, lm_d, dtype),
        },
    }


def qformer_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Learned queries self-attend and cross-attend the (flattened) visual
    features each layer, then a 2-layer GELU MLP projects to the LM width.
    features: (t, n, d) or (n, d)."""
    if features.ndim == 3:
        features = features.reshape(1, -1, features.shape[-1])
    else:
        features = features[None]
    q = jnp.broadcast_to(
        params["query_tokens"][None].astype(features.dtype),
        (1, params["query_tokens"].shape[0], cfg.hidden_size),
    )
    for lp in params["layers"]:
        q = transformer_layer(
            lp, q, num_heads=cfg.num_attention_heads, eps=cfg.layer_norm_eps,
            act=cfg.hidden_act, encoder_hidden=features,
            deterministic=deterministic,
        )
    tokens = _dense(params["proj"]["fc2"],
                    jax.nn.gelu(_dense(params["proj"]["fc1"], q), approximate=False))[0]
    return tokens, jnp.ones(tokens.shape[:1], bool)


# ---------------------------------------------------------------------------
# Retention projector — reference retent_transformer_projector.py
# ---------------------------------------------------------------------------
#
# The reference module is dead code: it is not registered in the factory
# (multimodal_projector/builder.py:13-53 has no name for it) and its
# eponymous `Retention` class is unconstructible as written, twice over:
# :59 references `RMSNorm`, never defined or imported in the file
# (NameError), and reset_parameters (:70) initializes
# `self.out_proj.weight` but the attribute created at :57 is `output_proj`
# (AttributeError). The class is ALSO unused within its own
# file: `TransformerLayer` (:232-236) builds the plain `Attention`, so the
# file's `RMTTransformerProjector` (:391-499) is constructible and runs.
#
# We implement both pieces, bug fixed:
#   * retention_video/image_forward — the file's projector semantics: raw
#     patches (no spatial pooling), CLS read from patch index 1 (:437
#     quirk), SceneTilling k=3 whole segments (no frame subsample),
#     num_memory_tokens=128 (:480), initial memory = read_memory_emb
#     (zeros, :351-352), carried memory passed through un-adjusted, output
#     = LAST segment's projected tokens (:445-455).
#   * retention_attention / init_retention_attention — the Retention layer
#     itself. Its forward (:78-145) is plain softmax attention + Residual;
#     g_proj / output_proj / the affine-free RMSNorm group_norm are
#     initialized but never touched by forward. We keep the dead params in
#     the tree for state-dict parity and reproduce the forward exactly.


def init_retention_params(rng, cfg: BridgeConfig, lm_d: int, dtype=jnp.float32) -> Params:
    """Parameter tree of the file's RMTTransformerProjector: projector only
    (no retrieval module exists in retent_transformer_projector.py)."""
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params

    return {"projector": init_rmt_r_params(rng, cfg, lm_d, dtype)["projector"]}


def retention_video_forward(
    params: Params, cfg: BridgeConfig, features: jax.Array,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Reference retent_transformer_projector.py:429-455: CLS from index 1,
    drop token 0, k=3 whole segments (every frame, no linspace subsample),
    recurrent memory without retrieval, return the final segment."""
    t, n, d = features.shape
    cls_states = features[:, 1, :]
    patches = features[:, 1:, :]
    p = n - 1
    s = cfg.max_segments
    m = cfg.num_memory_tokens

    bounds = segment_topk(cls_states, k=cfg.segment_topk)
    # max_frames=t => linspace(start, end, len) == every frame of the segment.
    frame_idx, frame_mask = segment_plan(bounds, t, max_frames=t)

    seg_tokens = patches[frame_idx].reshape(s, t * p, d)
    seg_mask = jnp.repeat(frame_mask, p, axis=1)
    seg_tokens = jnp.where(seg_mask[..., None], seg_tokens, 0.0)

    emb = params["projector"]["read_memory_emb"].astype(seg_tokens.dtype)

    def body(carry, xs):
        mem, step = carry
        tokens, tmask = xs
        mem_in = jnp.where(step == 0, emb[None], mem)
        proj, mem_out = projector_pass(
            params["projector"], cfg, tokens[None], tmask[None], mem_in,
            deterministic=deterministic,
        )
        return (mem_out, step + 1), proj[0]

    init = (jnp.zeros((1, m, d), seg_tokens.dtype), jnp.asarray(0, jnp.int32))
    _, all_proj = jax.lax.scan(body, init, (seg_tokens, seg_mask))
    return all_proj[-1], seg_mask[-1]


def retention_image_forward(
    params: Params, cfg: BridgeConfig, img: jax.Array,
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """t==1 path (:417-428): ALL tokens (CLS kept, no pooling), one
    projector pass with the zero read_memory_emb as the initial memory."""
    emb = params["projector"]["read_memory_emb"].astype(img.dtype)
    proj, _ = projector_pass(
        params["projector"], cfg, img, None, emb[None],
        deterministic=deterministic,
    )
    return proj[0], jnp.ones(proj.shape[1:2], bool)


def init_retention_attention(rng, d: int, dtype=jnp.float32) -> Params:
    """Retention layer params (retent_transformer_projector.py:40-70), with
    the reference's construction bug fixed: the gain-2**-1 xavier init that
    :70 aims at the nonexistent `out_proj` is applied to `output_proj`.
    Biases keep the torch Linear default (reset_parameters touches only
    weights). g_proj/output_proj are dead in forward but kept for
    state-dict parity; group_norm is affine-free (no params)."""
    from videollamb_tpu.models.bridge.layers import init_residual

    ks = jax.random.split(rng, 6)

    def xavier(k, gain):
        limit = gain * math.sqrt(6.0 / (d + d))
        kb, kw = jax.random.split(k)
        blim = math.sqrt(1.0 / d)
        return {
            "kernel": jax.random.uniform(kw, (d, d), dtype, -limit, limit),
            "bias": jax.random.uniform(kb, (d,), dtype, -blim, blim),
        }

    return {
        "q_proj": xavier(ks[0], 2 ** -2.5),
        "k_proj": xavier(ks[1], 2 ** -2.5),
        "v_proj": xavier(ks[2], 2 ** -2.5),
        "g_proj": xavier(ks[3], 2 ** -2.5),
        "output_proj": xavier(ks[4], 2 ** -1),
        "residual": init_residual(ks[5], d, d, dtype),
    }


def retention_attention(
    p: Params, hidden: jax.Array, *, num_heads: int, eps: float,
    encoder_hidden: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Retention.forward (retent_transformer_projector.py:78-145): despite
    the RetNet-style parameter set, the forward is plain softmax attention
    (q/k/v, 1/sqrt(dh) scaling, optional cross source) into the Residual
    block — gate, output_proj and group_norm are never applied. We delegate
    to the shared attention primitive, which reads exactly the live keys."""
    from videollamb_tpu.models.bridge.layers import attention

    return attention(
        p, hidden, num_heads=num_heads, eps=eps,
        encoder_hidden=encoder_hidden, key_mask=key_mask,
        deterministic=deterministic,
    )
