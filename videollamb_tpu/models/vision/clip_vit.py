"""LanguageBind CLIP-ViT vision tower with per-layer temporal attention.

TPU-native re-implementation of the vendored LanguageBind video/image CLIP
encoder (reference: llava/model/multimodal_encoder/languagebind/video/
modeling_video.py:78-179 CLIPEncoderLayer with temporal attention,
:617-697 CLIPVisionTransformer). Design notes:

- the patchify convolution (stride == kernel) is expressed as a reshape +
  one big matmul — identical math, lands on the MXU without im2col;
- temporal attention runs over fixed windows of ``num_frames`` (the
  reference hard-codes t=8, modeling_video.py:92-93): frames are grouped as
  (B*T/8, 8) regardless of the clip length, exactly like the reference's
  ``rearrange('(b t) n d -> (b n) t d', t=8)``;
- the temporal positional embedding is added into the residual stream
  *before* the temporal-attention residual branch (reference order,
  modeling_video.py:129-148);
- feature extraction stops at the select layer (default -2 == skip the last
  encoder layer entirely) instead of materializing all 25 hidden states;
- attention logits accumulate in float32; weights can be held in bfloat16.

Measured negative result (v5e, batch 256): keeping the residual stream
token-major ((b, n, t, d)) to skip the two per-layer temporal transposes
LOSES ~45 ms/forward — the spatial kernel's (1, n, d)-at-lane-offset-t*d
blocks of the (b, n, t*d) view DMA at row-strided 2 KB granularity, which
costs more than the contiguous transposes it removes. The production path
is (b*t, n, d) + the packed spatial kernel (zero spatial relayouts).

Parameter tree key names mirror the HF module names
(embeddings/pre_layrnorm — sic — /layers.N.self_attn etc.) so checkpoint
conversion is mechanical.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.bridge.layers import _act

Params = Dict[str, Any]


def _dense(p: Params, x: jax.Array) -> jax.Array:
    if isinstance(p["kernel"], dict):  # int8 path (models/vision/quant.py)
        from videollamb_tpu.models.vision.quant import dense_int8

        return dense_int8(p, x)
    y = jnp.einsum("...d,dk->...k", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _clip_attention(p: Params, x: jax.Array, num_heads: int) -> jax.Array:
    """HF CLIPAttention: query pre-scaled by head_dim**-0.5, out_proj.

    On TPU the core runs as the fused Pallas spatial kernel
    (ops/spatial_attention.py: each head's (N, N) f32 score tile stays in
    VMEM — the XLA path materializes ~1 GB of scores per layer at batch
    256). Elsewhere (CPU tests / training grads) the XLA einsum path."""
    b, n, d = x.shape
    head_dim = d // num_heads
    scale = head_dim**-0.5

    from videollamb_tpu.ops.attention import use_tpu_kernels

    if use_tpu_kernels():
        # Packed layout end to end: q/k/v stay (B, N, D) as the GEMMs
        # produce them; the kernel lane-slices heads internally — zero
        # relayouts in the whole spatial block (ops/spatial_attention.py).
        from videollamb_tpu.ops.spatial_attention import spatial_core_packed

        q = _dense(p["q_proj"], x) * scale
        k = _dense(p["k_proj"], x)
        v = _dense(p["v_proj"], x)
        out = spatial_core_packed(q, k, v, num_heads)
        return _dense(p["out_proj"], out)

    def split(v):
        return v.reshape(b, n, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split(_dense(p["q_proj"], x)) * scale
    k = split(_dense(p["k_proj"], x))
    v = split(_dense(p["v_proj"], x))
    scores = jnp.einsum("bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhke->bhqe", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
    return _dense(p["out_proj"], out)


def _use_fused_temporal(cfg: VisionConfig, t: int) -> bool:
    """Fused Pallas temporal attention: TPU only, and only when the head
    pack (t * heads) lands on whole sublane tiles (always true for the
    production tower: 8 * 16 = 128)."""
    from videollamb_tpu.ops.attention import use_tpu_kernels

    if not use_tpu_kernels():
        return False
    return (t * cfg.num_attention_heads) % 8 == 0


def _encoder_layer(
    p: Params, x: jax.Array, cfg: VisionConfig, time_window: int
) -> jax.Array:
    """One encoder layer: [temporal attn →] spatial attn → MLP (pre-LN)."""
    bt, n, d = x.shape
    if cfg.add_time_attn and time_window > 1:
        t = time_window
        b = bt // t
        if _use_fused_temporal(cfg, t):
            # Frame-major branch: the (b, t, n, d) view of the residual
            # stream is a FREE reshape of (b*t, n, d); the kernel
            # lane-slices heads and packs (t, bn) rows internally, so the
            # whole temporal block runs with zero relayouts (the old
            # (b,n,t,d) core needed a 2x ~135 MB transpose pair per layer
            # at batch 256 — benchmarks/encoder_bisect.py attribution).
            from videollamb_tpu.ops.temporal_attention import (
                temporal_attention_fm,
            )

            y = temporal_attention_fm(
                x.reshape(b, t, n, d), p["temporal_embedding"],
                p["temporal_layer_norm1"], p["temporal_attn"],
                cfg.num_attention_heads, cfg.layer_norm_eps,
            )
            x = y.reshape(bt, n, d)
        else:
            # (bt, n, d) -> (b*n, t, d)
            xt = x.reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b * n, t, d)
            # Temporal embedding enters the residual stream (reference order).
            xt = xt + p["temporal_embedding"][:t].astype(x.dtype)[None]
            residual = xt
            h = _layer_norm(p["temporal_layer_norm1"], xt, cfg.layer_norm_eps)
            h = _clip_attention(p["temporal_attn"], h, cfg.num_attention_heads)
            xt = residual + h
            x = xt.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(bt, n, d)

    residual = x
    h = _layer_norm(p["layer_norm1"], x, cfg.layer_norm_eps)
    h = _clip_attention(p["self_attn"], h, cfg.num_attention_heads)
    x = residual + h

    residual = x
    h = _layer_norm(p["layer_norm2"], x, cfg.layer_norm_eps)
    h = _act(cfg.hidden_act, _dense(p["mlp"]["fc1"], h))
    h = _dense(p["mlp"]["fc2"], h)
    return residual + h


def _embed(p: Params, pixels: jax.Array, cfg: VisionConfig) -> jax.Array:
    """Patchify + class token + positional embedding.

    pixels: (M, C, H, W) -> (M, 1+N, D).
    """
    m, c, h, w = pixels.shape
    ph = pw = cfg.patch_size
    gh, gw = h // ph, w // pw
    # (M, C, gh, ph, gw, pw) -> (M, gh, gw, C, ph, pw) -> (M, gh*gw, C*ph*pw)
    x = pixels.reshape(m, c, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(m, gh * gw, c * ph * pw)
    if isinstance(p["patch_embedding"]["kernel"], dict):
        from videollamb_tpu.models.vision.quant import dense_int8

        patches = dense_int8(p["patch_embedding"], x)
    else:
        patches = jnp.einsum(
            "mnk,kd->mnd", x, p["patch_embedding"]["kernel"].astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(x.dtype)[None, None], (m, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, patches], axis=1)
    return x + p["position_embedding"].astype(x.dtype)[None]


def patch_dropout(
    x: jax.Array, rng: jax.Array, prob: float, b: int, t: int,
) -> jax.Array:
    """Training-only PatchDropout (reference modeling_video.py:32-76,
    arXiv:2212.00794): keep a random top-(1-prob) subset of patch tokens,
    SAME subset across all frames of a video; CLS always kept.

    x: (b*t, 1+N, d). Static output shape (b*t, 1+keep, d).
    """
    if prob <= 0.0:
        return x
    cls_tokens, patches = x[:, :1], x[:, 1:]
    num_tokens = patches.shape[1]
    keep = max(1, int(num_tokens * (1.0 - prob)))
    scores = jax.random.normal(rng, (b, num_tokens))
    _, idx = jax.lax.top_k(scores, keep)  # (b, keep) — per video
    idx = jnp.repeat(idx, t, axis=0)  # (b*t, keep), shared across frames
    kept = jnp.take_along_axis(patches, idx[..., None], axis=1)
    return jnp.concatenate([cls_tokens, kept], axis=1)


@partial(jax.jit, static_argnames=("cfg", "select_layer", "patch_dropout_prob"))
def vision_encode(
    params: Params,
    pixels: jax.Array,
    cfg: VisionConfig,
    select_layer: Optional[int] = None,
    patch_dropout_prob: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Encode frames and return the select-layer hidden states.

    Args:
      params: vision tower parameter tree.
      pixels: (B, T, C, H, W) normalized frames. For the video tower T must
        be a multiple of ``cfg.num_frames`` (the processor guarantees this);
        for images T == 1.
    Returns:
      (B, T, 1+N, D) features (CLS + patches per frame) — the reference
      ``feature_select`` 'patch' layout (languagebind/__init__.py:296-320).
    """
    b, t, c, h, w = pixels.shape
    sel = cfg.select_layer if select_layer is None else select_layer
    # hidden_states[sel] == output of layer (L + sel + 1) for sel < 0.
    n_layers = len(params["layers"]) + (sel + 1 if sel < 0 else sel - len(params["layers"]))
    if sel >= 0:
        n_layers = sel
    time_window = cfg.num_frames if (cfg.add_time_attn and t > 1) else 1

    x = _embed(params["embeddings"], pixels.reshape(b * t, c, h, w), cfg)
    if patch_dropout_prob > 0.0 and dropout_rng is not None:
        x = patch_dropout(x, dropout_rng, patch_dropout_prob, b, t)
    x = _layer_norm(params["pre_layrnorm"], x, cfg.layer_norm_eps)

    # Scan the layer stack: ONE compiled layer body (and ONE instance of
    # each Pallas kernel) instead of n_layers inlined copies. 23 inlined
    # kernel instances reproducibly kill the remote Mosaic compile service
    # ("Broken pipe"), and scan compiles ~20x faster regardless. The
    # per-layer list is stacked inside the trace (a one-off device copy,
    # ~0.8 ms for ViT-L bf16 — noise next to the 100s-of-ms forward).
    layers = params["layers"][:n_layers]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)

    def body(hidden, lp):
        return _encoder_layer(lp, hidden, cfg, time_window), None

    x, _ = jax.lax.scan(body, x, stacked)
    return x.reshape(b, t, x.shape[-2], x.shape[-1])


def vision_encode_features(params: Params, pixels: jax.Array, cfg: VisionConfig) -> jax.Array:
    """Reference-compatible tower forward + feature_select('patch')."""
    return vision_encode(params, pixels, cfg)


# ---------------------------------------------------------------------------
# Init / conversion
# ---------------------------------------------------------------------------


def _init_dense(rng, d_in, d_out, dtype):
    k1, k2 = jax.random.split(rng)
    limit = math.sqrt(1.0 / d_in)
    return {
        "kernel": jax.random.uniform(k1, (d_in, d_out), dtype, -limit * math.sqrt(3), limit * math.sqrt(3)),
        "bias": jnp.zeros((d_out,), dtype),
    }


def _init_ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _init_attn(rng, d, dtype):
    ks = jax.random.split(rng, 4)
    return {
        "q_proj": _init_dense(ks[0], d, d, dtype),
        "k_proj": _init_dense(ks[1], d, d, dtype),
        "v_proj": _init_dense(ks[2], d, d, dtype),
        "out_proj": _init_dense(ks[3], d, d, dtype),
    }


def init_vision_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    ks = jax.random.split(rng, cfg.num_hidden_layers + 3)
    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(ks[i], 4)
        layer = {
            "layer_norm1": _init_ln(d, dtype),
            "self_attn": _init_attn(lk[0], d, dtype),
            "layer_norm2": _init_ln(d, dtype),
            "mlp": {
                "fc1": _init_dense(lk[1], d, cfg.intermediate_size, dtype),
                "fc2": _init_dense(lk[2], cfg.intermediate_size, d, dtype),
            },
        }
        if cfg.add_time_attn:
            layer["temporal_embedding"] = (
                jax.random.normal(lk[3], (cfg.num_frames, d), dtype) * d**-0.5
            )
            layer["temporal_attn"] = _init_attn(jax.random.fold_in(lk[3], 1), d, dtype)
            layer["temporal_layer_norm1"] = _init_ln(d, dtype)
        layers.append(layer)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "embeddings": {
            "class_embedding": jax.random.normal(ks[-3], (d,), dtype) * d**-0.5,
            "patch_embedding": {
                "kernel": jax.random.normal(ks[-2], (patch_dim, d), dtype) * 0.02
            },
            "position_embedding": jax.random.normal(ks[-1], (cfg.seq_len, d), dtype) * 0.02,
        },
        "pre_layrnorm": _init_ln(d, dtype),
        "layers": layers,
        "post_layernorm": _init_ln(d, dtype),
    }
