"""Deformable-DETR image tower (encoder-only), TPU-native.

Reference: llava/model/multimodal_encoder/deformer/deformer_modeling.py
(DeformableVisionModel — HF DeformableDetrModel stripped to backbone +
multi-scale deformable encoder) and deformer/__init__.py
(DeformableImageTower). Experimental in the reference (never in a released
checkpoint), implemented here as working code for completeness.

Pieces:

- ResNet-50 backbone (HF ResNetBackbone layout: 7x7/2 embedder + maxpool +
  bottleneck stages [3,4,6,3]; features from the last three stages);
  BatchNorm is folded inference-style;
- DETR sine position embeddings (normalized, temperature 10000);
- per-level 1x1 conv + GroupNorm(32) input projections, plus a 3x3/2
  projection for the extra lowest-resolution level;
- multi-scale deformable attention: per query, learned sampling offsets
  (heads x levels x points x 2) around its reference point and softmaxed
  attention weights over levels*points; values sampled bilinearly
  (grid_sample semantics: align_corners=False, zero padding) — expressed
  as gathers + lerp weights, which XLA vectorizes fine on TPU (no CUDA
  im2col kernel needed);
- encoder layers: deformable self-attention + ReLU FFN, post-LN residuals
  (HF DeformableDetrEncoderLayer).

Parity: tests/test_deformable.py checks the attention core + encoder
against transformers' DeformableDetrEncoder and the backbone against
transformers' ResNetBackbone with shared weights.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class DeformableConfig:
    d_model: int = 256
    encoder_layers: int = 6
    encoder_attention_heads: int = 8
    encoder_ffn_dim: int = 1024
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    layer_norm_eps: float = 1e-5
    # ResNet-50 backbone geometry (HF microsoft/resnet-50).
    backbone_embed_channels: int = 64
    backbone_depths: Tuple[int, ...] = (3, 4, 6, 3)
    backbone_channels: Tuple[int, ...] = (256, 512, 1024, 2048)
    # Feature levels come from the last len(backbone_out) stages.
    backbone_out: Tuple[int, ...] = (1, 2, 3)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_attention_heads


# ---------------------------------------------------------------------------
# ResNet backbone (inference-mode BatchNorm)
# ---------------------------------------------------------------------------


def _conv(p: Params, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(p: Params, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv)[None, :, None, None]
    bias = (p["bias"].astype(jnp.float32)
            - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32) * inv)
    return (x.astype(jnp.float32) * scale + bias[None, :, None, None]).astype(x.dtype)


def _bottleneck(p: Params, x: jax.Array, stride: int) -> jax.Array:
    """HF ResNetBottleNeckLayer: 1x1 reduce -> 3x3 -> 1x1 expand (+ BN/ReLU
    after each conv), shortcut conv when shape changes."""
    identity = x
    if "shortcut" in p:
        identity = _bn(p["shortcut"]["bn"], _conv(p["shortcut"]["conv"], x, stride))
    h = jax.nn.relu(_bn(p["bn0"], _conv(p["conv0"], x, 1)))
    h = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"], h, stride, padding=1)))
    h = _bn(p["bn2"], _conv(p["conv2"], h, 1))
    return jax.nn.relu(h + identity)


def resnet_features(params: Params, pixels: jax.Array,
                    cfg: DeformableConfig) -> List[jax.Array]:
    """(B, 3, H, W) -> feature maps from the cfg.backbone_out stages."""
    x = jax.nn.relu(_bn(params["embed_bn"], _conv(params["embed_conv"], pixels, 2, padding=3)))
    # 3x3/2 max pool, SAME-ish padding 1.
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    outs = []
    for si, stage in enumerate(params["stages"]):
        stride = 1 if si == 0 else 2
        for li, layer in enumerate(stage):
            x = _bottleneck(layer, x, stride if li == 0 else 1)
        if si in cfg.backbone_out:
            outs.append(x)
    return outs


# ---------------------------------------------------------------------------
# DETR sine position embedding (normalized)
# ---------------------------------------------------------------------------


def sine_position_embedding(h: int, w: int, d_model: int,
                            temperature: float = 10000.0) -> jax.Array:
    """(d_model, h, w) — HF DeformableDetrSinePositionEmbedding with a full
    (no padding) mask: cumsum over ones == index + 1, normalized, scale 2*pi."""
    half = d_model // 2
    eps = 1e-6
    scale = 2 * math.pi
    # HF deformable variant: (cumsum - 0.5) / last, i.e. cell centers.
    y = ((jnp.arange(1, h + 1, dtype=jnp.float32) - 0.5)[:, None]
         / (h + eps) * scale)  # (h, 1)
    x = ((jnp.arange(1, w + 1, dtype=jnp.float32) - 0.5)[None, :]
         / (w + eps) * scale)  # (1, w)
    dim_t = temperature ** (2 * (jnp.arange(half) // 2) / half)
    pos_x = x[..., None] / dim_t  # (1, w, half)
    pos_y = y[..., None] / dim_t  # (h, 1, half)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(1, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, 1, half)
    pos_y = jnp.broadcast_to(pos_y, (h, w, half))
    pos_x = jnp.broadcast_to(pos_x, (h, w, half))
    return jnp.concatenate([pos_y, pos_x], axis=-1).transpose(2, 0, 1)


# ---------------------------------------------------------------------------
# Multi-scale deformable attention
# ---------------------------------------------------------------------------


def _grid_sample(value: jax.Array, grid: jax.Array) -> jax.Array:
    """torch grid_sample(bilinear, zeros, align_corners=False) on one level.

    value: (BH, E, H, W); grid (BH, Q, P, 2) in [-1, 1] (x, y).
    Returns (BH, E, Q, P).
    """
    bh, e, h, w = value.shape
    x = (grid[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (grid[..., 1] + 1.0) * h / 2.0 - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    vflat = value.reshape(bh, e, h * w)

    def corner(xi, yi, wgt):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        # (BH, Q, P) gather over the flattened map, per batch row.
        g = jnp.take_along_axis(
            vflat[:, :, None, :], idx[:, None, :, :].reshape(bh, 1, -1)[..., None].swapaxes(-1, -2),
            axis=-1,
        )
        return g, ok, wgt

    # Simpler: vmap the gather per batch row.
    def sample_row(vrow, xi, yi, wgt):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        g = vrow[:, idx]  # (E, Q, P)
        return g * (ok * wgt)[None]

    out = 0
    for dx, dy, wgt in (
        (0, 0, (1 - wx) * (1 - wy)),
        (1, 0, wx * (1 - wy)),
        (0, 1, (1 - wx) * wy),
        (1, 1, wx * wy),
    ):
        out = out + jax.vmap(sample_row)(
            vflat, (x0 + dx).astype(jnp.int32), (y0 + dy).astype(jnp.int32), wgt
        )
    return out


def _linear(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.einsum("...d,dk->...k", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def deformable_attention(
    p: Params,
    cfg: DeformableConfig,
    hidden: jax.Array,  # (B, Q, D) — queries == values (encoder self-attn)
    pos: jax.Array,  # (B, Q, D) position embeddings
    reference_points: jax.Array,  # (B, Q, L, 2) normalized (x, y)
    spatial_shapes: Sequence[Tuple[int, int]],
) -> jax.Array:
    """HF DeformableDetrMultiscaleDeformableAttention.forward."""
    b, q, d = hidden.shape
    h = cfg.encoder_attention_heads
    e = cfg.head_dim
    l = len(spatial_shapes)
    pts = cfg.encoder_n_points

    query = hidden + pos
    value = _linear(p["value_proj"], hidden).reshape(b, q, h, e)
    offsets = _linear(p["sampling_offsets"], query).reshape(b, q, h, l, pts, 2)
    weights = _linear(p["attention_weights"], query).reshape(b, q, h, l * pts)
    weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1).astype(hidden.dtype)
    weights = weights.reshape(b, q, h, l, pts)

    # offset_normalizer = (w, h) per level.
    normalizer = jnp.asarray([(w_, h_) for h_, w_ in spatial_shapes], jnp.float32)
    loc = (reference_points[:, :, None, :, None, :]
           + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :])
    grids = 2 * loc - 1  # (B, Q, H, L, P, 2)

    # Split value per level and sample.
    sizes = [hh * ww for hh, ww in spatial_shapes]
    starts = [0]
    for s in sizes[:-1]:
        starts.append(starts[-1] + s)
    outs = []
    for li, (hh, ww) in enumerate(spatial_shapes):
        v_l = value[:, starts[li]: starts[li] + sizes[li]]  # (B, hw, H, E)
        v_l = v_l.transpose(0, 2, 3, 1).reshape(b * h, e, hh, ww)
        g_l = grids[:, :, :, li].transpose(0, 2, 1, 3, 4).reshape(b * h, q, pts, 2)
        outs.append(_grid_sample(v_l, g_l.astype(jnp.float32)))  # (B*H, E, Q, P)
    sampled = jnp.stack(outs, axis=-2)  # (B*H, E, Q, L, P)
    w_ = weights.transpose(0, 2, 1, 3, 4).reshape(b * h, 1, q, l, pts)
    out = jnp.sum(sampled * w_.astype(sampled.dtype), axis=(-2, -1))  # (B*H, E, Q)
    out = out.reshape(b, h, e, q).transpose(0, 3, 1, 2).reshape(b, q, d)
    return _linear(p["output_proj"], out.astype(hidden.dtype))


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def encoder_layer(p: Params, cfg: DeformableConfig, hidden, pos,
                  reference_points, spatial_shapes):
    """HF DeformableDetrEncoderLayer: deformable self-attn + ReLU FFN,
    post-LN residuals."""
    attn = deformable_attention(p["self_attn"], cfg, hidden, pos,
                                reference_points, spatial_shapes)
    hidden = _ln(p["self_attn_layer_norm"], hidden + attn, cfg.layer_norm_eps)
    ffn = _linear(p["fc2"], jax.nn.relu(_linear(p["fc1"], hidden)))
    return _ln(p["final_layer_norm"], hidden + ffn, cfg.layer_norm_eps)


def encoder_reference_points(spatial_shapes: Sequence[Tuple[int, int]]) -> jax.Array:
    """(1, Q, L, 2) normalized cell centers per level, tiled over levels
    (HF get_reference_points with valid_ratios == 1)."""
    refs = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    ref = jnp.concatenate(refs, axis=0)  # (Q, 2)
    l = len(spatial_shapes)
    return jnp.broadcast_to(ref[None, :, None, :], (1, ref.shape[0], l, 2))


# ---------------------------------------------------------------------------
# Full tower forward
# ---------------------------------------------------------------------------


def _group_norm(p: Params, x: jax.Array, groups: int = 32,
                eps: float = 1e-5) -> jax.Array:
    b, c, h, w = x.shape
    xf = x.astype(jnp.float32).reshape(b, groups, c // groups, h, w)
    mean = jnp.mean(xf, axis=(2, 3, 4), keepdims=True)
    var = jnp.var(xf, axis=(2, 3, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, c, h, w)
    return (xf * p["scale"][None, :, None, None]
            + p["bias"][None, :, None, None]).astype(x.dtype)


def deformable_encode(params: Params, pixels: jax.Array,
                      cfg: DeformableConfig) -> List[jax.Array]:
    """(B, 3, H, W) -> per-layer hidden states [(B, Q, D)] of the
    deformable encoder over the multi-scale token sequence (reference
    DeformableVisionModel.forward, deformer_modeling.py:60-160)."""
    feats = resnet_features(params["backbone"], pixels, cfg)
    sources, poss, shapes = [], [], []
    for li, f in enumerate(feats):
        s = _group_norm(params["input_proj"][li]["gn"],
                        _conv(params["input_proj"][li]["conv"], f, 1))
        sources.append(s)
        shapes.append(s.shape[-2:])
        poss.append(sine_position_embedding(*s.shape[-2:], cfg.d_model).astype(s.dtype))
    # Extra lowest-resolution level: 3x3 stride-2 conv on the last feature.
    for li in range(len(feats), cfg.num_feature_levels):
        src = feats[-1] if li == len(feats) else sources[-1]
        s = _group_norm(params["input_proj"][li]["gn"],
                        _conv(params["input_proj"][li]["conv"], src, 2, padding=1))
        sources.append(s)
        shapes.append(s.shape[-2:])
        poss.append(sine_position_embedding(*s.shape[-2:], cfg.d_model).astype(s.dtype))

    b = pixels.shape[0]
    flat = jnp.concatenate(
        [s.reshape(b, cfg.d_model, -1).transpose(0, 2, 1) for s in sources], axis=1
    )
    pos = jnp.concatenate(
        [
            (p_.reshape(cfg.d_model, -1).T + params["level_embed"][li].astype(p_.dtype))[None]
            for li, p_ in enumerate(poss)
        ],
        axis=1,
    )
    pos = jnp.broadcast_to(pos, flat.shape)
    refs = jnp.broadcast_to(
        encoder_reference_points(shapes), (b,) + encoder_reference_points(shapes).shape[1:]
    )

    hidden = flat
    states = [hidden]
    for lp in params["layers"]:
        hidden = encoder_layer(lp, cfg, hidden, pos, refs, shapes)
        states.append(hidden)
    return states


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _init_linear(rng, din, dout, dtype):
    k1, _ = jax.random.split(rng)
    lim = (1.0 / din) ** 0.5
    return {"kernel": jax.random.uniform(k1, (din, dout), dtype, -lim, lim),
            "bias": jnp.zeros((dout,), dtype)}


def _init_conv(rng, cin, cout, k, dtype):
    fan = cin * k * k
    return {"kernel": jax.random.normal(rng, (cout, cin, k, k), dtype)
            * (2.0 / fan) ** 0.5}


def _init_bn(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _init_sampling_offsets(rng, cfg, dtype):
    """HF bias init: points arranged on a scaled grid of directions."""
    h = cfg.encoder_attention_heads
    thetas = jnp.arange(h, dtype=jnp.float32) * (2.0 * math.pi / h)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :],
                    (1, cfg.num_feature_levels, cfg.encoder_n_points, 1))
    scale = jnp.arange(1, cfg.encoder_n_points + 1, dtype=jnp.float32)
    grid = grid * scale[None, None, :, None]
    return {
        "kernel": jnp.zeros(
            (cfg.d_model, h * cfg.num_feature_levels * cfg.encoder_n_points * 2), dtype),
        "bias": grid.reshape(-1).astype(dtype),
    }


def init_deformable_params(rng: jax.Array, cfg: DeformableConfig,
                           dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, cfg.encoder_layers + 8)
    # Backbone.
    stage_in = cfg.backbone_embed_channels
    stages = []
    for si, (depth, cout) in enumerate(zip(cfg.backbone_depths, cfg.backbone_channels)):
        layers = []
        mid = cout // 4
        for li in range(depth):
            cin = stage_in if li == 0 else cout
            lk = jax.random.split(jax.random.fold_in(ks[0], si * 100 + li), 4)
            layer = {
                "conv0": _init_conv(lk[0], cin, mid, 1, dtype), "bn0": _init_bn(mid, dtype),
                "conv1": _init_conv(lk[1], mid, mid, 3, dtype), "bn1": _init_bn(mid, dtype),
                "conv2": _init_conv(lk[2], mid, cout, 1, dtype), "bn2": _init_bn(cout, dtype),
            }
            if li == 0:
                layer["shortcut"] = {"conv": _init_conv(lk[3], cin, cout, 1, dtype),
                                     "bn": _init_bn(cout, dtype)}
            layers.append(layer)
        stages.append(layers)
        stage_in = cout
    backbone = {
        "embed_conv": _init_conv(ks[1], 3, cfg.backbone_embed_channels, 7, dtype),
        "embed_bn": _init_bn(cfg.backbone_embed_channels, dtype),
        "stages": stages,
    }
    # Input projections.
    out_channels = [cfg.backbone_channels[i] for i in cfg.backbone_out]
    input_proj = []
    for li in range(cfg.num_feature_levels):
        if li < len(out_channels):
            cin, k = out_channels[li], 1
        else:
            cin, k = (out_channels[-1] if li == len(out_channels) else cfg.d_model), 3
        input_proj.append({
            "conv": _init_conv(jax.random.fold_in(ks[2], li), cin, cfg.d_model, k, dtype),
            "gn": {"scale": jnp.ones((cfg.d_model,), dtype),
                   "bias": jnp.zeros((cfg.d_model,), dtype)},
        })
    # Encoder layers.
    layers = []
    for i in range(cfg.encoder_layers):
        lk = jax.random.split(ks[3 + i], 6)
        d = cfg.d_model
        layers.append({
            "self_attn": {
                "sampling_offsets": _init_sampling_offsets(lk[0], cfg, dtype),
                "attention_weights": {
                    "kernel": jnp.zeros(
                        (d, cfg.encoder_attention_heads * cfg.num_feature_levels
                         * cfg.encoder_n_points), dtype),
                    "bias": jnp.zeros(
                        (cfg.encoder_attention_heads * cfg.num_feature_levels
                         * cfg.encoder_n_points,), dtype),
                },
                "value_proj": _init_linear(lk[1], d, d, dtype),
                "output_proj": _init_linear(lk[2], d, d, dtype),
            },
            "self_attn_layer_norm": {"scale": jnp.ones((d,), dtype),
                                     "bias": jnp.zeros((d,), dtype)},
            "fc1": _init_linear(lk[3], d, cfg.encoder_ffn_dim, dtype),
            "fc2": _init_linear(lk[4], cfg.encoder_ffn_dim, d, dtype),
            "final_layer_norm": {"scale": jnp.ones((d,), dtype),
                                 "bias": jnp.zeros((d,), dtype)},
        })
    return {
        "backbone": backbone,
        "input_proj": input_proj,
        "level_embed": jax.random.normal(ks[-1], (cfg.num_feature_levels, cfg.d_model), dtype),
        "layers": layers,
    }
