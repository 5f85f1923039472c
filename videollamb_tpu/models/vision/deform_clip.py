"""DeformCLIP vision tower: CLIP ViT whose self-attention is single-level
deformable attention over the patch grid.

Counterpart of llava/model/multimodal_encoder/deform_clip/ (~2,339 LoC:
deform_clip_modeling.py + deform_clip_configuration.py). That module is
abandoned, NON-FUNCTIONAL code in the reference — it would crash on first
call:

- ``CLIPVisionTransformer.forward`` iterates an undefined name ``sources``
  (deform_clip_modeling.py:1293) and then instantiates the *standard*
  ``CLIPEncoder``, never the Deform one (:1261);
- ``DeformCLIPAttention.forward`` calls ``self.output_proj`` /
  ``self.im2col_step`` which are never created (:464, :459 — the layers are
  named ``out_proj`` and no im2col step is set);
- the second ``deformable_attention`` helper reads an undefined ``value_``
  (:330).

No reference checkpoint exists and nothing imports the package, so there is
no byte-level behavior to match. This port implements the evident intended
design so the inventory line is a working component rather than a gap:

- CLIP ViT embeddings (patchify + CLS + learned positions) and pre-LN
  residual layers with a quick-GELU MLP (DeformCLIPEncoderLayer,
  deform_clip_modeling.py:586-639) — unchanged from CLIP;
- each layer's self-attention is the deformable form (DeformCLIPAttention,
  :365-465): per query, ``n_points`` sampling offsets and softmax weights
  per head are predicted by linear heads; values are bilinearly sampled
  from the v-projected patch grid (one level — CLIP has a single spatial
  scale) and combined with the weights, then out-projected. This is HF
  ``multi_scale_deformable_attention`` (:286-322) at num_levels=1;
- reference points are patch-cell centers, ``(x+0.5)/W, (y+0.5)/H``
  (DeformCLIPEncoder.get_reference_points, :870-902);
- the CLS token has no grid position; its query samples around the image
  center ``(0.5, 0.5)`` (the broken reference never decided — flattening in
  :1290-1301 silently assumed no CLS; keeping CLS preserves the CLIP
  pooled-output contract and the downstream bridges' CLS-at-0 layout);
- ``q_proj``/``k_proj`` exist in the parameter tree but are UNUSED, exactly
  like the reference module, which creates them (:391-392) and never reads
  them in the deformable forward — kept so a state-dict round-trip is
  mechanical.

TPU notes: the bilinear sample is 4 gathers + a weighted sum (the shared
``_grid_sample`` from models/vision/deformable.py, already oracle-tested
against torch ``grid_sample``); offsets/weights/value/out projections are
plain GEMMs. Everything is static-shape and jit-safe.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from videollamb_tpu.models.vision.deformable import _grid_sample, _linear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DeformCLIPConfig:
    """deform_clip_configuration.py:160-260 CLIPVisionConfig + n_points."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    n_points: int = 4  # deform_clip_configuration.py:229
    layer_norm_eps: float = 1e-5
    select_layer: int = -2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @classmethod
    def tiny(cls) -> "DeformCLIPConfig":
        return cls(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                   num_attention_heads=4, image_size=28, patch_size=7,
                   n_points=2)


def reference_points(gh: int, gw: int) -> jax.Array:
    """(1+N, 2) normalized (x, y) sampling anchors: image center for CLS,
    patch-cell centers for the grid (get_reference_points, :885-902)."""
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    cls = jnp.full((1, 2), 0.5, jnp.float32)
    return jnp.concatenate([cls, pts], axis=0)


def deform_clip_attention(
    p: Params,
    x: jax.Array,  # (B, 1+N, D) — pre-normed hidden states, CLS at 0
    refs: jax.Array,  # (1+N, 2) normalized (x, y)
    gh: int,
    gw: int,
    *,
    num_heads: int,
    n_points: int,
) -> jax.Array:
    """DeformCLIPAttention.forward's intended semantics (:399-465).

    Values come from the patch grid only (x[:, 1:]); every token — CLS
    included — is a query."""
    b, s, d = x.shape
    e = d // num_heads

    value = _linear(p["v_proj"], x[:, 1:])  # (B, N, D)
    value = value.reshape(b, gh * gw, num_heads, e)
    offsets = _linear(p["sampling_offsets"], x).reshape(
        b, s, num_heads, n_points, 2)
    weights = _linear(p["attention_weights"], x).reshape(
        b, s, num_heads, n_points)
    weights = jax.nn.softmax(weights.astype(jnp.float32), axis=-1)

    # offset_normalizer = (W, H) (:435-439, single level).
    norm = jnp.asarray([gw, gh], jnp.float32)
    loc = (refs[None, :, None, None, :]
           + offsets.astype(jnp.float32) / norm[None, None, None, None, :])
    grids = 2.0 * loc - 1.0  # (B, S, H, P, 2)

    v_map = value.transpose(0, 2, 3, 1).reshape(b * num_heads, e, gh, gw)
    g = grids.transpose(0, 2, 1, 3, 4).reshape(b * num_heads, s, n_points, 2)
    sampled = _grid_sample(v_map, g)  # (B*H, E, S, P)
    w = weights.transpose(0, 2, 1, 3).reshape(b * num_heads, 1, s, n_points)
    out = jnp.sum(sampled * w.astype(sampled.dtype), axis=-1)  # (B*H, E, S)
    out = out.reshape(b, num_heads, e, s).transpose(0, 3, 1, 2)
    return _linear(p["out_proj"], out.reshape(b, s, d).astype(x.dtype))


def _ln(p: Params, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def encoder_layer(p: Params, cfg: DeformCLIPConfig, x: jax.Array,
                  refs: jax.Array, gh: int, gw: int) -> jax.Array:
    """Pre-LN residual layer (DeformCLIPEncoderLayer.forward, :595-639)."""
    h = _ln(p["layer_norm1"], x, cfg.layer_norm_eps)
    x = x + deform_clip_attention(p["self_attn"], h, refs, gh, gw,
                                  num_heads=cfg.num_attention_heads,
                                  n_points=cfg.n_points)
    h = _ln(p["layer_norm2"], x, cfg.layer_norm_eps)
    h = _quick_gelu(_linear(p["mlp"]["fc1"], h))
    return x + _linear(p["mlp"]["fc2"], h)


@partial(jax.jit, static_argnames=("cfg", "select_layer"))
def deform_clip_encode(
    params: Params,
    pixels: jax.Array,  # (M, C, H, W)
    cfg: DeformCLIPConfig,
    select_layer: Optional[int] = None,
) -> jax.Array:
    """Embeddings -> pre-LN -> deform encoder, stopping at the select
    layer; returns (M, 1+N, D) hidden states (CLIPVisionTransformer's
    intended forward, :1267-1313, with the CLIP-family select-layer
    contract the other towers use)."""
    from videollamb_tpu.models.vision.clip_vit import _embed

    sel = cfg.select_layer if select_layer is None else select_layer
    n_layers = cfg.num_hidden_layers
    stop = n_layers + 1 + sel if sel < 0 else sel
    gh = gw = pixels.shape[-1] // cfg.patch_size

    x = _embed(params["embeddings"], pixels, cfg)
    x = _ln(params["pre_layrnorm"], x, cfg.layer_norm_eps)  # sic, HF name
    refs = reference_points(gh, gw)
    for li in range(stop):
        x = encoder_layer(params["layers"][li], cfg, x, refs, gh, gw)
    return x


def _init_linear(rng, din, dout, dtype, std=0.02):
    kr, _ = jax.random.split(rng)
    return {"kernel": (jax.random.normal(kr, (din, dout)) * std).astype(dtype),
            "bias": jnp.zeros((dout,), dtype)}


def _init_ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_deform_clip_params(rng: jax.Array, cfg: DeformCLIPConfig,
                            dtype=jnp.float32) -> Params:
    """Random init mirroring the module tree (CLIP inits, :704-753; the
    deform heads get plain 0.02-std init — DeformCLIPAttention defines no
    special reset, unlike DETR's directional offset init)."""
    d = cfg.hidden_size
    h = cfg.num_attention_heads
    n_patches = cfg.grid * cfg.grid
    keys = jax.random.split(rng, cfg.num_hidden_layers + 4)

    in_std = d**-0.5 * (2 * cfg.num_hidden_layers) ** -0.5
    fc_std = (2 * d) ** -0.5

    def layer(k):
        ks = jax.random.split(k, 8)
        return {
            "self_attn": {
                # q/k vestigial (created, never read — :391-392).
                "q_proj": _init_linear(ks[0], d, d, dtype, in_std),
                "k_proj": _init_linear(ks[1], d, d, dtype, in_std),
                "v_proj": _init_linear(ks[2], d, d, dtype, in_std),
                "out_proj": _init_linear(ks[3], d, d, dtype, d**-0.5),
                "sampling_offsets": _init_linear(
                    ks[4], d, h * cfg.n_points * 2, dtype),
                "attention_weights": _init_linear(
                    ks[5], d, h * cfg.n_points, dtype),
            },
            "layer_norm1": _init_ln(d, dtype),
            "layer_norm2": _init_ln(d, dtype),
            "mlp": {
                "fc1": _init_linear(ks[6], d, cfg.intermediate_size, dtype,
                                    fc_std),
                "fc2": _init_linear(ks[7], cfg.intermediate_size, d, dtype,
                                    in_std),
            },
        }

    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "embeddings": {
            "class_embedding": (jax.random.normal(keys[0], (d,)) * d**-0.5
                                ).astype(dtype),
            "patch_embedding": {
                "kernel": (jax.random.normal(keys[1], (patch_dim, d)) * 0.02
                           ).astype(dtype)},
            "position_embedding": (jax.random.normal(
                keys[2], (1 + n_patches, d)) * 0.02).astype(dtype),
        },
        "pre_layrnorm": _init_ln(d, dtype),
        "post_layernorm": _init_ln(d, dtype),
        "layers": [layer(keys[3 + i]) for i in range(cfg.num_hidden_layers)],
    }
