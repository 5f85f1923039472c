"""EgoVLP video tower: Frozen-in-Time space-time transformer.

Reference: llava/model/multimodal_encoder/egovlp/model/video_transformer.py
(SpaceTimeTransformer, arXiv:2104.00650) wrapped by EgoVLPTower
(egovlp/__init__.py:16-77). The reference factory has it commented out
(multimodal_encoder/builder.py:56-58) and the vendored module cannot
import here (hard timm dependency + a cwd-relative yaml read at import
time); this is a from-scratch JAX implementation of the same math.

Architecture per block (video_transformer.py:214-229, frozen-in-time
style):

    time_out  = timeattn(norm3(x))       # attention across frames, per
    time_res  = x + time_out             # spatial position
    space_out = attn(norm1(time_res))    # attention within each frame
    space_res = x + space_out            # NOTE: residual from x, not
    x = space_res + mlp(norm2(space_res))#       time_res (:225)

Divided attention (VarAttention, :117-153): the CLS token attends over
the FULL (f*n + 1) sequence; patch queries attend within their group
(same spatial position across frames for time, same frame for space)
with the CLS key/value prepended to every group.

Positional scheme (:353-372): per-frame pos_embed tiled over frames plus
a temporal embedding repeat-interleaved over patches; CLS has its own
slot. Time attention is zero-initialized ('zeros' time_init) so the
model starts as a ViT.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclass(frozen=True)
class EgoVLPConfig:
    """ViT-B/16 defaults (video_transformer.py:247-249)."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: float = 4.0
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 4
    layer_norm_eps: float = 1e-6

    @property
    def patches_per_frame(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p, x):
    y = jnp.einsum("...d,dk->...k", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _attn(q, k, v):
    """Plain softmax attention, f32 scores (reference attn(), :35-39)."""
    s = jnp.einsum("...id,...jd->...ij", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("...ij,...jd->...id", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _i2t_cross(p: Params, x: jax.Array, y: jax.Array, cfg: EgoVLPConfig,
               y_bias=None) -> jax.Array:
    """Image->text cross-attention bolted onto space attention
    (VarAttention.forward, video_transformer.py:156-187): q from
    norm_i2t_i(x), k/v from the text stream, output gated by the learned
    scalar alpha_i2t (zero-init, so fusion starts as identity)."""
    b, tot, d = x.shape
    h, e = cfg.num_attention_heads, cfg.head_dim
    kv = _linear(p["qkv_text_i2t"], y).reshape(y.shape[0], y.shape[1], 2, h, e)
    k, v = kv[:, :, 0], kv[:, :, 1]  # (b, n_text, h, e)
    q = _linear(p["qkv_i2t"], _ln(p["norm_i2t_i"], x, cfg.layer_norm_eps))
    q = q.reshape(b, tot, h, e) * (e**-0.5)
    s = jnp.einsum("bihe,bjhe->bhij", q, k, preferred_element_type=jnp.float32)
    if y_bias is not None:  # (b, n_text) additive bias, 0 valid / -inf pad
        s = s + y_bias[:, None, None, :]
    pr = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhij,bjhe->bihe", pr, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    o = _linear(p["proj_i2t"], o.reshape(b, tot, d))
    return x + p["alpha_i2t"].astype(jnp.float32).astype(x.dtype) * o


def _var_attention(p: Params, x: jax.Array, cfg: EgoVLPConfig, mode: str,
                   f: int, y=None, y_bias=None) -> jax.Array:
    """Divided attention over time or space groups (VarAttention.forward).

    x: (b, 1 + f*n, d); mode 'time' groups by spatial position, 'space'
    groups by frame. ``y`` (text hidden states) adds the FIBER-style i2t
    cross-attention after the projection (fusion blocks only).
    """
    b, tot, d = x.shape
    h = cfg.num_attention_heads
    e = cfg.head_dim
    n = (tot - 1) // f
    qkv = _linear(p["qkv"], x).reshape(b, tot, 3, h, e)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, tot, h, e)
    q = q * (e**-0.5)

    def heads_first(t):  # (b, tot, h, e) -> (b*h, tot, e)
        return t.transpose(0, 2, 1, 3).reshape(b * h, tot, e)

    q, k, v = heads_first(q), heads_first(k), heads_first(v)
    cls_q, q_ = q[:, :1], q[:, 1:]
    cls_k, k_ = k[:, :1], k[:, 1:]
    cls_v, v_ = v[:, :1], v[:, 1:]

    # CLS attends over everything.
    cls_out = _attn(cls_q, k, v)  # (b*h, 1, e)

    if mode == "time":  # 'b (f n) d -> (b n) f d'
        def group(t):
            return t.reshape(b * h, f, n, e).transpose(0, 2, 1, 3).reshape(b * h * n, f, e)

        def ungroup(t):
            return t.reshape(b * h, n, f, e).transpose(0, 2, 1, 3).reshape(b * h, f * n, e)

        r = n
        glen = f
    else:  # 'b (f n) d -> (b f) n d'
        def group(t):
            return t.reshape(b * h * f, n, e)

        def ungroup(t):
            return t.reshape(b * h, f * n, e)

        r = f
        glen = n

    qg, kg, vg = group(q_), group(k_), group(v_)
    cls_kg = jnp.repeat(cls_k, r, axis=0)
    cls_vg = jnp.repeat(cls_v, r, axis=0)
    kg = jnp.concatenate([cls_kg, kg], axis=1)
    vg = jnp.concatenate([cls_vg, vg], axis=1)
    out = ungroup(_attn(qg, kg, vg))

    out = jnp.concatenate([cls_out, out], axis=1)  # (b*h, tot, e)
    out = out.reshape(b, h, tot, e).transpose(0, 2, 1, 3).reshape(b, tot, d)
    out = _linear(p["proj"], out)
    if y is not None:
        out = _i2t_cross(p, out, y, cfg, y_bias)
    return out


def _block(p: Params, x: jax.Array, cfg: EgoVLPConfig, f: int,
           y=None, y_bias=None) -> jax.Array:
    time_out = _var_attention(p["timeattn"], _ln(p["norm3"], x, cfg.layer_norm_eps),
                              cfg, "time", f)
    time_res = x + time_out
    # Text fusion rides ONLY the space attention (SpaceTimeBlock.forward
    # :214-220 passes y to self.attn, never to timeattn).
    space_out = _var_attention(p["attn"], _ln(p["norm1"], time_res, cfg.layer_norm_eps),
                               cfg, "space", f, y=y, y_bias=y_bias)
    space_res = x + space_out  # frozen-in-time residual (:225)
    h = _ln(p["norm2"], space_res, cfg.layer_norm_eps)
    h = _linear(p["mlp"]["fc2"], jax.nn.gelu(_linear(p["mlp"]["fc1"], h), approximate=False))
    return space_res + h


def egovlp_embed_patches(params: Params, pixels: jax.Array,
                         cfg: EgoVLPConfig) -> jax.Array:
    """(B, F, C, H, W) -> (B, 1 + F*N, D) CLS + patch tokens with the
    tiled positional scheme (forward_features :353-372; the ITM/MLM
    fusion paths rebuild exactly this prologue, model.py:210-234)."""
    b, f, c, hh, ww = pixels.shape
    ps = cfg.patch_size
    gh, gw = hh // ps, ww // ps
    n = gh * gw
    d = cfg.hidden_size

    # Per-frame patchify (VideoPatchEmbed: a 2-D conv applied frame-wise).
    x = pixels.reshape(b * f, c, gh, ps, gw, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * f, n, c * ps * ps)
    x = jnp.einsum("mnk,kd->mnd", x, params["patch_embed"]["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(pixels.dtype)
    x = x + params["patch_embed"]["bias"].astype(x.dtype)
    x = x.reshape(b, f * n, d)

    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype)[None, None], (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)

    pos = params["pos_embed"].astype(x.dtype)  # (1+n, d)
    temb = params["temporal_embed"].astype(x.dtype)  # (num_frames, d)
    tile_pos = jnp.tile(pos[1:], (cfg.num_frames, 1))
    tile_temb = jnp.repeat(temb, n, axis=0)
    total = jnp.concatenate([pos[:1], tile_pos + tile_temb], axis=0)
    return x + total[: x.shape[1]][None]


@partial(jax.jit, static_argnames=("cfg",))
def egovlp_encode(params: Params, pixels: jax.Array, cfg: EgoVLPConfig) -> jax.Array:
    """(B, F, C, H, W) -> (B, 1 + F*N, D) final-LN hidden states.

    The CLS row ([:, 0]) is the video embedding the reference pools
    (forward_features, :392); the rest are per-frame patch features for
    tower-style consumption.
    """
    b, f = pixels.shape[:2]
    x = egovlp_embed_patches(params, pixels, cfg)
    for lp in params["blocks"]:
        x = _block(lp, x, cfg, f)
    return _ln(params["norm"], x, cfg.layer_norm_eps)


def init_egovlp_params(rng: jax.Array, cfg: EgoVLPConfig, dtype=jnp.float32) -> Params:
    d = cfg.hidden_size
    inter = int(d * cfg.mlp_ratio)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    ks = jax.random.split(rng, cfg.num_hidden_layers + 4)

    def dense(key, din, dout, zero=False):
        if zero:
            return {"kernel": jnp.zeros((din, dout), dtype),
                    "bias": jnp.zeros((dout,), dtype)}
        return {"kernel": jax.random.normal(key, (din, dout), dtype) * 0.02,
                "bias": jnp.zeros((dout,), dtype)}

    def ln():
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        bk = jax.random.split(ks[i], 4)
        blocks.append({
            "norm1": ln(), "norm2": ln(), "norm3": ln(),
            "attn": {"qkv": dense(bk[0], d, 3 * d), "proj": dense(bk[1], d, d)},
            # time_init='zeros': qkv zero, proj weight ONES (:97-101) so
            # the timesformer starts as a ViT.
            "timeattn": {
                "qkv": dense(bk[2], d, 3 * d, zero=True),
                "proj": {"kernel": jnp.ones((d, d), dtype),
                         "bias": jnp.zeros((d,), dtype)},
            },
            "mlp": {"fc1": dense(bk[3], d, inter),
                    "fc2": dense(jax.random.fold_in(bk[3], 1), inter, d)},
        })
    return {
        "patch_embed": dense(ks[-4], patch_dim, d),
        "cls_token": jnp.zeros((d,), dtype),
        "pos_embed": jax.random.normal(ks[-3], (cfg.patches_per_frame + 1, d), dtype) * 0.02,
        "temporal_embed": jnp.zeros((cfg.num_frames, d), dtype),
        "blocks": blocks,
        "norm": ln(),
    }


def convert_egovlp_state_dict(sd, cfg: EgoVLPConfig) -> Params:
    """Reference SpaceTimeTransformer state dict -> our param tree
    (egovlp/model/video_transformer.py:231-352 module names). Linear
    weights transpose to (in, out); the Conv2d patch embed flattens to a
    (C*ps*ps, D) matmul kernel — channel-major then the two patch dims,
    matching the pixel unfold in ``egovlp_encode``."""
    import numpy as np

    def t(name):
        return np.asarray(sd[name])

    def linear(name):
        return {"kernel": t(f"{name}.weight").T, "bias": t(f"{name}.bias")}

    def ln(name):
        return {"scale": t(f"{name}.weight"), "bias": t(f"{name}.bias")}

    d = cfg.hidden_size
    w = t("patch_embed.proj.weight")  # (D, C, ps, ps)
    patch = {"kernel": w.reshape(d, -1).T, "bias": t("patch_embed.proj.bias")}

    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"blocks.{i}"
        blocks.append({
            "norm1": ln(f"{p}.norm1"), "norm2": ln(f"{p}.norm2"),
            "norm3": ln(f"{p}.norm3"),
            "attn": {"qkv": linear(f"{p}.attn.qkv"),
                     "proj": linear(f"{p}.attn.proj")},
            "timeattn": {"qkv": linear(f"{p}.timeattn.qkv"),
                         "proj": linear(f"{p}.timeattn.proj")},
            "mlp": {"fc1": linear(f"{p}.mlp.fc1"),
                    "fc2": linear(f"{p}.mlp.fc2")},
        })
    return {
        "patch_embed": patch,
        "cls_token": t("cls_token").reshape(d),
        "pos_embed": t("pos_embed")[0],
        "temporal_embed": t("temporal_embed")[0],
        "blocks": blocks,
        "norm": ln("norm"),
    }
