"""Generic ViT-family towers: ViT, ViT-MAE, ViViT, VideoMAE.

JAX counterparts of the reference's alternative HF encoders
(llava/model/multimodal_encoder/{vit,mae,vivit,videomae}_encoder.py, each a
thin wrapper over the HF model). One implementation covers all four:

- 2-D patches (ViT/MAE) or 3-D tubelets (ViViT/VideoMAE);
- optional CLS token (VideoMAE has none);
- learned positional embeddings or VideoMAE's fixed sin-cos table;
- pre-LN encoder blocks (layernorm_before -> MHA -> +res ->
  layernorm_after -> MLP -> +res), exact-GELU, final layernorm;
- VideoMAE's q/v-only biases (k un-biased).

Select-layer semantics match the CLIP towers: hidden_states[sel].
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTFamilyConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    tubelet_t: int = 1  # >1 for ViViT / VideoMAE tubelets
    num_frames: int = 1
    use_cls_token: bool = True
    pos_embed: str = "learned"  # 'learned' | 'sincos'
    layer_norm_eps: float = 1e-12
    qkv_bias: str = "full"  # 'full' | 'qv_only' (VideoMAE) | 'none'
    select_layer: int = -2

    @property
    def tokens_per_frame_group(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def vit_base(**kw):
        return ViTFamilyConfig(**kw)

    @staticmethod
    def vivit_base(num_frames=32, **kw):
        return ViTFamilyConfig(tubelet_t=2, num_frames=num_frames,
                               layer_norm_eps=1e-6, **kw)

    @staticmethod
    def videomae_base(num_frames=16, **kw):
        return ViTFamilyConfig(tubelet_t=2, num_frames=num_frames,
                               use_cls_token=False, pos_embed="sincos",
                               qkv_bias="qv_only", **kw)


def sincos_position_table(n_position: int, d: int) -> np.ndarray:
    """HF VideoMAE fixed table: sin on even columns, cos on odd."""
    pos = np.arange(n_position)[:, None]
    dim = np.arange(d)[None, :]
    angle = pos / np.power(10000, 2 * (dim // 2) / d)
    table = np.zeros((n_position, d), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


def _dense(p, x):
    y = jnp.einsum("...d,dk->...k", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    if p.get("bias") is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _ln(p, x, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(x.dtype)


def _attention(p, x, heads):
    b, n, d = x.shape
    dh = d // heads

    def split(v):
        return v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

    q, k, v = split(_dense(p["query"], x)), split(_dense(p["key"], x)), split(_dense(p["value"], x))
    s = jnp.einsum("bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(s / math.sqrt(dh), -1).astype(v.dtype)
    o = jnp.einsum("bhqk,bhke->bhqe", probs, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
    return _dense(p["output"], o)


def _embed(p: Params, pixels: jax.Array, cfg: ViTFamilyConfig) -> jax.Array:
    """pixels (B, T, C, H, W) -> (B, tokens, D). T==1 for image models."""
    b, t, c, h, w = pixels.shape
    ph = pw = cfg.patch_size
    tt = cfg.tubelet_t
    gh, gw, gt = h // ph, w // pw, t // tt
    x = pixels.reshape(b, gt, tt, c, gh, ph, gw, pw)
    # (B, gt, gh, gw, C, tt, ph, pw) row-major flatten matches torch
    # Conv3d weight (D, C, tt, ph, pw).
    x = x.transpose(0, 1, 4, 6, 3, 2, 5, 7).reshape(b, gt * gh * gw, c * tt * ph * pw)
    tokens = jnp.einsum("bnk,kd->bnd", x, p["patch_embedding"]["kernel"].astype(x.dtype),
                        preferred_element_type=jnp.float32).astype(x.dtype)
    tokens = tokens + p["patch_embedding"]["bias"].astype(x.dtype)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype)[None, None],
                               (b, 1, cfg.hidden_size))
        tokens = jnp.concatenate([cls, tokens], axis=1)
    if cfg.pos_embed == "learned":
        tokens = tokens + p["position_embeddings"].astype(x.dtype)[None]
    else:
        table = jnp.asarray(
            sincos_position_table(tokens.shape[1], cfg.hidden_size), x.dtype)
        tokens = tokens + table[None]
    return tokens


@partial(jax.jit, static_argnames=("cfg", "select_layer"))
def vit_encode(params: Params, pixels: jax.Array, cfg: ViTFamilyConfig,
               select_layer: Optional[int] = None) -> jax.Array:
    """(B, T, C, H, W) -> select-layer hidden states (B, tokens, D)."""
    sel = cfg.select_layer if select_layer is None else select_layer
    n_layers = len(params["layers"]) + sel + 1 if sel < 0 else sel
    x = _embed(params["embeddings"], pixels, cfg)
    for lp in params["layers"][:n_layers]:
        h = _ln(lp["layernorm_before"], x, cfg.layer_norm_eps)
        x = x + _attention(lp["attention"], h, cfg.num_attention_heads)
        h = _ln(lp["layernorm_after"], x, cfg.layer_norm_eps)
        h = jax.nn.gelu(_dense(lp["intermediate"], h).astype(jnp.float32),
                        approximate=False).astype(x.dtype)
        x = x + _dense(lp["output"], h)
    return x


# ---------------------------------------------------------------------------
# HF conversion
# ---------------------------------------------------------------------------


def _np(x):
    return x.detach().cpu().float().numpy() if hasattr(x, "detach") else np.asarray(x)


def init_vit_params(rng: jax.Array, cfg: ViTFamilyConfig, dtype=jnp.float32) -> Params:
    """Random init matching the convert_vit_state_dict tree (for tests and
    the tower factory's checkpoint-free path)."""
    keys = iter(jax.random.split(rng, 4 + 8 * cfg.num_hidden_layers))

    def dense(d_in, d_out, bias=True):
        k = next(keys)
        scale = 1.0 / math.sqrt(d_in)
        return {
            "kernel": (jax.random.normal(k, (d_in, d_out), jnp.float32) * scale
                       ).astype(dtype),
            "bias": jnp.zeros((d_out,), dtype) if bias else None,
        }

    def ln(d):
        return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}

    d = cfg.hidden_size
    patch_dim = 3 * cfg.tubelet_t * cfg.patch_size**2
    emb: Params = {"patch_embedding": dense(patch_dim, d)}
    if cfg.use_cls_token:
        emb["cls_token"] = (jax.random.normal(next(keys), (d,), jnp.float32)
                            * 0.02).astype(dtype)
    if cfg.pos_embed == "learned":
        gt = max(cfg.num_frames // cfg.tubelet_t, 1)
        n = gt * cfg.tokens_per_frame_group + int(cfg.use_cls_token)
        emb["position_embeddings"] = (
            jax.random.normal(next(keys), (n, d), jnp.float32) * 0.02
        ).astype(dtype)

    qkv_bias = cfg.qkv_bias != "none"
    layers = [
        {
            "layernorm_before": ln(d),
            "attention": {
                "query": dense(d, d, bias=qkv_bias),
                "key": dense(d, d, bias=cfg.qkv_bias == "full"),
                "value": dense(d, d, bias=qkv_bias),
                "output": dense(d, d),
            },
            "layernorm_after": ln(d),
            "intermediate": dense(d, cfg.intermediate_size),
            "output": dense(cfg.intermediate_size, d),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    return {"embeddings": emb, "layers": layers}


def convert_vit_state_dict(sd: Mapping[str, Any], cfg: ViTFamilyConfig) -> Params:
    """Convert HF ViT/ViTMAE/Vivit/VideoMAE state dicts."""
    def dense(prefix, bias=True):
        out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
        out["bias"] = _np(sd[f"{prefix}.bias"]) if bias and f"{prefix}.bias" in sd else None
        return out

    def ln(prefix):
        return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}

    emb: Params = {}
    pw = _np(sd["embeddings.patch_embeddings.projection.weight"])
    d = pw.shape[0]
    emb["patch_embedding"] = {
        "kernel": pw.reshape(d, -1).T,
        "bias": _np(sd["embeddings.patch_embeddings.projection.bias"]),
    }
    if cfg.use_cls_token:
        emb["cls_token"] = _np(sd["embeddings.cls_token"]).reshape(d)
    if cfg.pos_embed == "learned":
        emb["position_embeddings"] = _np(sd["embeddings.position_embeddings"]).reshape(-1, d)

    layers = []
    i = 0
    while f"encoder.layer.{i}.attention.attention.query.weight" in sd:
        p = f"encoder.layer.{i}"
        attn = {
            "query": dense(f"{p}.attention.attention.query"),
            "key": dense(f"{p}.attention.attention.key"),
            "value": dense(f"{p}.attention.attention.value"),
            "output": dense(f"{p}.attention.output.dense"),
        }
        if cfg.qkv_bias == "qv_only":
            attn["query"]["bias"] = _np(sd[f"{p}.attention.attention.q_bias"])
            attn["value"]["bias"] = _np(sd[f"{p}.attention.attention.v_bias"])
            attn["key"]["bias"] = None
        layers.append({
            "layernorm_before": ln(f"{p}.layernorm_before"),
            "attention": attn,
            "layernorm_after": ln(f"{p}.layernorm_after"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
        })
        i += 1
    out = {"embeddings": emb, "layers": layers}
    # VideoMAE with mean pooling has no final layernorm.
    if "layernorm.weight" in sd:
        out["layernorm"] = ln("layernorm")
    return out
