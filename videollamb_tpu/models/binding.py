"""LanguageBind joint-embedding meta-model.

Reference: llava/model/multimodal_encoder/languagebind/__init__.py:57-88 —
per-modality CLIP encoders + visual/text projections + per-modality logit
scales, producing L2-normalized embeddings in one shared space:

    out[m] = normalize(proj_m(encoder_m(x_m))) * exp(logit_scale_m)
    out['language'] = normalize(text_proj(text_encoder(ids)))

TPU-native layout: every vision modality runs through the ONE
parameterized CLIP tower (models/vision/clip_vit.py — video uses temporal
attention, audio the rectangular mel grid); the text branch is a CLIP
text transformer (causal mask, EOT pooling) implemented below. Pooling
for vision is CLS + post-LN, matching HF CLIPVisionModelWithProjection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import (
    _dense,
    _layer_norm,
    init_vision_params,
    vision_encode,
)

Params = Dict[str, Any]


@dataclass(frozen=True)
class TextConfig:
    """OpenCLIP ViT-L text branch (LanguageBind text encoders)."""

    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    vocab_size: int = 49408
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


# ---------------------------------------------------------------------------
# CLIP text transformer
# ---------------------------------------------------------------------------


def init_text_params(rng: jax.Array, cfg: TextConfig, dtype=jnp.float32) -> Params:
    from videollamb_tpu.models.vision.clip_vit import _init_attn, _init_dense, _init_ln

    ks = jax.random.split(rng, cfg.num_hidden_layers + 3)
    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(ks[i], 3)
        layers.append({
            "layer_norm1": _init_ln(d, dtype),
            "self_attn": _init_attn(lk[0], d, dtype),
            "layer_norm2": _init_ln(d, dtype),
            "mlp": {
                "fc1": _init_dense(lk[1], d, cfg.intermediate_size, dtype),
                "fc2": _init_dense(lk[2], cfg.intermediate_size, d, dtype),
            },
        })
    return {
        "token_embedding": jax.random.normal(ks[-3], (cfg.vocab_size, d), dtype) * 0.02,
        "position_embedding": jax.random.normal(
            ks[-2], (cfg.max_position_embeddings, d), dtype) * 0.01,
        "layers": layers,
        "final_layer_norm": _init_ln(d, dtype),
    }


def _text_attention(p: Params, x: jax.Array, num_heads: int,
                    mask: jax.Array) -> jax.Array:
    """CLIPAttention with an additive mask (causal for text)."""
    b, n, d = x.shape
    head_dim = d // num_heads
    scale = head_dim**-0.5

    def split(v):
        return v.reshape(b, n, num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split(_dense(p["q_proj"], x)) * scale
    k = split(_dense(p["k_proj"], x))
    v = split(_dense(p["v_proj"], x))
    scores = jnp.einsum("bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores + mask[None, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhke->bhqe", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
    return _dense(p["out_proj"], out)


@partial(jax.jit, static_argnames=("cfg",))
def text_encode(params: Params, input_ids: jax.Array, cfg: TextConfig) -> jax.Array:
    """(B, T) token ids -> (B, D) pooled text features (last LN hidden at
    the EOT position == per-row argmax token id, HF CLIPTextModel pooling)."""
    from videollamb_tpu.models.bridge.layers import _act

    b, t = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][None, :t]
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e30
    ).astype(jnp.float32)
    for lp in params["layers"]:
        h = _layer_norm(lp["layer_norm1"], x, cfg.layer_norm_eps)
        x = x + _text_attention(lp["self_attn"], h, cfg.num_attention_heads, causal)
        h = _layer_norm(lp["layer_norm2"], x, cfg.layer_norm_eps)
        h = _act(cfg.hidden_act, _dense(lp["mlp"]["fc1"], h))
        x = x + _dense(lp["mlp"]["fc2"], h)
    x = _layer_norm(params["final_layer_norm"], x, cfg.layer_norm_eps)
    eot = jnp.argmax(input_ids, axis=-1)  # highest id == EOT (CLIP BPE)
    return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# Meta-model
# ---------------------------------------------------------------------------


def convert_text_state_dict(sd) -> Params:
    """HF ``CLIPTextModel`` state dict -> text-branch params (the text
    encoders inside LanguageBind checkpoints are stock CLIP text models;
    reference loads them via transformers). Accepts torch tensors or
    numpy arrays; keys use the ``text_model.`` prefix."""
    import numpy as np

    def t(name):
        v = sd[name]
        return jnp.asarray(v if isinstance(v, np.ndarray) else v.numpy())

    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("text_model.encoder.layers."))
    layers = []
    for i in range(n_layers):
        pre = f"text_model.encoder.layers.{i}."
        layers.append({
            "layer_norm1": {"scale": t(pre + "layer_norm1.weight"),
                            "bias": t(pre + "layer_norm1.bias")},
            "self_attn": {
                p: {"kernel": t(pre + f"self_attn.{p}.weight").T,
                    "bias": t(pre + f"self_attn.{p}.bias")}
                for p in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layer_norm2": {"scale": t(pre + "layer_norm2.weight"),
                            "bias": t(pre + "layer_norm2.bias")},
            "mlp": {
                "fc1": {"kernel": t(pre + "mlp.fc1.weight").T,
                        "bias": t(pre + "mlp.fc1.bias")},
                "fc2": {"kernel": t(pre + "mlp.fc2.weight").T,
                        "bias": t(pre + "mlp.fc2.bias")},
            },
        })
    return {
        "token_embedding": t("text_model.embeddings.token_embedding.weight"),
        "position_embedding": t("text_model.embeddings.position_embedding.weight"),
        "layers": layers,
        "final_layer_norm": {"scale": t("text_model.final_layer_norm.weight"),
                             "bias": t("text_model.final_layer_norm.bias")},
    }


def text_config_from_json(model_dir: str) -> TextConfig:
    """config.json ``text_config`` sub-dict -> TextConfig (LanguageBind /
    CLIP checkpoints are dual encoders with both sub-configs)."""
    import json
    import os

    path = os.path.join(model_dir, "config.json")
    if not os.path.exists(path):
        return TextConfig()
    with open(path) as f:
        raw = json.load(f)
    tc = raw.get("text_config", raw)
    return TextConfig(
        hidden_size=tc.get("hidden_size", 768),
        intermediate_size=tc.get("intermediate_size", 3072),
        num_hidden_layers=tc.get("num_hidden_layers", 12),
        num_attention_heads=tc.get("num_attention_heads", 12),
        vocab_size=tc.get("vocab_size", 49408),
        max_position_embeddings=tc.get("max_position_embeddings", 77),
        layer_norm_eps=tc.get("layer_norm_eps", 1e-5),
        hidden_act=tc.get("hidden_act", "quick_gelu"),
    )


def load_binding_checkpoints(paths: Dict[str, str], dtype=jnp.float32):
    """Modality name -> HF LanguageBind/CLIP dual-encoder checkpoint dir
    (e.g. {"video": ".../LanguageBind_Video_merge"}) -> (binding params,
    vision_cfgs, text_cfg) ready for language_bind_forward / the
    embeddings service. Each dir carries ``vision_model.*`` +
    ``visual_projection.weight`` (+ ``logit_scale``); the shared language
    branch (``text_model.*`` + ``text_projection.weight``) is taken from
    the first sorted dir that has one — the reference's LanguageBind
    builds exactly this layout (languagebind/__init__.py:57-77)."""
    from videollamb_tpu.models.builder import (
        load_state_dict,
        vision_config_from_tower_json,
    )
    from videollamb_tpu.models.vision.convert import convert_vision_state_dict

    def arr(v):
        import numpy as np

        return jnp.asarray(
            (v if isinstance(v, np.ndarray) else v.numpy()), dtype)

    params: Params = {"modalities": {}, "text": {}}
    vision_cfgs: Dict[str, VisionConfig] = {}
    text_cfg = TextConfig()
    import dataclasses

    for name in sorted(paths):
        sd = load_state_dict(paths[name])
        tower = convert_vision_state_dict(sd, prefix="vision_model.")
        vcfg = (vision_config_from_tower_json(paths[name]) or VisionConfig())
        # Trust the weights over the config default: plain CLIP encoders
        # (image / LanguageBind image towers) have no temporal layers.
        has_t = bool(tower["layers"]) and "temporal_attn" in tower["layers"][0]
        if vcfg.add_time_attn != has_t:
            vcfg = dataclasses.replace(vcfg, add_time_attn=has_t)
        vision_cfgs[name] = vcfg
        scale = sd.get("logit_scale")
        params["modalities"][name] = {
            "tower": tower,
            # HF nn.Linear stores (out, in); our einsum reads (in, out).
            "projection": arr(sd["visual_projection.weight"]).T,
            "logit_scale": (jnp.asarray(float(scale), jnp.float32)
                            if scale is not None
                            else jnp.asarray(math.log(1 / 0.07), jnp.float32)),
        }
        if not params["text"] and any(
                k.startswith("text_model.") for k in sd):
            params["text"] = {
                "encoder": convert_text_state_dict(sd),
                "projection": arr(sd["text_projection.weight"]).T,
            }
            text_cfg = text_config_from_json(paths[name])
    if not params["text"]:
        raise ValueError(
            "no checkpoint dir carried a text branch (text_model.* keys) — "
            "LanguageBind embeddings need the shared language encoder")
    # One compute dtype for the whole tree (logit scales stay f32).
    cast = lambda tree: jax.tree.map(lambda v: jnp.asarray(v, dtype), tree)  # noqa: E731
    for m in params["modalities"].values():
        m["tower"] = cast(m["tower"])
    params["text"]["encoder"] = cast(params["text"]["encoder"])
    return params, vision_cfgs, text_cfg


def init_binding_params(
    rng: jax.Array,
    vision_cfgs: Dict[str, VisionConfig],
    text_cfg: TextConfig = TextConfig(),
    projection_dim: int = 768,
    dtype=jnp.float32,
) -> Params:
    """One tower + projection + logit scale per modality, plus the shared
    language branch (reference __init__.py:59-77)."""
    ks = jax.random.split(rng, len(vision_cfgs) * 2 + 2)
    params: Params = {"modalities": {}, "text": {}}
    for i, (name, vcfg) in enumerate(sorted(vision_cfgs.items())):
        params["modalities"][name] = {
            "tower": init_vision_params(ks[2 * i], vcfg, dtype),
            "projection": jax.random.normal(
                ks[2 * i + 1], (vcfg.hidden_size, projection_dim), dtype
            ) * vcfg.hidden_size**-0.5,
            "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
        }
    params["text"] = {
        "encoder": init_text_params(ks[-2], text_cfg, dtype),
        "projection": jax.random.normal(
            ks[-1], (text_cfg.hidden_size, projection_dim), dtype
        ) * text_cfg.hidden_size**-0.5,
    }
    return params


def binding_encode_modality(
    params: Params, name: str, pixels: jax.Array, cfg: VisionConfig,
    use_temp: bool = True,
) -> jax.Array:
    """pixels (B, T, C, H, W) -> (B, projection_dim) normalized embedding
    (reference forward, __init__.py:79-88: CLS pooled + post-LN + proj +
    L2 norm, scaled by exp(logit_scale))."""
    mp = params["modalities"][name]
    feats = vision_encode(mp["tower"], pixels, cfg, select_layer=len(mp["tower"]["layers"]))
    pooled = feats[:, :, 0].mean(axis=1)  # CLS per frame, frame-averaged
    pooled = _layer_norm(mp["tower"]["post_layernorm"], pooled, cfg.layer_norm_eps)
    emb = jnp.einsum("bd,dk->bk", pooled, mp["projection"].astype(pooled.dtype))
    emb = emb / jnp.linalg.norm(emb.astype(jnp.float32), axis=-1, keepdims=True).astype(emb.dtype)
    if use_temp:
        emb = emb * jnp.exp(mp["logit_scale"]).astype(emb.dtype)
    return emb


def binding_encode_text(
    params: Params, input_ids: jax.Array, cfg: TextConfig = TextConfig()
) -> jax.Array:
    pooled = text_encode(params["text"]["encoder"], input_ids, cfg)
    emb = jnp.einsum("bd,dk->bk", pooled, params["text"]["projection"].astype(pooled.dtype))
    return emb / jnp.linalg.norm(
        emb.astype(jnp.float32), axis=-1, keepdims=True
    ).astype(emb.dtype)


def language_bind_forward(
    params: Params,
    inputs: Dict[str, jax.Array],
    vision_cfgs: Dict[str, VisionConfig],
    text_cfg: TextConfig = TextConfig(),
    use_temp: bool = True,
) -> Dict[str, jax.Array]:
    """Dict of modality inputs -> dict of joint-space embeddings
    (reference LanguageBind.forward, __init__.py:79-88)."""
    out = {}
    for name, value in inputs.items():
        if name == "language":
            out[name] = binding_encode_text(params, value, text_cfg)
        else:
            out[name] = binding_encode_modality(
                params, name, value, vision_cfgs[name], use_temp=use_temp
            )
    return out
