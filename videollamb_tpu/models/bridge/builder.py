"""Projector factory: typed dispatch over the full projector family.

Counterpart of the reference name-string factory
(llava/model/multimodal_projector/builder.py:13-53), driven by the typed
:class:`videollamb_tpu.config.BridgeConfig` instead of regex parsing (the
regex grammar is still accepted via ``BridgeConfig.from_projector_type``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig
from videollamb_tpu.models.bridge import variants as v
from videollamb_tpu.models.bridge.rmt_r import (
    init_rmt_r_params,
    rmt_r_image_forward,
    rmt_r_video_forward,
)

Params = Dict[str, Any]


def init_bridge_params(rng: jax.Array, cfg: BridgeConfig, lm_hidden_size: int,
                       dtype=jnp.float32) -> Params:
    kind = cfg.kind
    if kind == "identity":
        return {}
    if kind == "linear":
        return v.init_linear_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "mlp":
        return v.init_mlp_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "transformer":
        return v.init_transformer_proj_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "mlp_transformer":
        return v.init_mlp_transformer_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "rmt_transformer":
        return v.init_rmt_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "rmt_r_transformer":
        return init_rmt_r_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "rmt_r_transformer_cap":
        return v.init_rmt_r_cap_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "qformer":
        return v.init_qformer_params(rng, cfg, lm_hidden_size, dtype)
    if kind == "spatial_pool":
        return {}
    if kind == "retention":
        # Reference retent_transformer_projector.py — dead code there (never
        # registered in the factory; its Retention class has a construction
        # bug), implemented here with the bug fixed. See the retention
        # section of variants.py for the full provenance note.
        return v.init_retention_params(rng, cfg, lm_hidden_size, dtype)
    raise ValueError(f"Unknown projector kind: {kind!r}")


def bridge_apply(
    params: Params,
    cfg: BridgeConfig,
    features: jax.Array,
    *,
    modality: str = "video",
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Apply the configured projector to ONE sample's tower features.

    modality='video': features (t, n, d) — one video's frames.
    modality='image': features (n, d)    — one image.

    Returns (tokens (N_tok, lm_d), mask (N_tok,)). Callers vmap over the
    batch (encode_videos / encode_images in models/assembly.py).
    """
    kind = cfg.kind
    if modality == "image" and features.ndim == 2:
        img = features[None]  # (1, n, d)
    else:
        img = None

    if kind in ("identity", "linear", "mlp"):
        fwd = {"identity": v.identity_forward, "linear": v.linear_forward,
               "mlp": v.mlp_forward}[kind]
        tokens = fwd(params, cfg, features)
        tokens = tokens.reshape(-1, tokens.shape[-1])
        return tokens, jnp.ones(tokens.shape[:1], bool)

    if kind == "transformer":
        if modality == "image":
            tokens = v.transformer_image_forward(params, cfg, img, deterministic)[0]
            return tokens, jnp.ones(tokens.shape[:-1], bool)
        return v.transformer_video_forward(params, cfg, features, deterministic)

    if kind == "mlp_transformer":
        return v.mlp_transformer_forward(
            params, cfg, img if img is not None else features, deterministic)

    if kind == "rmt_transformer":
        if modality == "image":
            tokens, _ = rmt_r_image_forward(
                {"projector": params["projector"], "retrieval": {"layers": []}},
                cfg, img, deterministic=deterministic)
            return tokens[0], jnp.ones(tokens.shape[1:-1], bool)
        return v.rmt_video_forward(params, cfg, features, deterministic)

    if kind == "rmt_r_transformer":
        if modality == "image":
            tokens, _ = rmt_r_image_forward(params, cfg, img,
                                            deterministic=deterministic)
            return tokens[0], jnp.ones(tokens.shape[1:-1], bool)
        out = rmt_r_video_forward(params, cfg, features, rng=rng,
                                  deterministic=deterministic)
        return out.tokens, out.token_mask

    if kind == "rmt_r_transformer_cap":
        return v.rmt_r_cap_video_forward(params, cfg, features, deterministic)

    if kind == "qformer":
        return v.qformer_forward(params, cfg, features, deterministic)

    if kind == "retention":
        if modality == "image":
            return v.retention_image_forward(params, cfg, img,
                                             deterministic=deterministic)
        return v.retention_video_forward(params, cfg, features,
                                         deterministic=deterministic)

    if kind == "spatial_pool":
        # Resampler semantics (reference spatial_pool_projector.py): output
        # stays in the TOWER dim — usable as a feature resampler, not as a
        # direct LM projector (the reference factory never wires it either).
        return v.spatial_pool_forward(params, cfg, features)

    raise ValueError(f"Unknown projector kind: {kind!r}")
