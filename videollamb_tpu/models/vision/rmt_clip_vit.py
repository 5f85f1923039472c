"""RMT-LanguageBind tower: CLIP ViT with recurrent read-memory tokens.

Reference: llava/model/multimodal_encoder/languagebind/rmt_video/
modeling_video.py:354-520 (CLIPEncoder with 128 memory tokens prepended to
the patch sequence) and __init__.py:389-524 (RMTLanguageBindVideoTower).

The reference's forward cannot run as shipped: CLIPVisionTransformer.forward
raises unconditionally — the ``raise NotImplimentatedError`` at
modeling_video.py:755 sits AFTER the if/else so even the T==1 branch hits
it (and the name itself is undefined, so it is a NameError; the image
branch also leaves ``T`` unbound). This module implements the evident
design as working code:

- per segment, the encoder runs over ``[read_memories, patch_tokens]``
  where read memories are the carried memory plus the learned
  ``read_memory_emb`` (first step: the embedding alone —
  modeling_video.py:461-477);
- after the layers, the first M positions are the new memories and the
  rest the patch features (the encoder-variant unpack, :512-513);
- video clips run the recurrence over frames via ``lax.scan`` (the
  commented segment loop at :757-767), images are a single step.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import (
    _encoder_layer,
    _layer_norm,
    init_vision_params,
)
from videollamb_tpu.models.vision.clip_vit import _embed  # noqa: F401

Params = Dict[str, Any]

NUM_MEMORY_TOKENS = 128  # reference modeling_video.py:371


def init_rmt_vision_params(
    rng: jax.Array, cfg: VisionConfig, dtype=jnp.float32,
    num_memory_tokens: int = NUM_MEMORY_TOKENS,
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    params = init_vision_params(k1, cfg, dtype)
    d = cfg.hidden_size
    params["encoder_memory"] = {
        # reference :372-375: both initialized normal(std=0.02).
        "read_memory_emb": jax.random.normal(k2, (num_memory_tokens, d), dtype) * 0.02,
        "memory_tokens": jax.random.normal(k3, (num_memory_tokens, d), dtype) * 0.02,
    }
    return params


def _run_layers(params: Params, cfg: VisionConfig, x: jax.Array,
                n_layers: int) -> jax.Array:
    """Scan the layer stack (one compiled body — see clip_vit.vision_encode
    for why the python loop is a compile hazard with Pallas cores)."""
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *params["layers"][:n_layers])

    def body(hidden, lp):
        return _encoder_layer(lp, hidden, cfg, time_window=1), None

    return jax.lax.scan(body, x, stacked)[0]


def _encode_one_step(
    params: Params,
    cfg: VisionConfig,
    tokens: jax.Array,  # (B, 1+N, d) pre-LN'd frame tokens
    memories: Optional[jax.Array],  # (B, M, d) or None (first step)
    n_layers: int,
) -> Tuple[jax.Array, jax.Array]:
    """One memory-augmented encoder pass -> (features, new_memories)."""
    b = tokens.shape[0]
    m = params["encoder_memory"]["read_memory_emb"].shape[0]
    emb = params["encoder_memory"]["read_memory_emb"].astype(tokens.dtype)
    if memories is None:
        read = jnp.broadcast_to(emb[None], (b, m, tokens.shape[-1]))
    else:
        read = memories.astype(tokens.dtype) + emb[None]
    x = jnp.concatenate([read, tokens], axis=1)
    x = _run_layers(params, cfg, x, n_layers)
    return x[:, m:], x[:, :m]


@partial(jax.jit, static_argnames=("cfg", "select_layer"))
def rmt_vision_encode(
    params: Params,
    pixels: jax.Array,  # (B, T, C, H, W)
    cfg: VisionConfig,
    memories: Optional[jax.Array] = None,  # (B, M, d) carried state
    select_layer: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Encode with the memory recurrence over frames.

    Returns ((B, T, 1+N, D) features, (B, M, D) final memories). For
    T == 1 this is the single-image step; longer clips run the frame
    recurrence (each frame reads the previous frame's written memories).
    """
    b, t, c, h, w = pixels.shape
    sel = cfg.select_layer if select_layer is None else select_layer
    n_layers = len(params["layers"]) + (sel + 1) if sel < 0 else sel

    x = _embed(params["embeddings"], pixels.reshape(b * t, c, h, w), cfg)
    x = _layer_norm(params["pre_layrnorm"], x, cfg.layer_norm_eps)
    x = x.reshape(b, t, x.shape[-2], x.shape[-1])

    if t == 1:
        feats, mem = _encode_one_step(params, cfg, x[:, 0], memories, n_layers)
        return feats[:, None], mem

    m = params["encoder_memory"]["read_memory_emb"].shape[0]
    emb = params["encoder_memory"]["read_memory_emb"].astype(x.dtype)

    def step(mem, frame_tokens):
        read = mem + emb[None]
        y = jnp.concatenate([read, frame_tokens], axis=1)
        for lp in params["layers"][:n_layers]:
            y = _encoder_layer(lp, y, cfg, time_window=1)
        return y[:, :m], y[:, m:]

    if memories is None:
        # First frame reads the raw embedding (memories == None branch).
        mem0 = jnp.zeros((b, m, x.shape[-1]), x.dtype)
    else:
        mem0 = memories.astype(x.dtype)
    final_mem, feats = jax.lax.scan(step, mem0, x.transpose(1, 0, 2, 3))
    return feats.transpose(1, 0, 2, 3), final_mem
