"""VideoLLaMB model assembly: tower -> Memory Bridge -> splice -> Llama.

TPU-native counterpart of the reference model classes
(llava/model/language_model/llava_llama.py:41-174 LlavaLlamaForCausalLM and
llava/model/llava_arch.py LlavaMetaModel/LlavaMetaForCausalLM): pure
functions over an explicit parameter pytree, one compiled graph per shape
bucket, batch handled by vmap instead of the reference's per-sample Python
loop (llava_arch.py:505).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import IGNORE_INDEX
from videollamb_tpu.models.bridge.rmt_r import rmt_r_video_forward
from videollamb_tpu.models.lm.llama import embed_tokens, llama_forward
from videollamb_tpu.models.splice import (
    SplicedBatch,
    splice_multimodal,
    splice_multimodal_packed,
)
from videollamb_tpu.models.vision.clip_vit import vision_encode

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Encoders (reference llava_arch.py:331-348)
# ---------------------------------------------------------------------------


def _tower_features(params: Params, cfg: ModelConfig, pixels: jax.Array,
                    tower_key: str = "video_tower") -> jax.Array:
    """(B, T, C, H, W) -> (B, T', N, D) tower features. Routes through the
    tower factory when cfg.tower is set (research towers), else the default
    CLIP family (LanguageBind image/video)."""
    tower = params.get(tower_key, params["video_tower"])
    if cfg.tower is not None:
        from videollamb_tpu.models.vision.builder import tower_encode

        return tower_encode(cfg.tower, tower, pixels)
    return vision_encode(tower, pixels, cfg.vision)


def encode_videos(
    params: Params, cfg: ModelConfig, videos: jax.Array, deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """videos (B, T, C, H, W) -> per-video projector tokens.

    Dispatches through the projector factory (any BridgeConfig.kind); for
    the production rmt_r bridge this is the last segment's tokens
    (reference encode_videos, llava_arch.py:331-338).
    Returns (B, N_tokens, lm_d) and (B, N_tokens) validity mask.
    """
    from videollamb_tpu.models.bridge.builder import bridge_apply

    feats = _tower_features(params, cfg, videos)  # (B,T,N,D)
    rngs = jax.random.split(rng, feats.shape[0]) if rng is not None else None

    def one(f, r):
        return bridge_apply(
            params["mm_projector"], cfg.bridge, f, modality="video",
            rng=r, deterministic=deterministic,
        )

    if rngs is None:
        tokens, mask = jax.vmap(lambda f: one(f, None))(feats)
    else:
        tokens, mask = jax.vmap(one)(feats, rngs)
    return tokens, mask


def encode_videos_retro(
    params: Params, cfg: ModelConfig, videos: jax.Array, deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-segment bridge tokens for the RMT-loss training path
    (reference encode_videos_retro, llava_arch.py:428).

    Returns (B, S, F*P, lm_d) and (B, S, F*P)."""
    feats = _tower_features(params, cfg, videos)

    def one(f):
        out = rmt_r_video_forward(
            params["mm_projector"], cfg.bridge, f, deterministic=deterministic,
        )
        return out.all_tokens, out.all_masks

    return jax.vmap(one)(feats)


def encode_images(
    params: Params, cfg: ModelConfig, images: jax.Array, deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """images (B, C, H, W) -> (B, P, lm_d) tokens + validity mask
    (reference encode_images, llava_arch.py:265). Dispatches through the
    projector factory."""
    from videollamb_tpu.models.bridge.builder import bridge_apply

    feats = _tower_features(params, cfg, images[:, None], "image_tower")  # (B,1,N,D)

    def one(f):
        return bridge_apply(
            params["mm_projector"], cfg.bridge, f, modality="image",
            deterministic=deterministic,
        )

    return jax.vmap(one)(feats[:, 0])


def encode_images_anyres(
    params: Params,
    cfg: ModelConfig,
    images: jax.Array,  # (B, P, C, H, W): base resized image + grid patches
    image_specs: jax.Array,  # (B, 4) int32 from models.anyres.anyres_spec
    deterministic: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Anyres patch encode + merge (reference encode_images 'spatial*'
    branch, llava_arch.py:265-331): every patch through tower+projector,
    then the static-shape spatial merge with unpad + newline tokens.

    Requires a grid-preserving projector (identity/linear/mlp) — the
    reference asserts the same (llava_arch.py:291).
    Returns (B, N_max, lm_d) tokens + (B, N_max) validity mask.
    """
    from videollamb_tpu.models.anyres import anyres_merge
    from videollamb_tpu.models.bridge.builder import bridge_apply

    if cfg.bridge.kind not in ("identity", "linear", "mlp"):
        raise ValueError(
            "anyres spatial merge needs a grid-preserving projector "
            f"(got {cfg.bridge.kind!r}); reference asserts height*width == "
            "base_image_feature.shape[0] (llava_arch.py:291)"
        )
    b, p = images.shape[:2]
    feats = _tower_features(
        params, cfg, images.reshape(b * p, 1, *images.shape[2:]), "image_tower"
    )[:, 0, 1:]  # (B*P, n_patches, d_vis): feature_select('patch') drops CLS

    def proj(f):
        tokens, _ = bridge_apply(
            params["mm_projector"], cfg.bridge, f, modality="image",
            deterministic=deterministic,
        )
        return tokens

    tokens = jax.vmap(proj)(feats)  # (B*P, n_patches, lm_d)
    tokens = tokens.reshape(b, p, cfg.vision.num_patches, -1)
    newline = params.get(
        "image_newline", jnp.zeros((tokens.shape[-1],), tokens.dtype)
    )

    def merge_one(tok, spec):
        return anyres_merge(
            tok, spec, newline, cfg.vision.num_patches_per_side,
            cfg.mm_patch_merge_type,
        )

    return jax.vmap(merge_one)(tokens, image_specs)


def encode_mixed(
    params: Params,
    cfg: ModelConfig,
    blocks: Tuple[Tuple[str, jax.Array], ...],
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Mixed-modality blocks for ONE row -> stacked K-block splice input.

    ``blocks`` is the ordered list the reference's multi-X drivers build
    (llava/eval/model_videoqa_act.py:117-120: an ``X`` list plus
    ``X_modalities``): each entry ("VIDEO", (T,C,H,W)) / ("IMAGE",
    (C,H,W)) / ("AUDIO", (C,H,W) fbank image). Every block goes through
    its own encoder; results are right-padded to the widest block and
    stacked so the k-th X sentinel binds block k.

    Returns x_embeds (1, K, N_max, lm_d) and x_mask (1, K, N_max)."""
    outs = []
    for modality, pixels in blocks:
        if modality == "VIDEO":
            e, m = encode_videos(
                params, cfg, pixels[None], deterministic=deterministic, rng=rng)
        elif modality in ("IMAGE", "AUDIO"):
            # AUDIO rides the image path: the fbank "image" routes to the
            # audio tower via the model's TowerSpec (models/vision/builder).
            e, m = encode_images(params, cfg, pixels[None],
                                 deterministic=deterministic)
        else:
            raise ValueError(f"unknown modality {modality!r}")
        outs.append((e[0], m[0].astype(bool)))

    n_max = max(e.shape[0] for e, _ in outs)
    d = outs[0][0].shape[-1]
    k = len(outs)
    x_embeds = jnp.zeros((1, k, n_max, d), outs[0][0].dtype)
    x_mask = jnp.zeros((1, k, n_max), bool)
    for i, (e, m) in enumerate(outs):
        x_embeds = x_embeds.at[0, i, : e.shape[0]].set(e)
        x_mask = x_mask.at[0, i, : m.shape[0]].set(m)
    return x_embeds, x_mask


def init_image_newline(rng: jax.Array, lm_hidden_size: int, dtype=jnp.float32) -> jax.Array:
    """Learned row-terminator token for 'spatial_unpad' (reference
    LlavaMetaModel.__init__: randn(hidden) / sqrt(hidden))."""
    return (
        jax.random.normal(rng, (lm_hidden_size,), jnp.float32)
        / jnp.sqrt(float(lm_hidden_size))
    ).astype(dtype)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


class MultimodalBatch(NamedTuple):
    """Host-assembled batch. ``videos`` may be None for text/image batches.

    input_ids carry X sentinels on multimodal rows (-200 image/-201 video;
    up to K per row — the k-th sentinel binds to the k-th visual block);
    pure-text rows have none. ``images`` may be 5-D (B, P, C, H, W) anyres
    patch stacks, in which case ``image_specs`` carries the per-sample
    (NPH, NPW, pad_r, pad_c) grid spec from models.anyres.anyres_spec.
    """

    input_ids: jax.Array  # (B, T)
    attention_mask: jax.Array  # (B, T)
    labels: Optional[jax.Array]  # (B, T) or None
    videos: Optional[jax.Array]  # (B, T_v, C, H, W)
    images: Optional[jax.Array]  # (B, C, H, W) or (B, P, C, H, W) anyres
    image_specs: Optional[jax.Array] = None  # (B, 4) int32, anyres only
    # Mixed-modality requests (B=1 serving path): ordered per-row visual
    # blocks, each ("VIDEO"|"IMAGE"|"AUDIO", pixels). The k-th block binds
    # the k-th X sentinel in input_ids (mm_utils.tokenizer_multi_x_token).
    # Host-side only — must stay None inside jitted train steps (the
    # modality strings are not pytree leaves).
    blocks: Optional[Tuple[Tuple[str, jax.Array], ...]] = None
    # Packed-sequence training (train/dataset.PackedCollator): several
    # conversations share one row. segment_ids numbers them 1..S per row
    # (0 = padding). With packing, the k-th SENTINEL slot of a row binds
    # block k: ``videos`` is 6-D (B, K, T_v, C, H, W) with
    # video_block_mask (B, K) marking which slots hold a video, and
    # packed ``images`` are 5-D (B, K, C, H, W) with image_block_mask.
    # Slots true in neither mask insert nothing (a sentinel with no
    # media); a batch may carry both arrays (mixed video+image packing).
    segment_ids: Optional[jax.Array] = None  # (B, T) int32
    video_block_mask: Optional[jax.Array] = None  # (B, K) bool
    image_block_mask: Optional[jax.Array] = None  # (B, K) bool


def prepare_multimodal_embeds(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> SplicedBatch:
    """Encode visuals, embed text, splice (reference
    prepare_inputs_labels_for_multimodal, llava_arch.py:492-660)."""
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    b = batch.input_ids.shape[0]
    lm_d = text_embeds.shape[-1]

    if batch.blocks is not None:
        x_embeds, x_mask = encode_mixed(
            params, cfg, batch.blocks, deterministic=deterministic, rng=rng
        )
    elif batch.videos is not None:
        x_embeds, x_mask = encode_videos(
            params, cfg, batch.videos, deterministic=deterministic, rng=rng
        )
    elif batch.images is not None and batch.images.ndim == 5:
        if batch.image_specs is not None:
            x_embeds, x_mask = encode_images_anyres(
                params, cfg, batch.images, batch.image_specs,
                deterministic=deterministic,
            )
        else:
            # Multi-image rows: (B, K, C, H, W) — each image becomes its own
            # visual block; the k-th sentinel binds block k (reference
            # multi-X conversations, llava_arch.py:560-599).
            b, k = batch.images.shape[:2]
            flat = batch.images.reshape(b * k, *batch.images.shape[2:])
            tok, msk = encode_images(params, cfg, flat, deterministic=deterministic)
            x_embeds = tok.reshape(b, k, *tok.shape[1:])
            x_mask = msk.reshape(b, k, *msk.shape[1:])
    elif batch.images is not None:
        x_embeds, x_mask = encode_images(
            params, cfg, batch.images, deterministic=deterministic
        )
    else:
        x_embeds = jnp.zeros((b, 1, lm_d), text_embeds.dtype)
        x_mask = jnp.zeros((b, 1), bool)

    return splice_multimodal(
        batch.input_ids, batch.attention_mask, batch.labels,
        text_embeds, x_embeds, x_mask, cfg.max_length,
    )


def prepare_packed_embeds(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[SplicedBatch, jax.Array, jax.Array]:
    """Packed-row prepare: encode each row's K video blocks, splice with
    segment tracking. Returns (spliced, segment_ids (B, L), position_ids
    (B, L)). Requires batch.segment_ids; videos, when present, are 6-D
    (B, K, T_v, C, H, W) with video_block_mask (B, K)."""
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    b = batch.input_ids.shape[0]
    lm_d = text_embeds.shape[-1]

    vtok = vmsk = itok = imsk = None
    if batch.videos is not None:
        bb, k = batch.videos.shape[:2]
        flat = batch.videos.reshape((bb * k,) + batch.videos.shape[2:])
        tok, msk = encode_videos(
            params, cfg, flat, deterministic=deterministic, rng=rng
        )
        vtok = tok.reshape((bb, k) + tok.shape[1:])
        vmsk = msk.reshape((bb, k) + msk.shape[1:])
        if batch.video_block_mask is not None:
            vmsk = vmsk & batch.video_block_mask[:, :, None].astype(bool)
    if batch.images is not None:
        bb, k = batch.images.shape[:2]
        flat = batch.images.reshape((bb * k,) + batch.images.shape[2:])
        tok, msk = encode_images(params, cfg, flat, deterministic=deterministic)
        itok = tok.reshape((bb, k) + tok.shape[1:])
        imsk = msk.reshape((bb, k) + msk.shape[1:])
        blk = (batch.image_block_mask if batch.image_block_mask is not None
               else batch.video_block_mask)
        if blk is not None:
            imsk = imsk & blk[:, :, None].astype(bool)

    if vtok is not None and itok is not None:
        # Mixed video+image packing: the k-th slot of a row is a video OR
        # an image (disjoint block masks), so after padding both token
        # grids to a common width the masked sum selects per slot.
        n = max(vtok.shape[2], itok.shape[2])
        vtok = jnp.pad(vtok, ((0, 0), (0, 0), (0, n - vtok.shape[2]), (0, 0)))
        vmsk = jnp.pad(vmsk, ((0, 0), (0, 0), (0, n - vmsk.shape[2])))
        itok = jnp.pad(itok, ((0, 0), (0, 0), (0, n - itok.shape[2]), (0, 0)))
        imsk = jnp.pad(imsk, ((0, 0), (0, 0), (0, n - imsk.shape[2])))
        x_embeds = (vtok * vmsk[..., None].astype(vtok.dtype)
                    + itok * imsk[..., None].astype(itok.dtype))
        x_mask = vmsk | imsk
    elif vtok is not None:
        x_embeds, x_mask = vtok, vmsk
    elif itok is not None:
        x_embeds, x_mask = itok, imsk
    else:
        x_embeds = jnp.zeros((b, 1, 1, lm_d), text_embeds.dtype)
        x_mask = jnp.zeros((b, 1, 1), bool)

    return splice_multimodal_packed(
        batch.input_ids, batch.attention_mask, batch.labels,
        batch.segment_ids, text_embeds, x_embeds, x_mask, cfg.max_length,
    )


def measure_block_tokens(params: Params, cfg: ModelConfig,
                         modality: str = "video") -> int:
    """Spliced tokens one media block expands to — the packing budget unit
    (train.dataset.PackedCollator). Shape-only: jax.eval_shape traces the
    encoder without running it."""
    img = cfg.vision.image_size
    if modality == "video":
        dummy = jax.ShapeDtypeStruct((1, cfg.num_frames, 3, img, img),
                                     jnp.float32)
        out = jax.eval_shape(
            lambda p, v: encode_videos(p, cfg, v), params, dummy
        )
    else:
        dummy = jax.ShapeDtypeStruct((1, 3, img, img), jnp.float32)
        out = jax.eval_shape(
            lambda p, v: encode_images(p, cfg, v), params, dummy
        )
    return int(out[0].shape[1])


@partial(jax.jit, static_argnames=("cfg", "deterministic"))
def _prepare_embeds_jit(params, cfg, batch, deterministic=True):
    return prepare_multimodal_embeds(params, cfg, batch,
                                     deterministic=deterministic)


@partial(jax.jit, static_argnames=("cfg", "modalities", "deterministic"))
def _encode_mixed_jit(params, cfg, modalities, pixels, deterministic=True):
    return encode_mixed(params, cfg, tuple(zip(modalities, pixels)),
                        deterministic=deterministic)


@partial(jax.jit, static_argnames=("cfg",))
def _splice_with_x(params, cfg, batch, x_embeds, x_mask):
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    return splice_multimodal(
        batch.input_ids, batch.attention_mask, batch.labels,
        text_embeds, x_embeds, x_mask, cfg.max_length,
    )


def prepare_multimodal_embeds_fast(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
) -> SplicedBatch:
    """Jit-dispatched splice for HOST-DRIVEN serving paths (engines,
    Chat, offline generate).

    ``prepare_multimodal_embeds`` is a plain function — correct inside
    already-jitted train steps, but catastrophic when a host loop calls
    it eagerly: every op dispatches individually (and on the TPU tunnel
    each dispatch pays a round trip — measured ~1.5 s per serving
    admission at 7B, ~30x the compiled cost; the round-3 serving-load
    bench caught it). This wrapper runs the same computation as one
    compiled graph per (shape, cfg) key. Mixed-modality blocks carry
    host-side modality strings, so they route through a jit whose
    modality tuple is STATIC and whose pixel tensors are traced."""
    if batch.blocks is not None:
        modalities = tuple(m for m, _ in batch.blocks)
        pixels = tuple(p for _, p in batch.blocks)
        x_embeds, x_mask = _encode_mixed_jit(
            params, cfg, modalities, pixels, deterministic=deterministic)
        return _splice_with_x(params, cfg, batch._replace(blocks=None),
                              x_embeds, x_mask)
    return _prepare_embeds_jit(params, cfg, batch,
                               deterministic=deterministic)


def videollamb_forward(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attn_impl: str = "auto",
    act_sharding=None,
) -> Tuple[jax.Array, SplicedBatch]:
    """Full multimodal forward -> (logits (B, L, V), spliced batch).

    Batches carrying ``segment_ids`` take the packed-row route: block-causal
    segment attention + per-segment RoPE positions, so several packed
    conversations train exactly as if each had its own row.
    ``act_sharding`` (optional NamedSharding) sequence-shards the LM's
    remat-saved layer boundaries — see models/lm/llama.py:_run_layers."""
    if batch.segment_ids is not None:
        spliced, seg, pos = prepare_packed_embeds(
            params, cfg, batch, deterministic=deterministic, rng=rng
        )
        logits = llama_forward(
            params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask,
            position_ids=pos, remat=remat, attn_impl=attn_impl,
            segment_ids=seg, act_sharding=act_sharding,
        )
        return logits, spliced
    spliced = prepare_multimodal_embeds(
        params, cfg, batch, deterministic=deterministic, rng=rng
    )
    logits = llama_forward(
        params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask,
        remat=remat, attn_impl=attn_impl, act_sharding=act_sharding,
    )
    return logits, spliced


def causal_lm_loss(logits: jax.Array, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Shifted cross-entropy with IGNORE_INDEX masking (reference: HF
    CausalLM loss over the spliced labels). Returns (mean loss, token count)."""
    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    token_logp = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(valid), 1)
    loss = -jnp.sum(jnp.where(valid, token_logp, 0.0)) / n
    return loss, n
