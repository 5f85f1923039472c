"""Research towers end-to-end through assembly (cfg.tower routing).

The reference wires alternative encoders (vit/mae/vivit/videomae) through
the same LlavaMetaModel path by name dispatch
(llava/model/multimodal_encoder/builder.py:14-61); here a TowerSpec on
ModelConfig.tower routes assembly through models.vision.builder.tower_encode.
"""

import dataclasses

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch, videollamb_forward
from videollamb_tpu.models.bridge.builder import init_bridge_params
from videollamb_tpu.models.vision.builder import TowerSpec, tower_encode
from videollamb_tpu.models.vision.vit import ViTFamilyConfig, init_vit_params

TINY = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, image_size=32, patch_size=16)


def _spec(kind):
    if kind == "vit":
        return TowerSpec("vit", ViTFamilyConfig(**TINY), frame_wise=True)
    if kind == "vitmae":
        return TowerSpec("vitmae", ViTFamilyConfig(**TINY), frame_wise=True)
    if kind == "vivit":
        return TowerSpec("vivit", ViTFamilyConfig(tubelet_t=2, num_frames=8,
                                                  layer_norm_eps=1e-6, **TINY),
                         frame_wise=False)
    return TowerSpec("videomae", ViTFamilyConfig(tubelet_t=2, num_frames=8,
                                                 use_cls_token=False,
                                                 pos_embed="sincos",
                                                 qkv_bias="qv_only", **TINY),
                     frame_wise=False)


@pytest.mark.parametrize("kind", ["vit", "vitmae", "vivit", "videomae"])
def test_tower_encode_contract(kind):
    """Every tower kind yields (B, T', 1+n, D) with a CLS-like slot at 0."""
    spec = _spec(kind)
    params = init_vit_params(jax.random.PRNGKey(0), spec.config)
    pixels = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 8, 3, 32, 32)).astype(np.float32))
    feats = tower_encode(spec, params, pixels)
    t_out = 8 if spec.frame_wise else 8 // spec.config.tubelet_t
    n = spec.config.tokens_per_frame_group
    assert feats.shape == (2, t_out, 1 + n, 32)
    assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.parametrize("kind", ["vit", "videomae"])
def test_vit_family_through_assembly(kind):
    from videollamb_tpu.models.lm.llama import init_llama_params

    spec = _spec(kind)
    base = ModelConfig.tiny()
    bridge = dataclasses.replace(base.bridge, kind="mlp")
    cfg = dataclasses.replace(base, bridge=bridge, tower=spec)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vit_params(k1, spec.config),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    rng = np.random.default_rng(1)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=None,
        videos=jnp.asarray(rng.normal(size=(2, 8, 3, 32, 32)).astype(np.float32)),
        images=None,
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(spliced.lengths[0]) > 10  # video tokens were spliced in


def test_factory_resolves_vit_family_configs():
    from videollamb_tpu.models.vision.builder import resolve_tower

    for name, kind in [("google/vit-base-patch16-224", "vit"),
                       ("facebook/vit-mae-base", "vitmae"),
                       ("google/vivit-b-16x2-kinetics400", "vivit"),
                       ("MCG-NJU/videomae-base", "videomae"),
                       ("rmt_vivit", "vivit")]:
        spec = resolve_tower(name)
        assert spec.kind == kind
        assert isinstance(spec.config, ViTFamilyConfig)
    assert resolve_tower("MCG-NJU/videomae-base").config.qkv_bias == "qv_only"


@pytest.mark.parametrize("kind", ["languagebind_audio", "languagebind_depth",
                                  "languagebind_thermal"])
def test_modality_towers_through_assembly(kind):
    """Audio/depth/thermal end-to-end: modality tower -> projector -> LM
    (the reference only ships these encoders importable, never wired;
    languagebind/__init__.py:57-88)."""
    from videollamb_tpu.constants import IMAGE_TOKEN_INDEX
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.models.vision.modalities import audio_tower_config

    tiny_dims = dict(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64)
    if kind == "languagebind_audio":
        vcfg = audio_tower_config(image_size_hw=(28, 56), patch_size=14, **tiny_dims)
        chw = (3, 28, 56)
    else:
        vcfg = dataclasses.replace(ModelConfig.tiny().vision, **tiny_dims)
        chw = (3, vcfg.image_size, vcfg.image_size)
    spec = TowerSpec(kind, vcfg, frame_wise=True)

    base = ModelConfig.tiny()
    bridge = dataclasses.replace(base.bridge, kind="mlp")
    cfg = dataclasses.replace(base, bridge=bridge, tower=spec)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, vcfg),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }

    rng = np.random.default_rng(2)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    ids[:, 2] = IMAGE_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=None, videos=None,
        images=jnp.asarray(rng.normal(size=(2,) + chw).astype(np.float32)),
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(spliced.lengths[0]) > 10


def test_audio_processor_feeds_tower():
    """Waveform -> log-mel fbank -> audio tower features, full-size config
    geometry (1036x126 mel grid, ViT-L/14 patches)."""
    from videollamb_tpu.models.vision.builder import resolve_tower
    from videollamb_tpu.models.vision.modalities import AudioProcessor

    proc = AudioProcessor()
    wav = np.sin(np.linspace(0, 4000 * np.pi, 3 * 16000)).astype(np.float32)
    spec = proc(wav)
    tower = resolve_tower("LanguageBind/LanguageBind_Audio")
    h, w = tower.config.image_size_hw
    assert spec.shape[-2:] == (h, w)
