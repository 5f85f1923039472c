"""ViT-family tower parity vs HF transformers (ViT / ViT-MAE / ViViT /
VideoMAE), random weights, tiny configs."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.models.vision.vit import (
    ViTFamilyConfig,
    convert_vit_state_dict,
    vit_encode,
)

DIMS = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64)


def _check(hf_model, cfg, pixels_torch, pixels_jax, rtol=2e-4, **hf_kwargs):
    with torch.no_grad():
        out = hf_model(pixels_torch, output_hidden_states=True, **hf_kwargs)
    ref = out.hidden_states[-2].numpy()
    params = jax.tree.map(
        lambda x: x if x is None else jnp.asarray(x),
        convert_vit_state_dict(hf_model.state_dict(), cfg),
        is_leaf=lambda x: x is None,
    )
    ours = np.asarray(vit_encode(params, jnp.asarray(pixels_jax), cfg, select_layer=-2))
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=2e-5)


def test_vit_matches_hf():
    from transformers import ViTConfig, ViTModel

    torch.manual_seed(0)
    hf = ViTModel(ViTConfig(image_size=32, patch_size=16, **DIMS),
                  add_pooling_layer=False).eval()
    cfg = ViTFamilyConfig(image_size=32, patch_size=16, **DIMS)
    px = np.random.default_rng(0).normal(size=(2, 3, 32, 32)).astype(np.float32)
    _check(hf, cfg, torch.from_numpy(px), px[:, None])


def test_vitmae_matches_hf():
    from transformers import ViTMAEConfig, ViTMAEModel

    torch.manual_seed(1)
    hf = ViTMAEModel(ViTMAEConfig(image_size=32, patch_size=16, mask_ratio=0.0,
                                  **DIMS)).eval()
    cfg = ViTFamilyConfig(image_size=32, patch_size=16, **DIMS)
    px = np.random.default_rng(1).normal(size=(2, 3, 32, 32)).astype(np.float32)
    # MAE's random_masking shuffles tokens even at mask_ratio 0; identity
    # noise keeps the natural order.
    n_patches = (32 // 16) ** 2
    noise = torch.arange(n_patches, dtype=torch.float32)[None].repeat(2, 1)
    _check(hf, cfg, torch.from_numpy(px), px[:, None], noise=noise)


def test_vivit_matches_hf():
    from transformers import VivitConfig, VivitModel

    torch.manual_seed(2)
    hf = VivitModel(
        VivitConfig(image_size=32, num_frames=4, tubelet_size=[2, 16, 16], **DIMS),
        add_pooling_layer=False).eval()
    cfg = ViTFamilyConfig(image_size=32, patch_size=16, tubelet_t=2,
                          num_frames=4, layer_norm_eps=1e-6, **DIMS)
    px = np.random.default_rng(2).normal(size=(2, 4, 3, 32, 32)).astype(np.float32)
    _check(hf, cfg, torch.from_numpy(px), px)


def test_videomae_matches_hf():
    from transformers import VideoMAEConfig, VideoMAEModel

    torch.manual_seed(3)
    hf = VideoMAEModel(VideoMAEConfig(image_size=32, patch_size=16,
                                      num_frames=4, tubelet_size=2, **DIMS)).eval()
    cfg = ViTFamilyConfig(image_size=32, patch_size=16, tubelet_t=2,
                          num_frames=4, use_cls_token=False,
                          pos_embed="sincos", qkv_bias="qv_only", **DIMS)
    px = np.random.default_rng(3).normal(size=(2, 4, 3, 32, 32)).astype(np.float32)
    _check(hf, cfg, torch.from_numpy(px), px)
