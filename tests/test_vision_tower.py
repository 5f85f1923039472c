"""Vision tower parity vs the reference LanguageBind video/image CLIP model.

Golden oracle: /root/reference/.../languagebind/video/modeling_video.py run
on torch CPU with random weights; our JAX tower must reproduce the
select-layer (-2) features exactly (within float32 tolerance).
"""

import numpy as np
import pytest

import conftest as _c

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode
from videollamb_tpu.models.vision.convert import convert_vision_state_dict

ref_cfg_mod = _c.import_reference_submodule(
    "llava/model/multimodal_encoder/languagebind/video",
    "ref_lb_video", "configuration_video",
)
ref_mod = _c.import_reference_submodule(
    "llava/model/multimodal_encoder/languagebind/video",
    "ref_lb_video", "modeling_video",
)


def _tiny_cfgs(add_time_attn=True):
    ref_cfg = ref_cfg_mod.CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        add_time_attn=add_time_attn, num_frames=8, force_patch_dropout=0.0,
    )
    # The reference targets an older transformers; modern HF CLIPAttention
    # dispatches through config._attn_implementation.
    ref_cfg._attn_implementation = "eager"
    ours = VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        add_time_attn=add_time_attn, num_frames=8,
    )
    return ref_cfg, ours


def _build(add_time_attn=True, seed=0):
    torch.manual_seed(seed)
    ref_cfg, cfg = _tiny_cfgs(add_time_attn)
    ref = ref_mod.CLIPVisionTransformer(ref_cfg).eval()
    sd = {f"vision_model.{k}": v for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_vision_state_dict(sd))
    return ref, cfg, params


@pytest.mark.parametrize("b,t", [(1, 8), (1, 16), (2, 8)])
def test_video_tower_matches_reference(b, t):
    ref, cfg, params = _build(add_time_attn=True)
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(b, 3, t, 28, 28)).astype(np.float32)  # (b,c,t,h,w)

    with torch.no_grad():
        out = ref(torch.from_numpy(pixels), output_hidden_states=True, return_dict=True)
    ref_feats = out.hidden_states[-2].numpy()  # (b, t, n, c)

    ours = vision_encode(
        params, jnp.asarray(pixels.transpose(0, 2, 1, 3, 4)), cfg, select_layer=-2
    )
    np.testing.assert_allclose(np.asarray(ours), ref_feats, rtol=2e-4, atol=2e-5)


def test_image_tower_matches_reference():
    ref, cfg, params = _build(add_time_attn=False)
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(3, 3, 28, 28)).astype(np.float32)  # (b,c,h,w)

    with torch.no_grad():
        out = ref(torch.from_numpy(pixels), output_hidden_states=True, return_dict=True)
    ref_feats = out.hidden_states[-2].numpy()  # (b, 1, n, c) after reshape

    ours = vision_encode(params, jnp.asarray(pixels[:, None]), cfg, select_layer=-2)
    np.testing.assert_allclose(np.asarray(ours), ref_feats, rtol=2e-4, atol=2e-5)


def test_init_matches_converted_tree():
    _, cfg, converted = _build(add_time_attn=True)
    ours = init_vision_params(jax.random.PRNGKey(0), cfg)
    assert jax.tree.structure(ours) == jax.tree.structure(converted)


def test_select_layer_minus_two_skips_last_layer():
    """-2 must run L-1 layers (hidden_states[-2] == output of layer L-1)."""
    _, cfg, params = _build(add_time_attn=True)
    pixels = jnp.zeros((1, 8, 3, 28, 28))
    a = vision_encode(params, pixels, cfg, select_layer=-2)
    params_trunc = dict(params)
    params_trunc["layers"] = params["layers"][:1]
    b = vision_encode(params_trunc, pixels, cfg, select_layer=-1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
