"""Memory Bridge parity tests vs the reference RMTRTransformerProjector.

The reference module is imported read-only from /root/reference and run on
torch CPU in eval mode (dropout off); our lax.scan bridge must match its
outputs numerically on both image and video paths.
"""

import types

import numpy as np
import pytest

import conftest as _c

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig
from videollamb_tpu.models.bridge.convert import convert_rmt_r_state_dict
from videollamb_tpu.models.bridge.rmt_r import (
    init_rmt_r_params,
    rmt_r_image_forward,
    rmt_r_video_forward,
)

ref_mod = _c.import_reference_submodule(
    "llava/model/multimodal_projector", "ref_projector_pkg", "rmt_r_transformer_projector"
)

LM_D = 48


def _ref_config(d=32, heads=4, inter=64):
    return types.SimpleNamespace(
        mm_hidden_size=d,
        mm_num_attention_heads=heads,
        mm_intermediate_size=inter,
        mm_hidden_act="gelu",
        mm_layer_norm_eps=1e-12,
        mm_hidden_dropout_prob=0.0,
        mm_attention_probs_dropout_prob=0.0,
        hidden_size=LM_D,
    )


def _bridge_cfg(d=32, heads=4, inter=64, pool=2):
    return BridgeConfig(
        hidden_size=d, num_attention_heads=heads, intermediate_size=inter,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_memory_tokens=32, pool_h=pool, pool_w=pool,
    )


@pytest.fixture(scope="module")
def ref_and_params():
    torch.manual_seed(0)
    ref = ref_mod.RMTRTransformerProjector(_ref_config(), depth=1).eval()
    # Override pooling grid for the tiny test (reference hard-codes 12x12).
    ref.h = ref.w = 2
    ref.pooler = torch.nn.AdaptiveAvgPool2d((2, 2))
    params = convert_rmt_r_state_dict(ref.state_dict())
    params = jax.tree.map(jnp.asarray, params)
    return ref, params


def _features(t, n=17, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(t, n, d)).astype(np.float32)


@pytest.mark.parametrize("t,seed", [(16, 0), (16, 3), (32, 1), (64, 2)])
def test_video_forward_matches_reference(ref_and_params, t, seed):
    ref, params = ref_and_params
    cfg = _bridge_cfg()
    feats = _features(t, seed=seed)

    with torch.no_grad():
        ref_last, ref_all = ref(torch.from_numpy(feats[None]))  # (1, t, n, d)

    out = jax.jit(
        lambda p, f: rmt_r_video_forward(p, cfg, f)
    )(params, jnp.asarray(feats))

    # Final-segment tokens: reference returns the ragged (1, nf*P, lm_d); we
    # return the padded (F*P, lm_d) + mask.
    ref_np = ref_last[0].numpy()
    ours = np.asarray(out.tokens)[np.asarray(out.token_mask)]
    assert ours.shape == ref_np.shape
    np.testing.assert_allclose(ours, ref_np, rtol=2e-4, atol=2e-5)

    # Per-segment hiddens (retro training path).
    assert len(ref_all) == out.all_tokens.shape[0]
    for s, ref_seg in enumerate(ref_all):
        seg = np.asarray(out.all_tokens[s])[np.asarray(out.all_masks[s])]
        np.testing.assert_allclose(seg, ref_seg[0].numpy(), rtol=2e-4, atol=2e-5)


def test_image_forward_matches_reference(ref_and_params):
    ref, params = ref_and_params
    cfg = _bridge_cfg()
    feats = _features(1, seed=5)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feats[None]))  # t==1 -> single tensor

    ours, _mem = jax.jit(
        lambda p, f: rmt_r_image_forward(p, cfg, f)
    )(params, jnp.asarray(feats))
    np.testing.assert_allclose(
        np.asarray(ours[0]), ref_out[0].numpy(), rtol=2e-4, atol=2e-5
    )


def test_video_forward_jit_static_across_lengths(ref_and_params):
    """One compiled graph per (t,) shape; output shapes are fully static."""
    _, params = ref_and_params
    cfg = _bridge_cfg()
    out = rmt_r_video_forward(params, cfg, jnp.asarray(_features(16)))
    s, fp = cfg.max_segments, cfg.tokens_per_segment
    assert out.tokens.shape == (fp, LM_D)
    assert out.all_tokens.shape == (s, fp, LM_D)
    assert out.memory.shape == (cfg.num_memory_tokens, cfg.hidden_size)


def test_init_params_tree_matches_converted_tree(ref_and_params):
    _, converted = ref_and_params
    cfg = _bridge_cfg()
    ours = init_rmt_r_params(jax.random.PRNGKey(0), cfg, LM_D)
    ref_tree = jax.tree.structure(converted)
    our_tree = jax.tree.structure(ours)
    assert ref_tree == our_tree
