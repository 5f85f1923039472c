"""Projector family tests: golden parity vs reference modules where they run
(rmt_transformer, cap), plus shape/behavior tests for the rest."""

import types

import numpy as np
import pytest

import conftest as _c

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig
from videollamb_tpu.models.bridge.builder import bridge_apply, init_bridge_params
from videollamb_tpu.models.bridge.convert import convert_rmt_r_state_dict
from videollamb_tpu.models.bridge import variants as v

LM_D = 48


def _ref_config(d=32, heads=4, inter=64):
    return types.SimpleNamespace(
        mm_hidden_size=d, mm_num_attention_heads=heads,
        mm_intermediate_size=inter, mm_hidden_act="gelu",
        mm_layer_norm_eps=1e-12, mm_hidden_dropout_prob=0.0,
        mm_attention_probs_dropout_prob=0.0, hidden_size=LM_D,
    )


def _bridge_cfg(**kw):
    base = dict(hidden_size=32, num_attention_heads=4, intermediate_size=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                num_memory_tokens=32, pool_h=2, pool_w=2)
    base.update(kw)
    return BridgeConfig(**base)


def _features(t, n=17, d=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(t, n, d)).astype(np.float32)


def test_rmt_transformer_matches_reference():
    ref_mod = _c.import_reference_submodule(
        "llava/model/multimodal_projector", "ref_projector_pkg",
        "rmt_transformer_projector",
    )
    torch.manual_seed(0)
    ref = ref_mod.RMTTransformerProjector(_ref_config(), depth=1).eval()
    ref.h = ref.w = 2
    ref.pooler = torch.nn.AdaptiveAvgPool2d((2, 2))
    sd = ref.state_dict()
    params = {"projector": convert_rmt_r_state_dict(sd)["projector"]}
    params = jax.tree.map(jnp.asarray, params)

    cfg = _bridge_cfg(kind="rmt_transformer")
    feats = _features(32, seed=1)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(feats[None]))
    tokens, mask = v.rmt_video_forward(params, cfg, jnp.asarray(feats))
    ours = np.asarray(tokens)[np.asarray(mask)]
    np.testing.assert_allclose(ours, ref_out[0].numpy(), rtol=2e-4, atol=2e-5)


def test_rmt_r_cap_matches_reference():
    ref_mod = _c.import_reference_submodule(
        "llava/model/multimodal_projector", "ref_projector_pkg",
        "rmt_r_transformer_cap_projector",
    )
    torch.manual_seed(1)
    ref = ref_mod.RMTRTransformerProjector(_ref_config(), depth=1).eval()
    params = jax.tree.map(jnp.asarray, convert_rmt_r_state_dict(ref.state_dict()))

    # The cap projector uses 128 memory tokens (cap_projector.py:197).
    cfg = _bridge_cfg(kind="rmt_r_transformer_cap", num_memory_tokens=128)
    feats = _features(32, n=5, seed=2)  # 4 patches + CLS
    with torch.no_grad():
        ref_all = ref(torch.from_numpy(feats[None]))
    all_tokens, all_masks = v.rmt_r_cap_video_forward(
        params, cfg, jnp.asarray(feats), topk=7, max_frames=4,
    )
    assert len(ref_all) == all_tokens.shape[0]
    for s, ref_seg in enumerate(ref_all):
        seg = np.asarray(all_tokens[s])[np.asarray(all_masks[s])]
        np.testing.assert_allclose(seg, ref_seg[0].numpy(), rtol=2e-4, atol=2e-5)


def test_linear_and_mlp_match_torch():
    cfg = _bridge_cfg(kind="mlp", mlp_depth=2)
    params = init_bridge_params(jax.random.PRNGKey(0), cfg, LM_D)
    x = _features(4)
    # Torch oracle built from the same weights.
    lin1 = torch.nn.Linear(32, LM_D)
    lin2 = torch.nn.Linear(LM_D, LM_D)
    with torch.no_grad():
        lin1.weight.copy_(torch.from_numpy(np.asarray(params["layers"][0]["kernel"]).T))
        lin1.bias.copy_(torch.from_numpy(np.asarray(params["layers"][0]["bias"])))
        lin2.weight.copy_(torch.from_numpy(np.asarray(params["layers"][1]["kernel"]).T))
        lin2.bias.copy_(torch.from_numpy(np.asarray(params["layers"][1]["bias"])))
        ref = lin2(torch.nn.functional.gelu(lin1(torch.from_numpy(x)))).numpy()
    tokens, mask = bridge_apply(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(tokens).reshape(ref.shape), ref, rtol=2e-5, atol=2e-6
    )
    assert bool(mask.all())


@pytest.mark.parametrize("kind,extra", [
    ("transformer", {}),
    ("mlp_transformer", {}),
    ("qformer", {"qformer_layers": 2, "qformer_queries": 8}),
])
def test_variant_shapes(kind, extra):
    cfg = _bridge_cfg(kind=kind, **extra)
    params = init_bridge_params(jax.random.PRNGKey(0), cfg, LM_D)
    feats = jnp.asarray(_features(8))
    tokens, mask = bridge_apply(params, cfg, feats)
    assert tokens.shape[-1] == LM_D
    assert mask.shape == tokens.shape[:-1]
    assert np.isfinite(np.asarray(tokens)).all()
    if kind == "transformer":
        assert tokens.shape[0] == 4 * cfg.pool_h * cfg.pool_w
    if kind == "qformer":
        assert tokens.shape[0] == 8


def test_identity_and_config_roundtrip():
    for name in ["identity", "linear", "mlp2x_gelu", "transformer2x",
                 "mlp_transformer1x", "rmt_transformer1x",
                 "rmt_r_transformer1x", "qformer2_32"]:
        cfg = BridgeConfig.from_projector_type(name)
        assert cfg.projector_type == name
