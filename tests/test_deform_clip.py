"""DeformCLIP tower tests.

The reference's deform_clip package is abandoned non-functional code (see
models/vision/deform_clip.py docstring for the bug inventory), so there is
no end-to-end torch oracle. What IS oracle-testable is the working math it
vendors: ``multi_scale_deformable_attention`` (deform_clip_modeling.py:
286-322) is byte-identical to HF transformers' deformable-DETR helper —
our attention core is checked against that, with our projections and
sampling-location arithmetic replayed in torch around it.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from videollamb_tpu.models.vision.deform_clip import (  # noqa: E402
    DeformCLIPConfig,
    deform_clip_attention,
    deform_clip_encode,
    encoder_layer,
    init_deform_clip_params,
    reference_points,
)


def _lin_t(p, x_t):
    w = torch.from_numpy(np.asarray(p["kernel"], np.float32))
    b = torch.from_numpy(np.asarray(p["bias"], np.float32))
    return x_t @ w + b


def test_attention_core_matches_hf_msda():
    """deform_clip_attention == v_proj → HF multi_scale_deformable_attention
    (single level) → out_proj, with sampling locations built per the
    reference formula (offset / (W, H) around the reference points)."""
    from transformers.models.deformable_detr.modeling_deformable_detr import (
        MultiScaleDeformableAttention,
    )

    cfg = DeformCLIPConfig.tiny()
    gh = gw = cfg.grid
    b, s, d = 2, 1 + gh * gw, cfg.hidden_size
    h, pts, e = cfg.num_attention_heads, cfg.n_points, cfg.head_dim

    params = init_deform_clip_params(jax.random.PRNGKey(0), cfg)
    p = params["layers"][0]["self_attn"]
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, d), jnp.float32)
    refs = reference_points(gh, gw)

    ours = deform_clip_attention(p, x, refs, gh, gw, num_heads=h,
                                 n_points=pts)

    x_t = torch.from_numpy(np.asarray(x))
    value = _lin_t(p["v_proj"], x_t[:, 1:]).view(b, gh * gw, h, e)
    offsets = _lin_t(p["sampling_offsets"], x_t).view(b, s, h, 1, pts, 2)
    weights = _lin_t(p["attention_weights"], x_t).view(b, s, h, pts)
    weights = torch.softmax(weights, -1).view(b, s, h, 1, pts)
    refs_t = torch.from_numpy(np.asarray(refs))
    norm = torch.tensor([gw, gh], dtype=torch.float32)
    loc = refs_t[None, :, None, None, None, :] + offsets / norm
    shapes = torch.tensor([[gh, gw]], dtype=torch.long)
    start = torch.tensor([0], dtype=torch.long)
    with torch.no_grad():
        core = MultiScaleDeformableAttention()(
            value, shapes, [(gh, gw)], start, loc, weights, 64)
    ref = _lin_t(p["out_proj"], core).numpy()

    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5, atol=2e-5)


def test_cls_query_samples_image_center():
    """The CLS row's sampling anchors sit at (0.5, 0.5): with zeroed
    offset weights every CLS sample lands at the image center, so its
    output equals the bilinear blend of the 4 center patches for EVERY
    head — check via a constant-valued grid (blend == the constant)."""
    cfg = DeformCLIPConfig.tiny()
    gh = gw = cfg.grid
    b, s, d = 1, 1 + gh * gw, cfg.hidden_size
    params = init_deform_clip_params(jax.random.PRNGKey(2), cfg)
    p = dict(params["layers"][0]["self_attn"])
    # Zero offsets; identity-ish v/out so values are readable.
    p["sampling_offsets"] = {
        "kernel": jnp.zeros_like(p["sampling_offsets"]["kernel"]),
        "bias": jnp.zeros_like(p["sampling_offsets"]["bias"])}
    p["v_proj"] = {"kernel": jnp.eye(d), "bias": jnp.zeros((d,))}
    p["out_proj"] = {"kernel": jnp.eye(d), "bias": jnp.zeros((d,))}
    x = jnp.concatenate([
        jnp.zeros((b, 1, d)),  # CLS (not a value source)
        jnp.ones((b, gh * gw, d)) * 3.0,
    ], axis=1)
    out = deform_clip_attention(p, x, reference_points(gh, gw), gh, gw,
                                num_heads=cfg.num_attention_heads,
                                n_points=cfg.n_points)
    np.testing.assert_allclose(np.asarray(out[0, 0]), 3.0, rtol=1e-5)


def test_encode_shapes_and_select_layer():
    cfg = DeformCLIPConfig.tiny()
    params = init_deform_clip_params(jax.random.PRNGKey(3), cfg)
    pix = jax.random.normal(jax.random.PRNGKey(4),
                            (2, 3, cfg.image_size, cfg.image_size))
    out = deform_clip_encode(params, pix, cfg)  # select -2 => 2 layers
    assert out.shape == (2, 1 + cfg.grid ** 2, cfg.hidden_size)
    # select -2 must equal running exactly num_layers-1 layers by hand.
    from videollamb_tpu.models.vision.clip_vit import _embed
    from videollamb_tpu.models.vision.deform_clip import _ln

    x = _embed(params["embeddings"], pix, cfg)
    x = _ln(params["pre_layrnorm"], x, cfg.layer_norm_eps)
    refs = reference_points(cfg.grid, cfg.grid)
    for li in range(cfg.num_hidden_layers - 1):
        x = encoder_layer(params["layers"][li], cfg, x, refs, cfg.grid,
                          cfg.grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5,
                               atol=1e-5)


def test_grads_flow():
    cfg = DeformCLIPConfig.tiny()
    params = init_deform_clip_params(jax.random.PRNGKey(5), cfg)
    pix = jax.random.normal(jax.random.PRNGKey(6),
                            (1, 3, cfg.image_size, cfg.image_size))

    def loss(p):
        return jnp.sum(deform_clip_encode(p, pix, cfg) ** 2)

    g = jax.grad(loss)(params)
    off = g["layers"][0]["self_attn"]["sampling_offsets"]["kernel"]
    assert bool(jnp.all(jnp.isfinite(off)))
    assert float(jnp.abs(off).sum()) > 0.0


def test_factory_dispatch():
    from videollamb_tpu.models.vision.builder import (
        build_image_tower,
        resolve_tower,
        tower_encode,
    )

    assert resolve_tower("deform_clip-vit-large").kind == "deform_clip"
    # Plain deformable names still route to the DETR tower.
    assert resolve_tower("deformable-detr").kind == "deformable"

    spec, params = build_image_tower("deform_clip-tiny")
    # Swap in the tiny config for the smoke encode.
    cfg = DeformCLIPConfig.tiny()
    spec = type(spec)(kind=spec.kind, config=cfg, frame_wise=True)
    params = init_deform_clip_params(jax.random.PRNGKey(7), cfg)
    pix = jax.random.normal(jax.random.PRNGKey(8),
                            (1, 2, 3, cfg.image_size, cfg.image_size))
    out = tower_encode(spec, params, pix)
    assert out.shape == (1, 2, 1 + cfg.grid ** 2, cfg.hidden_size)
