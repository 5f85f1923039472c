"""EgoVLP SpaceTimeTransformer vs a faithful numpy restatement of the
reference math (video_transformer.py:86-229; the vendored module cannot
import here — hard timm dependency + cwd-relative yaml read)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.models.vision.egovlp import (
    EgoVLPConfig,
    egovlp_encode,
    init_egovlp_params,
)


def _np_ln(p, x, eps):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def _np_linear(p, x):
    return x @ np.asarray(p["kernel"]) + np.asarray(p["bias"])


def _np_attn(q, k, v):
    s = q @ k.transpose(0, 2, 1)
    s = s - s.max(-1, keepdims=True)
    e = np.exp(s)
    p = e / e.sum(-1, keepdims=True)
    return p @ v


def _np_var_attention(p, x, cfg, mode, f):
    """Restates VarAttention.forward (:117-153): CLS attends globally;
    patch q/k/v regrouped by time or space with CLS k/v prepended."""
    b, tot, d = x.shape
    h, e = cfg.num_attention_heads, cfg.head_dim
    n = (tot - 1) // f
    qkv = _np_linear(p["qkv"], x)
    q, k, v = np.split(qkv, 3, axis=-1)

    def hf(t):  # 'b n (h d) -> (b h) n d'
        return t.reshape(b, tot, h, e).transpose(0, 2, 1, 3).reshape(b * h, tot, e)

    q, k, v = hf(q) * (e**-0.5), hf(k), hf(v)
    cls_q, q_ = q[:, :1], q[:, 1:]
    cls_k, k_ = k[:, :1], k[:, 1:]
    cls_v, v_ = v[:, :1], v[:, 1:]
    cls_out = _np_attn(cls_q, k, v)

    if mode == "time":  # '(b h) (f n) d -> (b h n) f d'
        def g(t):
            return t.reshape(b * h, f, n, e).transpose(0, 2, 1, 3).reshape(b * h * n, f, e)

        def ug(t):
            return t.reshape(b * h, n, f, e).transpose(0, 2, 1, 3).reshape(b * h, f * n, e)

        r = n
    else:
        def g(t):
            return t.reshape(b * h * f, n, e)

        def ug(t):
            return t.reshape(b * h, f * n, e)

        r = f
    qg, kg, vg = g(q_), g(k_), g(v_)
    kg = np.concatenate([np.repeat(cls_k, r, axis=0), kg], axis=1)
    vg = np.concatenate([np.repeat(cls_v, r, axis=0), vg], axis=1)
    out = ug(_np_attn(qg, kg, vg))
    out = np.concatenate([cls_out, out], axis=1)
    out = out.reshape(b, h, tot, e).transpose(0, 2, 1, 3).reshape(b, tot, d)
    return _np_linear(p["proj"], out)


def _gelu(x):
    import math

    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / np.sqrt(2.0)))


def _np_forward(params, pixels, cfg):
    b, f, c, hh, ww = pixels.shape
    ps = cfg.patch_size
    gh, gw = hh // ps, ww // ps
    n = gh * gw
    x = pixels.reshape(b * f, c, gh, ps, gw, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * f, n, c * ps * ps)
    x = x @ np.asarray(params["patch_embed"]["kernel"]) + np.asarray(params["patch_embed"]["bias"])
    x = x.reshape(b, f * n, cfg.hidden_size)
    cls = np.broadcast_to(np.asarray(params["cls_token"])[None, None], (b, 1, cfg.hidden_size))
    x = np.concatenate([cls, x], axis=1)

    pos = np.asarray(params["pos_embed"])
    temb = np.asarray(params["temporal_embed"])
    tile_pos = np.tile(pos[1:], (cfg.num_frames, 1))
    tile_temb = np.repeat(temb, n, axis=0)
    total = np.concatenate([pos[:1], tile_pos + tile_temb], axis=0)
    x = x + total[: x.shape[1]][None]

    eps = cfg.layer_norm_eps
    for p in params["blocks"]:
        time_out = _np_var_attention(p["timeattn"], _np_ln(p["norm3"], x, eps), cfg, "time", f)
        time_res = x + time_out
        space_out = _np_var_attention(p["attn"], _np_ln(p["norm1"], time_res, eps), cfg, "space", f)
        space_res = x + space_out
        h = _np_ln(p["norm2"], space_res, eps)
        h = _gelu(_np_linear(p["mlp"]["fc1"], h))
        x = space_res + _np_linear(p["mlp"]["fc2"], h)
    return _np_ln(params["norm"], x, eps)


@pytest.mark.parametrize("b,f", [(2, 3), (1, 1)])
def test_egovlp_matches_numpy_restatement(b, f):
    cfg = EgoVLPConfig(hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
                       mlp_ratio=2.0, image_size=32, patch_size=16, num_frames=4)
    params = init_egovlp_params(jax.random.PRNGKey(0), cfg)
    # Perturb the zero-init time attention so the time path is exercised.
    for blk in params["blocks"]:
        blk["timeattn"]["qkv"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(1), blk["timeattn"]["qkv"]["kernel"].shape) * 0.02
        )
        blk["timeattn"]["proj"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(2), blk["timeattn"]["proj"]["kernel"].shape) * 0.02
        )
    pixels = jax.random.normal(jax.random.PRNGKey(3), (b, f, 3, 32, 32))
    out = egovlp_encode(params, pixels, cfg)
    ref = _np_forward(jax.tree.map(np.asarray, params), np.asarray(pixels), cfg)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_egovlp_zero_time_init_reduces_to_frame_vit():
    """With the 'zeros' time init, the time-attention branch contributes a
    CONSTANT shift per group (softmax of zeros averages v=0 -> proj bias),
    i.e. the model starts as a spatial ViT (time_init rationale, :97-101)."""
    cfg = EgoVLPConfig(hidden_size=24, num_hidden_layers=1, num_attention_heads=4,
                       mlp_ratio=2.0, image_size=32, patch_size=16, num_frames=2)
    params = init_egovlp_params(jax.random.PRNGKey(0), cfg)
    pixels = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 3, 32, 32))
    out = egovlp_encode(params, pixels, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_egovlp_factory_dispatch():
    from videollamb_tpu.models.vision.builder import resolve_tower

    spec = resolve_tower("EgoVLP")
    assert spec.kind == "egovlp"
