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


# ---------------------------------------------------------------------------
# Hardened oracle (VERDICT r2 #10): parity against the VENDORED reference
# module itself, imported with a faithful timm shim.
# ---------------------------------------------------------------------------


def _import_vendored_video_transformer():
    """Import egovlp/model/video_transformer.py. Its two import blockers
    are shimmed with REAL semantics: timm.models.layers provides
    to_2tuple / trunc_normal_ (torch ships trunc_normal_) and DropPath
    (identity at p=0 / eval — the config uses drop_path_rate=0); the
    module-level yaml read is cwd-relative, so import under the
    reference root."""
    import importlib.machinery as machinery
    import os
    import sys
    import types

    torch = pytest.importorskip("torch")

    if "timm.models.layers" not in sys.modules:
        timm = types.ModuleType("timm")
        timm.__spec__ = machinery.ModuleSpec("timm", None)
        timm.__path__ = []
        models = types.ModuleType("timm.models")
        models.__spec__ = machinery.ModuleSpec("timm.models", None)
        models.__path__ = []
        layers = types.ModuleType("timm.models.layers")
        layers.__spec__ = machinery.ModuleSpec("timm.models.layers", None)
        layers.to_2tuple = lambda x: x if isinstance(x, tuple) else (x, x)
        layers.trunc_normal_ = torch.nn.init.trunc_normal_

        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):  # eval / p=0: identity
                return x

        layers.DropPath = DropPath
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    old = os.getcwd()
    os.chdir(_c.REFERENCE_ROOT)
    try:
        return _c.load_reference_module(
            "llava/model/multimodal_encoder/egovlp/model/video_transformer.py",
            "ref_egovlp_video_transformer")
    finally:
        os.chdir(old)


@pytest.mark.parametrize("b,f", [(2, 3)])
def test_egovlp_matches_vendored_module(b, f):
    """Parity chain now terminates at reference code: the vendored
    SpaceTimeTransformer's own forward_features (torch CPU, converted
    weights) vs egovlp_encode."""
    torch = pytest.importorskip("torch")
    vt = _import_vendored_video_transformer()
    from videollamb_tpu.models.vision.egovlp import convert_egovlp_state_dict

    cfg = EgoVLPConfig(hidden_size=24, num_hidden_layers=2,
                       num_attention_heads=4, image_size=16, patch_size=8,
                       num_frames=f, mlp_ratio=2.0)
    torch.manual_seed(0)
    ref = vt.SpaceTimeTransformer(
        img_size=cfg.image_size, patch_size=cfg.patch_size,
        embed_dim=cfg.hidden_size, depth=cfg.num_hidden_layers,
        num_heads=cfg.num_attention_heads, mlp_ratio=cfg.mlp_ratio,
        qkv_bias=True, num_frames=f, time_init="zeros",
    ).eval()
    # Give every parameter a non-degenerate value (several init to zeros).
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p) * 0.05)

    params = jax.tree.map(jnp.asarray, convert_egovlp_state_dict(
        {k: v for k, v in ref.state_dict().items()}, cfg))

    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(b, f, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

    # forward_features returns only the CLS row; hook the final norm to
    # capture the full token grid our encoder emits.
    captured = {}
    ref.norm.register_forward_hook(
        lambda mod, inp, out: captured.__setitem__("tokens", out))
    with torch.no_grad():
        cls_want = ref.forward_features(torch.from_numpy(pixels)).numpy()
    want = captured["tokens"].numpy()  # (B, 1 + F*N, D)

    got = np.asarray(egovlp_encode(params, jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got[:, 0], cls_want, rtol=2e-4, atol=2e-5)
