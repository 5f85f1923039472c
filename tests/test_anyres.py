"""Anyres multi-patch merge vs a numpy restatement of the reference
semantics (llava/model/llava_arch.py:279-319 'spatial'/'spatial_unpad'
merge, llava_arch.py:222-250 unpad_image), plus end-to-end assembly through
the K-sentinel splice.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.mm_utils import unpad_image
from videollamb_tpu.models.anyres import anyres_max_tokens, anyres_merge, anyres_spec


def _np_anyres_merge(patch_tokens, image_size, nph, npw, newline, h, merge_type):
    """Faithful numpy restatement of the reference torch merge."""
    d = patch_tokens.shape[-1]
    if merge_type == "flat":  # llava_arch.py:283
        return patch_tokens.reshape(-1, d)
    base = patch_tokens[0]
    feat = patch_tokens[1 : 1 + nph * npw].reshape(nph, npw, h, h, d)
    if "unpad" in merge_type:  # llava_arch.py:297-306
        grid = feat.transpose(4, 0, 2, 1, 3).reshape(d, nph * h, npw * h)
        grid = unpad_image(grid, image_size)
        nl = np.tile(newline[:, None, None], (1, grid.shape[1], 1))
        grid = np.concatenate([grid, nl], axis=2)
        feat = grid.reshape(d, -1).T
    else:  # 'spatial', llava_arch.py:307-309
        feat = feat.transpose(0, 2, 1, 3, 4).reshape(-1, d)
    return np.concatenate([base, feat], axis=0)


PINPOINTS = ((336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008))


@pytest.mark.parametrize("merge_type", ["spatial_unpad", "spatial", "flat"])
@pytest.mark.parametrize(
    "image_size",
    [(800, 1100), (1100, 500), (700, 680), (336, 1400), (250, 90), (90, 250)],
)
def test_anyres_merge_matches_reference_semantics(merge_type, image_size):
    rng = np.random.default_rng(0)
    h = 4  # patches_per_side
    vis_size = 336
    spec = anyres_spec(image_size, PINPOINTS, vis_size, h)
    nph, npw = int(spec[0]), int(spec[1])

    p = 1 + nph * npw
    d = 5
    tokens = rng.normal(size=(p, h * h, d)).astype(np.float32)
    newline = rng.normal(size=(d,)).astype(np.float32)

    ref = _np_anyres_merge(tokens, image_size, nph, npw, newline, h, merge_type)
    out, mask = anyres_merge(
        jnp.asarray(tokens), jnp.asarray(spec), jnp.asarray(newline), h, merge_type
    )
    out, mask = np.asarray(out), np.asarray(mask)
    n = int(mask.sum())
    assert n == ref.shape[0]
    assert mask[:n].all() and not mask[n:].any()
    np.testing.assert_allclose(out[:n], ref, rtol=1e-6)
    assert out.shape[0] == anyres_max_tokens(p, h, merge_type)


def test_anyres_merge_static_bucket_with_spare_patches():
    """A (1,2) grid sample padded into a P=5 bucket: spare patches dropped."""
    rng = np.random.default_rng(3)
    h, d = 3, 4
    image_size = (1100, 500)
    spec = anyres_spec(image_size, PINPOINTS, 336, h)
    nph, npw = int(spec[0]), int(spec[1])
    tokens = rng.normal(size=(5, h * h, d)).astype(np.float32)
    newline = rng.normal(size=(d,)).astype(np.float32)

    ref = _np_anyres_merge(tokens, image_size, nph, npw, newline, h, "spatial_unpad")
    out, mask = anyres_merge(
        jnp.asarray(tokens), jnp.asarray(spec), jnp.asarray(newline), h, "spatial_unpad"
    )
    n = int(np.asarray(mask).sum())
    assert n == ref.shape[0]
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-6)


def test_anyres_dataset_and_collator(tmp_path):
    """Image records through SupervisedDataset(anyres) -> Collator: 5-D
    patch stacks + per-sample specs (reference train.py anyres data path +
    mm_utils.py:120-146 process_anyres_image)."""
    import json

    from PIL import Image

    from videollamb_tpu.data.processing import ImageProcessor
    from videollamb_tpu.train.dataset import Collator, DataConfig, SupervisedDataset
    from test_preprocess import WordTokenizer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    sizes = [(100, 40), (40, 100)]
    for i, (w, h) in enumerate(sizes):
        Image.new("RGB", (w, h), (i * 40, 0, 0)).save(img_dir / f"{i}.png")
    records = [
        {"image": f"{i}.png", "conversations": [
            {"from": "human", "value": "<image> what"},
            {"from": "gpt", "value": "a color"},
        ]}
        for i in range(len(sizes))
    ]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))

    pinpoints = ((56, 112), (112, 56), (112, 112))
    ds = SupervisedDataset(
        str(data_path), WordTokenizer(),
        DataConfig(image_folder=str(img_dir), model_max_length=64,
                   image_aspect_ratio="anyres", image_grid_pinpoints=pinpoints),
        image_processor=ImageProcessor(size=56),
    )
    s0 = ds[0]
    assert s0["image"].ndim == 4 and s0["image"].shape[1:] == (3, 56, 56)
    assert s0["image_size"] == sizes[0]

    coll = Collator(bucket=16, max_length=128, image_grid_pinpoints=pinpoints,
                    vision_image_size=56, patches_per_side=4)
    batch = coll([ds[0], ds[1]])
    assert batch.images.ndim == 5
    assert batch.image_specs.shape == (2, 4)
    # (100, 40) -> wide grid; (40, 100) -> tall grid.
    nph0, npw0 = batch.image_specs[0][:2]
    nph1, npw1 = batch.image_specs[1][:2]
    assert npw0 > nph0 and nph1 > npw1


def test_anyres_end_to_end_forward():
    """(B, P, C, H, W) anyres batch through tower -> mlp projector -> merge
    -> K-sentinel splice -> LM: finite logits and the expected splice
    length."""
    from videollamb_tpu.config import BridgeConfig
    from videollamb_tpu.constants import IGNORE_INDEX
    from videollamb_tpu.models.assembly import (
        MultimodalBatch,
        init_image_newline,
        videollamb_forward,
    )
    from videollamb_tpu.models.bridge.builder import init_bridge_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((56, 112), (112, 56), (112, 112)),
    )
    cfg = ModelConfig(
        vision=cfg.vision,
        bridge=BridgeConfig(kind="mlp", mlp_depth=2, hidden_size=cfg.vision.hidden_size),
        lm=cfg.lm,
        max_length=cfg.max_length,
        dtype="float32",
        mm_patch_merge_type="spatial_unpad",
        image_aspect_ratio="anyres",
        image_grid_pinpoints=cfg.image_grid_pinpoints,
    )
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
        "image_newline": init_image_newline(k4, cfg.lm.hidden_size),
    }

    rng = np.random.default_rng(0)
    b, p = 2, 3  # base + 2 grid patches
    sizes = [(100, 40), (30, 70)]  # (1,2) and (2,1) grids
    specs = np.stack([
        anyres_spec(s, cfg.image_grid_pinpoints, cfg.vision.image_size,
                    cfg.vision.num_patches_per_side)
        for s in sizes
    ])
    ids = rng.integers(4, cfg.lm.vocab_size, size=(b, 10)).astype(np.int32)
    ids[:, 1] = -200
    images = rng.normal(size=(b, p, 3, 56, 56)).astype(np.float32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((b, 10), jnp.int32),
        labels=None,
        videos=None,
        images=jnp.asarray(images),
        image_specs=jnp.asarray(specs),
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()

    hw = cfg.vision.num_patches
    side = cfg.vision.num_patches_per_side
    for i, s in enumerate(sizes):
        nph, npw, pad_r, pad_c = specs[i]
        keep_h = nph * side - 2 * pad_r
        keep_w = npw * side - 2 * pad_c
        expected_x = hw + keep_h * (keep_w + 1)
        assert int(spliced.lengths[i]) == 10 - 1 + expected_x
    assert np.asarray(spliced.labels[0] == IGNORE_INDEX).any()
