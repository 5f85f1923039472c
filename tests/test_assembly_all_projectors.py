"""Full forward through assembly for EVERY projector kind (video + image)."""

import dataclasses

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig, ModelConfig
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch, causal_lm_loss, videollamb_forward
from videollamb_tpu.models.bridge.builder import init_bridge_params

# spatial_pool is a resampler (tower-dim output, like the reference's
# SpatialPool which the factory never wires as a projector) — it can't feed
# the LM directly, so it's covered in test_projector_variants instead.
KINDS = ["linear", "mlp", "transformer", "mlp_transformer",
         "rmt_transformer", "rmt_r_transformer", "qformer", "retention"]


def _model(kind):
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    base = ModelConfig.tiny()
    bridge = dataclasses.replace(
        base.bridge, kind=kind, num_memory_tokens=8,
        qformer_layers=1, qformer_queries=8,
    )
    cfg = dataclasses.replace(base, bridge=bridge)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


@pytest.mark.parametrize("kind", KINDS)
def test_forward_all_kinds_video_and_image(kind):
    cfg, params = _model(kind)
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=jnp.asarray(np.where(np.ones((2, 10), bool), ids, IGNORE_INDEX)),
        videos=jnp.asarray(rng.normal(size=(2, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    loss, n = causal_lm_loss(logits, spliced.labels)
    assert np.isfinite(float(loss)) and int(n) > 0

    ids2 = ids.copy()
    ids2[:, 2] = -200
    batch_img = MultimodalBatch(
        input_ids=jnp.asarray(ids2),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=None,
        videos=None,
        images=jnp.asarray(rng.normal(size=(2, 3, 56, 56)).astype(np.float32)),
    )
    logits2, spliced2 = videollamb_forward(params, cfg, batch_img)
    assert np.isfinite(np.asarray(logits2)).all()
    assert int(spliced2.lengths[0]) > 9
