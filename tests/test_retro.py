"""RMT-loss (retro) path tests: per-segment logits match per-segment
single-splice forwards; gradients flow through the memory recurrence."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch, encode_videos_retro
from videollamb_tpu.models.lm.llama import embed_tokens, llama_forward
from videollamb_tpu.models.splice import splice_multimodal
from videollamb_tpu.train.retro import retro_loss, videollamb_retro_forward


@pytest.fixture(scope="module")
def tiny():
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    # max_length bounds every per-segment graph (logits are (1, S*max_len,
    # V)); 128 keeps the retro compiles ~4x smaller than the 512 default.
    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 10), jnp.int32),
        labels=jnp.asarray(ids),
        videos=jnp.asarray(rng.normal(size=(1, 16, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    return cfg, params, batch


def test_retro_logits_match_per_segment_forwards(tiny):
    cfg, params, batch = tiny
    logits, labels = videollamb_retro_forward(params, cfg, batch)
    s = cfg.bridge.max_segments
    l = cfg.max_length
    assert logits.shape == (1, s * l, cfg.lm.vocab_size)

    # Oracle: splice + forward each segment independently.
    all_tokens, all_masks = encode_videos_retro(params, cfg, batch.videos)
    text_embeds = embed_tokens(params["lm"], batch.input_ids)
    for seg in range(s):
        spliced = splice_multimodal(
            batch.input_ids, batch.attention_mask, batch.labels,
            text_embeds, all_tokens[:, seg], all_masks[:, seg], cfg.max_length,
        )
        ref = llama_forward(params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask)
        got = logits[:, seg * l: (seg + 1) * l]
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
        np.testing.assert_array_equal(
            np.asarray(labels[:, seg * l: (seg + 1) * l]), np.asarray(spliced.labels)
        )


def test_retro_lm_memory_variant(tiny):
    from videollamb_tpu.train.retro import init_lm_memory, videollamb_retro_lm_forward
    from videollamb_tpu.models.assembly import causal_lm_loss

    cfg, params, batch = tiny
    params = dict(params)
    params["lm_memory"] = init_lm_memory(jax.random.PRNGKey(7), cfg, num_mem_tokens=4)
    logits, labels = videollamb_retro_lm_forward(params, cfg, batch)
    s, l = cfg.bridge.max_segments, cfg.max_length
    assert logits.shape == (1, s * l, cfg.lm.vocab_size)
    assert labels.shape == (1, s * l)

    def loss_fn(p):
        lg, lb = videollamb_retro_lm_forward(p, cfg, batch, attn_impl="xla")
        return causal_lm_loss(lg, lb)[0]

    grads = jax.grad(loss_fn)(params)
    # The LM memory parameter receives gradient through the first hand-off.
    assert float(jnp.abs(grads["lm_memory"]).max()) > 0


def test_retro_loss_grads_flow_to_bridge_and_lm(tiny):
    cfg, params, batch = tiny

    def loss_fn(p):
        loss, _ = retro_loss(p, cfg, batch, deterministic=True, remat=False,
                             attn_impl="xla")
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g_bridge = grads["mm_projector"]["projector"]["layers"][0]["selfattention"]["q_proj"]["kernel"]
    g_retr = grads["mm_projector"]["retrieval"]["layers"][0]["crossattention"]["q_proj"]["kernel"]
    assert float(jnp.abs(g_bridge).max()) > 0
    assert float(jnp.abs(g_retr).max()) > 0  # retrieval in the grad path


def test_trainer_step_with_rmt_loss(tiny):
    """make_train_step(rmt_loss=True) trains through the retro path."""
    from videollamb_tpu.config import TrainConfig
    from videollamb_tpu.train.step import create_optimizer, create_train_state, make_train_step

    cfg, params, batch = tiny
    tcfg = TrainConfig(rmt_loss=True)
    tx = create_optimizer(tcfg, 10, params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, tx, remat=False, attn_impl="xla",
                                   rmt_loss=True))
    state1, metrics = step(state, batch, jax.random.PRNGKey(0))
    state2, metrics = step(state1, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    d = np.abs(np.asarray(params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
               - np.asarray(state2.params["mm_projector"]["projector"]["proj"]["dense"]["kernel"]))
    assert d.max() > 0
