"""LoRA adapter tests: identity at init, merge == adapted forward, lora-only
training updates."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig, ModelConfig, TrainConfig
from videollamb_tpu.models.lm.llama import embed_tokens, init_llama_params, llama_forward
from videollamb_tpu.models.lm.lora import add_lora_params, merge_lora_params

CFG = LlamaConfig.tiny()


@pytest.fixture(scope="module")
def base_params():
    return {"lm": init_llama_params(jax.random.PRNGKey(0), CFG)}


def _logits(params, ids):
    embeds = embed_tokens(params["lm"], ids)
    return llama_forward(params["lm"], CFG, embeds, jnp.ones(ids.shape, jnp.int32))


def test_lora_identity_at_init(base_params):
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 200, size=(1, 12)))
    ref = _logits(base_params, ids)
    lora = add_lora_params(base_params, CFG, r=4, alpha=8,
                           rng=jax.random.PRNGKey(1))
    out = _logits(lora, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_lora_merge_matches_adapted_forward(base_params):
    ids = jnp.asarray(np.random.default_rng(1).integers(4, 200, size=(1, 12)))
    lora = add_lora_params(base_params, CFG, r=4, alpha=8,
                           rng=jax.random.PRNGKey(1))
    # Perturb B so the adapters do something.
    layers = lora["lm"]["layers"]
    for name in ("q_proj", "down_proj"):
        layers[f"{name}_lora_b"] = (
            jax.random.normal(jax.random.PRNGKey(2), layers[f"{name}_lora_b"].shape) * 0.05
        )
    adapted = _logits(lora, ids)
    merged = merge_lora_params(lora)
    assert not any("_lora_" in k for k in merged["lm"]["layers"])
    out = _logits(merged, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(adapted), rtol=2e-4, atol=2e-4)
    # And it differs from the base model.
    base = _logits(base_params, ids)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-3


def test_lora_training_only_updates_adapters(base_params):
    from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.train.step import create_optimizer, create_train_state, make_train_step

    mcfg = ModelConfig.tiny(max_length=128)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {
        "video_tower": init_vision_params(k1, mcfg.vision),
        "mm_projector": init_rmt_r_params(k2, mcfg.bridge, mcfg.lm.hidden_size),
        "lm": base_params["lm"],
    }
    params = add_lora_params(params, mcfg.lm, r=4, alpha=8,
                             rng=jax.random.PRNGKey(4))
    tcfg = TrainConfig(tune_mode="lora", warmup_ratio=0.0)
    tx = create_optimizer(tcfg, total_steps=10, params=params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(mcfg, tx, remat=False, attn_impl="xla"))

    rng = np.random.default_rng(0)
    ids = rng.integers(4, mcfg.lm.vocab_size, size=(1, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 10), jnp.int32),
        labels=jnp.asarray(np.where(np.ones((1, 10), bool), ids, IGNORE_INDEX)),
        videos=jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    state1, metrics = step(state, batch, jax.random.PRNGKey(0))
    state1, metrics = step(state1, batch, jax.random.PRNGKey(0))  # warmup LR=0 at step 0
    assert np.isfinite(float(metrics["loss"]))
    # Base kernel frozen; adapter B updated (grad flows since A != 0).
    np.testing.assert_array_equal(
        np.asarray(params["lm"]["layers"]["q_proj"]),
        np.asarray(state1.params["lm"]["layers"]["q_proj"]),
    )
    db = np.abs(np.asarray(params["lm"]["layers"]["q_proj_lora_b"])
                - np.asarray(state1.params["lm"]["layers"]["q_proj_lora_b"]))
    assert db.max() > 0
    # Projector also trains in LoRA mode (reference recipe).
    dp = np.abs(
        np.asarray(params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
        - np.asarray(state1.params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    )
    assert dp.max() > 0


def test_lora_params_shard_on_mesh(base_params):
    from videollamb_tpu.parallel import create_mesh, shard_params

    params = add_lora_params(
        {"lm": base_params["lm"]}, CFG, r=4, alpha=8, rng=jax.random.PRNGKey(1))
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 200, size=(1, 12)))
    ref = _logits(params, ids)
    out = _logits(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_qlora_int8_base_training(base_params):
    """QLoRA: LoRA adapters on an int8-quantized frozen base train through
    the full step (trainable_mask stops gradients into the int8 leaves)."""
    from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.train.step import (
        create_optimizer, create_train_state, make_train_step, trainable_mask,
    )

    mcfg = ModelConfig.tiny(max_length=128)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    lm = jax.tree.map(jnp.copy, base_params["lm"])
    params = {
        "video_tower": init_vision_params(k1, mcfg.vision),
        "mm_projector": init_rmt_r_params(k2, mcfg.bridge, mcfg.lm.hidden_size),
        "lm": quantize_llama_params(lm),
    }
    params = add_lora_params(params, mcfg.lm, r=4, alpha=8,
                             rng=jax.random.PRNGKey(6))
    tcfg = TrainConfig(tune_mode="lora", warmup_ratio=0.0)
    tx = create_optimizer(tcfg, total_steps=10, params=params)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(mcfg, tx, remat=False, attn_impl="xla",
                                   mask=trainable_mask(tcfg, params)))

    rng = np.random.default_rng(0)
    ids = rng.integers(4, mcfg.lm.vocab_size, size=(1, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 10), jnp.int32),
        labels=jnp.asarray(np.where(np.ones((1, 10), bool), ids, IGNORE_INDEX)),
        videos=jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    state, m = step(state, batch, jax.random.PRNGKey(0))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # int8 base untouched; adapters moved.
    np.testing.assert_array_equal(
        np.asarray(params["lm"]["layers"]["q_proj"]["q"]),
        np.asarray(state.params["lm"]["layers"]["q_proj"]["q"]))
    db = np.abs(np.asarray(params["lm"]["layers"]["q_proj_lora_b"])
                - np.asarray(state.params["lm"]["layers"]["q_proj_lora_b"]))
    assert db.max() > 0
