"""Sequence-parallel Llama forward: logits and GRADS equal the
single-device forward with the sequence sharded over a 'seq' mesh."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import init_llama_params, llama_forward
from videollamb_tpu.parallel.ring_attention import create_seq_mesh
from videollamb_tpu.parallel.seq_parallel import seq_parallel_llama_forward


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_hidden_layers=2)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("shards", [4, 8])
def test_seq_parallel_forward_matches(model, shards):
    cfg, params = model
    b, s = 2, 16
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    mask[1, 13:] = 0  # ragged row: padded keys masked across shards
    mask = jnp.asarray(mask)

    ref = llama_forward(params, cfg, embeds, mask)
    mesh = create_seq_mesh(shards)
    out = seq_parallel_llama_forward(mesh, params, cfg, embeds, mask)
    # Padded-query rows differ (ref masks them differently); compare valid.
    valid = np.asarray(mask).astype(bool)
    np.testing.assert_allclose(
        np.asarray(out)[valid], np.asarray(ref)[valid], rtol=2e-5, atol=2e-5)


def test_seq_parallel_gradients_match(model):
    """Reverse-mode AD through the per-layer ppermute rings — the grads a
    seq-parallel TRAINING step would use."""
    cfg, params = model
    b, s = 2, 8
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)), jnp.int32)

    def ce(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    g_ref = jax.grad(lambda p: ce(llama_forward(p, cfg, embeds, mask)))(params)
    mesh = create_seq_mesh(4)
    g_sp = jax.grad(lambda p: ce(
        seq_parallel_llama_forward(mesh, p, cfg, embeds, mask, remat=True)))(params)

    for key in g_ref["layers"]:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(g_sp["layers"][key])),
            np.asarray(g_ref["layers"][key]), rtol=3e-4, atol=3e-5,
            err_msg=key)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(g_sp["lm_head"])),
        np.asarray(g_ref["lm_head"]), rtol=3e-4, atol=3e-5)


def test_seq_parallel_train_step_matches_unsharded(model):
    import optax

    from videollamb_tpu.constants import IGNORE_INDEX
    from videollamb_tpu.models.assembly import causal_lm_loss
    from videollamb_tpu.parallel.seq_parallel import make_seq_parallel_train_step
    from videollamb_tpu.train.step import TrainState

    cfg, params0 = model
    b, s = 2, 8
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    labels = np.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)), np.int32)
    labels[0, :2] = IGNORE_INDEX
    labels = jnp.asarray(labels)

    tx = optax.adamw(1e-2)

    def ref_loss(p):
        return causal_lm_loss(llama_forward(p, cfg, embeds, mask), labels)

    (ref_l, _), g = jax.value_and_grad(ref_loss, has_aux=True)(params0)
    upd, _ = tx.update(g, tx.init(params0), params0)
    ref_params = jax.tree.map(lambda a, u: a + u, params0, upd)

    mesh = create_seq_mesh(4)
    own = jax.tree.map(jnp.array, params0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=own,
                       opt_state=tx.init(own))
    step = make_seq_parallel_train_step(mesh, cfg, tx)
    state, metrics = step(state, embeds, mask, labels)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_l), rtol=1e-5)
    for key in ref_params["layers"]:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["layers"][key])),
            np.asarray(ref_params["layers"][key]), rtol=3e-4, atol=3e-5,
            err_msg=key)


def test_seq_parallel_with_data_axis(model):
    """('data','seq') mesh: batch over 'data', sequence over 'seq' — each
    replica runs its own ring; logits match single-device."""
    from jax.sharding import Mesh

    cfg, params = model
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    b, s = 4, 8
    rng = np.random.default_rng(5)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)

    ref = llama_forward(params, cfg, embeds, mask)
    out = seq_parallel_llama_forward(mesh, params, cfg, embeds, mask,
                                     data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # Grads through the composed mesh (psum over 'data' in backward).
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)), jnp.int32)

    def ce(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], axis=-1))

    g_ref = jax.grad(lambda p: ce(llama_forward(p, cfg, embeds, mask)))(params)
    g_sp = jax.grad(lambda p: ce(seq_parallel_llama_forward(
        mesh, p, cfg, embeds, mask, data_axis="data")))(params)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(g_sp["layers"]["q_proj"])),
        np.asarray(g_ref["layers"]["q_proj"]), rtol=3e-4, atol=3e-5)


def test_seq_parallel_videollamb_step_matches_unsharded():
    """Full multimodal train step with the spliced context seq-sharded:
    loss and updated TOWER + PROJECTOR + LM params all match the plain
    single-device step (grads flow through the shard_map into every
    module)."""
    import optax

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        MultimodalBatch,
        causal_lm_loss,
        videollamb_forward,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.parallel.seq_parallel import (
        make_seq_parallel_videollamb_step,
    )
    from videollamb_tpu.train.step import TrainState

    cfg = ModelConfig.tiny(max_length=64)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params0 = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=jnp.asarray(rng.integers(0, cfg.lm.vocab_size, size=(2, 10)), jnp.int32),
        videos=jnp.asarray(rng.normal(size=(2, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    tx = optax.adamw(1e-2)
    step_rng = jax.random.PRNGKey(7)

    def ref_loss(p):
        logits, spliced = videollamb_forward(
            p, cfg, batch, deterministic=False,
            rng=jax.random.fold_in(step_rng, 0))
        return causal_lm_loss(logits, spliced.labels)

    (ref_l, _), g_ref = jax.value_and_grad(ref_loss, has_aux=True)(params0)

    from videollamb_tpu.parallel.ring_attention import create_seq_mesh
    from videollamb_tpu.models.assembly import prepare_multimodal_embeds
    from videollamb_tpu.parallel.seq_parallel import seq_parallel_llama_forward

    mesh = create_seq_mesh(4)

    def sp_loss(p):
        spliced = prepare_multimodal_embeds(
            p, cfg, batch, deterministic=False,
            rng=jax.random.fold_in(step_rng, 0))
        logits = seq_parallel_llama_forward(
            mesh, p["lm"], cfg.lm, spliced.embeds, spliced.attention_mask,
            remat=True)
        return causal_lm_loss(logits, spliced.labels)

    (sp_l, _), g_sp = jax.value_and_grad(sp_loss, has_aux=True)(params0)
    np.testing.assert_allclose(float(sp_l), float(ref_l), rtol=1e-5)
    # Grads reach EVERY module through the shard_map (tower + projector +
    # LM); compare raw grads — a post-Adam comparison is sign-brittle where
    # grads are near zero.
    for mod in ("video_tower", "mm_projector", "lm"):
        for a, b_ in zip(jax.tree.leaves(jax.device_get(g_sp[mod])),
                         jax.tree.leaves(g_ref[mod])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-5)

    # And the packaged step runs end to end, updating params.
    own = jax.tree.map(jnp.array, params0)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=own,
                       opt_state=tx.init(own))
    step = make_seq_parallel_videollamb_step(mesh, cfg, tx)
    state, metrics = step(state, batch, step_rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
