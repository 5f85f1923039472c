"""GPipe pipeline parallelism over the 'pipe' mesh axis: logits parity with
the unpipelined forward, for several (stages, microbatch) schedules."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import init_llama_params, llama_forward
from videollamb_tpu.parallel.pipeline import (
    create_pipeline_mesh,
    pipeline_llama_forward,
    shard_stacked_layers,
)


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(num_hidden_layers=4)
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("stages,n_micro", [(4, 2), (2, 4)])
def test_pipeline_matches_unpipelined(model, stages, n_micro):
    cfg, params = model
    b, s = 4, 12
    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = np.ones((b, s), np.int32)
    mask[1, 9:] = 0  # ragged row
    mask = jnp.asarray(mask)

    ref = llama_forward(params, cfg, embeds, mask)

    mesh = create_pipeline_mesh(stages)
    pp_params = dict(params, layers=shard_stacked_layers(mesh, params["layers"]))
    out = pipeline_llama_forward(mesh, pp_params, cfg, embeds, mask, n_micro=n_micro)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_layers_actually_sharded(model):
    cfg, params = model
    mesh = create_pipeline_mesh(4)
    layers = shard_stacked_layers(mesh, params["layers"])
    shard_shapes = {
        tuple(sh.data.shape)
        for sh in layers["q_proj"].addressable_shards
    }
    # 4 layers over 4 stages: one layer per stage.
    assert shard_shapes == {(1, cfg.hidden_size, cfg.hidden_size)}


def test_pipeline_gradients_match_unpipelined(model):
    """Reverse-mode AD through the GPipe loop (ppermute transposes to the
    inverse ring) — layer grads equal the unpipelined ones, enabling
    pipelined TRAINING, not just inference. 2 stages x 2 layers here keeps
    the CPU compile small; the 4-stage schedule's grads are covered by
    test_pipeline_train_step_matches_unpipelined[4-1]."""
    cfg, params = model
    b, s = 4, 8
    rng = np.random.default_rng(1)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    labels = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)), jnp.int32)

    def ce(logits):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        tok = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        return -jnp.mean(tok)

    g_ref = jax.grad(lambda p: ce(llama_forward(p, cfg, embeds, mask)))(params)

    mesh = create_pipeline_mesh(2)
    pp_params = dict(params, layers=shard_stacked_layers(mesh, params["layers"]))
    g_pp = jax.grad(lambda p: ce(
        pipeline_llama_forward(mesh, p, cfg, embeds, mask, n_micro=2)))(pp_params)

    for key in g_ref["layers"]:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(g_pp["layers"][key])),
            np.asarray(g_ref["layers"][key]), rtol=2e-4, atol=2e-5,
            err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(g_pp["lm_head"]), np.asarray(g_ref["lm_head"]),
        rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("stages,n_data", [(4, 1), (2, 2)])
def test_pipeline_train_step_matches_unpipelined(model, stages, n_data):
    """Full pipelined train step (loss + grads + AdamW update) equals the
    single-device step — microbatch grad accumulation via the GPipe loop's
    AD transpose, optionally composed with a 'data' axis."""
    import optax

    from videollamb_tpu.constants import IGNORE_INDEX
    from videollamb_tpu.models.assembly import causal_lm_loss
    from videollamb_tpu.parallel.pipeline import (
        create_pipe_data_mesh,
        make_pipeline_train_step,
    )
    from videollamb_tpu.train.step import TrainState

    cfg, params0 = model
    b, s = 4, 8
    rng = np.random.default_rng(2)
    embeds = jnp.asarray(rng.normal(size=(b, s, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    labels = np.asarray(rng.integers(0, cfg.vocab_size, size=(b, s)), np.int32)
    labels[0, :3] = IGNORE_INDEX  # prompt holes
    labels = jnp.asarray(labels)

    tx = optax.adamw(1e-2)

    # Reference: unpipelined single-device step.
    def ref_loss(p):
        return causal_lm_loss(llama_forward(p, cfg, embeds, mask), labels)

    (ref_l, _), g = jax.value_and_grad(ref_loss, has_aux=True)(params0)
    upd, _ = tx.update(g, tx.init(params0), params0)
    ref_params = optax.apply_updates(params0, upd)

    mesh = create_pipe_data_mesh(stages, n_data)
    # Fresh copies: the train step donates its state, and the module-scoped
    # fixture leaves must survive for other parametrizations.
    own = jax.tree.map(jnp.array, params0)
    pp_params = dict(own, layers=shard_stacked_layers(mesh, own["layers"]))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=pp_params,
                       opt_state=tx.init(pp_params))
    step = make_pipeline_train_step(
        mesh, cfg, tx, n_micro=2, data_axis="data" if n_data > 1 else None)
    state, metrics = step(state, embeds, mask, labels)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_l), rtol=1e-5)
    for key in ref_params["layers"]:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(state.params["layers"][key])),
            np.asarray(ref_params["layers"][key]), rtol=2e-4, atol=2e-5,
            err_msg=key)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(state.params["lm_head"])),
        np.asarray(ref_params["lm_head"]), rtol=2e-4, atol=2e-5)
    # Layer params stay pipe-sharded through the optimizer update.
    shard_shapes = {tuple(sh.data.shape)
                    for sh in state.params["layers"]["q_proj"].addressable_shards}
    assert {sh[0] for sh in shard_shapes} == {4 // stages}


def test_pipeline_multimodal_step_matches_unpipelined():
    """Pipelined MULTIMODAL train step (VERDICT r2 #7): tower/bridge/splice
    prologue composed with the GPipe LM stages — loss parity with the
    unpipelined multimodal forward, gradients reaching EVERY module."""
    import optax

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        MultimodalBatch,
        causal_lm_loss,
        prepare_multimodal_embeds,
        videollamb_forward,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.parallel.pipeline import (
        make_pipeline_videollamb_step,
        pipeline_llama_forward,
    )
    from videollamb_tpu.train.step import TrainState

    cfg = ModelConfig.tiny(max_length=64)
    # 4 LM layers over 2 stages.
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
    step_rng = jax.random.PRNGKey(7)

    def ref_loss(p):
        logits, spliced = videollamb_forward(
            p, cfg, batch, deterministic=False,
            rng=jax.random.fold_in(step_rng, 0))
        return causal_lm_loss(logits, spliced.labels)

    (ref_l, _), g_ref = jax.value_and_grad(ref_loss, has_aux=True)(params0)

    n_stages = 2
    mesh = create_pipeline_mesh(n_stages)

    def pp_loss(p):
        spliced = prepare_multimodal_embeds(
            p, cfg, batch, deterministic=False,
            rng=jax.random.fold_in(step_rng, 0))
        logits = pipeline_llama_forward(
            mesh, p["lm"], cfg.lm, spliced.embeds, spliced.attention_mask,
            n_micro=2, remat=True)
        return causal_lm_loss(logits, spliced.labels)

    pp_params = dict(params0)
    pp_params["lm"] = dict(
        params0["lm"],
        layers=shard_stacked_layers(mesh, params0["lm"]["layers"]))
    (pp_l, _), g_pp = jax.jit(
        jax.value_and_grad(pp_loss, has_aux=True))(pp_params)
    np.testing.assert_allclose(float(pp_l), float(ref_l), rtol=1e-5)
    for mod in ("video_tower", "mm_projector", "lm"):
        for a, b_ in zip(jax.tree.leaves(jax.device_get(g_pp[mod])),
                         jax.tree.leaves(g_ref[mod])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-5)

    # The packaged step runs end to end and keeps layers pipe-sharded.
    import optax as _ox
    tx = _ox.adamw(1e-2)
    own = jax.tree.map(jnp.array, pp_params)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=own,
                       opt_state=tx.init(own))
    step = make_pipeline_videollamb_step(mesh, cfg, tx, n_micro=2)
    state, metrics = step(state, batch, step_rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
    shard_shapes = {tuple(sh.data.shape)
                    for sh in state.params["lm"]["layers"]["q_proj"].addressable_shards}
    assert {sh[0] for sh in shard_shapes} == {cfg.lm.num_hidden_layers // n_stages}
