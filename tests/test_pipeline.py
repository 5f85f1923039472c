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
    pipelined TRAINING, not just inference."""
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

    mesh = create_pipeline_mesh(4)
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
