"""Multi-device sharding tests on the virtual 8-CPU-device mesh.

Validates that the full train step compiles and runs under GSPMD with
DP+FSDP+TP shardings, and that sharded execution matches single-device
execution numerically.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig, TrainConfig
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch, causal_lm_loss, videollamb_forward
from videollamb_tpu.parallel import batch_sharding, create_mesh, shard_params
from videollamb_tpu.train import create_optimizer, create_train_state, make_train_step


def _tiny_params(cfg):
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }


def _batch(cfg, b=8, t=8, text_len=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(b, text_len)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    mask = np.ones((b, text_len), np.int32)
    videos = rng.normal(
        size=(b, t, 3, cfg.vision.image_size, cfg.vision.image_size)
    ).astype(np.float32)
    return MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        labels=jnp.asarray(np.where(mask, ids, IGNORE_INDEX)),
        videos=jnp.asarray(videos),
        images=None,
    )


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_multislice_mesh_train_step():
    """3-axis ('replica','data','model') mesh: one sharded train step."""
    from videollamb_tpu.parallel.mesh import create_multislice_mesh

    mesh = create_multislice_mesh(model_parallel=2)
    assert mesh.axis_names == ("replica", "data", "model")
    assert mesh.devices.size == 8

    cfg = ModelConfig.tiny(max_length=128)
    tcfg = TrainConfig()
    params = shard_params(mesh, _tiny_params(cfg))
    tx = create_optimizer(tcfg, total_steps=10, params=params)
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(cfg, tx, remat=False))

    batch = _batch(cfg, b=8)
    bsh = batch_sharding(mesh)
    batch = MultimodalBatch(
        input_ids=jax.device_put(batch.input_ids, bsh),
        attention_mask=jax.device_put(batch.attention_mask, bsh),
        labels=jax.device_put(batch.labels, bsh),
        videos=jax.device_put(batch.videos, bsh),
        images=None,
    )
    _, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_sharded_forward_matches_single_device():
    cfg = ModelConfig.tiny(max_length=128)
    params = _tiny_params(cfg)
    batch = _batch(cfg, b=8)

    logits_single, spliced_single = videollamb_forward(params, cfg, batch)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    bsh = batch_sharding(mesh)
    batch_sharded = MultimodalBatch(
        input_ids=jax.device_put(batch.input_ids, bsh),
        attention_mask=jax.device_put(batch.attention_mask, bsh),
        labels=jax.device_put(batch.labels, bsh),
        videos=jax.device_put(batch.videos, bsh),
        images=None,
    )
    logits_sharded, _ = videollamb_forward(sharded, cfg, batch_sharded)
    np.testing.assert_allclose(
        np.asarray(logits_single), np.asarray(logits_sharded), rtol=2e-4, atol=2e-4
    )


def test_sharded_generate_matches_single_device():
    """Greedy generation with TP+FSDP-sharded params == single-device."""
    from videollamb_tpu.models.engine import generate

    cfg = ModelConfig.tiny(max_length=128)
    params = _tiny_params(cfg)
    rng = np.random.default_rng(7)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 8), jnp.int32),
        labels=None,
        videos=jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    kwargs = dict(max_new_tokens=5, do_sample=False, eos_token_id=-1,
                  max_seq_len=cfg.max_length + 5)
    ref = generate(params, cfg, batch, jax.random.PRNGKey(0), **kwargs)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    out = generate(sharded, cfg, batch, jax.random.PRNGKey(0), **kwargs)
    assert np.asarray(out.tokens).tolist() == np.asarray(ref.tokens).tolist()


# One parametrization: each sharded train-step compile costs ~3 min on the
# virtual CPU mesh. Pure-DP meshes are covered by test_multislice_mesh_
# train_step and the driver's dryrun_multichip; (2,4) exercises TP+DP —
# WITH sequence-parallel activation sharding (act_sharding), the FSDP+TP
# production recipe's memory-fit requirement (tools/aot_memory.py). Its
# numeric parity vs the unconstrained step was verified bit-identical on
# this mesh (loss AND grad_norm); this keeps the path compiling + sane.
@pytest.mark.parametrize("dp,tp,remat", [(2, 4, True)])
def test_train_step_runs_sharded(dp, tp, remat):
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = ModelConfig.tiny(max_length=128)
    tcfg = TrainConfig(mm_projector_lr=1e-4, gradient_accumulation_steps=1)
    params = _tiny_params(cfg)

    mesh = create_mesh(data_parallel=dp, model_parallel=tp)
    params = shard_params(mesh, params)
    tx = create_optimizer(tcfg, total_steps=100, params=params)
    state = create_train_state(params, tx)
    act_sh = NamedSharding(mesh, P("data", "model", None))
    step_fn = jax.jit(make_train_step(cfg, tx, remat=remat,
                                      act_sharding=act_sh))

    batch = _batch(cfg, b=8)
    bsh = batch_sharding(mesh)
    batch = MultimodalBatch(
        input_ids=jax.device_put(batch.input_ids, bsh),
        attention_mask=jax.device_put(batch.attention_mask, bsh),
        labels=jax.device_put(batch.labels, bsh),
        videos=jax.device_put(batch.videos, bsh),
        images=None,
    )
    state1, metrics1 = step_fn(state, batch, jax.random.PRNGKey(1))
    state2, metrics2 = step_fn(state1, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics1["loss"]))
    assert float(metrics2["loss"]) < float(metrics1["loss"]) + 1.0  # sane scale
    assert int(state2.step) == 2
    # Towers must stay frozen (prod recipe freezes the video tower).
    t0 = np.asarray(
        jax.tree.leaves(params["video_tower"])[0]
    )
    t2 = np.asarray(jax.tree.leaves(state2.params["video_tower"])[0])
    np.testing.assert_array_equal(t0, t2)


def test_adapter_only_tuning_freezes_lm():
    cfg = ModelConfig.tiny(max_length=128)
    tcfg = TrainConfig(tune_mode="adapter")
    params = _tiny_params(cfg)
    tx = create_optimizer(tcfg, total_steps=10, params=params)
    state = create_train_state(params, tx)
    step_fn = jax.jit(make_train_step(cfg, tx, remat=False))
    # Two steps: warmup LR is 0 at step 0 (HF semantics), nonzero after.
    state1, _ = step_fn(state, _batch(cfg, b=2), jax.random.PRNGKey(0))
    state1, _ = step_fn(state1, _batch(cfg, b=2), jax.random.PRNGKey(0))

    lm0 = np.asarray(params["lm"]["embed_tokens"])
    lm1 = np.asarray(state1.params["lm"]["embed_tokens"])
    np.testing.assert_array_equal(lm0, lm1)
    # memory_tokens is vestigial (never read in the forward pass, matching
    # the reference) — check a live projector weight instead.
    pr0 = np.asarray(params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    pr1 = np.asarray(state1.params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    assert np.abs(pr0 - pr1).max() > 0


def test_sharded_serving_engines_match_single_device():
    """The continuous-batching engines run UNCHANGED over TP+FSDP-sharded
    params (GSPMD inserts the collectives into the jitted prefill/decode
    graphs) and produce token-identical output — the multi-chip serving
    story: shard the weights, keep the engine."""
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import Request, ServingEngine

    cfg = ModelConfig.tiny(max_length=128)
    params = _tiny_params(cfg)

    def make_req(uid, seed):
        r = np.random.default_rng(seed)
        ids = r.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
        ids[:, 2] = VIDEO_TOKEN_INDEX
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 8), jnp.int32), labels=None,
            videos=jnp.asarray(r.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
            images=None)
        return Request(uid=uid, batch=batch, max_new_tokens=5, temperature=0.0)

    def run(engine):
        reqs = [make_req(i, i) for i in range(2)]
        for r in reqs:
            engine.submit(r)
        done = engine.run_until_drained(k=2)
        return {r.uid: r.tokens for r in done}

    ref = run(ServingEngine(params, cfg, num_slots=2, eos_token_id=-1))
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    assert run(ServingEngine(sharded, cfg, num_slots=2, eos_token_id=-1)) == ref
    assert run(PagedServingEngine(sharded, cfg, num_slots=2, page_size=32,
                                  eos_token_id=-1)) == ref


def test_sharded_sampled_engine_matches_unsharded():
    """The round-3 sampled k-step device scan is a GSPMD program like the
    greedy one: a TP+FSDP-sharded engine must draw the same tokens as an
    unsharded engine from the same seed (sampling riding sharded logits)."""
    from videollamb_tpu.serve.server import Request, ServingEngine

    cfg = ModelConfig.tiny(max_length=128)
    params = _tiny_params(cfg)

    def build_req():
        rng = np.random.default_rng(55)
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
        ids[:, 2] = VIDEO_TOKEN_INDEX
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 8), jnp.int32), labels=None,
            videos=jnp.asarray(
                rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
            images=None)
        return Request(uid=0, batch=batch, max_new_tokens=6,
                       temperature=0.9, top_p=0.9)

    ref_req = build_req()
    ref = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1, seed=4)
    ref.submit(ref_req)
    ref.run_until_drained(k=3)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    req = build_req()
    eng = ServingEngine(sharded, cfg, num_slots=2, eos_token_id=-1, seed=4)
    eng.submit(req)
    eng.run_until_drained(k=3)
    assert req.tokens == ref_req.tokens
