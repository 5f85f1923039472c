"""Trainer + checkpoint integration: train a tiny model end-to-end on a
synthetic dataset, checkpoint, resume, adapter-only save/restore."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig, TrainConfig
from videollamb_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_adapter,
    restore_checkpoint,
    save_checkpoint,
)
from videollamb_tpu.train.dataset import Collator, DataConfig, SupervisedDataset
from videollamb_tpu.train.step import create_optimizer, create_train_state
from videollamb_tpu.train.trainer import Trainer
from test_preprocess import WordTokenizer


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


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path_factory.mktemp("train")
    vid_dir = root / "vids"
    vid_dir.mkdir()
    for name in ("a.mp4", "b.mp4"):
        writer = cv2.VideoWriter(str(vid_dir / name), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
        for i in range(30):
            writer.write(np.full((48, 64, 3), (i * 8) % 255, np.uint8))
        writer.release()
    records = []
    for name in ("a.mp4", "b.mp4") * 2:
        records.append({"video": name, "conversations": [
            {"from": "human", "value": "<video> what"},
            {"from": "gpt", "value": "a gradient video"},
        ]})
    data_path = root / "data.json"
    data_path.write_text(json.dumps(records))
    return str(data_path), str(vid_dir), str(root)


def test_trainer_end_to_end_with_resume(tiny_dataset):
    data_path, vid_dir, root = tiny_dataset
    cfg = ModelConfig.tiny(max_length=128)
    # Shrink video size to the tiny tower's input.
    from videollamb_tpu.data.processing import VideoProcessor

    ds = SupervisedDataset(
        data_path, WordTokenizer(),
        DataConfig(video_folder=vid_dir, num_frames=8, model_max_length=64),
        video_processor=VideoProcessor(size=cfg.vision.image_size),
    )
    tcfg = TrainConfig(
        per_device_batch_size=2, num_train_epochs=1, save_steps=0,
        logging_steps=1, output_dir=root + "/ckpt", gradient_checkpointing=False,
    )
    logs = []
    trainer = Trainer(cfg, tcfg, _tiny_params(cfg), ds, log_fn=logs.append,
                      collator=Collator(bucket=16, max_length=cfg.max_length))
    # With 8 CPU "devices" the global batch would exceed the dataset; force 2.
    trainer.global_batch = 2
    state = trainer.train()
    assert int(state.step) >= 1
    assert all(np.isfinite(l["loss"]) for l in logs)
    # Final checkpoint exists and resumes.
    path = latest_checkpoint(tcfg.output_dir)
    assert path is not None
    tx = create_optimizer(tcfg, 10, _tiny_params(cfg))
    fresh = create_train_state(_tiny_params(cfg), tx)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    a = np.asarray(state.params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    b = np.asarray(restored.params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_adapter_only_checkpoint_roundtrip(tmp_path):
    cfg = ModelConfig.tiny(max_length=128)
    params = _tiny_params(cfg)
    tcfg = TrainConfig(tune_mode="adapter", output_dir=str(tmp_path))
    tx = create_optimizer(tcfg, 10, params)
    state = create_train_state(params, tx)
    path = save_checkpoint(str(tmp_path), state, step=7, adapter_only=True)

    fresh = _tiny_params(cfg)
    # Perturb the projector so restore visibly changes it.
    fresh["mm_projector"] = jax.tree.map(lambda x: x * 0, fresh["mm_projector"])
    out = restore_adapter(path, fresh)
    a = np.asarray(params["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    b = np.asarray(out["mm_projector"]["projector"]["proj"]["dense"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_checkpoint_restore_across_mesh_topologies(tiny_dataset, tmp_path):
    """Save params sharded on a 2x4 mesh; restore onto an 8x1 mesh template
    — orbax must re-shard transparently (pod-topology migration)."""
    from videollamb_tpu.parallel import create_mesh, shard_params
    from videollamb_tpu.config import ModelConfig, TrainConfig

    cfg = ModelConfig.tiny(max_length=128)
    tcfg = TrainConfig()
    params = _tiny_params(cfg)

    mesh_a = create_mesh(data_parallel=2, model_parallel=4)
    sharded_a = shard_params(mesh_a, params)
    tx = create_optimizer(tcfg, 10, sharded_a)
    state_a = create_train_state(sharded_a, tx)
    path = save_checkpoint(str(tmp_path), state_a, step=3)

    mesh_b = create_mesh(data_parallel=8, model_parallel=1)
    sharded_b = shard_params(mesh_b, params)
    tx_b = create_optimizer(tcfg, 10, sharded_b)
    template = create_train_state(sharded_b, tx_b)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 3
    a = np.asarray(state_a.params["lm"]["embed_tokens"])
    b = np.asarray(restored.params["lm"]["embed_tokens"])
    np.testing.assert_array_equal(a, b)


def test_process_local_order_disjoint_and_complete():
    """Two processes slice every global batch into disjoint, covering,
    contiguous chunks (reference world_size semantics)."""
    from videollamb_tpu.train.trainer import process_local_order

    order = list(range(100, 148))  # 48 samples
    gb = 8
    shards = [process_local_order(order, gb, 2, p) for p in range(2)]
    assert len(shards[0]) == len(shards[1]) == 24
    assert not set(shards[0]) & set(shards[1])
    assert set(shards[0]) | set(shards[1]) == set(order)
    # Batch k of process p == rows [k*8+p*4, k*8+(p+1)*4) of the global order.
    assert shards[0][:4] == order[0:4]
    assert shards[1][:4] == order[4:8]
    assert shards[0][4:8] == order[8:12]


def test_resume_does_zero_decodes_for_skipped_batches(tiny_dataset):
    """Fast-forwarding a resumed run must not touch skipped samples
    (the round-1 implementation decoded every skipped batch)."""
    data_path, vid_dir, root = tiny_dataset
    cfg = ModelConfig.tiny(max_length=128)
    from videollamb_tpu.data.processing import VideoProcessor

    class CountingDataset(SupervisedDataset):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.loaded = []

        def __getitem__(self, i):
            self.loaded.append(i)
            return super().__getitem__(i)

    ds = CountingDataset(
        data_path, WordTokenizer(),
        DataConfig(video_folder=vid_dir, num_frames=8, model_max_length=64),
        video_processor=VideoProcessor(size=cfg.vision.image_size),
    )
    out = root + "/ckpt_resume_test"
    tcfg = TrainConfig(per_device_batch_size=2, num_train_epochs=1,
                       save_steps=0, output_dir=out,
                       gradient_checkpointing=False)
    trainer = Trainer(cfg, tcfg, _tiny_params(cfg), ds, log_fn=lambda m: None,
                      collator=Collator(bucket=16, max_length=cfg.max_length))
    trainer.global_batch = 2
    # Simulate a checkpoint at step 1: one batch (2 samples) must be skipped
    # without being decoded.
    trainer.state = trainer.state._replace(step=jnp.asarray(1))
    trainer.train()
    order = trainer._batch_order(0)
    skipped = set(order[:2])
    assert not skipped & set(ds.loaded), (skipped, ds.loaded)


def test_trainer_with_seq_parallel_step_factory(tiny_dataset):
    """Trainer drives the sequence-parallel multimodal step (the
    --sequence_parallel CLI path): loss finite, params update."""
    from jax.sharding import Mesh

    from videollamb_tpu.data.processing import VideoProcessor
    from videollamb_tpu.parallel.seq_parallel import (
        make_seq_parallel_videollamb_step,
    )

    # Compiling this step late in the full suite has segfaulted XLA:CPU
    # (LLVM state after ~280 accumulated executables); dropping them first
    # avoids it and costs only the few remaining tests' recompiles.
    jax.clear_caches()

    data_path, vid_dir, root = tiny_dataset
    cfg = ModelConfig.tiny(max_length=128)
    ds = SupervisedDataset(
        data_path, WordTokenizer(),
        DataConfig(video_folder=vid_dir, num_frames=8, model_max_length=64),
        video_processor=VideoProcessor(size=cfg.vision.image_size),
    )
    tcfg = TrainConfig(
        per_device_batch_size=2, num_train_epochs=1, save_steps=0,
        logging_steps=1, output_dir=root + "/ckpt_sp",
        gradient_checkpointing=True,
    )
    smesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))

    def factory(mcfg, tx, tcfg_):
        return make_seq_parallel_videollamb_step(
            smesh, mcfg, tx, data_axis="data",
            remat=tcfg_.gradient_checkpointing)

    logs = []
    params0 = _tiny_params(cfg)
    before = np.asarray(params0["lm"]["layers"]["q_proj"]).copy()
    trainer = Trainer(cfg, tcfg, params0, ds, log_fn=logs.append,
                      collator=Collator(bucket=16, max_length=cfg.max_length),
                      step_factory=factory)
    trainer.global_batch = 2
    state = trainer.train()
    assert int(state.step) >= 1
    assert all(np.isfinite(l["loss"]) for l in logs)
    after = np.asarray(jax.device_get(state.params["lm"]["layers"]["q_proj"]))
    assert not np.array_equal(before, after)


def test_adapter_checkpoint_writes_reference_bin(tmp_path):
    """Adapter-only saves also emit a reference-format mm_projector.bin
    that converts back to the exact bridge tree."""
    import torch

    import os

    from videollamb_tpu.models.bridge.convert import convert_rmt_r_state_dict
    from videollamb_tpu.train.checkpoint import save_checkpoint
    from videollamb_tpu.train.step import TrainState

    cfg = ModelConfig.tiny()
    params = _tiny_params(cfg)
    state = TrainState(step=jnp.asarray(3), params=params, opt_state={})
    path = save_checkpoint(str(tmp_path), state, adapter_only=True,
                           include_embed_tokens=True)
    bin_path = os.path.join(path, "mm_projector.bin")
    assert os.path.exists(bin_path)
    sd = torch.load(bin_path, weights_only=True)
    assert "model.embed_tokens.weight" in sd
    bridge = convert_rmt_r_state_dict(sd, prefix="model.mm_projector.")
    for a, b in zip(jax.tree.leaves(bridge),
                    jax.tree.leaves(jax.device_get(params["mm_projector"]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prefetcher_backpressure_bounds_lookahead():
    import time as _time

    from videollamb_tpu.train.trainer import Prefetcher

    calls = []

    class CountingDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            calls.append(i)
            return i

    pf = Prefetcher(CountingDS(), list(range(64)), 1, list,
                    num_threads=2, depth=3)
    _time.sleep(0.5)
    # Without consumption, workers must stall at the lookahead bound
    # instead of decoding the whole epoch into host memory.
    assert len(calls) <= 3 + 2
    out = list(pf)
    assert len(out) == 64
    assert sorted(calls) == list(range(64))


def _preempt_trainer(tiny_dataset, outdir, log_fn):
    from videollamb_tpu.data.processing import VideoProcessor
    from videollamb_tpu.train.dataset import DataConfig

    data_path, vid_dir, _ = tiny_dataset
    cfg = ModelConfig.tiny(max_length=128)
    ds = SupervisedDataset(
        data_path, WordTokenizer(),
        DataConfig(video_folder=vid_dir, num_frames=8, model_max_length=64),
        video_processor=VideoProcessor(size=cfg.vision.image_size),
    )
    tcfg = TrainConfig(
        per_device_batch_size=1, num_train_epochs=2, save_steps=0,
        logging_steps=1, output_dir=outdir, gradient_checkpointing=False,
    )
    trainer = Trainer(cfg, tcfg, _tiny_params(cfg), ds, log_fn=log_fn,
                      collator=Collator(bucket=16, max_length=cfg.max_length))
    trainer.global_batch = 1  # 4 batches/epoch on the tiny dataset
    return trainer


def test_preemption_checkpoints_and_resumes(tiny_dataset, tmp_path):
    from videollamb_tpu.train.trainer import GracefulShutdown

    outdir = str(tmp_path / "ckpt_preempt")
    sd = GracefulShutdown()
    logs = []

    def log(m):
        logs.append(m)
        if m.get("step") == 2 and "loss" in m:
            sd.request()

    trainer = _preempt_trainer(tiny_dataset, outdir, log)
    state = trainer.train(shutdown=sd)
    # Preempted after step 2: loop saved and returned, losing zero steps.
    assert int(state.step) == 2
    assert any(l.get("preempted") for l in logs)
    path = latest_checkpoint(outdir)
    assert path is not None and path.endswith("checkpoint-2")

    # A fresh Trainer auto-resumes from step 2 and completes both epochs.
    trainer2 = _preempt_trainer(tiny_dataset, outdir, lambda m: None)
    assert int(trainer2.state.step) == 2
    state2 = trainer2.train()
    assert int(state2.step) == 8


def test_sigterm_triggers_graceful_checkpoint(tiny_dataset, tmp_path):
    import os
    import signal as _signal

    outdir = str(tmp_path / "ckpt_sigterm")

    def log(m):
        # Delivered in the main thread: the default GracefulShutdown that
        # train() installs must catch it, checkpoint, and return cleanly.
        if m.get("step") == 1 and "loss" in m:
            os.kill(os.getpid(), _signal.SIGTERM)

    trainer = _preempt_trainer(tiny_dataset, outdir, log)
    state = trainer.train()
    assert int(state.step) == 1
    path = latest_checkpoint(outdir)
    assert path is not None and path.endswith("checkpoint-1")
