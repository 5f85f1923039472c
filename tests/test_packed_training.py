"""Packed-sequence training: segment-ID block-causal attention, the packed
splice, the packing collator, and end-to-end parity with unpacked training.

The reference pads every training row to the batch max (train.py:827-872);
packing several conversations into one static row is a TPU-side extension
with no reference counterpart. The invariant under test everywhere: a
sample packed next to strangers must see EXACTLY the math it would see in
its own row — same logits, same loss contribution, same gradients.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import (
    MultimodalBatch,
    causal_lm_loss,
    measure_block_tokens,
    prepare_multimodal_embeds,
    prepare_packed_embeds,
    videollamb_forward,
)
from videollamb_tpu.models.lm.llama import embed_tokens
from videollamb_tpu.models.splice import (
    packed_position_ids,
    splice_multimodal_packed,
)
from videollamb_tpu.ops.attention import multihead_attention
from videollamb_tpu.train.dataset import PackedCollator


# ---------------------------------------------------------------------------
# Segment attention isolation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["xla", "chunked"])
def test_segment_attention_matches_per_segment(impl):
    """Packed attention over [seg1 | seg2] must equal attending each segment
    separately: cross-segment keys are invisible."""
    rng = np.random.default_rng(0)
    b, h, dh = 2, 4, 8
    n1, n2 = 7, 9
    s = n1 + n2
    q = rng.normal(size=(b, s, h, dh)).astype(np.float32)
    k = rng.normal(size=(b, s, h, dh)).astype(np.float32)
    v = rng.normal(size=(b, s, h, dh)).astype(np.float32)
    seg = np.concatenate([np.full(n1, 1), np.full(n2, 2)])[None].repeat(b, 0)

    out = multihead_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        causal=True, impl=impl, segment_ids=jnp.asarray(seg),
    )
    ref1 = multihead_attention(
        jnp.asarray(q[:, :n1]), jnp.asarray(k[:, :n1]), jnp.asarray(v[:, :n1]),
        causal=True, impl="xla",
    )
    ref2 = multihead_attention(
        jnp.asarray(q[:, n1:]), jnp.asarray(k[:, n1:]), jnp.asarray(v[:, n1:]),
        causal=True, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out[:, :n1]), np.asarray(ref1),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out[:, n1:]), np.asarray(ref2),
                               rtol=2e-5, atol=2e-5)


def test_segment_attention_composes_with_k_mask():
    rng = np.random.default_rng(1)
    b, s, h, dh = 1, 12, 2, 4
    q = jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))
    k = q + 0.1
    v = jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))
    seg = jnp.asarray(np.array([[1] * 5 + [2] * 4 + [0] * 3]))
    km = jnp.asarray(np.array([[True] * 9 + [False] * 3]))
    out = multihead_attention(q, k, v, causal=True, k_mask=km,
                              impl="chunked", segment_ids=seg)
    ref = multihead_attention(q, k, v, causal=True, k_mask=km,
                              impl="xla", segment_ids=seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Packed splice
# ---------------------------------------------------------------------------

def test_packed_position_ids_restart_per_run():
    seg = jnp.asarray(np.array([[1, 1, 1, 2, 2, 3, 0, 0]]))
    pos = packed_position_ids(seg)
    assert np.asarray(pos)[0].tolist() == [0, 1, 2, 0, 1, 0, 0, 1]


def test_packed_splice_segments_and_positions():
    """Visual tokens inherit the segment of the sentinel they replace, and
    positions restart at each spliced segment boundary."""
    d, n_x, max_len = 4, 3, 32
    # Two conversations in one row: [a b X c] (seg 1) + [d X e] (seg 2).
    ids = np.array([[5, 6, VIDEO_TOKEN_INDEX, 7, 8, VIDEO_TOKEN_INDEX, 9, 0]])
    valid = np.array([[1, 1, 1, 1, 1, 1, 1, 0]], bool)
    seg = np.array([[1, 1, 1, 1, 2, 2, 2, 0]])
    text_emb = np.arange(8 * d, dtype=np.float32).reshape(1, 8, d)
    x_emb = np.ones((1, 2, n_x, d), np.float32)
    x_mask = np.ones((1, 2, n_x), bool)

    spliced, seg_out, pos_out = splice_multimodal_packed(
        jnp.asarray(ids), jnp.asarray(valid), None, jnp.asarray(seg),
        jnp.asarray(text_emb), jnp.asarray(x_emb), jnp.asarray(x_mask),
        max_len,
    )
    # Spliced layout: [a b v v v c | d v v v e] -> seg 111111 22222.
    want_seg = [1] * 6 + [2] * 5 + [0] * (max_len - 11)
    assert np.asarray(seg_out)[0].tolist() == want_seg
    want_pos = list(range(6)) + list(range(5))
    assert np.asarray(pos_out)[0, :11].tolist() == want_pos
    assert int(spliced.lengths[0]) == 11
    # Visual labels stay IGNORE.
    lab = np.asarray(spliced.labels)[0]
    assert (lab[2:5] == IGNORE_INDEX).all() and (lab[7:10] == IGNORE_INDEX).all()


# ---------------------------------------------------------------------------
# Packing collator
# ---------------------------------------------------------------------------

def _fake_sample(rng, text_len, video=None, vocab=64):
    ids = rng.integers(4, vocab, size=text_len).astype(np.int32)
    labels = ids.copy()
    labels[: text_len // 2] = IGNORE_INDEX  # prompt masking
    s = {"input_ids": ids, "labels": labels}
    if video is not None:
        ids[1] = VIDEO_TOKEN_INDEX
        s["video"] = video
    return s


def test_packer_coverage_budget_and_first_label():
    rng = np.random.default_rng(0)
    vid = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    samples = [
        _fake_sample(rng, n, vid if i % 2 == 0 else None)
        for i, n in enumerate([30, 50, 20, 40, 10, 60])
    ]
    # Homogeneity: the packer requires one modality per call.
    samples = [s for s in samples if "video" in s]
    col = PackedCollator(max_length=128, block_tokens=12, k_max=2,
                         rows_bucket=2, bucket=16)
    rows = col.pack(samples)
    flat = sorted(i for row in rows for i in row)
    assert flat == list(range(len(samples)))  # every sample exactly once
    for row in rows:
        cost = sum(col._cost(samples[i])[0] for i in row)
        nb = sum(col._cost(samples[i])[1] for i in row)
        assert len(row) == 1 or cost <= 128
        assert nb <= 2

    batch = col(samples)
    assert batch.input_ids.shape[0] % 2 == 0  # rows_bucket padding
    assert batch.segment_ids is not None
    assert batch.videos.ndim == 6
    # First label of every segment is IGNORE.
    seg = np.asarray(batch.segment_ids)
    lab = np.asarray(batch.labels)
    for r in range(seg.shape[0]):
        prev = 0
        for t in range(seg.shape[1]):
            if seg[r, t] != prev and seg[r, t] != 0:
                assert lab[r, t] == IGNORE_INDEX
            prev = seg[r, t]
    # Block mask counts match per-row videos.
    assert int(np.asarray(batch.video_block_mask).sum()) == len(samples)


def test_packer_pinned_shape_and_carry():
    """fixed_rows mode: every batch is exactly (fixed_rows, max_length)
    with k_max block slots; overflow samples carry into the next call
    instead of growing the batch (ADVICE r3: SPMD-stable packed shape)."""
    rng = np.random.default_rng(2)
    vid = rng.normal(size=(4, 3, 8, 8)).astype(np.float32)
    col = PackedCollator(max_length=64, block_tokens=40, k_max=1,
                         fixed_rows=2, fixed_frames=4)
    # Four samples, each ~(10 - 1 + 40) = 49 tokens with one video block:
    # only one fits per row -> 4 rows packed, 2 emitted, 2 carried.
    samples = [_fake_sample(rng, 10, vid.copy()) for _ in range(4)]
    b1 = col(samples)
    assert b1.input_ids.shape == (2, 64)
    assert b1.videos.shape[:3] == (2, 1, 4)
    assert len(col._carry) == 2
    # Next call drains the carry first.
    b2 = col([_fake_sample(rng, 10, vid.copy()) for _ in range(2)])
    assert b2.input_ids.shape == (2, 64)
    assert len(col._carry) == 2
    b3 = col([])
    assert b3.input_ids.shape == (2, 64)
    assert not col._carry
    total = sum(int(np.asarray(b.video_block_mask).sum())
                for b in (b1, b2, b3))
    assert total == 6  # every sample trained exactly once


def test_packer_carry_waits_for_matching_modality():
    rng = np.random.default_rng(4)
    vid = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    img = rng.normal(size=(3, 8, 8)).astype(np.float32)
    col = PackedCollator(max_length=64, block_tokens=40,
                         block_tokens_image=40, k_max=1, fixed_rows=1)
    col([_fake_sample(rng, 10, vid.copy()) for _ in range(2)])
    assert len(col._carry) == 1  # one video sample deferred
    s_i = _fake_sample(rng, 10)
    s_i["image"] = img
    s_i["input_ids"][1] = -200
    b_img = col([s_i])  # image batch: video carry must NOT join it
    assert len(col._carry) == 1
    assert b_img.image_block_mask is not None
    assert b_img.video_block_mask is None  # ADVICE r3: correct mask field
    b_vid = col([])  # empty call drains the video carry
    assert b_vid.videos is not None
    assert not col._carry


def test_packer_per_modality_budget_and_sentinel_guard():
    rng = np.random.default_rng(6)
    vid = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    col = PackedCollator(max_length=256, block_tokens=100,
                         block_tokens_image=10)
    s_v = _fake_sample(rng, 10, vid)
    assert col._cost(s_v)[0] == 10 - 1 + 100
    s_i = _fake_sample(rng, 10)
    s_i["image"] = rng.normal(size=(3, 8, 8)).astype(np.float32)
    s_i["input_ids"][1] = -200
    assert col._cost(s_i)[0] == 10 - 1 + 10
    # Sentinel/media mismatch raises instead of silently mis-binding the
    # next sample's media (ADVICE r3).
    s_bad = _fake_sample(rng, 10, vid.copy())
    s_bad["input_ids"][3] = VIDEO_TOKEN_INDEX  # second sentinel, one video
    with pytest.raises(ValueError, match="sentinel"):
        col._cost(s_bad)
    s_bad2 = _fake_sample(rng, 10)  # no media, but a stray sentinel
    s_bad2["input_ids"][1] = VIDEO_TOKEN_INDEX
    with pytest.raises(ValueError, match="sentinel"):
        col._cost(s_bad2)


def test_packer_rejects_mixed_and_anyres():
    rng = np.random.default_rng(0)
    vid = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    img = rng.normal(size=(3, 8, 8)).astype(np.float32)
    col = PackedCollator(max_length=64, block_tokens=4)
    s_v = _fake_sample(rng, 10, vid)
    s_i = _fake_sample(rng, 10)
    s_i["image"] = img
    s_i["input_ids"][1] = -200
    with pytest.raises(ValueError):
        col([s_v, s_i])
    s_a = _fake_sample(rng, 10)
    s_a["image"] = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    with pytest.raises(ValueError):
        col([s_a])


# ---------------------------------------------------------------------------
# End-to-end parity: packed forward == per-sample unpacked forward
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_model():
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


def _video_samples(cfg, rng, lens=(10, 14, 8)):
    vids, samples = [], []
    for n in lens:
        ids = rng.integers(4, cfg.lm.vocab_size, size=n).astype(np.int32)
        ids[2] = VIDEO_TOKEN_INDEX
        labels = ids.copy()
        labels[:4] = IGNORE_INDEX
        vid = rng.normal(size=(8, 3, cfg.vision.image_size,
                               cfg.vision.image_size)).astype(np.float32)
        samples.append({"input_ids": ids, "labels": labels, "video": vid})
        vids.append(vid)
    return samples


def _unpacked_batch(s):
    ids = s["input_ids"][None]
    return MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
        labels=jnp.asarray(s["labels"][None]),
        videos=jnp.asarray(s["video"][None]),
        images=None,
    )


def test_packed_forward_matches_unpacked(tiny_model):
    """Each sample's logits inside a packed row equal its own-row logits."""
    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    samples = _video_samples(cfg, rng)
    block = measure_block_tokens(params, cfg)
    col = PackedCollator(max_length=cfg.max_length, block_tokens=block,
                         k_max=4, rows_bucket=1, bucket=64)
    rows = col.pack(samples)
    assert len(rows) == 1, "tiny samples should pack into one row"
    batch = col(samples)
    packed_logits, packed_spliced = videollamb_forward(
        params, cfg, batch, attn_impl="xla"
    )
    seg = np.asarray(prepare_packed_embeds(params, cfg, batch)[1])[0]

    cursor = 0
    for si in rows[0]:
        s = samples[si]
        ub = _unpacked_batch(s)
        ulogits, uspliced = videollamb_forward(params, cfg, ub,
                                               attn_impl="xla")
        ulen = int(uspliced.lengths[0])
        got = np.asarray(packed_logits)[0, cursor:cursor + ulen]
        want = np.asarray(ulogits)[0, :ulen]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
        # The packed segment really is where we think it is.
        assert (seg[cursor:cursor + ulen] == rows[0].index(si) + 1).all()
        cursor += ulen


def test_packed_loss_matches_unpacked(tiny_model):
    """Packed loss over the row == loss over the same samples unpacked
    (identical valid-token set: the collator IGNOREs each segment's first
    label, which the per-row shift drops anyway)."""
    cfg, params = tiny_model
    rng = np.random.default_rng(5)
    samples = _video_samples(cfg, rng, lens=(10, 12))
    block = measure_block_tokens(params, cfg)
    col = PackedCollator(max_length=cfg.max_length, block_tokens=block,
                         k_max=4, rows_bucket=1, bucket=64)
    batch = col(samples)
    plogits, pspliced = videollamb_forward(params, cfg, batch,
                                           attn_impl="xla")
    ploss, pn = causal_lm_loss(plogits, pspliced.labels)

    tot, cnt = 0.0, 0
    for s in samples:
        ub = _unpacked_batch(s)
        # Mirror the packer's first-label handling so token sets match: the
        # first supervised position after the shift is identical.
        logits, spliced = videollamb_forward(params, cfg, ub,
                                             attn_impl="xla")
        loss, n = causal_lm_loss(logits, spliced.labels)
        tot += float(loss) * int(n)
        cnt += int(n)
    # Packing moves segment 2+ first-labels out of the shift window; in
    # these synthetic samples position 0..3 labels are IGNORE already, so
    # the sets coincide exactly.
    assert int(pn) == cnt
    np.testing.assert_allclose(float(ploss), tot / cnt, rtol=5e-4)


def test_packed_grads_flow_everywhere(tiny_model):
    """Gradients through the packed path reach tower, bridge and LM."""
    cfg, params = tiny_model
    rng = np.random.default_rng(7)
    samples = _video_samples(cfg, rng, lens=(9, 11))
    block = measure_block_tokens(params, cfg)
    col = PackedCollator(max_length=cfg.max_length, block_tokens=block,
                         rows_bucket=1, bucket=64)
    batch = col(samples)

    def loss_fn(p):
        logits, spliced = videollamb_forward(p, cfg, batch, attn_impl="xla")
        return causal_lm_loss(logits, spliced.labels)[0]

    grads = jax.grad(loss_fn)(params)
    for key in ("video_tower", "mm_projector", "lm"):
        norm = float(
            sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(grads[key]))
        )
        assert norm > 0, f"no gradient reached {key}"


def test_text_only_packed_batch(tiny_model):
    """Pure-text packed rows (no media blocks) forward fine."""
    cfg, params = tiny_model
    rng = np.random.default_rng(9)
    samples = []
    for n in (6, 7, 5):
        ids = rng.integers(4, cfg.lm.vocab_size, size=n).astype(np.int32)
        labels = ids.copy()
        labels[:2] = IGNORE_INDEX
        samples.append({"input_ids": ids, "labels": labels})
    col = PackedCollator(max_length=cfg.max_length, block_tokens=1,
                         rows_bucket=1, bucket=32)
    batch = col(samples)
    assert batch.videos is None and batch.images is None
    logits, spliced = videollamb_forward(params, cfg, batch, attn_impl="xla")
    loss, n = causal_lm_loss(logits, spliced.labels)
    assert np.isfinite(float(loss)) and int(n) > 0


# ---------------------------------------------------------------------------
# Trainer integration
# ---------------------------------------------------------------------------

def test_trainer_packs_end_to_end(tmp_path):
    """--pack_sequences trains: PackedCollator auto-built (block budget via
    measure_block_tokens), each step consumes pack_factor x the samples."""
    import json

    cv2 = pytest.importorskip("cv2")
    from test_preprocess import WordTokenizer
    from videollamb_tpu.config import TrainConfig
    from videollamb_tpu.data.processing import VideoProcessor
    from videollamb_tpu.train.dataset import DataConfig, SupervisedDataset
    from videollamb_tpu.train.trainer import Trainer

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    writer = cv2.VideoWriter(str(vid_dir / "a.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(30):
        writer.write(np.full((48, 64, 3), (i * 8) % 255, np.uint8))
    writer.release()
    records = [{"video": "a.mp4", "conversations": [
        {"from": "human", "value": "<video> what"},
        {"from": "gpt", "value": f"answer number {i}"},
    ]} for i in range(8)]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))

    cfg = ModelConfig.tiny(max_length=256)
    ds = SupervisedDataset(
        str(data_path), WordTokenizer(),
        DataConfig(video_folder=str(vid_dir), num_frames=8,
                   model_max_length=128),
        video_processor=VideoProcessor(size=cfg.vision.image_size),
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tcfg = TrainConfig(
        per_device_batch_size=2, num_train_epochs=1, save_steps=0,
        logging_steps=1, output_dir=str(tmp_path / "ckpt"),
        gradient_checkpointing=False, pack_sequences=True, pack_factor=2,
    )
    logs = []
    trainer = Trainer(cfg, tcfg, params, ds, log_fn=logs.append)
    trainer.global_batch = 2  # 8 virtual devices would outsize the dataset
    trainer.collator.fixed_rows = 2  # pinned row count follows global_batch
    state = trainer.train()
    # 8 samples / (2 rows * pack_factor 2) = 2 steps.
    steps = [l for l in logs if "loss" in l]
    assert int(state.step) == 2
    assert all(np.isfinite(l["loss"]) for l in steps)
    assert trainer.collator.block_tokens > 0
    # The auto-built collator carries per-modality budgets and a pinned
    # shape (ADVICE r3: modality budgets + SPMD-stable packed row count).
    assert trainer.collator.block_tokens_image is not None
    assert trainer.collator.fixed_frames == 8


def test_trainer_rejects_packing_with_rmt_loss(tmp_path):
    from videollamb_tpu.config import TrainConfig
    from videollamb_tpu.train.trainer import Trainer

    cfg = ModelConfig.tiny()
    tcfg = TrainConfig(pack_sequences=True, rmt_loss=True,
                       output_dir=str(tmp_path))
    with pytest.raises(ValueError, match="pack_sequences"):
        Trainer(cfg, tcfg, {}, dataset=_EmptyDs())


class _EmptyDs:
    def __len__(self):
        return 0

    def modality_lengths(self):
        return []


def test_bench_train_packed_tiny_smoke():
    """bench.bench_train_packed runs end-to-end on the tiny config (the
    driver runs it on 7B; a silent breakage there would only surface as a
    train_packed_error key in the round artifact)."""
    import bench
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.lm.quant import quantize_llama_params

    cfg = ModelConfig.tiny()
    lm_int8 = quantize_llama_params(
        init_llama_params(jax.random.PRNGKey(0), cfg.lm))
    out = bench.bench_train_packed(lm_int8, runs=1, cfg=cfg)
    assert out["train_padded_samples_s"] > 0
    assert out["train_packed_samples_s"] > 0
    assert out["train_pack_speedup"] > 0
