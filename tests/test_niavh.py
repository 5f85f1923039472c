"""NIAVH pressure-test harness: needle placement arithmetic, scoring,
grid protocol, and end-to-end runs (full + streaming routes) on the tiny
model. The reference points users at its MM-NIAVH companion benchmark
(reference README.md:144-149); this driver synthesizes that protocol."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu.eval.niavh import (
    insert_needle,
    sample_indices,
    score_pred,
    summarize,
)


def _clip(n, value, size=48):
    return np.full((n, size, size, 3), value, np.uint8)


def test_sample_indices_uniform_and_identity():
    assert list(sample_indices(5, 8)) == [0, 1, 2, 3, 4]
    idx = sample_indices(100, 10)
    assert len(idx) == 10 and idx[0] == 0 and idx[-1] == 99
    assert all(np.diff(idx) > 0)


def test_insert_needle_placement_exact():
    hay = _clip(64, 0)
    ndl = _clip(4, 255)
    for depth in (0.0, 0.25, 0.5, 0.75, 1.0):
        frames, start = insert_needle(hay, ndl, length=32, depth=depth)
        assert frames.shape == (32, 48, 48, 3)
        assert start == int(round(depth * 28))
        marks = np.where(frames[:, 0, 0, 0] == 255)[0]
        assert list(marks) == list(range(start, start + 4))


def test_insert_needle_resizes_mismatched_geometry():
    hay = _clip(16, 0, size=48)
    ndl = _clip(2, 255, size=20)
    frames, start = insert_needle(hay, ndl, length=8, depth=0.5)
    assert frames.shape == (8, 48, 48, 3)
    assert (frames[start] == 255).all()


def test_insert_needle_rejects_oversized_needle():
    with pytest.raises(ValueError):
        insert_needle(_clip(16, 0), _clip(8, 255), length=8, depth=0.5)


def test_score_pred_lenient():
    assert score_pred("The secret WORD is: banana!", "banana")
    assert score_pred("banana", "Banana.")
    assert not score_pred("apple pie", "banana")


def test_summarize_grid():
    records = [
        {"length": 32, "depth": 0.0, "correct": True},
        {"length": 32, "depth": 0.0, "correct": False},
        {"length": 32, "depth": 1.0, "correct": True},
        {"length": 64, "depth": 0.0, "correct": False},
    ]
    s = summarize(records)
    assert s["grid"]["32"]["0.0"] == 0.5
    assert s["grid"]["32"]["1.0"] == 1.0
    assert s["grid"]["64"]["0.0"] == 0.0
    assert s["overall"] == 0.5 and s["n"] == 4


def _write_video(path, frames):
    cv2 = pytest.importorskip("cv2")
    h, w = frames.shape[1:3]
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 30,
                             (w, h))
    for f in frames:
        writer.write(f)
    writer.release()


def _args(tmp_path, **over):
    class Args:
        haystack_video = str(tmp_path / "haystack.mp4")
        needle_json = str(tmp_path / "needles.json")
        lengths = "16"
        depths = "0.0,1.0"
        needle_frames = 2
        mode = "full"
        stream_open_frames = 4
        stream_seq_len = 512
        output_dir = str(tmp_path / "out")
        output_name = "niavh"
        max_new_tokens = 4
        temperature = 0.0

    for k, v in over.items():
        setattr(Args, k, v)
    return Args()


def _stage(tmp_path):
    rng = np.random.default_rng(0)
    hay = rng.integers(0, 255, size=(64, 48, 48, 3)).astype(np.uint8)
    _write_video(tmp_path / "haystack.mp4", hay)
    _write_video(tmp_path / "needle.mp4", _clip(6, 250))
    (tmp_path / "needles.json").write_text(json.dumps([
        {"needle": str(tmp_path / "needle.mp4"),
         "question": "what was the secret word shown",
         "answer": "banana"},
    ]))


def test_pressure_test_full_mode_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    from videollamb_tpu.eval.niavh import run_pressure_test

    _stage(tmp_path)
    chat = _tiny_chat()
    summary = run_pressure_test(_args(tmp_path), chat=chat)
    assert summary["n"] == 2  # 1 needle x 1 length x 2 depths
    assert set(summary["grid"]["16"].keys()) == {"0.0", "1.0"}
    records = [json.loads(l) for l in open(summary["records"])]
    assert all(isinstance(r["pred"], str) for r in records)
    assert {r["depth"] for r in records} == {0.0, 1.0}
    # Depth-0 needle sits at frame 0; depth-1 at the end of the body.
    starts = {r["depth"]: r["needle_start"] for r in records}
    assert starts[0.0] == 0 and starts[1.0] == 14
    grid = json.load(open(tmp_path / "out" / "niavh_grid.json"))
    assert grid["n"] == 2


def test_pressure_test_streaming_mode_answers(tmp_path):
    """The streaming route must produce a non-empty answer for every cell
    (the query is timestamped so it lands after the final frame fold)."""
    pytest.importorskip("cv2")
    from videollamb_tpu.eval.niavh import run_pressure_test

    _stage(tmp_path)
    chat = _tiny_chat()
    args = _args(tmp_path, mode="streaming", lengths="12", depths="1.0")
    summary = run_pressure_test(args, chat=chat)
    assert summary["n"] == 1
    rec = json.loads(open(summary["records"]).read())
    assert rec["pred"] != ""


def _tiny_chat():
    import jax

    from test_serving import ChatTokenizer
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence "
        "assistant what was the secret word shown banana")
    return Chat(tok, params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)
