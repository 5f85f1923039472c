"""Eval harness tests: MC prompt format, chunk/merge protocol, accuracy
aggregation, judge prompt construction, end-to-end shard inference on a
tiny model."""

import json
import os

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu.eval.acc import compute_accuracy, merge_shards
from videollamb_tpu.eval.gpt_judge import JUDGE_PROMPTS, judge_messages, aggregate
from videollamb_tpu.eval.videoqa_mc import (
    OPTIONS,
    build_mc_question,
    get_chunk,
    run_inference,
    split_list,
)


def test_build_mc_question_llava_format():
    q = build_mc_question("What happens?", {"0": "runs", "1": "sits"})
    assert q == (
        "What happens?\nA. runs\nB. sits\n"
        "Answer with the option's letter from the given choices directly."
    )


def test_chunking_protocol():
    lst = list(range(10))
    chunks = [get_chunk(lst, 3, i) for i in range(3)]
    assert sum(chunks, []) == lst
    assert all(len(c) in (2, 3, 4) for c in chunks)


def test_merge_and_accuracy(tmp_path):
    shard0 = tmp_path / "s0.json"
    shard1 = tmp_path / "s1.json"
    shard0.write_text(json.dumps({"question": "q1", "answer": "A", "pred": "A.", "type": "t1"}) + "\n")
    shard1.write_text(
        json.dumps({"question": "q2", "answer": "B", "pred": "C", "type": "t1"}) + "\n"
        + json.dumps({"question": "q3", "answer": "C", "pred": "C", "type": "t2"}) + "\n"
    )
    merged = merge_shards([str(shard0), str(shard1)], str(tmp_path / "m.jsonl"))
    overall, per_type, total = compute_accuracy(merged)
    assert total == 3
    assert overall == pytest.approx(2 / 3)
    assert per_type["t1"] == pytest.approx(0.5)
    assert per_type["t2"] == 1.0


def test_judge_messages_all_dimensions():
    qa = {"q": "what", "a": "ans", "pred": "guess", "q2": "w2", "pred2": "g2"}
    for dim in JUDGE_PROMPTS:
        msgs = judge_messages(dim, qa)
        assert msgs[0]["role"] == "system" and msgs[1]["role"] == "user"
        assert "what" in msgs[1]["content"]
        assert "{'" in msgs[1]["content"]  # the dict-format instruction


def test_judge_aggregate(tmp_path):
    for i, (pred, score) in enumerate([("yes", 4), ("no", 1), ("yes", 5)]):
        with open(tmp_path / f"{i}.json", "w") as f:
            json.dump([{"pred": pred, "score": score}, {}], f)
    out = aggregate(str(tmp_path))
    assert out["n"] == 3
    assert out["accuracy"] == pytest.approx(2 / 3)
    assert out["average_score"] == pytest.approx(10 / 3)


def test_mc_inference_end_to_end(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from test_serving import tiny_chat as _  # noqa: F401  (fixture import)
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.serve.chat import Chat
    from test_serving import ChatTokenizer
    import jax

    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    chat = Chat(ChatTokenizer(), params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)

    vids = tmp_path / "videos"
    vids.mkdir()
    writer = cv2.VideoWriter(str(vids / "v1.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(16):
        writer.write(np.full((48, 64, 3), i * 10, np.uint8))
    writer.release()

    questions = [{"question_id": 1, "video_name": "v1",
                  "question": "what", "option": {"0": "x", "1": "y"}}]
    answers = [{"answer": 0, "type": "demo"}]
    qf = tmp_path / "q.json"
    af = tmp_path / "a.json"
    qf.write_text(json.dumps(questions))
    af.write_text(json.dumps(answers))

    class Args:
        video_dir = str(vids)
        gt_file_question = str(qf)
        gt_file_answers = str(af)
        output_dir = str(tmp_path / "out")
        output_name = "pred0"
        num_chunks = 1
        chunk_idx = 0
        num_frames = 8
        max_new_tokens = 4
        temperature = 0.0
        names_have_extension = False

    result = run_inference(Args(), chat=chat)
    assert result["n"] == 1
    lines = open(result["output"]).read().strip().splitlines()
    rec = json.loads(lines[0])
    assert rec["answer"] == "A" and "pred" in rec and rec["type"] == "demo"


def test_likelihood_ranking_prefers_training_answer():
    """Likelihood MC: sanity — runs end-to-end on the tiny model and returns
    a valid option index for every call."""
    import jax
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.eval.videoqa_likelihood import rank_options_by_likelihood
    from videollamb_tpu.serve.chat import Chat
    from test_serving import ChatTokenizer
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.train.preprocess import set_default_conversation

    set_default_conversation("v1")
    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    chat = Chat(ChatTokenizer(), params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    })
    frames = VideoProcessor(size=cfg.vision.image_size)(
        np.random.default_rng(0).integers(0, 255, size=(8, 56, 56, 3)).astype(np.uint8)
    )
    idx = rank_options_by_likelihood(
        chat, "what happens", ["a dog runs", "nothing at all", "cats"], frames)
    assert idx in (0, 1, 2)


def _tiny_eval_chat():
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
    return Chat(ChatTokenizer(), params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)


def _write_tiny_video(tmp_path, name="v1.mp4"):
    cv2 = pytest.importorskip("cv2")
    vids = tmp_path / "videos"
    vids.mkdir(exist_ok=True)
    writer = cv2.VideoWriter(str(vids / name),
                             cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(16):
        writer.write(np.full((48, 64, 3), i * 10, np.uint8))
    writer.release()
    return vids


class _BaseArgs:
    num_chunks = 1
    chunk_idx = 0
    num_frames = 8
    max_new_tokens = 4
    temperature = 0.0


def test_open_ended_videoqa_end_to_end(tmp_path):
    """Open-ended QA driver (eval/videoqa.py): chunk -> decode -> JSONL."""
    from videollamb_tpu.eval.videoqa import run_inference

    chat = _tiny_eval_chat()
    vids = _write_tiny_video(tmp_path)
    (tmp_path / "q.json").write_text(json.dumps(
        [{"question_id": 1, "video_name": "v1", "question": "what happens"}]))
    (tmp_path / "a.json").write_text(json.dumps([{"answer": "something"}]))

    class Args(_BaseArgs):
        video_dir = str(vids)
        gt_file_question = str(tmp_path / "q.json")
        gt_file_answers = str(tmp_path / "a.json")
        output_dir = str(tmp_path / "out")
        output_name = "pred0"

    result = run_inference(Args(), chat=chat)
    assert result["n"] == 1
    rec = json.loads(open(result["output"]).read().strip())
    assert rec["answer"] == "something" and isinstance(rec["pred"], str)


def test_moviechat_flat_and_ws_end_to_end(tmp_path):
    """MovieChat drivers: flat QA and global/breakpoint session format."""
    from videollamb_tpu.eval.videoqa_moviechat import (
        run_inference,
        run_inference_global_breakpoint,
    )

    chat = _tiny_eval_chat()
    vids = _write_tiny_video(tmp_path)
    (tmp_path / "q.json").write_text(json.dumps(
        [{"question_id": 1, "video_name": "v1", "question": "what",
          "type": "g"}]))
    (tmp_path / "a.json").write_text(json.dumps([{"answer": "yes"}]))

    class Args(_BaseArgs):
        video_dir = str(vids)
        gt_file_question = str(tmp_path / "q.json")
        gt_file_answers = str(tmp_path / "a.json")
        output_dir = str(tmp_path / "out")
        output_name = "pred0"

    result = run_inference(Args(), chat=chat)
    assert result["n"] == 1
    rec = json.loads(open(result["output"]).read().strip())
    assert rec["pred"] and rec["type"] == "g"

    (tmp_path / "ws.json").write_text(json.dumps([{
        "video_name": "v1",
        "global": [{"video_name": "v1", "question": "overall?"}],
        "breakpoint": [{"video_name": "v1", "question": "now?", "time": 3}],
    }]))

    class WsArgs(_BaseArgs):
        video_dir = str(vids)
        gt_file_question = str(tmp_path / "ws.json")
        output_dir = str(tmp_path / "out")
        output_name = "ws0"

    result = run_inference_global_breakpoint(WsArgs(), chat=chat)
    rec = json.loads(open(result["output"]).read().strip())
    assert "v1.mp4" in rec
    assert rec["v1.mp4"]["global"][0]["answer"]
    assert rec["v1.mp4"]["breakpoint"][0]["answer"]


def test_consistency_driver_end_to_end(tmp_path):
    """Consistency (Q1/Q2) driver writes both predictions per sample."""
    from videollamb_tpu.eval.videoqa_consistency import run_inference

    chat = _tiny_eval_chat()
    vids = _write_tiny_video(tmp_path)
    (tmp_path / "gt.json").write_text(json.dumps(
        [{"question_id": 1, "video_name": "v1",
          "Q1": "first?", "Q2": "second?", "A": "ans"}]))

    class Args(_BaseArgs):
        video_dir = str(vids)
        gt_file = str(tmp_path / "gt.json")
        output_dir = str(tmp_path / "out")
        output_name = "pred0"

    result = run_inference(Args(), chat=chat)
    assert result["n"] == 1
    rec = json.loads(open(result["output"]).read().strip())
    assert rec["pred1"] and rec["pred2"] and rec["answer"] == "ans"


def test_mc_batched_engine_matches_sequential(tmp_path):
    """--batch_slots path: batched engine answers equal the sequential
    chat-driven driver (greedy), same records and accuracy."""
    cv2 = pytest.importorskip("cv2")
    from videollamb_tpu.eval.videoqa_mc import (
        run_inference,
        run_inference_batched,
    )

    chat = _tiny_eval_chat()
    vids = _write_tiny_video(tmp_path, "v1.mp4")
    _write_tiny_video(tmp_path, "v2.mp4")

    questions = [
        {"question_id": 1, "video_name": "v1", "question": "what",
         "option": {"0": "x", "1": "y"}},
        {"question_id": 2, "video_name": "v2", "question": "which",
         "option": {"0": "p", "1": "q", "2": "r"}},
        {"question_id": 3, "video_name": "v1", "question": "how",
         "option": {"0": "m", "1": "n"}},
    ]
    answers = [{"answer": 0, "type": "t"}, {"answer": 2}, {"answer": 1}]
    (tmp_path / "q.json").write_text(json.dumps(questions))
    (tmp_path / "a.json").write_text(json.dumps(answers))

    class Args(_BaseArgs):
        video_dir = str(vids)
        gt_file_question = str(tmp_path / "q.json")
        gt_file_answers = str(tmp_path / "a.json")
        output_dir = str(tmp_path / "out")
        names_have_extension = False
        temperature = 0.0

    class SeqArgs(Args):
        output_name = "seq"

    class BatchArgs(Args):
        output_name = "batch"

    seq = run_inference(SeqArgs(), chat=chat)
    bat = run_inference_batched(BatchArgs(), chat=chat, num_slots=2,
                                sync_every=3)
    assert bat["n"] == seq["n"] == 3
    seq_recs = {json.loads(l)["id"]: json.loads(l)
                for l in open(seq["output"])}
    bat_recs = {json.loads(l)["id"]: json.loads(l)
                for l in open(bat["output"])}
    assert set(seq_recs) == set(bat_recs)
    for qid in seq_recs:
        assert bat_recs[qid]["pred"] == seq_recs[qid]["pred"], qid
        assert bat_recs[qid]["answer"] == seq_recs[qid]["answer"]
    assert bat["acc"] == seq["acc"]


def test_mc_batched_constrained_pins_output_to_letters(tmp_path):
    """--constrained: every prediction is exactly one of the option
    letters, regardless of what the free model would have said."""
    cv2 = pytest.importorskip("cv2")
    from videollamb_tpu.eval.videoqa_mc import run_inference_batched

    chat = _tiny_eval_chat()
    # Seed the letters so the tokenizer has ids for them.
    chat.tokenizer("A B C")
    vids = _write_tiny_video(tmp_path, "v1.mp4")

    questions = [
        {"question_id": 1, "video_name": "v1", "question": "what",
         "option": {"0": "x", "1": "y"}},
        {"question_id": 2, "video_name": "v1", "question": "which",
         "option": {"0": "p", "1": "q", "2": "r"}},
    ]
    answers = [{"answer": 0}, {"answer": 2}]
    (tmp_path / "q.json").write_text(json.dumps(questions))
    (tmp_path / "a.json").write_text(json.dumps(answers))

    class Args(_BaseArgs):
        video_dir = str(vids)
        gt_file_question = str(tmp_path / "q.json")
        gt_file_answers = str(tmp_path / "a.json")
        output_dir = str(tmp_path / "out")
        output_name = "con"
        names_have_extension = False
        temperature = 0.0
        constrained = True

    res = run_inference_batched(Args(), chat=chat, num_slots=2, sync_every=4)
    recs = [json.loads(l) for l in open(res["output"])]
    assert len(recs) == 2
    assert recs[0]["pred"] in ("A", "B")
    assert recs[1]["pred"] in ("A", "B", "C")
