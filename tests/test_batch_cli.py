"""Batch serving CLI plumbing: JSONL requests -> engine -> JSONL answers,
dense and paged engines agreeing."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.serve.batch_cli import build_requests, serve_requests


@pytest.fixture(scope="module")
def tiny_chat():
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat
    from test_serving import ChatTokenizer

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    processors = {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence assistant")
    return Chat(tok, params, cfg, processors, text_bucket=32), params, cfg


def _frame_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    d = tmp_path / "vid"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        frame = rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8)
        cv2.imwrite(str(d / f"{i:04d}.jpg"), frame)
    return str(d)


def test_batch_cli_dense_and_paged_agree(tiny_chat, tmp_path):
    chat, params, cfg = tiny_chat
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    lines = [
        {"id": "a", "prompt": "what is happening",
         "video": _frame_dir(tmp_path), "max_new_tokens": 5},
        {"id": "b", "prompt": "hello there", "max_new_tokens": 5},
    ]

    outs = {}
    for name, engine in [
        ("dense", ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)),
        ("paged", PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                     eos_token_id=-1)),
    ]:
        reqs = build_requests(lines, chat)
        rows = serve_requests(engine, reqs, chat.tokenizer, k=4)
        outs[name] = {r["id"]: r for r in rows}
        assert set(outs[name]) == {"a", "b"}
        assert all(r["tokens"] == 5 for r in rows)

    for uid in ("a", "b"):
        assert outs["dense"][uid]["text"] == outs["paged"][uid]["text"]

    # JSONL round trip like main() does.
    path = tmp_path / "out.jsonl"
    with open(path, "w") as f:
        for row in outs["paged"].values():
            f.write(json.dumps(row) + "\n")
    back = [json.loads(l) for l in open(path)]
    assert len(back) == 2
