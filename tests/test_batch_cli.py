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


def test_batch_cli_audio_request(tmp_path):
    """Audio JSONL request: WAV -> fbank -> audio-tower model -> tokens."""
    import dataclasses
    import wave

    from test_serving import ChatTokenizer
    from videollamb_tpu.models.bridge.builder import init_bridge_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.builder import TowerSpec
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.models.vision.modalities import (
        AudioProcessor,
        audio_tower_config,
    )
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.server import ServingEngine

    tiny_dims = dict(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64)
    vcfg = audio_tower_config(image_size_hw=(28, 56), patch_size=14, **tiny_dims)
    base = ModelConfig.tiny(max_length=128)
    cfg = dataclasses.replace(
        base, bridge=dataclasses.replace(base.bridge, kind="mlp"),
        tower=TowerSpec("languagebind_audio", vcfg, frame_wise=True))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    params = {
        "video_tower": init_vision_params(k1, vcfg),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence assistant")
    chat = Chat(tok, params, cfg, {
        "AUDIO": AudioProcessor(num_mel_bins=28, target_length=56),
    }, text_bucket=32)

    sr = 16000
    wav_arr = (0.3 * np.sin(2 * np.pi * 330 * np.linspace(0, 0.5, sr // 2)))
    path = tmp_path / "a.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav_arr * 32767).astype(np.int16).tobytes())

    lines = [{"id": "au", "prompt": "what do you hear",
              "audio": str(path), "max_new_tokens": 4}]
    reqs = build_requests(lines, chat)
    rows = serve_requests(
        ServingEngine(params, cfg, num_slots=1, eos_token_id=-1),
        reqs, chat.tokenizer, k=2)
    assert rows[0]["id"] == "au" and rows[0]["tokens"] == 4


def test_batch_cli_shared_prefix_rows(tiny_chat, tmp_path):
    """'shared_prefix' rows: same answers as full-prompt rows through the
    paged engine, with one prefix registration shared by both requests
    (automatic prefix caching, serve/paged.py)."""
    chat, params, cfg = tiny_chat
    from videollamb_tpu.serve.paged import PagedServingEngine

    vid = _frame_dir(tmp_path)
    qs = ["what is happening", "who is present"]
    full_lines = [{"id": f"f{i}", "prompt": q, "video": vid,
                   "max_new_tokens": 5} for i, q in enumerate(qs)]
    pfx_lines = [{"id": f"p{i}", "prompt": q, "video": vid,
                  "max_new_tokens": 5, "shared_prefix": True}
                 for i, q in enumerate(qs)]

    ref = serve_requests(
        PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                           eos_token_id=-1),
        build_requests(full_lines, chat), chat.tokenizer, k=4)

    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                eos_token_id=-1)
    reqs = build_requests(pfx_lines, chat)
    assert all(r.prefix_batch is not None for r in reqs)
    out = serve_requests(engine, reqs, chat.tokenizer, k=4)

    assert engine.prefix_misses == 1 and engine.prefix_hits == 1
    by_id = {r["id"]: r["text"] for r in ref + out}
    for i in range(len(qs)):
        assert by_id[f"f{i}"] == by_id[f"p{i}"], (i, by_id)


def test_batch_cli_shared_prefix_requires_media(tiny_chat):
    chat, _, _ = tiny_chat
    import pytest as _pt

    with _pt.raises(ValueError, match="shared_prefix"):
        build_requests([{"id": "x", "prompt": "hi", "shared_prefix": True,
                         "max_new_tokens": 2}], chat)
