"""Serving tests: Chat wrapper and streaming LiveInfer on a tiny model."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
from videollamb_tpu.serve.chat import Chat
from videollamb_tpu.serve.streaming import LiveInfer
from test_preprocess import WordTokenizer


class ChatTokenizer(WordTokenizer):
    eos_token_id = 2
    pad_token_id = 0

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.vocab.items()}
        words = [inv.get(i, f"tok{i}") for i in ids
                 if not (skip_special_tokens and i in (0, 1, 2))]
        return " ".join(words)


@pytest.fixture(scope="module")
def tiny_chat():
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
    processors = {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }
    tok = ChatTokenizer()
    # Seed some vocabulary so prompts tokenize deterministically.
    tok("A chat between a curious human and an artificial intelligence assistant")
    return Chat(tok, params, cfg, processors, text_bucket=32)


def _frames(t=8, size=56, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(t, size, size, 3)).astype(np.uint8)


def test_chat_video_roundtrip(tiny_chat):
    frames = tiny_chat.processors["VIDEO"](_frames())
    out = tiny_chat.ask_about_video(
        "what happens", frames, max_new_tokens=4, do_sample=False,
    )
    assert isinstance(out, str)
    # Conversation advanced: last assistant turn recorded.
    assert tiny_chat.conv.messages[-1][1] == out


def test_streaming_liveinfer_full_pass(tiny_chat):
    tiny_chat.reset()
    live = LiveInfer(tiny_chat, frame_fps=1.0)
    # Stage a synthetic "video" directly (bypass file IO).
    live.video_tensor = tiny_chat.processors["VIDEO"](_frames(t=12, seed=3))
    live.num_video_frames = 12
    live.video_duration = 12.0

    live.input_query_stream("what is shown", video_time=2.0)
    responses = []
    for i in range(12):
        live.input_video_stream(float(i))
        q, r = live()
        if r:
            responses.append((q, r))
    # The query at t=2 must have been answered once frames passed it.
    assert any("User: what is shown" in q for q, _ in responses)
    assert all(isinstance(r, str) for _, r in responses)


def test_streaming_boundary_bookkeeping(tiny_chat):
    tiny_chat.reset()
    live = LiveInfer(tiny_chat, frame_fps=1.0)
    # Strongly structured frames: two abrupt scene changes.
    frames = np.zeros((12, 56, 56, 3), np.uint8)
    frames[4:8] = 200
    frames[8:] = 90
    live.video_tensor = tiny_chat.processors["VIDEO"](frames)
    live.num_video_frames = 12
    live.video_duration = 12.0
    for i in range(12):
        live.input_video_stream(float(i))
        live._call_for_streaming()
    assert live.boundaries[0] == 0
    assert sorted(live.boundaries) == live.boundaries
