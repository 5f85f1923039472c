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


def test_stream_text_matches_generate(tiny_chat):
    """The incremental streamer (gradio path) must produce the same greedy
    text as the one-shot engine generate."""
    tiny_chat.reset()
    frames = tiny_chat.processors["VIDEO"](_frames(t=8, seed=7))
    from videollamb_tpu.constants import DEFAULT_X_TOKEN

    tiny_chat.conv.append_message(
        tiny_chat.conv.roles[0], DEFAULT_X_TOKEN["VIDEO"] + "\nwhat is this")
    tiny_chat.conv.append_message(tiny_chat.conv.roles[1], None)
    prompt = tiny_chat.conv.get_prompt()

    oneshot = tiny_chat.generate_text(
        prompt, videos=frames, max_new_tokens=6, do_sample=False)
    partials = list(tiny_chat.stream_text(
        prompt, videos=frames, max_new_tokens=6, do_sample=False))
    assert partials, "streamer yielded nothing"
    # Partials grow monotonically and the final equals the one-shot text.
    for a, b in zip(partials, partials[1:]):
        assert b.startswith(a[: max(len(a) - 2, 0)])
    assert partials[-1] == oneshot


def test_video_reader_av_backend_gated(tmp_path):
    """'av' backend is selectable; on images without PyAV it raises the
    module error rather than silently decoding wrong."""
    import pytest as _pytest

    from videollamb_tpu.data.video_reader import ffmpeg_command, load_video

    cmd = ffmpeg_command("in.mp4", "out.mp4", fps=1, resolution=224)
    assert cmd[0] == "ffmpeg" and "-r" in cmd and "out.mp4" == cmd[-1]
    import cv2

    path = str(tmp_path / "x.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 32))
    for i in range(10):
        w.write(np.full((32, 32, 3), i * 20, np.uint8))
    w.release()
    try:
        import av  # noqa: F401
    except ImportError:
        with _pytest.raises(ImportError):
            load_video(path, num_frames=2, backend="av")
    else:
        out = load_video(path, num_frames=2, backend="av")
        assert out.shape == (2, 32, 32, 3)


def test_kv_chat_session_matches_full_reprefill(tiny_chat):
    """Multi-turn KV reuse: each turn's answer equals the from-scratch
    full-prompt greedy answer; later turns EXTEND the cache instead of
    re-prefilling (diagnostics prove the fast path ran)."""
    from videollamb_tpu.serve.chat import Chat, KVChatSession

    base = tiny_chat
    frames = base.processors["VIDEO"](_frames())

    # Reference: a fresh Chat driven turn-by-turn with full re-prefill.
    ref_chat = Chat(base.tokenizer, base.params, base.cfg, base.processors,
                    text_bucket=32)
    ref_answers = []
    for i, q in enumerate(["what is shown", "and then"]):
        ref_answers.append(ref_chat.ask_about_video(
            q, frames, first_turn=(i == 0), max_new_tokens=6,
            do_sample=False, temperature=0.0))

    sess_chat = Chat(base.tokenizer, base.params, base.cfg, base.processors,
                     text_bucket=32)
    sess = KVChatSession(sess_chat, max_new_tokens=6)
    a1 = sess.ask("what is shown", frames)
    a2 = sess.ask("and then")
    assert [a1, a2] == ref_answers
    assert sess.full_prefills == 1 and sess.extends == 1

    # Forced diff mismatch -> exact fallback, still correct.
    sess2_chat = Chat(base.tokenizer, base.params, base.cfg, base.processors,
                      text_bucket=32)
    sess2 = KVChatSession(sess2_chat, max_new_tokens=6)
    sess2.ask("what is shown", frames)
    sess2.cached_ids[0] = -999  # corrupt: prefix check must fail
    a2b = sess2.ask("and then")
    assert a2b == ref_answers[1]
    assert sess2.full_prefills == 2


def test_kv_chat_session_speculative_matches_plain(tiny_chat):
    """KV reuse + prompt-lookup speculation compose: same answers as the
    plain session (greedy-exact), cache diff still extends across turns."""
    from videollamb_tpu.serve.chat import Chat, KVChatSession

    base = tiny_chat
    frames = base.processors["VIDEO"](_frames())

    def run(spec):
        chat = Chat(base.tokenizer, base.params, base.cfg, base.processors,
                    text_bucket=32)
        sess = KVChatSession(chat, max_new_tokens=6)
        a1 = sess.ask("what is shown", frames, speculative=spec)
        a2 = sess.ask("and then", speculative=spec)
        return [a1, a2], sess

    plain, _ = run(False)
    spec, sess = run(True)
    assert spec == plain
    assert sess.full_prefills == 1 and sess.extends == 1


def test_streaming_cli_main_end_to_end(tiny_chat, tmp_path):
    """serve/cli_streaming.main: real mp4 in, tick loop with fps/latency
    accounting, JSON history out."""
    cv2 = pytest.importorskip("cv2")
    from videollamb_tpu.serve.cli_streaming import main as streaming_main
    from videollamb_tpu.serve.streaming import LiveInfer

    path = tmp_path / "v.mp4"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (64, 48))
    for i in range(90):  # 3 s @ 30 fps -> 3 frames @ 1 fps
        writer.write(np.full((48, 64, 3), (i * 5) % 255, np.uint8))
    writer.release()

    tiny_chat.reset()
    live = LiveInfer(tiny_chat, frame_fps=1.0)

    class Args:
        video_file = str(path)
        query = "what is happening"
        query_time = 0.0
        no_sleep = True
        output = str(tmp_path / "history.json")

    import json

    streaming_main(live, Args())
    hist = json.loads(open(Args.output).read())
    assert hist["video_path"] == str(path)
    roles = [m["role"] for m in hist["conversation"]]
    assert "user" in roles and "assistant" in roles
    assert all("time" in m and "cost" in m for m in hist["conversation"])
