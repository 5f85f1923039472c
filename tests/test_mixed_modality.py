"""Mixed-modality requests (VERDICT r2 #6): image+video(+audio) blocks in
ONE prompt through the K-sentinel splice, end-to-end from the CLI surface.

Reference protocol: llava/eval/model_videoqa_act.py:82-88,117-120 (the
X / X_modalities request lists)."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import X_TOKEN_INDEX


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


def test_tokenizer_multi_x_token_orders_sentinels(tiny_chat):
    from videollamb_tpu.mm_utils import tokenizer_multi_x_token, tokenizer_x_token

    chat, _, _ = tiny_chat
    tok = chat.tokenizer
    prompt = "<video>\ncompare with <image>\nwhat changed"
    ids, mods = tokenizer_multi_x_token(prompt, tok)
    assert mods == ["VIDEO", "IMAGE"]
    sentinels = [i for i in ids if i < 0]
    assert sentinels == [X_TOKEN_INDEX["VIDEO"], X_TOKEN_INDEX["IMAGE"]]

    # Single-tag prompts reduce to tokenizer_x_token exactly.
    single = "<video>\nwhat is happening"
    ids1, mods1 = tokenizer_multi_x_token(single, tok)
    ids_ref = tokenizer_x_token(single, tok, X_TOKEN_INDEX["VIDEO"])
    assert mods1 == ["VIDEO"]
    assert list(ids1) == list(ids_ref)


def test_encode_mixed_matches_per_modality_encoders(tiny_chat):
    """Block k of encode_mixed must be exactly what the dedicated encoder
    produces for that medium, under the shared padded-N layout."""
    from videollamb_tpu.models.assembly import (
        encode_images, encode_mixed, encode_videos,
    )

    _, params, cfg = tiny_chat
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.normal(size=(8, 3, 56, 56)).astype(np.float32))
    image = jnp.asarray(rng.normal(size=(3, 56, 56)).astype(np.float32))

    xe, xm = encode_mixed(params, cfg, (("VIDEO", video), ("IMAGE", image)))
    ve, vm = encode_videos(params, cfg, video[None])
    ie, im = encode_images(params, cfg, image[None])

    assert xe.shape[:2] == (1, 2)
    np.testing.assert_allclose(
        np.asarray(xe[0, 0, : ve.shape[1]]), np.asarray(ve[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xe[0, 1, : ie.shape[1]]), np.asarray(ie[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(xm[0, 0, : vm.shape[1]]), np.asarray(vm[0]).astype(bool))
    np.testing.assert_array_equal(
        np.asarray(xm[0, 1, : im.shape[1]]), np.asarray(im[0]).astype(bool))
    # Padding beyond each block's own tokens is masked out.
    assert not np.asarray(xm[0, 1, im.shape[1]:]).any()


def test_ask_mixed_single_video_matches_plain_video_path(tiny_chat):
    """A K=1 mixed request must reproduce the standard video path token
    for token (same prompt, same greedy decode)."""
    chat, _, _ = tiny_chat
    rng = np.random.default_rng(1)
    frames = chat.processors["VIDEO"](
        rng.integers(0, 255, size=(8, 56, 56, 3)).astype(np.uint8))

    chat.reset()
    plain = chat.ask_about_video("what is happening", frames,
                                 max_new_tokens=6, temperature=0.0,
                                 do_sample=False)
    chat.reset()
    mixed = chat.ask_mixed("what is happening", [("VIDEO", frames)],
                           max_new_tokens=6)
    assert mixed == plain


def test_mixed_video_image_request_end_to_end(tiny_chat):
    """Video+image in one prompt: the answer must exist AND both blocks
    must reach the LM (perturbing either medium moves the spliced embeds
    and the forward logits)."""
    from videollamb_tpu.models.assembly import (
        MultimodalBatch, prepare_multimodal_embeds,
    )
    from videollamb_tpu.models.lm.llama import llama_forward

    chat, params, cfg = tiny_chat
    rng = np.random.default_rng(2)
    frames = chat.processors["VIDEO"](
        rng.integers(0, 255, size=(8, 56, 56, 3)).astype(np.uint8))
    image = chat.processors["IMAGE"](
        rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))
    image_b = chat.processors["IMAGE"](
        rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))
    frames_b = chat.processors["VIDEO"](
        rng.integers(0, 255, size=(8, 56, 56, 3)).astype(np.uint8))

    chat.reset()
    answer = chat.ask_mixed("compare", [("VIDEO", frames), ("IMAGE", image)],
                            max_new_tokens=8)
    assert isinstance(answer, str) and len(answer) > 0

    def last_logits(vid, img):
        chat.reset()
        q = "<video>\n<image>\ncompare"
        chat.conv.append_message(chat.conv.roles[0], q)
        chat.conv.append_message(chat.conv.roles[1], None)
        ids, mask, order = chat._prepare_multi_ids(chat.conv.get_prompt())
        assert order == ["VIDEO", "IMAGE"]
        batch = MultimodalBatch(
            jnp.asarray(ids), jnp.asarray(mask), None, None, None,
            blocks=(("VIDEO", jnp.asarray(vid, jnp.float32)),
                    ("IMAGE", jnp.asarray(img, jnp.float32))))
        sp = prepare_multimodal_embeds(params, cfg, batch)
        lg = llama_forward(params["lm"], cfg.lm, sp.embeds, sp.attention_mask)
        return np.asarray(lg[0, int(sp.lengths[0]) - 1])

    base = last_logits(frames, image)
    diff_img = np.abs(base - last_logits(frames, image_b)).max()
    diff_vid = np.abs(base - last_logits(frames_b, image)).max()
    assert diff_img > 1e-3, "image block does not reach the LM"
    assert diff_vid > 1e-3, "video block does not reach the LM"


def test_batch_cli_mixed_row_through_both_engines(tiny_chat, tmp_path):
    """A JSONL row naming BOTH a video and an image becomes one mixed
    request; dense and paged engines agree on its tokens."""
    cv2 = pytest.importorskip("cv2")
    from videollamb_tpu.serve.batch_cli import build_requests, serve_requests
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    chat, params, cfg = tiny_chat
    rng = np.random.default_rng(3)
    vid_dir = tmp_path / "vid"
    vid_dir.mkdir()
    for i in range(4):
        cv2.imwrite(str(vid_dir / f"{i:04d}.jpg"),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))
    img_path = tmp_path / "img.jpg"
    cv2.imwrite(str(img_path),
                rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))

    lines = [{"id": "mix", "prompt": "what changed",
              "video": str(vid_dir), "image": str(img_path),
              "max_new_tokens": 5}]

    outs = {}
    for name, engine in [
        ("dense", ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)),
        ("paged", PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                     eos_token_id=-1)),
    ]:
        reqs = build_requests(lines, chat)
        assert reqs[0].batch.blocks is not None
        assert [m for m, _ in reqs[0].batch.blocks] == ["VIDEO", "IMAGE"]
        # Two sentinels made it into the ids, in prompt order.
        neg = [int(t) for t in np.asarray(reqs[0].batch.input_ids[0]) if t < 0]
        assert neg == [X_TOKEN_INDEX["VIDEO"], X_TOKEN_INDEX["IMAGE"]]
        rows = serve_requests(engine, reqs, chat.tokenizer, k=4)
        outs[name] = rows[0]
        assert rows[0]["tokens"] == 5
    assert outs["dense"]["text"] == outs["paged"]["text"]


def test_mixed_eval_driver(tiny_chat, tmp_path):
    """eval/videoqa_mixed.py end-to-end on a video+image question."""
    cv2 = pytest.importorskip("cv2")
    import argparse

    from videollamb_tpu.eval.videoqa_mixed import run_inference

    chat, _, _ = tiny_chat
    rng = np.random.default_rng(4)
    vid_dir = tmp_path / "vids" / "clip"
    vid_dir.mkdir(parents=True)
    for i in range(8):
        cv2.imwrite(str(vid_dir / f"{i:04d}.jpg"),
                    rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "ref.jpg"),
                rng.integers(0, 255, size=(56, 56, 3)).astype(np.uint8))

    qf = tmp_path / "q.json"
    af = tmp_path / "a.json"
    qf.write_text(json.dumps([{
        "question_id": 1, "question": "what changed",
        "video_name": "clip", "image_name": "ref.jpg",
    }]))
    af.write_text(json.dumps([{"answer": "nothing"}]))

    args = argparse.Namespace(
        model_path=None, model_base=None, video_tower=None,
        video_dir=str(tmp_path / "vids"), image_dir=str(img_dir),
        audio_dir=None, gt_file_question=str(qf), gt_file_answers=str(af),
        output_dir=str(tmp_path / "out"), output_name="pred",
        num_chunks=1, chunk_idx=0, num_frames=8, max_new_tokens=5,
        temperature=0.0,
    )
    res = run_inference(args, chat=chat)
    assert res["n"] == 1
    row = json.loads(open(res["output"]).readline())
    assert row["modalities"] == ["VIDEO", "IMAGE"]
    assert isinstance(row["pred"], str)
