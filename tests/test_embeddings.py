"""Multimodal embeddings service (serve/embeddings.py): OpenAI request
parsing, text batch bucketing, media items through the binding towers,
base64 encoding, and the joint-space property (text and video land in
the same normalized space)."""

import base64

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.binding import TextConfig, init_binding_params
from videollamb_tpu.serve.openai_api import BadRequest


class ClipTokenizer:
    """Word-level stand-in for the CLIP BPE tokenizer: stable small ids,
    EOT (= the highest id used, CLIP pooling convention) appended."""

    EOT = 99

    def __init__(self):
        self.vocab = {}

    def __call__(self, text):
        class R:
            pass

        r = R()
        ids = []
        for w in text.split():
            if w not in self.vocab:
                self.vocab[w] = 5 + (len(self.vocab) % 90)
            ids.append(self.vocab[w])
        r.input_ids = ids + [self.EOT]
        return r


@pytest.fixture(scope="module")
def service():
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.serve.embeddings import EmbeddingService

    vcfgs = {
        "image": VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=8, add_time_attn=False),
        "video": VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=8, add_time_attn=True,
                              num_frames=4),
    }
    tcfg = TextConfig(hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      vocab_size=100, max_position_embeddings=16)
    params = init_binding_params(jax.random.PRNGKey(0), vcfgs, tcfg,
                                 projection_dim=24)
    return EmbeddingService(
        params, vcfgs, ClipTokenizer(),
        {"image": ImageProcessor(size=32), "video": VideoProcessor(size=32)},
        text_cfg=tcfg, model_name="bind-tiny", num_frames=4)


def _video(tmp_path, name="clip.mp4", frames=8, seed=0):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path / name
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (48, 48))
    rng = np.random.default_rng(seed)
    for _ in range(frames):
        writer.write(rng.integers(0, 255, size=(48, 48, 3)).astype(np.uint8))
    writer.release()
    return str(path)


def test_text_batch_unit_norm_and_usage(service):
    out = service.openai_embeddings(
        {"input": ["a dog runs", "a cat sleeps", "rain"]})
    assert out["object"] == "list" and out["model"] == "bind-tiny"
    assert [d["index"] for d in out["data"]] == [0, 1, 2]
    embs = np.asarray([d["embedding"] for d in out["data"]], np.float32)
    assert embs.shape == (3, 24)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, rtol=1e-3)
    # usage counts real tokens (words + EOT), not the 77-padding.
    assert out["usage"]["prompt_tokens"] == 4 + 4 + 2
    assert out["usage"]["total_tokens"] == out["usage"]["prompt_tokens"]


def test_bucketing_matches_single_calls(service):
    """A 3-row batch pads to the 4-bucket; results must equal per-item
    calls (padding rows never leak into real rows)."""
    texts = ["a dog runs", "a cat sleeps", "rain"]
    batch = service.openai_embeddings({"input": texts})
    for i, t in enumerate(texts):
        single = service.openai_embeddings({"input": t})
        np.testing.assert_allclose(
            batch["data"][i]["embedding"], single["data"][0]["embedding"],
            rtol=1e-4, atol=1e-5)


def test_video_item_in_joint_space(service, tmp_path):
    path = _video(tmp_path)
    out = service.openai_embeddings({"input": [
        {"type": "text", "text": "a dog runs"},
        {"type": "video_url", "video_url": {"url": path}},
    ]})
    embs = [np.asarray(d["embedding"], np.float32) for d in out["data"]]
    assert embs[0].shape == embs[1].shape == (24,)
    np.testing.assert_allclose(np.linalg.norm(embs[1]), 1.0, rtol=1e-3)
    # Joint space: a cosine similarity is well-defined and in [-1, 1].
    cos = float(embs[0] @ embs[1])
    assert -1.001 <= cos <= 1.001
    # Determinism: same file embeds identically.
    again = service.openai_embeddings(
        {"input": [{"type": "video_url", "video_url": {"url": path}}]})
    np.testing.assert_allclose(again["data"][0]["embedding"], embs[1],
                               rtol=1e-5)


def test_image_item(service, tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "pic.png")
    rng = np.random.default_rng(1)
    cv2.imwrite(path, rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8))
    out = service.openai_embeddings(
        {"input": [{"type": "image_url", "image_url": {"url": path}}]})
    emb = np.asarray(out["data"][0]["embedding"], np.float32)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-3)


def test_base64_encoding_roundtrips(service):
    flt = service.openai_embeddings({"input": "a dog runs"})
    b64 = service.openai_embeddings({"input": "a dog runs",
                                     "encoding_format": "base64"})
    decoded = np.frombuffer(
        base64.b64decode(b64["data"][0]["embedding"]), "<f4")
    np.testing.assert_allclose(decoded, flt["data"][0]["embedding"],
                               rtol=1e-6)


def test_errors(service):
    with pytest.raises(BadRequest, match="'input'"):
        service.openai_embeddings({})
    with pytest.raises(BadRequest, match="non-empty"):
        service.openai_embeddings({"input": []})
    with pytest.raises(BadRequest, match="unsupported input part"):
        service.openai_embeddings({"input": [{"type": "tool"}]})
    with pytest.raises(BadRequest, match="encoding_format"):
        service.openai_embeddings({"input": "x", "encoding_format": "int8"})
    with pytest.raises(BadRequest) as e:
        service.openai_embeddings({"input": "x", "model": "other"})
    assert e.value.status == 404
    # Modality without a configured tower (no audio in this fixture).
    with pytest.raises(BadRequest, match="no 'audio' tower"):
        service.openai_embeddings(
            {"input": [{"type": "audio_url", "audio_url": {"url": "x.wav"}}]})
