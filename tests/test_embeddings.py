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


def test_load_binding_checkpoints_matches_hf_clip(tmp_path):
    """Checkpoint loader oracle: a HF CLIPModel dual encoder saved to
    disk loads into the binding layout, and text/image embeddings + the
    contrastive logits match transformers exactly."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig(
        text_config={"vocab_size": 120, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4,
                     "max_position_embeddings": 16,
                     "eos_token_id": 119, "bos_token_id": 118},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "image_size": 32, "patch_size": 8},
        projection_dim=24,
    )
    torch.manual_seed(0)
    hf = CLIPModel(hf_cfg).eval()
    ckpt = tmp_path / "clip"
    hf.save_pretrained(str(ckpt))

    from videollamb_tpu.models.binding import (
        binding_encode_modality,
        binding_encode_text,
        load_binding_checkpoints,
    )

    params, vcfgs, tcfg = load_binding_checkpoints({"image": str(ckpt)})
    assert vcfgs["image"].add_time_attn is False
    assert tcfg.vocab_size == 120 and tcfg.max_position_embeddings == 16

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 110, size=(2, 12)).astype(np.int64)
    ids[:, -1] = 119  # EOT = max id (CLIP pooling)
    pixels = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)

    with torch.no_grad():
        hf_t = hf.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
        hf_i = hf.get_image_features(
            pixel_values=torch.from_numpy(pixels)).numpy()
        hf_logits = hf(input_ids=torch.from_numpy(ids),
                       pixel_values=torch.from_numpy(pixels),
                       ).logits_per_text.numpy()

    import jax.numpy as jnp

    ours_t = np.asarray(binding_encode_text(
        params, jnp.asarray(ids.astype(np.int32)), tcfg))
    ours_i = np.asarray(binding_encode_modality(
        params, "image", jnp.asarray(pixels)[:, None], vcfgs["image"],
        use_temp=False))

    def norm(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    np.testing.assert_allclose(ours_t, norm(hf_t), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours_i, norm(hf_i), rtol=2e-4, atol=2e-4)
    scale = np.exp(np.asarray(
        params["modalities"]["image"]["logit_scale"], np.float32))
    ours_logits = scale * ours_t @ ours_i.T
    np.testing.assert_allclose(ours_logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_build_embedder_from_checkpoint_dir(tmp_path):
    """The server CLI path: --binding-towers image=DIR builds a working
    EmbeddingService from a saved dual-encoder checkpoint (weights +
    config + tokenizer files all come from the dir)."""
    torch = pytest.importorskip("torch")
    import json

    from transformers import CLIPConfig, CLIPModel

    hf_cfg = CLIPConfig(
        text_config={"vocab_size": 120, "hidden_size": 32,
                     "intermediate_size": 64, "num_hidden_layers": 2,
                     "num_attention_heads": 4,
                     "max_position_embeddings": 16,
                     "eos_token_id": 119, "bos_token_id": 118},
        vision_config={"hidden_size": 32, "intermediate_size": 64,
                       "num_hidden_layers": 2, "num_attention_heads": 4,
                       "image_size": 32, "patch_size": 8},
        projection_dim=24,
    )
    torch.manual_seed(0)
    ckpt = tmp_path / "clip"
    CLIPModel(hf_cfg).eval().save_pretrained(str(ckpt))
    vocab = {"<|startoftext|>": 118, "<|endoftext|>": 119}
    for i, w in enumerate(["a</w>", "dog</w>", "runs</w>"]):
        vocab[w] = 2 + i
    json.dump(vocab, open(ckpt / "vocab.json", "w"))
    (ckpt / "merges.txt").write_text("#version: 0.2\n")
    json.dump({"tokenizer_class": "CLIPTokenizer", "model_max_length": 16},
              open(ckpt / "tokenizer_config.json", "w"))

    from videollamb_tpu.serve.http_server import build_embedder

    service = build_embedder(f"image={ckpt}")
    out = service.openai_embeddings({"input": ["a dog runs", "a"]})
    embs = np.asarray([d["embedding"] for d in out["data"]], np.float32)
    assert embs.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, rtol=1e-3)

    with pytest.raises(ValueError, match="modality=dir"):
        build_embedder("just-a-path")
