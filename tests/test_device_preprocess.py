"""On-device preprocessing parity vs the host VideoProcessor (cv2)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax.numpy as jnp

from videollamb_tpu.data.device_preprocess import (
    DeviceVideoProcessor,
    device_video_preprocess,
)
from videollamb_tpu.data.processing import VideoProcessor


def _frames(t=4, h=360, w=640, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(t, h, w, 3)).astype(np.uint8)


@pytest.mark.parametrize("h,w", [(360, 640), (640, 360), (224, 224), (300, 300)])
def test_device_matches_host_processor(h, w):
    pytest.importorskip("cv2")
    frames = _frames(h=h, w=w, seed=h + w)
    host = VideoProcessor(size=224)(frames)
    dev = np.asarray(device_video_preprocess(jnp.asarray(frames), size=224))
    assert dev.shape == host.shape == (4, 3, 224, 224)
    # cv2's fixed-point bilinear vs float bilinear: <1/255 per pixel
    # pre-normalization; normalize divides by std ~0.27 -> ~4/255 bound.
    err = np.abs(dev - host).max()
    assert err < 4.5 / 255 / 0.26, err


def test_identity_size_skips_resize_exactly():
    pytest.importorskip("cv2")
    frames = _frames(h=224, w=224, seed=1)
    host = VideoProcessor(size=224)(frames)
    dev = np.asarray(device_video_preprocess(jnp.asarray(frames), size=224))
    np.testing.assert_allclose(dev, host, rtol=0, atol=1e-5)


def test_wrapper_contract_and_single_frame():
    proc = DeviceVideoProcessor(size=224, out_dtype=jnp.bfloat16)
    out = proc(_frames(t=2))
    assert out.shape == (2, 3, 224, 224) and out.dtype == jnp.bfloat16
    one = proc(_frames(t=1)[0])  # (H, W, 3) promotes to T=1
    assert one.shape == (1, 3, 224, 224)


def test_feeds_the_encoder():
    import jax

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode

    cfg = ModelConfig.tiny()
    params = init_vision_params(jax.random.PRNGKey(0), cfg.vision)
    frames = _frames(t=8, h=cfg.vision.image_size * 2,
                     w=cfg.vision.image_size * 3)
    pixels = device_video_preprocess(jnp.asarray(frames),
                                     size=cfg.vision.image_size)
    feats = vision_encode(params, pixels[None], cfg.vision)
    assert feats.shape[0] == 1 and feats.shape[1] == 8


def test_chat_roundtrip_with_device_processor():
    """The serve path (--device-preprocess) works end to end: Chat's video
    ask runs with the TPU-side processor in the processors dict."""
    import jax

    from test_serving import ChatTokenizer
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor
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
    tok("A chat between a curious human and an artificial intelligence assistant")
    chat = Chat(tok, params, cfg, {
        "VIDEO": DeviceVideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)
    raw = _frames(t=8, h=80, w=120, seed=7)
    frames = chat.processors["VIDEO"](raw)
    out = chat.ask_about_video("what happens", frames, max_new_tokens=4,
                               do_sample=False)
    assert isinstance(out, str) and out
