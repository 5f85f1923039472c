"""LanguageBind modality family: audio/depth/thermal towers + processors,
the binding meta-model (CLIP text oracle vs transformers), and the RMT
memory-token encoder."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.binding import (
    TextConfig,
    binding_encode_text,
    init_binding_params,
    init_text_params,
    language_bind_forward,
    text_encode,
)
from videollamb_tpu.models.vision.modalities import (
    AudioProcessor,
    DepthProcessor,
    ThermalProcessor,
    audio_tower_config,
    log_mel_fbank,
)


# ---------------------------------------------------------------------------
# Processors
# ---------------------------------------------------------------------------


def test_audio_processor_shapes_and_chunking():
    proc = AudioProcessor(sample_rate=1600, num_mel_bins=16, target_length=64)
    # Short clip: repeated + padded, three identical channels.
    short = np.sin(np.linspace(0, 20, 400)).astype(np.float32)
    out = proc(short)
    assert out.shape == (3, 16, 64)
    np.testing.assert_array_equal(out[0], out[1])
    # Long clip: three different chunks (front/middle/back).
    long = np.sin(np.linspace(0, 500, 1600 * 120 // 100 * 3)).astype(np.float32)
    out2 = proc(long)
    assert out2.shape == (3, 16, 64)
    assert not np.allclose(out2[0], out2[2])


def test_audio_resample_path():
    proc = AudioProcessor(sample_rate=1600, num_mel_bins=8, target_length=32)
    wav = np.random.default_rng(0).normal(size=3200).astype(np.float32)
    out = proc(wav, origin_sr=3200)  # 2x downsample
    assert out.shape == (3, 8, 32)
    assert np.isfinite(out).all()


def test_log_mel_fbank_frame_math():
    sr = 1600
    wav = np.random.default_rng(1).normal(size=sr).astype(np.float32)  # 1 s
    mel = log_mel_fbank(wav, sr, num_mel_bins=12)
    win, hop = sr * 25 // 1000, sr * 10 // 1000
    assert mel.shape == (1 + (sr - win) // hop, 12)
    assert np.isfinite(mel).all()


def test_depth_thermal_processors():
    depth = np.random.default_rng(0).uniform(500, 5000, size=(48, 64)).astype(np.float32)
    out = DepthProcessor(size=32)(depth)
    assert out.shape == (3, 32, 32)
    thermal = np.random.default_rng(1).integers(0, 255, size=(48, 64)).astype(np.uint8)
    out = ThermalProcessor(size=32)(thermal)
    assert out.shape == (3, 32, 32)


# ---------------------------------------------------------------------------
# Rectangular (audio) tower
# ---------------------------------------------------------------------------


def test_audio_tower_rectangular_grid():
    from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode

    cfg = audio_tower_config(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, patch_size=8, image_size_hw=(16, 48),
    )
    assert cfg.grid_hw == (2, 6)
    assert cfg.seq_len == 13
    params = init_vision_params(jax.random.PRNGKey(0), cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3, 16, 48))
    feats = vision_encode(params, mel, cfg)
    assert feats.shape == (2, 1, 13, 32)
    assert np.isfinite(np.asarray(feats)).all()


# ---------------------------------------------------------------------------
# CLIP text encoder vs transformers oracle
# ---------------------------------------------------------------------------


def test_text_encoder_matches_hf_clip():
    torch = pytest.importorskip("torch")
    from transformers import CLIPTextConfig, CLIPTextModel

    hf_cfg = CLIPTextConfig(
        vocab_size=120, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=119, bos_token_id=118,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    cfg = TextConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                     num_attention_heads=4, vocab_size=120,
                     max_position_embeddings=16)
    from videollamb_tpu.models.binding import convert_text_state_dict

    params = convert_text_state_dict(hf.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 110, size=(3, 12)).astype(np.int64)
    ids[:, -1] = 119  # EOT = max id per row (CLIP pooling convention)

    with torch.no_grad():
        hf_out = hf(input_ids=torch.from_numpy(ids)).pooler_output.numpy()
    ours = np.asarray(text_encode(params, jnp.asarray(ids.astype(np.int32)), cfg))
    np.testing.assert_allclose(ours, hf_out, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Binding meta-model
# ---------------------------------------------------------------------------


def test_language_bind_forward_joint_space():
    vcfgs = {
        "image": VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=8, add_time_attn=False),
        "video": VisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=8, add_time_attn=True,
                              num_frames=2),
    }
    tcfg = TextConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                      num_attention_heads=4, vocab_size=100,
                      max_position_embeddings=12)
    params = init_binding_params(jax.random.PRNGKey(0), vcfgs, tcfg,
                                 projection_dim=24)
    rng = np.random.default_rng(0)
    inputs = {
        "image": jnp.asarray(rng.normal(size=(2, 1, 3, 32, 32)), jnp.float32),
        "video": jnp.asarray(rng.normal(size=(2, 2, 3, 32, 32)), jnp.float32),
        "language": jnp.asarray(rng.integers(1, 99, size=(2, 10)), jnp.int32),
    }
    out = language_bind_forward(params, inputs, vcfgs, tcfg)
    assert set(out) == {"image", "video", "language"}
    # Language embeddings are unit-norm; modality ones unit-norm * exp(scale).
    lang_n = np.linalg.norm(np.asarray(out["language"], np.float32), axis=-1)
    np.testing.assert_allclose(lang_n, 1.0, rtol=1e-3)
    img_n = np.linalg.norm(np.asarray(out["image"], np.float32), axis=-1)
    np.testing.assert_allclose(img_n, np.exp(1 / 0.07 * 0 + np.log(1 / 0.07)),
                               rtol=1e-2)
    # Without temperature, modality embeddings are unit-norm too.
    out2 = language_bind_forward(params, inputs, vcfgs, tcfg, use_temp=False)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out2["video"], np.float32), axis=-1), 1.0,
        rtol=1e-3,
    )


# ---------------------------------------------------------------------------
# RMT memory-token encoder
# ---------------------------------------------------------------------------


def _rmt_setup():
    from videollamb_tpu.models.vision.rmt_clip_vit import init_rmt_vision_params

    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=32, patch_size=8, add_time_attn=False)
    params = init_rmt_vision_params(jax.random.PRNGKey(0), cfg,
                                    num_memory_tokens=4)
    return cfg, params


def test_rmt_image_step_shapes_and_memory_sensitivity():
    from videollamb_tpu.models.vision.rmt_clip_vit import rmt_vision_encode

    cfg, params = _rmt_setup()
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3, 32, 32))
    feats, mem = rmt_vision_encode(params, img, cfg)
    assert feats.shape == (2, 1, 17, 32)
    assert mem.shape == (2, 4, 32)
    # Carrying DIFFERENT memories must change the features.
    feats2, _ = rmt_vision_encode(params, img, cfg, memories=mem * 3.0)
    assert not np.allclose(np.asarray(feats), np.asarray(feats2))


def test_rmt_video_recurrence_matches_manual_loop():
    from videollamb_tpu.models.vision.rmt_clip_vit import rmt_vision_encode

    cfg, params = _rmt_setup()
    clip = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 3, 32, 32))
    feats, mem = rmt_vision_encode(params, clip, cfg)

    # Manual: frame 0 with no memory, then carry.
    m = None
    outs = []
    for t in range(3):
        f, m = rmt_vision_encode(params, clip[:, t: t + 1], cfg, memories=m)
        outs.append(np.asarray(f[:, 0]))
    np.testing.assert_allclose(np.asarray(feats[:, 0]), outs[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(feats[:, 2]), outs[2], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mem), np.asarray(m), rtol=2e-4, atol=2e-4)


def test_rmt_tower_factory_dispatch():
    import dataclasses

    from videollamb_tpu.models.vision.builder import resolve_tower, tower_encode
    from videollamb_tpu.models.vision.rmt_clip_vit import init_rmt_vision_params

    spec = resolve_tower("LanguageBind/RMTLanguageBind_Video")
    assert spec.kind == "rmt_languagebind_video"
    # Encode with tiny dims (the factory's full ViT-L costs ~15 s of CPU
    # for a shape check; the real-dims path is covered by the TPU bench).
    tiny = dataclasses.replace(
        spec.config, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, image_size=28)
    spec = dataclasses.replace(spec, config=tiny)
    params = init_rmt_vision_params(jax.random.PRNGKey(0), tiny, num_memory_tokens=8)
    assert "encoder_memory" in params
    pixels = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 3, 28, 28))
    feats = tower_encode(spec, params, pixels)
    assert feats.shape[0] == 1 and feats.shape[1] == 2


def test_audio_depth_thermal_factory_dispatch():
    from videollamb_tpu.models.vision.builder import resolve_tower

    audio = resolve_tower("LanguageBind/LanguageBind_Audio")
    assert audio.kind == "languagebind_audio"
    assert audio.config.image_size_hw is not None
    assert resolve_tower("LanguageBind/LanguageBind_Depth").kind == "languagebind_depth"
    assert resolve_tower("LanguageBind/LanguageBind_Thermal").kind == "languagebind_thermal"


# ---------------------------------------------------------------------------
# AUDIO as a first-class training modality (beyond the reference: its audio
# encoder is importable but never wired to data/training)
# ---------------------------------------------------------------------------


def test_load_audio_wav_roundtrip(tmp_path):
    import wave

    from videollamb_tpu.data.audio_reader import load_audio

    sr = 8000
    t = np.linspace(0, 1, sr, endpoint=False)
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = (wav * 32767).astype(np.int16)
    path = tmp_path / "tone.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    out, rate = load_audio(str(path))
    assert rate == sr and out.dtype == np.float32
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0, atol=1e-6)

    # Stereo averages to mono.
    path2 = tmp_path / "stereo.wav"
    with wave.open(str(path2), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        inter = np.stack([pcm, np.zeros_like(pcm)], axis=1).reshape(-1)
        w.writeframes(inter.tobytes())
    out2, _ = load_audio(str(path2))
    np.testing.assert_allclose(out2, out / 2, atol=1e-6)


def test_audio_dataset_to_train_forward(tmp_path):
    """WAV sample -> SupervisedDataset (AUDIO sentinel -202) -> Collator ->
    multimodal forward under an audio TowerSpec: the full audio training
    recipe (scripts/finetune_audio.sh) end to end at tiny scale."""
    import dataclasses
    import json
    import wave

    import jax
    import jax.numpy as jnp

    from test_preprocess import WordTokenizer
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.models.vision.builder import TowerSpec
    from videollamb_tpu.constants import X_TOKEN_INDEX
    from videollamb_tpu.models.assembly import videollamb_forward
    from videollamb_tpu.models.bridge.builder import init_bridge_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.models.vision.modalities import AudioProcessor, audio_tower_config
    from videollamb_tpu.train.dataset import Collator, DataConfig, SupervisedDataset

    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.linspace(0, 0.5, sr // 2))).astype(np.float32)
    auds = tmp_path / "audios"
    auds.mkdir()
    with wave.open(str(auds / "a1.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())

    data = [{
        "id": "a1", "audio": "a1.wav",
        "conversations": [
            {"from": "human", "value": "<audio>\nwhat do you hear"},
            {"from": "gpt", "value": "a tone"},
        ],
    }]
    dpath = tmp_path / "data.json"
    dpath.write_text(json.dumps(data))

    dcfg = DataConfig(audio_folder=str(auds), model_max_length=128)
    ds = SupervisedDataset(
        str(dpath), WordTokenizer(), dcfg,
        audio_processor=AudioProcessor(num_mel_bins=28, target_length=56),
    )
    assert ds.modality(0) == "audio"
    sample = ds[0]
    assert sample["image"].shape == (3, 28, 56)
    assert (sample["input_ids"] == X_TOKEN_INDEX["AUDIO"]).sum() == 1

    batch = Collator(bucket=32, max_length=128)([sample])
    tiny_dims = dict(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64)
    vcfg = audio_tower_config(image_size_hw=(28, 56), patch_size=14, **tiny_dims)
    base = ModelConfig.tiny()
    cfg = dataclasses.replace(
        base, bridge=dataclasses.replace(base.bridge, kind="mlp"),
        tower=TowerSpec("languagebind_audio", vcfg, frame_wise=True))
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, vcfg),
        "mm_projector": init_bridge_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()
    # Labels spliced: audio tokens masked, answer tokens kept.
    labels = np.asarray(spliced.labels[0])
    assert (labels != -100).sum() >= 2
