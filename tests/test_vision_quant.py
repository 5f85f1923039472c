"""int8 vision-tower inference path (models/vision/quant.py).

Covers VERDICT r2 #1: per-output-channel int8 weights + dynamic per-row
int8 activations through every encoder GEMM, an output error bound vs the
full-precision tower, and an assembled-model answer-invariance check
(greedy tokens unchanged when the encoder is quantized).

Reference workload being quantized: llava/model/multimodal_encoder/
languagebind/video/modeling_video.py:617-697 (the reference itself has no
quantized encoder — bitsandbytes covers only the LM, builder.py:34-43).
"""

import numpy as np

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig, VisionConfig
from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode
from videollamb_tpu.models.vision.quant import dense_int8, quantize_vision_params


def test_dense_int8_matches_fp():
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (4, 16, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32), jnp.float32) * 0.05
    b = jax.random.normal(k3, (32,), jnp.float32) * 0.1
    ref = x @ w + b
    from videollamb_tpu.models.lm.quant import quantize_kernel

    got = dense_int8({"kernel": quantize_kernel(w), "bias": b}, x)
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.02, rel


def test_quantized_encoder_error_bound():
    """Whole-tower output error: int8 tower within a few % of full
    precision (the bench records the same bound on the real weights)."""
    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=56, patch_size=14)
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 3, 56, 56), jnp.float32)
    ref = vision_encode(params, pixels, cfg)
    params = quantize_vision_params(params)
    # every GEMM kernel is now int8
    for layer in params["layers"]:
        assert layer["self_attn"]["q_proj"]["kernel"]["q"].dtype == jnp.int8
        assert layer["mlp"]["fc1"]["kernel"]["q"].dtype == jnp.int8
        assert layer["temporal_attn"]["v_proj"]["kernel"]["q"].dtype == jnp.int8
    assert params["embeddings"]["patch_embedding"]["kernel"]["q"].dtype == jnp.int8
    got = vision_encode(params, pixels, cfg)
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_image_tower_no_time_attn_quantizes():
    cfg = VisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       image_size=56, patch_size=14, add_time_attn=False)
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 3, 56, 56), jnp.float32)
    ref = vision_encode(params, pixels, cfg)
    got = vision_encode(quantize_vision_params(params), pixels, cfg)
    rel = float(jnp.mean(jnp.abs(got - ref)) / jnp.mean(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_assembled_answer_invariance():
    """Greedy tokens from the assembled model are unchanged when the
    encoder runs int8 (the VERDICT-requested answer-invariance check)."""
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.engine import generate
    from videollamb_tpu.models.lm.llama import init_llama_params

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.float32),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                                          dtype=jnp.float32),
        "lm": init_llama_params(k3, cfg.lm, dtype=jnp.float32),
    }
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 12)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 12), jnp.int32),
        labels=None,
        videos=jax.random.normal(jax.random.PRNGKey(5), (1, 8, 3, 56, 56),
                                 jnp.float32),
        images=None,
    )

    def run(params):
        res = generate(params, cfg, batch, jax.random.PRNGKey(0),
                       max_new_tokens=8, do_sample=False,
                       max_seq_len=cfg.max_length + 8)
        return np.asarray(res.tokens[0][: int(res.lengths[0])]).tolist()

    ref_tokens = run(params)
    params["video_tower"] = quantize_vision_params(params["video_tower"])
    int8_tokens = run(params)
    assert int8_tokens == ref_tokens
