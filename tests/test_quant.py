"""int8 weight-only quantization tests."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import embed_tokens, init_llama_params, llama_forward
from videollamb_tpu.models.lm.quant import (
    dequantize_kernel,
    quantize_kernel,
    quantize_llama_params,
)

CFG = LlamaConfig.tiny()


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 64)) * 0.05
    qk = quantize_kernel(w)
    assert qk["q"].dtype == jnp.int8
    back = dequantize_kernel(qk, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(w))
    # Per-channel symmetric int8: error ~ scale/2 per element, plus bf16
    # rounding of the stored scale.
    scale = np.asarray(qk["scale"], np.float32)
    assert (err <= scale * 0.51 + np.abs(np.asarray(w)) * 2 ** -8 + 1e-6).all()


def test_quantized_forward_close_to_full_precision():
    params = {"lm": init_llama_params(jax.random.PRNGKey(0), CFG)}
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 200, size=(1, 16)))
    embeds = embed_tokens(params["lm"], ids)
    mask = jnp.ones(ids.shape, jnp.int32)
    ref = llama_forward(params["lm"], CFG, embeds, mask)

    import copy

    qlm = quantize_llama_params(copy.deepcopy(params["lm"]))
    out = llama_forward(qlm, CFG, embeds, mask)
    # Logits agree to int8-noise level; argmax (greedy tokens) mostly stable.
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    denom = np.maximum(np.abs(ref_np).max(), 1.0)
    assert np.abs(out_np - ref_np).max() / denom < 0.08
    agree = (ref_np.argmax(-1) == out_np.argmax(-1)).mean()
    assert agree > 0.9
