"""Weight-only int8 quantization for the LM.

Counterpart of the reference's bitsandbytes 8-bit path
(llava/model/builder.py:34-43, train.py:896-913) — TPU-native: symmetric
per-output-channel int8 with bf16 scales. Kernels are stored as
``{"q": int8, "scale": bf16}``; the projection helper dequantizes inline so
XLA fuses the dequant into the matmul — HBM reads halve, which directly
speeds up bandwidth-bound decode (the MXU compute stays bf16).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def _quantize_2d(w: jax.Array) -> Dict[str, jax.Array]:
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.bfloat16)}


@jax.jit
def quantize_kernel(w: jax.Array) -> Dict[str, jax.Array]:
    """(..., d_in, d_out) -> int8 values + per-output-channel scales.

    Stacked (L, d_in, d_out) kernels quantize layer-by-layer via lax.map so
    the f32 scratch is one layer slice, not the whole 2.7 GB tensor — full
    7B quantization fits alongside the bf16 originals on a 16 GB chip."""
    if w.ndim == 3:
        return jax.lax.map(_quantize_2d, w)
    return _quantize_2d(w)


def dequantize_kernel(qk: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    return (qk["q"].astype(dtype) * qk["scale"].astype(dtype))


def is_quantized(kernel: Any) -> bool:
    return isinstance(kernel, dict) and "q" in kernel and "scale" in kernel


def quantize_llama_params(params: Dict[str, Any],
                          targets=QUANT_TARGETS,
                          quantize_embed: bool = False) -> Dict[str, Any]:
    """Quantize the big LM matrices (layers + lm_head; embed optional —
    embedding GATHERS need the full-precision table by default).

    CONSUMES the input tree: each bf16 kernel is released as soon as its
    int8 replacement exists, so peak HBM is params + one kernel — a full 7B
    quantizes in place on a 16 GB chip.
    """
    layers = params["layers"]
    for name in targets:
        if name in layers and not is_quantized(layers[name]):
            q = quantize_kernel(layers[name])
            jax.block_until_ready(q)
            layers[name] = q  # drops the bf16 original
    if "lm_head" in params and not is_quantized(params["lm_head"]):
        params["lm_head"] = quantize_kernel(params["lm_head"])
    if quantize_embed and not is_quantized(params.get("embed_tokens")):
        params["embed_tokens"] = quantize_kernel(params["embed_tokens"])
    return params
