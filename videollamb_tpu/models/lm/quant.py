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


# ---------------------------------------------------------------------------
# int4 (group-wise symmetric, Pallas decode kernel in ops/int4_matmul.py)
# ---------------------------------------------------------------------------


def quantize_kernel_int4(w, group: int = 128) -> Dict[str, Any]:
    """(d_in, d_out) or stacked (L, d_in, d_out) -> int4 packed kernels."""
    from videollamb_tpu.ops.int4_matmul import quantize_int4

    if w.ndim == 3:
        return jax.lax.map(lambda x: quantize_int4(x, group), w)
    return quantize_int4(w, group)


def is_int4(kernel: Any) -> bool:
    return isinstance(kernel, dict) and "q4" in kernel


def quantize_llama_params_int4(params: Dict[str, Any],
                               targets=QUANT_TARGETS,
                               group: int = 128) -> Dict[str, Any]:
    """int4 variant of quantize_llama_params (same consuming discipline)."""
    layers = params["layers"]
    for name in targets:
        if name in layers and not (is_quantized(layers[name]) or is_int4(layers[name])):
            q = quantize_kernel_int4(layers[name], group)
            jax.block_until_ready(q)
            layers[name] = q
    if "lm_head" in params and not (is_quantized(params["lm_head"]) or is_int4(params["lm_head"])):
        params["lm_head"] = quantize_kernel_int4(params["lm_head"], group)
    return params


# ---------------------------------------------------------------------------
# NF4 load path (QLoRA checkpoints)
# ---------------------------------------------------------------------------

# bitsandbytes NF4 codebook (public constant): the 16 quantile points of a
# standard normal, normalized to [-1, 1]. Reference 4-bit load:
# llava/model/builder.py:34-43 (BitsAndBytesConfig nf4) and QLoRA training
# llava/train/train.py:896-913.
NF4_CODE = jnp.asarray([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], jnp.float32)


def dequantize_nf4(packed, absmax, shape, blocksize: int = 64,
                   dtype=jnp.bfloat16):
    """Decode a bitsandbytes NF4 tensor to dense weights.

    packed: (numel//2,) uint8, two codes per byte (high nibble first —
    bitsandbytes order); absmax: (numel//blocksize,) per-block scales;
    shape: the original (d_out, d_in) torch shape (row-major).
    Returns the weight in OUR layout (d_in, d_out), ready to requantize
    with quantize_kernel_int4 for the decode kernel.
    """
    import numpy as np

    p = np.asarray(packed, np.uint8)
    hi = (p >> 4) & 0xF
    lo = p & 0xF
    codes = np.empty(p.size * 2, np.uint8)
    codes[0::2] = hi
    codes[1::2] = lo
    vals = np.asarray(NF4_CODE)[codes]
    scales = np.repeat(np.asarray(absmax, np.float32), blocksize)[: vals.size]
    w = (vals * scales).reshape(shape)  # torch (d_out, d_in)
    return jnp.asarray(w.T, dtype)  # ours: (d_in, d_out)


def load_nf4_state_dict(state: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Walk a bitsandbytes-serialized state dict: every ``<name>.weight``
    with sibling quant_state tensors (``.absmax``, ``.quant_map``,
    ``.nested_*`` ignored — double-quant is pre-expanded by callers) is
    NF4-decoded; everything else passes through."""
    out = {}
    for key, val in state.items():
        if key.endswith(".weight") and f"{key}.absmax" in state:
            shape = tuple(state[f"{key}.shape"])
            out[key] = dequantize_nf4(
                val, state[f"{key}.absmax"], shape,
                blocksize=int(state.get(f"{key}.blocksize", 64)), dtype=dtype,
            )
        elif any(key.endswith(sfx) for sfx in (".absmax", ".shape", ".blocksize", ".quant_map")):
            continue
        else:
            out[key] = val
    return out


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
