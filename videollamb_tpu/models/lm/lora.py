"""LoRA adapters for the Llama backbone.

Counterpart of the reference's peft LoRA path (llava/train/train.py:957-986
``find_all_linear_names`` targets every LM linear except the projector;
builder.py:57-91 merges at load). Adapters are extra entries in the stacked
``params['lm']['layers']`` pytree (``{proj}_lora_a``: (L, d_in, r),
``{proj}_lora_b``: (L, r, d_out)), so the existing layer scan slices them
per layer with zero code changes outside the projection helper.

B is zero-initialized (identity at init, HF semantics); the alpha/r scale is
folded into A at init so no runtime scale parameter is needed — exporting
back to peft format divides it out.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig

LORA_TARGETS = ["q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj"]


def add_lora_params(
    params: Dict[str, Any],
    cfg: LlamaConfig,
    *,
    r: int = 128,
    alpha: float = 256.0,
    rng: jax.Array,
    targets: List[str] = None,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Return params with LoRA adapters added to the LM layers."""
    targets = targets or LORA_TARGETS
    layers = dict(params["lm"]["layers"])
    scale = alpha / r
    keys = jax.random.split(rng, len(targets))
    for key, name in zip(keys, targets):
        kernel = layers[name]  # (L, d_in, d_out) — bf16 array or int8
        # QLoRA: adapters ride an int8/int4-quantized frozen base (the
        # reference's bnb 4-bit + peft recipe, llava/train/train.py:896-986).
        if isinstance(kernel, dict) and "q" in kernel:
            kernel = kernel["q"]
        l, d_in, d_out = kernel.shape
        # Kaiming-ish init for A (scaled by alpha/r), zeros for B.
        a = jax.random.normal(key, (l, d_in, r), dtype) * (scale / math.sqrt(d_in))
        layers[f"{name}_lora_a"] = a
        layers[f"{name}_lora_b"] = jnp.zeros((l, r, d_out), dtype)
    out = dict(params)
    out["lm"] = dict(params["lm"])
    out["lm"]["layers"] = layers
    return out


def merge_lora_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold adapters into the base kernels and drop them (reference
    merge_and_unload equivalent)."""
    layers = dict(params["lm"]["layers"])
    for name in LORA_TARGETS:
        a_key, b_key = f"{name}_lora_a", f"{name}_lora_b"
        if a_key in layers:
            delta = jnp.einsum("lir,lro->lio", layers[a_key], layers[b_key])
            layers[name] = layers[name] + delta.astype(layers[name].dtype)
            del layers[a_key], layers[b_key]
    out = dict(params)
    out["lm"] = dict(params["lm"])
    out["lm"]["layers"] = layers
    return out
