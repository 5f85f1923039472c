"""Rotary position embeddings (Llama convention: rotate_half, non-interleaved).

Replaces the reference's reliance on HF LlamaRotaryEmbedding; math is the
standard GPT-NeoX/Llama RoPE with inverse frequencies theta^(-2i/d).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jax.Array:
    """(head_dim/2,) inverse frequencies, float32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponents)


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 10000.0):
    """cos/sin tables for given positions.

    Args:
      positions: (...,) int positions.
    Returns:
      cos, sin: (..., head_dim) float32 — duplicated half-tables, matching
      the HF layout where emb = cat([freqs, freqs], -1).
    """
    inv = rope_frequencies(head_dim, theta)
    angles = positions.astype(jnp.float32)[..., None] * inv  # (..., hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply RoPE. x: (..., seq, heads, head_dim); cos/sin: (..., seq, head_dim)
    broadcast over the heads axis."""
    cos = cos[..., :, None, :].astype(jnp.float32)
    sin = sin[..., :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
