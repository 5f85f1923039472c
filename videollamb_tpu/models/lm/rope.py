"""Rotary position embeddings (Llama convention: rotate_half, non-interleaved).

Replaces the reference's reliance on HF LlamaRotaryEmbedding; math is the
standard GPT-NeoX/Llama RoPE with inverse frequencies theta^(-2i/d).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jax.Array:
    """(head_dim/2,) inverse frequencies, float32."""
    exponents = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta**exponents)


def scaled_rope_frequencies(
    head_dim: int,
    theta: float = 10000.0,
    scaling=None,
    max_position_embeddings: int = 0,
) -> jax.Array:
    """Inverse frequencies with optional long-context scaling.

    ``scaling`` is a :class:`videollamb_tpu.config.RopeScaling` (duck-typed:
    any object with its fields). Parity with HF
    ``transformers.modeling_rope_utils.ROPE_INIT_FUNCTIONS`` is tested in
    tests/test_rope_scaling.py; the one caveat is 'dynamic', whose NTK
    base HF recomputes per sequence length — XLA needs one static table.
    By default it is computed at max_position_embeddings, where HF's
    formula reduces to the unscaled base (exact HF agreement for every
    standard-length sequence); set RopeScaling.target_length to pin the
    table for contexts beyond the trained maximum (exact agreement at
    that length).
    """
    inv = rope_frequencies(head_dim, theta)
    if scaling is None:
        return inv
    t = scaling.rope_type
    if t == "linear":
        return inv / scaling.factor
    if t == "dynamic":
        maxpos = max_position_embeddings or scaling.original_max_position_embeddings
        # HF formula with seq_len clamped below at maxpos (HF's own
        # behavior). Default target = maxpos -> the expression reduces to
        # the UNSCALED base, matching HF for every standard-length prompt;
        # an explicit target_length pins the table for extended contexts.
        seq_len = max(scaling.target_length or maxpos, maxpos)
        base = theta * (
            (scaling.factor * seq_len / maxpos) - (scaling.factor - 1)
        ) ** (head_dim / (head_dim - 2))
        return rope_frequencies(head_dim, base)
    if t == "llama3":
        # HF _compute_llama3_parameters: long wavelengths scale by
        # 1/factor, short ones keep, the mid band linearly blends.
        old_len = scaling.original_max_position_embeddings
        low_wl = old_len / scaling.low_freq_factor
        high_wl = old_len / scaling.high_freq_factor
        wavelen = 2.0 * math.pi / inv
        smooth = (old_len / wavelen - scaling.low_freq_factor) / (
            scaling.high_freq_factor - scaling.low_freq_factor
        )
        blended = (1.0 - smooth) / scaling.factor * inv + smooth * inv
        out = jnp.where(wavelen > low_wl, inv / scaling.factor, inv)
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        return jnp.where(is_mid, blended, out)
    raise ValueError(
        f"unsupported rope_scaling type {t!r} (have: linear, dynamic, llama3)"
    )


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float = 10000.0,
                 scaling=None, max_position_embeddings: int = 0):
    """cos/sin tables for given positions.

    Args:
      positions: (...,) int positions.
    Returns:
      cos, sin: (..., head_dim) float32 — duplicated half-tables, matching
      the HF layout where emb = cat([freqs, freqs], -1).
    """
    inv = scaled_rope_frequencies(head_dim, theta, scaling,
                                  max_position_embeddings)
    angles = positions.astype(jnp.float32)[..., None] * inv  # (..., hd/2)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rope_cos_sin_cfg(cfg, positions: jax.Array):
    """rope_cos_sin from a LlamaConfig-shaped object (head_dim, rope_theta,
    optional rope_scaling, max_position_embeddings)."""
    return rope_cos_sin(
        positions, cfg.head_dim, cfg.rope_theta,
        scaling=getattr(cfg, "rope_scaling", None),
        max_position_embeddings=cfg.max_position_embeddings,
    )


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
