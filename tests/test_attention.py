"""Attention implementations must agree: xla (oracle) vs chunked vs pallas
(interpret mode on CPU), incl. causal, key masks, GQA, and gradients."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.ops.attention import multihead_attention, _chunked_attention, _xla_attention


def _qkv(b=2, sq=37, skv=53, h=4, hkv=2, dh=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, sq, h, dh)).astype(np.float32)
    k = rng.normal(size=(b, skv, hkv, dh)).astype(np.float32)
    v = rng.normal(size=(b, skv, hkv, dh)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("masked", [False, True])
def test_chunked_matches_xla(causal, masked):
    q, k, v = _qkv()
    km = None
    if masked:
        m = np.ones((2, 53), bool)
        m[:, 45:] = False
        km = jnp.asarray(m)
    ref = _xla_attention(q, k, v, causal=causal, k_mask=km, scale=None if False else 0.25)
    out = _chunked_attention(q, k, v, causal=causal, k_mask=km, scale=0.25, block_kv=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_pallas_interpret_matches_xla(causal, monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    q, k, v = _qkv(b=1, sq=40, skv=40, h=2, hkv=2, dh=64, seed=1)
    m = np.ones((1, 40), bool)
    m[:, 33:] = False
    km = jnp.asarray(m)
    ref = _xla_attention(q, k, v, causal=causal, k_mask=km, scale=0.125)
    with pltpu.force_tpu_interpret_mode():
        out = multihead_attention(
            q, k, v, causal=causal, k_mask=km, scale=0.125, impl="pallas"
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_chunked_gradients_match_xla():
    q, k, v = _qkv(b=1, sq=16, skv=16, h=2, hkv=2, dh=8, seed=2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=True, k_mask=None, scale=0.3) ** 2)

    def loss_chunk(q, k, v):
        return jnp.sum(
            _chunked_attention(q, k, v, causal=True, k_mask=None, scale=0.3, block_kv=4) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_chk = jax.grad(loss_chunk, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_gqa_grouping_consistent():
    """GQA result == repeating kv heads into an MHA call."""
    q, k, v = _qkv(b=1, sq=12, skv=12, h=4, hkv=2, dh=8, seed=3)
    out_gqa = _xla_attention(q, k, v, causal=False, k_mask=None, scale=0.2)
    k_rep = jnp.repeat(k, 2, axis=2)
    v_rep = jnp.repeat(v, 2, axis=2)
    out_mha = _xla_attention(q, k_rep, v_rep, causal=False, k_mask=None, scale=0.2)
    np.testing.assert_allclose(np.asarray(out_gqa), np.asarray(out_mha), rtol=1e-5, atol=1e-6)
