"""Fused spatial-attention core parity (interpret mode on CPU)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.ops.spatial_attention import _xla_core, fused_spatial_core


@pytest.mark.parametrize("b,h,n,e,hb", [
    (2, 4, 9, 8, 2),   # odd sequence length
    (1, 8, 16, 8, 8),
    (3, 2, 5, 4, 8),   # hb > h after clamp
])
def test_fused_spatial_core_matches_einsum(b, h, n, e, hb):
    keys = jax.random.split(jax.random.PRNGKey(b * 10 + h), 3)
    q = jax.random.normal(keys[0], (b, h, n, e), jnp.float32)
    k = jax.random.normal(keys[1], (b, h, n, e), jnp.float32)
    v = jax.random.normal(keys[2], (b, h, n, e), jnp.float32)
    ref = _xla_core(q, k, v)
    out = fused_spatial_core(q, k, v, heads_per_block=hb, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_spatial_core_grad_via_reference_bwd():
    from videollamb_tpu.ops.spatial_attention import spatial_core

    def loss(q, k, v):
        return jnp.sum(_xla_core(q, k, v) ** 2)

    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (1, 2, 5, 4)) for kk in keys)
    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


@pytest.mark.parametrize("b,h,n,e", [(2, 4, 9, 8), (1, 8, 16, 8)])
def test_packed_core_matches_einsum(b, h, n, e):
    from videollamb_tpu.ops.spatial_attention import (
        _xla_core_packed, fused_spatial_core_packed,
    )

    d = h * e
    keys = jax.random.split(jax.random.PRNGKey(b + h), 3)
    q = jax.random.normal(keys[0], (b, n, d), jnp.float32)
    k = jax.random.normal(keys[1], (b, n, d), jnp.float32)
    v = jax.random.normal(keys[2], (b, n, d), jnp.float32)
    ref = _xla_core_packed(q, k, v, h)
    out = fused_spatial_core_packed(q, k, v, heads=h, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_packed_core_grad_via_reference_bwd():
    from videollamb_tpu.ops.spatial_attention import (
        _xla_core_packed, spatial_core_packed,
    )

    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (1, 5, 8)) for kk in keys)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_core_packed(q, k, v, 2) ** 2)

    g = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
