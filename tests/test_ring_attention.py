"""Ring attention (sequence parallelism) parity vs single-device attention."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.parallel.ring_attention import create_seq_mesh, ring_attention


def _reference(q, k, v, causal):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s * scale
    if causal:
        n = q.shape[1]
        mask = jnp.arange(n)[:, None] >= jnp.arange(n)[None, :]
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("shards,causal", [(4, True), (4, False), (8, True)])
def test_ring_attention_matches_reference(shards, causal):
    mesh = create_seq_mesh(shards)
    rng = np.random.default_rng(shards)
    b, s, h, dh = 2, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, dh)).astype(np.float32))

    out = ring_attention(mesh, q, k, v, causal=causal)
    ref = _reference(q, k, v, causal)
    np.testing.assert_allclose(
        np.asarray(jax.device_get(out)), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_attention_output_stays_sequence_sharded():
    mesh = create_seq_mesh(4)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype(np.float32))
    out = ring_attention(mesh, q, q, q)
    shapes = {tuple(sh.data.shape) for sh in out.addressable_shards}
    assert shapes == {(1, 4, 2, 8)}
