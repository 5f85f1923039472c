"""GSPMD partitioning rules for Pallas kernels (parallel/kernel_partition).

Mosaic custom calls cannot be auto-partitioned by GSPMD; every kernel
entry point is wrapped in custom_partitioning declaring which dims shard
(batch-like dims freely, head-proportional dims together by whole heads)
and which replicate. The kernels themselves only run on TPU, so these
tests exercise the wrapper machinery with XLA stand-in fns carrying the
SAME dim declarations on the virtual 8-device CPU mesh: the factor
assignment, the per-shard static rescaling (local head counts), and
numeric equality sharded-vs-replicated.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import conftest as _c  # noqa: F401

from videollamb_tpu.ops.spatial_attention import _xla_core_packed
from videollamb_tpu.parallel.kernel_partition import make_partitioned

HEADS, B, N, D = 8, 8, 16, 64


def _mesh(shape=(4, 2)):
    devs = np.asarray(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return Mesh(devs, ("data", "model"))


def _qkv(key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    mk = lambda k: jax.random.normal(k, (B, N, D), jnp.float32)
    return tuple(mk(k) for k in ks)


def _packed_spmd():
    """XLA stand-in carrying the spatial-packed declaration: (B, N, D),
    B shardable, D shardable by whole heads, heads rescaled per shard."""

    def full(q, k, v):
        return _xla_core_packed(q, k, v, HEADS)

    def local(shards, q, k, v):
        lh = HEADS // shards.get("d", 1)
        assert q.shape[-1] == lh * (D // HEADS), (q.shape, shards)
        return _xla_core_packed(q, k, v, lh)

    dims = ("b", "n", "d")
    return make_partitioned(full, [dims] * 3, [dims], replicate=("n",),
                            local_fn=local)


@pytest.mark.parametrize(
    "spec", [P("data", None, None), P(None, None, "model"),
             P("data", None, "model"), P()],
    ids=["batch", "heads-tp", "batch+tp", "replicated"],
)
def test_packed_attention_sharded_matches_replicated(spec):
    q, k, v = _qkv()
    ref = _xla_core_packed(q, k, v, HEADS)
    mesh = _mesh()
    fn = _packed_spmd()
    sh = NamedSharding(mesh, spec)
    out = jax.jit(fn, in_shardings=(sh, sh, sh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sharding_propagates_from_operands():
    """No in_shardings: placing sharded arrays and letting GSPMD infer
    through the custom call (infer_sharding_from_operands path)."""
    q, k, v = _qkv(1)
    ref = _xla_core_packed(q, k, v, HEADS)
    mesh = _mesh()
    sh = NamedSharding(mesh, P("data", None, "model"))
    qd, kd, vd = (jax.device_put(x, sh) for x in (q, k, v))
    fn = _packed_spmd()
    out = jax.jit(lambda a, b, c: fn(a, b, c) * 1.0)(qd, kd, vd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_disallowed_dim_is_gathered_not_split():
    """Proposing a sharding on a None dim (sequence) must still produce
    correct results — the partitioner reshards to replicated."""
    q, k, v = _qkv(2)
    ref = _xla_core_packed(q, k, v, HEADS)
    mesh = _mesh((8, 1))
    fn = _packed_spmd()
    sh = NamedSharding(mesh, P(None, "data", None))  # N: declared None
    out = jax.jit(fn, in_shardings=(sh, sh, sh))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_multi_output_and_tied_factors():
    """Stats-contract shape: (out, m, l) with q (B,H,Dh) and a pool whose
    feature dim ties to q's head dim via the shared factor — the
    gathered-paged declaration in miniature."""
    h, dh, p = 8, 16, 4

    def full(q, pool):
        # toy: out[b,h,:] = q[b,h,:] * mean(pool over pages); m = max, l = sum
        scale = jnp.mean(pool.reshape(-1, h, dh), axis=0)  # (h, dh)
        out = q * scale[None]
        return out, jnp.max(out, -1), jnp.sum(out, -1)

    def local(shards, q, pool):
        lh = h // shards.get("h", 1)
        assert q.shape[1] == lh, (q.shape, shards)
        scale = jnp.mean(pool.reshape(-1, lh, dh), axis=0)
        out = q * scale[None]
        return out, jnp.max(out, -1), jnp.sum(out, -1)

    fn = make_partitioned(
        full,
        [("b", "h", "dh"), ("p", ("h", "dh2"))],  # q (B,H,Dh); pool (P, H*Dh)
        [("b", "h", "dh"), ("b", "h"), ("b", "h")],
        replicate=("dh", "p", "dh2"),
        factor_sizes={"dh2": dh},
        local_fn=local,
    )
    q = jax.random.normal(jax.random.PRNGKey(3), (B, h, dh))
    pool = jax.random.normal(jax.random.PRNGKey(4), (p, h * dh))
    ref = full(q, pool)
    mesh = _mesh()
    out = jax.jit(fn, in_shardings=(
        NamedSharding(mesh, P("data", "model", None)),
        NamedSharding(mesh, P(None, "model")),
    ))(q, pool)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-5, atol=2e-5)


def test_single_device_passthrough():
    """Outside any mesh the wrapper must behave as a plain call."""
    q, k, v = _qkv(5)
    ref = _xla_core_packed(q, k, v, HEADS)
    out = jax.jit(_packed_spmd())(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gathered_wrapper_constructs_for_mha_and_gqa():
    """Building the gathered-int8 partitioning declaration must work for
    BOTH head layouts: MHA (groups == 1 — the 7B serving config; its "g"
    factor must not be declared, regression for the serving-load crash)
    and GQA (groups > 1)."""
    from videollamb_tpu.parallel.kernel_partition import _gathered_int8

    _gathered_int8.cache_clear()
    for groups in (1, 4):
        wrapped = _gathered_int8(2, groups, 128)
        assert wrapped is not None
