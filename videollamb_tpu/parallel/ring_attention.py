"""Ring attention: sequence parallelism over a 'seq' mesh axis.

The reference handles long context purely algorithmically (SceneTilling +
recurrent memory, SURVEY §5.7) and has no sequence/context parallelism;
this is the TPU-native scaling extension for contexts beyond one chip's
HBM. Classic ring schedule (scaling-book / Liu et al. arXiv:2310.01889):

- q/k/v are sharded on the sequence axis over 'seq' (P shards);
- each device holds its q shard for all P steps and accumulates flash-style
  online-softmax statistics (m, l, o in f32) against one k/v shard at a
  time, rotating the k/v shards around the ring with `ppermute`;
- causal masking uses global positions reconstructed from the owner index
  of the k/v shard currently held (owner = (my_idx - step) mod P).

Communication per step is one k/v shard over ICI, overlapped by XLA with
the attention block compute.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def ring_attention_local(
    q_l: jax.Array,  # (B, S_local, H, Dh) — this device's shard
    k_l: jax.Array,
    v_l: jax.Array,
    *,
    axis: str,
    causal: bool = True,
    scale: Optional[float] = None,
    k_valid: Optional[jax.Array] = None,  # (B, S_local) bool, local shard
) -> jax.Array:
    """The per-device ring-attention body — callable from inside any
    ``shard_map`` whose mesh has ``axis`` (the seq-parallel LM forward
    embeds it per layer; ``ring_attention`` wraps it standalone).

    Accumulates flash-style online-softmax statistics (m, l, o in f32)
    against one k/v shard at a time, rotating shards (and their validity
    mask) around the ring with ``ppermute``."""
    idx = jax.lax.axis_index(axis)
    p = jax.lax.axis_size(axis)
    b, s, h, dh = q_l.shape
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    q_pos = idx * s + jnp.arange(s, dtype=jnp.int32)  # global q positions

    qf = q_l.astype(jnp.float32) * scale
    kv0 = (jnp.ones((b, s), bool) if k_valid is None else k_valid.astype(bool))

    def step(carry, t):
        m, l, o, kc, vc, kvalid = carry
        owner = (idx - t) % p
        k_pos = owner * s + jnp.arange(s, dtype=jnp.int32)
        # (B, H, Sq, Sk) block scores in f32.
        scores = jnp.einsum("bqhd,bkhd->bhqk", qf, kc.astype(jnp.float32))
        mask = kvalid[:, None, None, :]
        if causal:
            mask = mask & (q_pos[:, None] >= k_pos[None, :])[None, None]
        scores = jnp.where(mask, scores, NEG_INF)
        m_blk = jnp.max(scores, axis=-1)  # (B, H, Sq)
        m_new = jnp.maximum(m, m_blk)
        # Guard fully-masked blocks (exp(NEG_INF - NEG_INF) = 1 garbage).
        alive = m_new > NEG_INF / 2
        exp_scores = jnp.exp(scores - m_new[..., None])
        exp_scores = jnp.where(alive[..., None], exp_scores, 0.0)
        corr = jnp.where(alive, jnp.exp(m - m_new), 0.0)
        l_new = corr * l + jnp.sum(exp_scores, axis=-1)
        o_new = (corr[..., None] * o
                 + jnp.einsum("bhqk,bkhd->bhqd", exp_scores,
                              vc.astype(jnp.float32)))
        # Rotate k/v (+ validity) to the next device in the ring.
        perm = [(i, (i + 1) % p) for i in range(p)]
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        kvalid = jax.lax.ppermute(kvalid, axis, perm)
        return (m_new, l_new, o_new, kc, vc, kvalid), None

    m0 = jnp.full((b, h, s), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s), jnp.float32)
    o0 = jnp.zeros((b, h, s, dh), jnp.float32)
    (m, l, o, _, _, _), _ = jax.lax.scan(
        step, (m0, l0, o0, k_l, v_l, kv0), jnp.arange(p))
    out = o / jnp.maximum(l, 1e-30)[..., None]  # (B, H, Sq, Dh)
    return out.transpose(0, 2, 1, 3).astype(q_l.dtype)


def ring_attention(
    mesh: Mesh,
    q: jax.Array,  # (B, S, H, Dh) — global sequence, sharded/shardable on S
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = True,
    axis: str = "seq",
) -> jax.Array:
    """Multi-head attention with the sequence distributed over ``axis``.
    Returns (B, S, H, Dh) with the same sharding as q."""
    n_shards = mesh.shape[axis]
    s_global = q.shape[1]
    assert s_global % n_shards == 0, (s_global, n_shards)
    s_local = s_global // n_shards
    scale = 1.0 / math.sqrt(q.shape[-1])

    def shard_fn(q_l, k_l, v_l):
        return ring_attention_local(q_l, k_l, v_l, axis=axis, causal=causal,
                                    scale=scale)

    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)


def create_seq_mesh(n_shards: int, *, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n_shards]
    assert len(devices) == n_shards
    return Mesh(np.asarray(devices), ("seq",))
