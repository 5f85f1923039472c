"""Fused spatial-attention core for the CLIP/LanguageBind encoder.

Reference semantics: HF CLIPAttention (llava/model/multimodal_encoder/
languagebind/video/modeling_video.py:78-124) — plain softmax attention
over the 257-token patch sequence, query pre-scaled.

Why a kernel: at batch 256 frames the XLA path materializes the (B, H,
257, 257) f32 score tensor in HBM — ~1 GB per layer, read+written twice
(scores + probs) => ~4-5 GB of HBM traffic per layer, ~5+ ms/layer of the
round-1 encoder breakdown (spatial core ~180 ms of 785 ms total). This
kernel keeps each head's (257, 257) score tile in VMEM.

Layout: the caller provides q/k/v already split per head — (B, H, N, e).
Unlike the temporal core there is no free-bitcast trick here (per-head
(N, e) tiles are lane-strided in the GEMM output), so the caller pays one
XLA transpose per tensor (~0.3 ms each at batch 256 — bandwidth-bound,
an order of magnitude cheaper than the score traffic it removes; this is
exactly the transpose round-1's generic flash kernel could not amortize
because it also re-materialized scores per program).

Grid: (B, H / hb). Each program loops its hb heads, one (N, N) f32 score
tile at a time in scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xla_core(q, k, v):
    s = jnp.einsum("bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhke->bhqe", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


@jax.custom_vjp
def spatial_core(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Kernel forward, XLA-recompute backward (grads may be traced through
    a frozen tower during training)."""
    return fused_spatial_core(q, k, v)


def _sc_fwd(q, k, v):
    return spatial_core(q, k, v), (q, k, v)


def _sc_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_core, q, k, v)
    return vjp(g)


spatial_core.defvjp(_sc_fwd, _sc_bwd)


def _xla_core_packed(q, k, v, heads):
    b, n, d = q.shape
    e = d // heads

    def split(t):
        return t.reshape(b, n, heads, e).transpose(0, 2, 1, 3)

    out = _xla_core(split(q), split(k), split(v))
    return out.transpose(0, 2, 1, 3).reshape(b, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def spatial_core_packed(q: jax.Array, k: jax.Array, v: jax.Array, heads: int) -> jax.Array:
    """Packed-layout core: q/k/v stay (B, N, D) exactly as the projection
    GEMMs produce them; heads are lane-sliced INSIDE the kernel (Mosaic
    lowers a 64-lane slice of a VMEM tile without a relayout copy —
    verified on v5e). Kills the 4 per-layer (B, N, H, e) <-> (B, H, N, e)
    relayouts of the split-layout path: measured 6.75 vs 10.04 ms per
    ViT-L layer at batch 256, bit-identical output.

    Routed through the custom_partitioning wrapper so GSPMD configs
    (FSDP / FSDP+TP via jit-with-shardings) can shard the batch dim and
    split D by whole heads instead of erroring on the Mosaic call
    (parallel/kernel_partition.py)."""
    from videollamb_tpu.parallel.kernel_partition import spatial_core_packed_spmd

    return spatial_core_packed_spmd(q, k, v, heads)


def _scp_fwd(q, k, v, heads):
    return spatial_core_packed(q, k, v, heads), (q, k, v)


def _scp_bwd(heads, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _xla_core_packed(a, b, c, heads), q, k, v)
    return vjp(g)


spatial_core_packed.defvjp(_scp_fwd, _scp_bwd)


def _kernel_packed(q_ref, k_ref, v_ref, out_ref, *, heads: int, e: int):
    # refs: (1, N, D) with D = heads * e; per-head lane slices.
    for i in range(heads):
        sl = slice(i * e, (i + 1) * e)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, N) f32, VMEM-resident
        s = s - jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s)
        p = ex / jnp.sum(ex, axis=-1, keepdims=True)
        out_ref[0, :, sl] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_spatial_core_packed(
    q: jax.Array,  # (B, N, D) — pre-scaled queries, heads packed in D
    k: jax.Array,
    v: jax.Array,
    *,
    heads: int,
    interpret: bool = False,
) -> jax.Array:
    b, n, d = q.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_packed, heads=heads, e=d // heads),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _kernel(q_ref, k_ref, v_ref, out_ref, *, heads_per_block: int):
    # refs: (1, hb, N, e)
    for i in range(heads_per_block):
        q = q_ref[0, i]
        k = k_ref[0, i]
        v = v_ref[0, i]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, N) f32, VMEM-resident
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out_ref[0, i] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads_per_block", "interpret"))
def fused_spatial_core(
    q: jax.Array,  # (B, H, N, e) — pre-scaled queries
    k: jax.Array,
    v: jax.Array,
    *,
    heads_per_block: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Softmax attention per (batch, head); returns (B, H, N, e)."""
    b, h, n, e = q.shape
    hb = heads_per_block
    while h % hb:
        hb //= 2

    spec = pl.BlockSpec((1, hb, n, e), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads_per_block=hb),
        grid=(b, h // hb),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, h, n, e), q.dtype),
        interpret=interpret,
    )(q, k, v)
