"""Fused temporal-attention core: a Pallas kernel for the LanguageBind
video tower's per-patch 8-frame attention.

Reference semantics: llava/model/multimodal_encoder/languagebind/video/
modeling_video.py:125-155 — per encoder layer, every patch position runs
softmax attention over its ``t`` (=8) frames: add temporal positional
embedding, LayerNorm, CLIP attention (q pre-scaled), residual.

Why a kernel: the XLA path spends ~250 ms of a 785 ms encoder forward
(batch 256 frames, v5e) in the temporal core alone — 65k independent
8-token attentions are VPU-bound with t=8 in lanes (16x lane padding).

Design — head-packed MXU core, everything else stays XLA:

- LN / temporal embedding / qkv / out projections remain XLA einsums: they
  are GEMM-dominated and already near roofline there (round-1 ablation);
- the (b, n, t, d) -> (b, n, t*h, e) regrouping the kernel wants is a pure
  row-major reshape — free in XLA (bitcast), and crucially NOT done inside
  the kernel: Mosaic cannot relayout a lane-split reshape
  (vector<256x1024> -> vector<4096x64> "unsupported shape cast", verified
  on v5e this round);
- the kernel packs each patch position's heads into one (t*h, e) tile
  (8 * 16 = 128 MXU rows for the production tower): the scores for ALL
  heads of one position are ONE (t*h, e) @ (e, t*h) MXU dot; cross-head
  entries are masked before the f32 softmax. Packs are batched G at a time
  through dot_general batch dims so Mosaic issues back-to-back MXU ops
  without FLOP inflation;
- FLOP inflation from head packing is h x on an op that is ~0.2% of the
  layer's essential FLOPs — noise next to the qkv GEMMs.

The public ``temporal_attention`` wrapper is a custom_vjp op (kernel
forward, XLA-recompute backward): the tower is frozen in every reference
recipe, but grads may still be traced through it.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _core_kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads: int, group: int):
    """q/k/v refs: (1, BN, P, e) with P = t*h rows ordered (t, h)."""
    bn, p, e = q_ref.shape[1:]
    h = num_heads

    # Rows within a pack are ordered (t, h): entry [(tq,hq),(tk,hk)] is
    # valid iff hq == hk.
    row_h = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0) % h
    col_h = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1) % h
    head_ok = row_h == col_h

    def body(g, _):
        rows = pl.ds(g * group, group)
        qg = q_ref[0, rows, :, :]
        kg = k_ref[0, rows, :, :]
        vg = v_ref[0, rows, :, :]
        s = jax.lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, P, P)
        s = jnp.where(head_ok[None], s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s)
        probs = ex / jnp.sum(ex, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            probs.astype(vg.dtype), vg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, P, e)
        out_ref[0, rows, :, :] = o.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bn // group, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_n", "group", "interpret")
)
def fused_temporal_core(
    q: jax.Array,  # (b, n, t, d) — pre-scaled queries
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    block_n: int = 32,
    group: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Per-(b, n) softmax attention over t frames, all heads packed into
    one MXU tile per position. Returns (b, n, t, d)."""
    b, n, t, d = q.shape
    h = num_heads
    e = d // h
    p = t * h
    bn = min(block_n, n)
    g = group
    while bn % g:
        g //= 2
    qp = q.reshape(b, n, p, e)  # row-major bitcast: rows (t, h), cols e
    kp = k.reshape(b, n, p, e)
    vp = v.reshape(b, n, p, e)

    spec = pl.BlockSpec((1, bn, p, e), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_core_kernel, num_heads=h, group=g),
        grid=(b, pl.cdiv(n, bn)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n, p, e), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, n, t, d)


def _core_kernel_fm(q_ref, k_ref, v_ref, out_ref, *, num_heads: int, e: int,
                    n: int):
    """Frame-major core: refs (1, t, BN, d) — the residual-stream layout.

    Rows are packed (t, bn) per head: entry [(tq, iq), (tk, ik)] is valid
    iff iq == ik (a patch position only attends across its own t frames).
    Heads are lane-sliced in-kernel (same Mosaic relayout-free slice the
    spatial kernel uses — ops/spatial_attention.py:103-118), so q/k/v are
    consumed EXACTLY as the projection GEMMs emit them and the output is
    written back in the same layout: zero relayouts in the whole temporal
    block, killing the per-layer (b,t,n,d)<->(b,n,t,d) transpose pair
    (~2.1 ms/layer at batch 256, benchmarks/encoder_bisect.py)."""
    t, bn, _ = q_ref.shape[1:]
    p = t * bn
    j = pl.program_id(1)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0) % bn
    col_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1) % bn
    pos_ok = row_i == col_i
    # The last n-block is padded past n: padded rows of v hold garbage
    # (NaN in interpret mode) and 0 * NaN = NaN would leak into VALID
    # positions through the probs @ v dot, so padding is zeroed by select
    # (not multiply) and padded score columns are masked outright.
    pos_ok &= (j * bn + col_i) < n
    valid_row = (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % bn
                 + j * bn) < n

    for h in range(num_heads):
        sl = slice(h * e, (h + 1) * e)
        qh = q_ref[0, :, :, sl].reshape(p, e)  # row-major collapse: free
        kh = k_ref[0, :, :, sl].reshape(p, e)
        vh = v_ref[0, :, :, sl].reshape(p, e)
        vh = jnp.where(valid_row, vh, jnp.zeros_like(vh))
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, P) f32, VMEM-resident
        s = jnp.where(pos_ok, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s)
        probs = ex / jnp.sum(ex, axis=-1, keepdims=True)
        o = jnp.dot(probs.astype(vh.dtype), vh,
                    preferred_element_type=jnp.float32)
        out_ref[0, :, :, sl] = o.reshape(t, bn, e).astype(out_ref.dtype)


def _core_kernel_fm3(qkv_ref, out_ref, *, num_heads: int, e: int, n: int,
                     d: int):
    """Frame-major core over ONE packed (1, t, BN, 3d) qkv ref (the fused
    3d-wide projection GEMM's output layout): head h's q/k/v live at lane
    offsets h*e, d + h*e, 2d + h*e. Same math as _core_kernel_fm."""
    t, bn, _ = qkv_ref.shape[1:]
    p = t * bn
    j = pl.program_id(1)

    row_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0) % bn
    col_i = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1) % bn
    pos_ok = row_i == col_i
    pos_ok &= (j * bn + col_i) < n
    valid_row = (jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0) % bn
                 + j * bn) < n

    for h in range(num_heads):
        qh = qkv_ref[0, :, :, h * e:(h + 1) * e].reshape(p, e)
        kh = qkv_ref[0, :, :, d + h * e:d + (h + 1) * e].reshape(p, e)
        vh = qkv_ref[0, :, :, 2 * d + h * e:2 * d + (h + 1) * e].reshape(p, e)
        vh = jnp.where(valid_row, vh, jnp.zeros_like(vh))
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(pos_ok, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        ex = jnp.exp(s)
        probs = ex / jnp.sum(ex, axis=-1, keepdims=True)
        o = jnp.dot(probs.astype(vh.dtype), vh,
                    preferred_element_type=jnp.float32)
        out_ref[0, :, :, h * e:(h + 1) * e] = (
            o.reshape(t, bn, e).astype(out_ref.dtype))


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_n", "interpret")
)
def fused_temporal_core_fm3(
    qkv: jax.Array,  # (b, t, n, 3d) — packed [q*scale | k | v], frame-major
    *,
    num_heads: int,
    block_n: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """fused_temporal_core_fm over the fused qkv projection's own packed
    (…, 3d) output — one GEMM and one kernel operand instead of three.
    Returns (b, t, n, d)."""
    b, t, n, d3 = qkv.shape
    d = d3 // 3
    e = d // num_heads
    bn = min(block_n, n)

    in_spec = pl.BlockSpec((1, t, bn, d3), lambda i, j: (i, 0, j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, t, bn, d), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_core_kernel_fm3, num_heads=num_heads, e=e, n=n,
                          d=d),
        grid=(b, pl.cdiv(n, bn)),
        in_specs=[in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, n, d), qkv.dtype),
        interpret=interpret,
    )(qkv)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_n", "interpret")
)
def fused_temporal_core_fm(
    q: jax.Array,  # (b, t, n, d) — pre-scaled queries, frame-major
    k: jax.Array,
    v: jax.Array,
    *,
    num_heads: int,
    block_n: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Per-(b, n) softmax attention over t frames, consumed and produced
    in the residual stream's OWN (b, t, n, d) layout. Rows pack (t, bn)
    per head with a same-position mask; FLOP inflation is bn/t x on an op
    that is ~1.5% of the layer's essential FLOPs. Returns (b, t, n, d)."""
    b, t, n, d = q.shape
    e = d // num_heads
    bn = min(block_n, n)

    spec = pl.BlockSpec((1, t, bn, d), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_core_kernel_fm, num_heads=num_heads, e=e, n=n),
        grid=(b, pl.cdiv(n, bn)),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, t, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _dense(p: Params, y: jax.Array) -> jax.Array:
    if isinstance(p["kernel"], dict):  # int8 path (models/vision/quant.py)
        from videollamb_tpu.models.vision.quant import dense_int8

        return dense_int8(p, y)
    out = jnp.einsum("...d,dk->...k", y, p["kernel"].astype(y.dtype),
                     preferred_element_type=jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(y.dtype)


def _ln_qkv(x, temporal_embedding, ln, attn, eps):
    """Shared XLA prologue: temb into the residual stream, LayerNorm, qkv
    projections with CLIP's pre-scaled q. The residual stream stays in the
    input dtype (an f32 xt would add ~270 MB of HBM traffic per layer at
    batch 256); LN statistics are f32 internally."""
    t = x.shape[2]
    xt = x + temporal_embedding[:t].astype(x.dtype)[None, None]
    xf = xt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * ln["scale"].astype(jnp.float32) + ln["bias"].astype(jnp.float32)
    normed = normed.astype(x.dtype)
    q = _dense(attn["q_proj"], normed)
    k = _dense(attn["k_proj"], normed)
    v = _dense(attn["v_proj"], normed)
    return xt, q, k, v


def _qkv_fused(attn: Params, normed: jax.Array, q_scale: float) -> jax.Array:
    """ONE 3d-wide qkv projection: normed @ [Wq·s | Wk | Wv] + [bq·s|bk|bv]
    (q's head_dim**-0.5 pre-scale folded into its weight columns). One GEMM
    and one kernel operand instead of three — the r2 'fused 3d-wide qkv'
    negative result was an artifact of the OLD core's (b,n,t*h,e) layout
    (strided output slices); the frame-major core consumes the packed
    (…, 3d) output directly via lane offsets. Weight concat is per-call
    but tiny (12 MB/layer) and hoisted by XLA CSE across the scan."""
    qp, kp, vp = attn["q_proj"], attn["k_proj"], attn["v_proj"]
    s = q_scale
    if isinstance(qp["kernel"], dict):  # int8: per-output-channel scales
        from videollamb_tpu.models.vision.quant import dense_int8

        fused = {
            "kernel": {
                "q": jnp.concatenate(
                    [qp["kernel"]["q"], kp["kernel"]["q"], vp["kernel"]["q"]],
                    axis=1),
                # f32 concat: scale*s in bf16 would round the q third to
                # ~0.4% relative error; dense_int8 dequants in f32 anyway.
                "scale": jnp.concatenate(
                    [qp["kernel"]["scale"].astype(jnp.float32) * s,
                     kp["kernel"]["scale"].astype(jnp.float32),
                     vp["kernel"]["scale"].astype(jnp.float32)], axis=-1),
            },
            "bias": jnp.concatenate(
                [qp["bias"] * s, kp["bias"], vp["bias"]]),
        }
        return dense_int8(fused, normed)
    w = jnp.concatenate(
        [qp["kernel"].astype(normed.dtype) * s,
         kp["kernel"].astype(normed.dtype),
         vp["kernel"].astype(normed.dtype)], axis=1)
    b = jnp.concatenate([qp["bias"].astype(jnp.float32) * s,
                         kp["bias"].astype(jnp.float32),
                         vp["bias"].astype(jnp.float32)])
    out = jnp.einsum("...d,dk->...k", normed, w,
                     preferred_element_type=jnp.float32)
    return (out + b).astype(normed.dtype)


def _ln_fm(x, temporal_embedding, ln, eps):
    """Frame-major temb-add + LayerNorm: returns (xt, normed) — the one
    implementation shared by the live op and the test scaffolding (the
    temporal embedding broadcasts over n instead of t)."""
    t = x.shape[1]
    xt = x + temporal_embedding[:t].astype(x.dtype)[None, :, None]
    xf = xt.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * ln["scale"].astype(jnp.float32) + ln["bias"].astype(jnp.float32)
    return xt, normed.astype(x.dtype)


def _ln_qkv_fm(x, temporal_embedding, ln, attn, eps):
    """_ln_fm + the three separate projections (kept for the 3-operand
    frame-major core's tests)."""
    xt, normed = _ln_fm(x, temporal_embedding, ln, eps)
    q = _dense(attn["q_proj"], normed)
    k = _dense(attn["k_proj"], normed)
    v = _dense(attn["v_proj"], normed)
    return xt, q, k, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def temporal_attention_fm(
    x: jax.Array,  # (b, t, n, d) — frame-major, the residual stream itself
    temporal_embedding: jax.Array,  # (t_table, d); first t rows used
    ln: Params,
    attn: Params,
    num_heads: int,
    eps: float = 1e-5,
    block_n: int = 32,
) -> jax.Array:
    """x + temb + CLIPAttention(LN(x + temb)) over the t axis, with the
    frame-major Pallas core: the caller keeps the residual stream in its
    native (b*t, n, d) GEMM layout (viewed (b, t, n, d)) — no transposes
    anywhere in the branch, and qkv is ONE fused 3d-wide GEMM whose packed
    output feeds the core directly at lane offsets 0/d/2d. Kernel forward,
    XLA-recompute backward."""
    d = x.shape[-1]
    e = d // num_heads
    xt, normed = _ln_fm(x, temporal_embedding, ln, eps)
    qkv = _qkv_fused(attn, normed, e**-0.5)
    from videollamb_tpu.parallel.kernel_partition import (
        fused_temporal_core_fm3_spmd,
    )

    o = fused_temporal_core_fm3_spmd(qkv, num_heads=num_heads,
                                     block_n=block_n)
    return xt + _dense(attn["out_proj"], o)


def _ta_fm_fwd(x, temporal_embedding, ln, attn, num_heads, eps, block_n):
    out = temporal_attention_fm(x, temporal_embedding, ln, attn, num_heads,
                                eps, block_n)
    return out, (x, temporal_embedding, ln, attn)


def _ta_fm_bwd(num_heads, eps, block_n, res, g):
    x, temb, ln, attn = res

    def ref(x, temb, ln, attn):
        xb = jnp.swapaxes(x, 1, 2)  # (b, n, t, d)
        out = temporal_attention_reference(xb, temb, ln, attn,
                                           num_heads=num_heads, eps=eps)
        return jnp.swapaxes(out, 1, 2)

    _, vjp = jax.vjp(ref, x, temb, ln, attn)
    return vjp(g)


temporal_attention_fm.defvjp(_ta_fm_fwd, _ta_fm_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def temporal_attention(
    x: jax.Array,  # (b, n, t, d)
    temporal_embedding: jax.Array,  # (t_table, d); first t rows used
    ln: Params,  # {'scale','bias'}
    attn: Params,  # {'q_proj','k_proj','v_proj','out_proj'} each {kernel,bias}
    num_heads: int,
    eps: float = 1e-5,
    block_n: int = 32,
) -> jax.Array:
    """x + temb + CLIPAttention(LN(x + temb)) with the Pallas packed core.

    Kernel forward, XLA-recompute backward (the tower is frozen in every
    reference recipe, but grads may still be traced through it)."""
    d = x.shape[-1]
    e = d // num_heads
    xt, q, k, v = _ln_qkv(x, temporal_embedding, ln, attn, eps)
    # Routed through the custom_partitioning wrapper so GSPMD configs can
    # shard batch / split d by whole heads (parallel/kernel_partition.py).
    from videollamb_tpu.parallel.kernel_partition import fused_temporal_core_spmd

    o = fused_temporal_core_spmd(
        q * (e**-0.5), k, v, num_heads=num_heads, block_n=block_n
    )
    return xt + _dense(attn["out_proj"], o)


def _ta_fwd(x, temporal_embedding, ln, attn, num_heads, eps, block_n):
    out = temporal_attention(x, temporal_embedding, ln, attn, num_heads, eps, block_n)
    return out, (x, temporal_embedding, ln, attn)


def _ta_bwd(num_heads, eps, block_n, res, g):
    x, temb, ln, attn = res
    _, vjp = jax.vjp(
        lambda *a: temporal_attention_reference(*a, num_heads=num_heads, eps=eps),
        x, temb, ln, attn,
    )
    return vjp(g)


temporal_attention.defvjp(_ta_fwd, _ta_bwd)


def temporal_attention_reference(
    x: jax.Array,  # (b, n, t, d)
    temporal_embedding: jax.Array,
    ln: Params,
    attn: Params,
    *,
    num_heads: int,
    eps: float = 1e-5,
) -> jax.Array:
    """Plain-XLA statement of the same math (parity oracle + the
    differentiable/training fallback)."""
    b, n, t, d = x.shape
    h = num_heads
    e = d // h
    xt, q, k, v = _ln_qkv(x, temporal_embedding, ln, attn, eps)
    q = q.reshape(b, n, t, h, e) * (e**-0.5)
    k = k.reshape(b, n, t, h, e)
    v = v.reshape(b, n, t, h, e)
    s = jnp.einsum("bnqhe,bnkhe->bnhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnhqk,bnkhe->bnqhe", p, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).reshape(b, n, t, d)
    return xt + _dense(attn["out_proj"], o)
