"""Pallas flash attention (forward) for TPU.

Replaces the reference's CUDA flash-attn / xformers monkey patches
(llava/train/llama_flash_attn_monkey_patch.py,
llama_xformers_attn_monkey_patch.py) with one TPU kernel used by both the
Llama prefill path and the vision tower: online-softmax over KV blocks, so
the (Sq, Skv) score matrix never leaves VMEM.

Supports multi-query/grouped heads (q heads grouped onto kv heads by the
caller reshaping), causal masking, and a per-key validity mask. Forward
only — training uses the differentiable chunked-scan implementation in
:mod:`videollamb_tpu.ops.attention` (same math, autodiff-friendly).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # (1, bq, dh)
    k_ref,  # (1, bkv, dh)
    v_ref,  # (1, bkv, dh)
    kmask_ref,  # (1, 1, bkv) float32 (1.0 valid / 0.0 invalid)
    o_ref,  # (1, bq, dh)
    m_scr,  # (bq, 128) f32
    l_scr,  # (bq, 128) f32
    acc_scr,  # (bq, dh) f32
    *,
    scale: float,
    causal: bool,
    bq: int,
    bkv: int,
    sq_valid: int,
    skv_valid: int,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # bf16 x bf16 -> f32 accumulation: native MXU fast path (an explicit
    # f32 cast before the dot would force the slow f32 MXU mode).
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, bkv) f32

    # Key validity: in-range and caller mask.
    k_pos = kj * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    valid = (k_pos < skv_valid) & (kmask_ref[0, 0][None, :] > 0.5)
    if causal:
        q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        valid = valid & (q_pos >= k_pos)
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)  # (bq, bkv)
    corr = jnp.exp(m_prev - m_new)  # (bq, 1)

    l_scr[:, :1] = l_scr[:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:, :1] = m_new
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kj == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        # Fully-masked query rows (padding) produce l == 0 -> emit zeros.
        o = acc_scr[:] / jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_kv")
)
def flash_attention(
    q: jax.Array,  # (B, H, Sq, Dh)
    k: jax.Array,  # (B, H, Skv, Dh)
    v: jax.Array,  # (B, H, Skv, Dh)
    k_mask: jax.Array | None = None,  # (B, Skv) bool
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 256,
    block_kv: int = 256,
) -> jax.Array:
    """Flash attention forward. Returns (B, H, Sq, Dh), q dtype."""
    b, h, sq, dh = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    # Short sequences run as a single fitted block (e.g. ViT's 257 -> one
    # 264x384 tile) instead of padding up to the next block multiple.
    bq = _round_up(sq, 8) if sq <= 2 * block_q else block_q
    bkv = _round_up(skv, 128) if skv <= 2 * block_kv else block_kv

    sq_pad = _round_up(sq, bq)
    skv_pad = _round_up(skv, bkv)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))

    if k_mask is None:
        kmask_f = jnp.ones((b, skv_pad), jnp.float32)
    else:
        kmask_f = jnp.pad(
            k_mask.astype(jnp.float32), ((0, 0), (0, skv_pad - skv))
        )

    bh = b * h
    qf = q.reshape(bh, sq_pad, dh)
    kf = k.reshape(bh, skv_pad, dh)
    vf = v.reshape(bh, skv_pad, dh)
    kmask_bh = jnp.repeat(kmask_f, h, axis=0)[:, None]  # (bh, 1, skv_pad)

    grid = (bh, sq_pad // bq, skv_pad // bkv)

    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, bq=bq, bkv=bkv,
        sq_valid=sq, skv_valid=skv,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda bh_, i, j: (bh_, i, 0)),
            pl.BlockSpec((1, bkv, dh), lambda bh_, i, j: (bh_, j, 0)),
            pl.BlockSpec((1, bkv, dh), lambda bh_, i, j: (bh_, j, 0)),
            pl.BlockSpec((1, 1, bkv), lambda bh_, i, j: (bh_, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda bh_, i, j: (bh_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, sq_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
    )(qf, kf, vf, kmask_bh)

    out = out.reshape(b, h, sq_pad, dh)
    return out[:, :, :sq]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Short-sequence block attention: one program per batch element, ALL heads
# and the whole (padded) sequence in VMEM. For ViT-scale sequences (<=512)
# this amortizes program launch overhead ~H-fold vs the tiled flash kernel
# and needs no online-softmax carry.
# ---------------------------------------------------------------------------


def _block_attn_kernel(
    q_ref,  # (1, H, sq_pad, dh)
    k_ref,  # (1, H, skv_pad, dh)
    v_ref,  # (1, H, skv_pad, dh)
    o_ref,  # (1, H, sq_pad, dh)
    *,
    scale: float,
    causal: bool,
    sq_valid: int,
    skv_valid: int,
    num_heads: int,
):
    sq_pad = q_ref.shape[2]
    skv_pad = k_ref.shape[2]
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (sq_pad, skv_pad), 1)
    valid = k_pos < skv_valid
    if causal:
        q_pos = jax.lax.broadcasted_iota(jnp.int32, (sq_pad, skv_pad), 0)
        valid = valid & (q_pos >= k_pos)
    bias = jnp.where(valid, 0.0, NEG_INF)

    for h in range(num_heads):  # static unroll
        s = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.where(l == 0.0, 1.0, l)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale"))
def block_attention(
    q: jax.Array,  # (B, H, Sq, Dh)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: float | None = None,
) -> jax.Array:
    """Whole-sequence attention in VMEM, all heads per program. Use for
    short sequences (no key mask — padding is masked by position)."""
    b, h, sq, dh = q.shape
    skv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(dh)
    sq_pad = _round_up(sq, 16)
    skv_pad = _round_up(skv, 128)
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    if skv_pad != skv:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))

    kernel = functools.partial(
        _block_attn_kernel, scale=scale, causal=causal,
        sq_valid=sq, skv_valid=skv, num_heads=h,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, sq_pad, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, skv_pad, dh), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, skv_pad, dh), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, sq_pad, dh), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, dh), q.dtype),
    )(q, k, v)
    return out[:, :, :sq]
