"""Paged attention that also returns its softmax statistics (m, l).

The stock JAX TPU Pallas paged-attention kernel
(jax.experimental.pallas.ops.tpu.paged_attention.paged_attention_kernel)
already computes the flash-attention running max ``m`` and normalizer ``l``
as kernel OUTPUTS — its public wrapper simply discards them
(``out, _, _ = pl.pallas_call(...)``). This module launches the same stock
kernel body with a host wrapper that keeps all three, enabling the
attention-before-write decode step (models/lm/paged.py): attend over the
already-resident pages only, then merge the current token's self-attention
contribution exactly via the (m, l) log-sum-exp combine, and write fresh
K/V to the pool ONCE per step after the layer loop.

Host-side setup is a condensed adaptation of the stock wrapper (Apache-2.0
JAX library code — library reuse), specialized to megacore_mode=None and
inline_seq_dim=True which is how the serving engine always calls it.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu.paged_attention import quantization_utils
from jax.experimental.pallas.ops.tpu.paged_attention.paged_attention_kernel import (
    DEFAULT_MASK_VALUE,
    paged_flash_attention_kernel_inline_seq_dim,
)


@functools.partial(jax.jit, static_argnames=("pages_per_compute_block",))
def paged_attention_with_stats(
    q: jax.Array,  # (B, H, Dh) — PRE-SCALED queries (kernel computes raw q.k)
    k_pages,  # (H_kv, P, page, Dh) jax.Array or QuantizedTensor
    v_pages,
    lengths: jax.Array,  # (B,) int32 — keys already resident
    page_indices: jax.Array,  # (B, pages_per_seq) int32 physical page ids
    *,
    pages_per_compute_block: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (out, m, l): ``out`` (B, H, Dh) normalized attention over the
    first ``lengths`` resident tokens; ``m``/``l`` (B, H) f32 running
    max / sum-exp so a caller can exactly fold in additional keys.

    ``lengths`` of 0 are legal: out rows are zeroed, m = -inf, l = 0."""
    k_scales = v_scales = None
    if isinstance(k_pages, quantization_utils.QuantizedTensor):
        k_pages, k_scales = k_pages.weight, k_pages.scales
        k_scales = jnp.broadcast_to(
            k_scales, (*k_scales.shape[:-1], k_pages.shape[-1]))
    if isinstance(v_pages, quantization_utils.QuantizedTensor):
        v_pages, v_scales = v_pages.weight, v_pages.scales
        v_scales = jnp.broadcast_to(
            v_scales, (*v_scales.shape[:-1], v_pages.shape[-1]))

    batch_size, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, _ = k_pages.shape
    pages_per_sequence = page_indices.shape[1]
    assert pages_per_sequence % pages_per_compute_block == 0
    num_groups = num_q_heads // num_kv_heads

    if num_groups % 8 != 0:
        # <1x128> layout hint (stock wrapper does the same): lift q to 4D.
        q_kernel = q.reshape(batch_size, num_q_heads, 1, head_dim)
        q_block_spec = pl.BlockSpec(
            (None, num_groups, None, head_dim),
            lambda core_index, b, h, *_: (b, h, 0, 0))
        q_dtype = jnp.float32
    else:
        q_kernel = q
        q_block_spec = pl.BlockSpec(
            (None, num_groups, head_dim),
            lambda core_index, b, h, *_: (b, h, 0))
        q_dtype = q.dtype

    def vmem_buf(ref):
        return pltpu.VMEM(
            (2, pages_per_compute_block, page_size, head_dim), ref.dtype)

    if k_scales is not None:
        in_specs = [q_block_spec] + [pl.BlockSpec(memory_space=pl.ANY)] * 4
        scratch_shapes = (
            vmem_buf(k_pages), vmem_buf(k_scales),
            vmem_buf(v_pages), vmem_buf(v_scales),
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        )
    else:
        in_specs = [
            q_block_spec,
            pl.BlockSpec(memory_space=pl.ANY), None,
            pl.BlockSpec(memory_space=pl.ANY), None,
        ]
        scratch_shapes = (
            vmem_buf(k_pages), None, vmem_buf(v_pages), None,
            pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA((2,)),
        )

    out, m, l = pl.pallas_call(
        functools.partial(
            paged_flash_attention_kernel_inline_seq_dim,
            pages_per_sequence=pages_per_sequence,
            batch_size=batch_size,
            pages_per_compute_block=pages_per_compute_block,
            mask_value=DEFAULT_MASK_VALUE,
            attn_logits_soft_cap=None,
            megacore_mode=None,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=in_specs,
            out_specs=[q_block_spec, q_block_spec, q_block_spec],
            grid=(1, batch_size, num_kv_heads),
            scratch_shapes=scratch_shapes,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        out_shape=[
            jax.ShapeDtypeStruct(q_kernel.shape, q_dtype),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], 1), jnp.float32),
            jax.ShapeDtypeStruct((*q_kernel.shape[:-1], 1), jnp.float32),
        ],
    )(
        lengths,
        page_indices.reshape(-1),
        jnp.zeros((1,), jnp.int32),  # buffer index
        jnp.ones((1,), jnp.int32),  # init flag
        q_kernel.astype(q_dtype),
        k_pages, k_scales, v_pages, v_scales,
    )
    out = out.reshape(batch_size, num_q_heads, head_dim).astype(q.dtype)
    m = m.reshape(batch_size, num_q_heads)
    l = l.reshape(batch_size, num_q_heads)
    # length == 0 rows never ran the inner loop: o_ref is uninitialized VMEM
    # (m/l ARE initialized to -inf/0 unconditionally) — zero them so the
    # caller's merge math sees 0 * l(=0) instead of garbage.
    out = jnp.where((lengths > 0)[:, None, None], out, 0)
    return out, m, l


def attend_paged_with_stats_xla(
    q: jax.Array,  # (B, H, Dh) pre-scaled
    k_pages: jax.Array,  # (H_kv, P, page, Dh); int8 when scales given
    v_pages: jax.Array,
    page_indices: jax.Array,  # (B, pps)
    lengths: jax.Array,  # (B,)
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA gather statement of the same contract (CPU tests + unaligned
    head_dim + the short-bf16-context regime where gather beats the
    kernel): returns (out, m, l) over the first ``lengths`` resident
    tokens. m/l are f32 (B, H)."""
    from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
        from_int8,
    )

    b, h, dh = q.shape
    h_kv = k_pages.shape[0]
    page = k_pages.shape[2]
    s_virt = page_indices.shape[1] * page
    k = k_pages[:, page_indices]  # (H_kv, B, pps, page, Dh)
    v = v_pages[:, page_indices]
    if k_scales is not None:
        k = from_int8(k, k_scales[:, page_indices], jnp.float32)
        v = from_int8(v, v_scales[:, page_indices], jnp.float32)
    k = k.reshape(h_kv, b, s_virt, dh)
    v = v.reshape(h_kv, b, s_virt, dh)
    groups = h // h_kv
    qg = q.reshape(b, h_kv, groups, dh).astype(jnp.float32)
    s = jnp.einsum("bkgd,kbsd->bkgs", qg, k.astype(jnp.float32))
    valid = (jnp.arange(s_virt, dtype=jnp.int32)[None] < lengths[:, None])
    s = jnp.where(valid[:, None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1)  # (B, H_kv, G)
    # all-masked rows: exp(-inf - -inf) = nan — pin m to 0 there.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m_safe[..., None])
    e = jnp.where(valid[:, None, None], e, 0.0)
    l = jnp.sum(e, axis=-1)  # (B, H_kv, G)
    o = jnp.einsum("bkgs,kbsd->bkgd", e, v.astype(jnp.float32))
    o = o / jnp.maximum(l, 1e-30)[..., None]
    o = jnp.where((lengths > 0)[:, None, None, None], o, 0.0)
    return (
        o.reshape(b, h, dh).astype(q.dtype),
        m.reshape(b, h),
        l.reshape(b, h),
    )


MAX_INT8 = 127.5  # quantization_utils convention: x = i8 * scale / 127.5


def attend_pool_int8_stats(
    q: jax.Array,  # (B, H, Dh) pre-scaled
    k_pool: jax.Array,  # (H_kv, P, page, Dh) int8 — ONE layer's page range
    v_pool: jax.Array,  # int8
    page_table: jax.Array,  # (B, pps) logical page ids into P
    lengths: jax.Array,  # (B,) resident tokens per slot
    k_scales: jax.Array,  # (H_kv, P, page, 1) f32
    v_scales: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Shared-pool int8 decode attention: every slot attends over the
    WHOLE layer pool under an ownership mask — the TPU-native shape for
    this workload.

    Why (measured on v5e, 7B batch 8, 32 layers): the stock Pallas paged
    kernel runs grid (1, B, H_kv) = 256 programs of 1x128 @ 128x(pages)
    blocks (num_groups=1 for MHA) — ~21 ms/step of per-program overhead
    for ~21 MB of resident KV (~26 us of bandwidth). Gather-then-dense
    XLA needs a float copy of the gathered pages because TPU dots cannot
    fuse an int8->float convert into their operand read (~18 ms/step
    materialized). Attending over the shared pool instead makes the slot
    axis the M dimension of ONE true matmul per head:

        scores[h] = q_i8[B, Dh] @ k_pool_i8[h][Dh, P*page]   (int8 MXU)

    with NO gather and NO float materialization of K/V. Dequantization is
    exact post-dot scaling (the per-token scale is linear in the
    contraction row): scores *= q_scale[b,h] * k_scale[h,s] / 127.5^2.
    For the output, the V scale folds into the probabilities BEFORE they
    are re-quantized per (b,h) row, so V also stays int8 through the MXU;
    the only approximation added over the existing int8-KV mode is that
    single probability-row quantization (<=0.5% relative on the attention
    output, bounded in tests).

    The ownership mask comes straight from the page table: slot b owns
    min(page, len_b - j*page) tokens of its j-th page. Compute grows with
    B * pool-size (every slot scans the whole pool), so this path is for
    the serving regime (pool ~= sum of resident pages); the dispatch in
    paged_decode_step keeps the Pallas kernel for configs where the pool
    is much larger than one slot's pages.

    Returns (out (B,H,Dh), m (B,H), l (B,H)) — same contract as
    paged_attention_with_stats (softmax stats over the resident tokens).
    """
    b, h, dh = q.shape
    h_kv, p_layer, page, _ = k_pool.shape
    groups = h // h_kv
    pps = page_table.shape[1]
    s_pool = p_layer * page

    # Ownership: tokens of (slot b, logical page p) = counts scattered via
    # the page table. Unallocated table entries point at the trash page
    # with zero counts (the engine allocates ahead of lengths).
    j = jnp.arange(pps, dtype=jnp.int32)
    counts = jnp.clip(lengths[:, None] - j[None] * page, 0, page)  # (B,pps)
    rows = jnp.arange(b, dtype=jnp.int32)[:, None]
    own = jnp.zeros((b, p_layer), jnp.int32).at[
        jnp.broadcast_to(rows, (b, pps)), page_table].max(counts, mode="drop")
    pos_in_page = jnp.arange(s_pool, dtype=jnp.int32) % page
    valid = pos_in_page[None] < own[:, jnp.arange(s_pool) // page]  # (B,S)

    # q -> int8 per (B, H) row.
    qf = q.astype(jnp.float32)
    q_scale = jnp.maximum(jnp.max(jnp.abs(qf), axis=-1, keepdims=True), 1e-30)
    q_i8 = jnp.rint(qf * (MAX_INT8 / q_scale)).astype(jnp.int8)

    k = k_pool.reshape(h_kv, s_pool, dh)
    ks = k_scales.reshape(h_kv, s_pool)
    qk = q_i8.reshape(b, h_kv, groups, dh)
    s_i32 = jnp.einsum("bkgd,ksd->bkgs", qk, k,
                       preferred_element_type=jnp.int32)
    s = s_i32.astype(jnp.float32) * (
        q_scale.reshape(b, h_kv, groups, 1) * ks[None, :, None, :]
        / (MAX_INT8 * MAX_INT8))
    s = jnp.where(valid[:, None, None], s, -jnp.inf)
    m = jnp.max(s, axis=-1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(s - m_safe[..., None])
    e = jnp.where(valid[:, None, None], e, 0.0)
    l = jnp.sum(e, axis=-1)

    # Fold the V scale into the (unnormalized) probs, requantize the row,
    # and keep V int8 through the MXU.
    vs = v_scales.reshape(h_kv, s_pool)
    w = e * (vs[None, :, None, :] / MAX_INT8)  # (B,K,G,S) f32
    w_scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1, keepdims=True), 1e-30)
    w_i8 = jnp.rint(w * (MAX_INT8 / w_scale)).astype(jnp.int8)
    v = v_pool.reshape(h_kv, s_pool, dh)
    o_i32 = jnp.einsum("bkgs,ksd->bkgd", w_i8, v,
                       preferred_element_type=jnp.int32)
    o = o_i32.astype(jnp.float32) * (w_scale / MAX_INT8)
    o = o / jnp.maximum(l, 1e-30)[..., None]
    o = jnp.where((lengths > 0)[:, None, None, None], o, 0.0)
    return (
        o.reshape(b, h, dh).astype(q.dtype),
        m.reshape(b, h),
        l.reshape(b, h),
    )


def merge_one_token(
    o_old: jax.Array,  # (B, H, Dh) normalized attention over old keys
    m_old: jax.Array,  # (B, H) f32
    l_old: jax.Array,  # (B, H) f32
    s_self: jax.Array,  # (B, H) f32 — PRE-SCALED q . k_new
    v_new: jax.Array,  # (B, H, Dh) the new token's value (already grouped)
) -> jax.Array:
    """Exact log-sum-exp fold of one extra key into a normalized flash
    result: softmax([old scores, s_self]) @ [V_old; v_new]."""
    m_new = jnp.maximum(m_old, s_self)
    alpha = jnp.exp(m_old - m_new) * l_old  # un-normalizer for o_old
    beta = jnp.exp(s_self - m_new)
    denom = alpha + beta
    o = (alpha[..., None] * o_old.astype(jnp.float32)
         + beta[..., None] * v_new.astype(jnp.float32)) / denom[..., None]
    return o.astype(o_old.dtype)
