"""Gathered int8 paged decode attention — the many-slot x long-context
kernel (VERDICT r3 #3).

The shared-pool int8 path (ops/paged_attention_stats.attend_pool_int8_
stats) made decode attention a true MXU matmul by letting EVERY slot
attend over the WHOLE layer pool under an ownership mask — compute grows
with B x pool_size, i.e. a factor-of-B overread of the resident KV (each
slot scans everyone's pages). The stock Pallas kernel reads only each
slot's own pages but runs a (1, B, H_kv) grid of 1x128 matvecs — measured
59.8 ms/step at 24 slots x 512 ctx and 107.6 ms/step at 8 x 3072 against
pool-int8's 27.7 / 30.7 (docs/PERFORMANCE.md item 6).

This kernel reads each slot's own pages ONCE (compute and bandwidth both
proportional to sum_b len_b — the attention roofline) while keeping real
MXU matmuls, by packing ALL query heads into the matmul instead of the
grid:

- the quantized pool is TOKEN-MAJOR: one layer is ``(P, page, H_kv*Dh)``
  int8 with per-token scales ``(P, page, H_kv)`` — a token's every head
  is contiguous, so a page DMA yields a ``(page, H_kv*Dh)`` tile that is
  directly a matmul operand;
- scores for all H heads of one block: ``K_blk (T, KD) @ Qbd (KD, H)``
  where ``Qbd`` is the per-head-quantized query laid out block-diagonally
  (rows kh*Dh..(kh+1)*Dh of column h hold q[h], zeros elsewhere — the
  zero rows mask cross-head terms); int8 x int8 -> int32 on the MXU,
  dequantized EXACTLY post-dot (the per-token k-scale is constant along
  the contraction);
- values: probabilities fold the per-token v-scale, requantize per
  (head, block) row, and hit the MXU again as ``Wt (H, T) @ V_blk
  (T, KD)`` int8; the per-head slice of the (H, KD) product is the
  attention output (cross-head columns are discarded — 1/H_kv of the
  matmul is useful, which on the MXU still beats matvecs by ~8x at
  H_kv=32 because M=H rides the systolic array's M dimension);
- grid is ``(B, num_blocks)`` with the stock kernel's double-buffered
  multi-page DMA pattern (descriptor-recreate-to-wait) and per-slot
  flash (m, l, acc) carried in VMEM scratch across sequential grid
  steps; blocks past a slot's length are predicated off, so compute
  tracks the ACTUAL context of each slot.

Returns the same (out, m, l) softmax-stats contract as the other attend
paths, so models/lm/paged.paged_decode_step folds the current token in
via the exact log-sum-exp merge unchanged.

Quantization convention matches quantization_utils / attend_pool_int8_
stats: x ~ i8 * scale / 127.5, absmax scales; the one approximation over
exact int8-KV attention is the probability-row requantization, here per
(head, block) — strictly tighter than pool-int8's per-(head, row-of-S).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_INT8 = 127.5
MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


class _BlockCopies:
    """Async copies for one (slot, block): ``ppb`` K/V pages gathered by
    page id from the token-major MULTI-LAYER pool at the scalar-prefetched
    layer index. Recreating the descriptor later and calling wait() is the
    stock paged-attention pattern — the semaphore carries the state. The
    tiny per-token scale tiles are NOT manually DMA'd (their 32-lane minor
    dim violates Mosaic's 128-lane slice alignment): the wrapper
    pre-gathers them with XLA and they ride the automatic BlockSpec
    pipeline. The pools stay full multi-layer operands so the per-layer
    decode scan passes them as loop CONSTANTS — a per-layer
    dynamic-slice operand would make XLA materialize a ~134 MB copy per
    layer per step (the pool is in ANY/HBM space; only the addressed
    pages ever move)."""

    def __init__(self, pt_ref, layer, kp_ref, vp_ref, kbuf, vbuf, k_sem,
                 v_sem, b, i, ppb, pages_per_seq):
        off = b * pages_per_seq + i * ppb
        self._copies = []
        for j in range(ppb):
            pid = pt_ref[off + j]
            self._copies += [
                pltpu.make_async_copy(kp_ref.at[layer, pid], kbuf.at[j],
                                      k_sem),
                pltpu.make_async_copy(vp_ref.at[layer, pid], vbuf.at[j],
                                      v_sem),
            ]

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _gathered_kernel(
    # scalar prefetch
    len_ref, pt_ref, buf_ref, init_ref, layer_ref,
    # inputs
    q_ref, kp_ref, vp_ref, ks_ref, vs_ref,
    # outputs
    o_ref, m_ref, l_ref,
    # scratch
    kbuf, vbuf, acc_ref, msc_ref, lsc_ref, k_sems, v_sems,
    *,
    pages_per_seq: int,
    ppb: int,
    groups: int,
):
    b, i = pl.program_id(0), pl.program_id(1)
    n_slots = pl.num_programs(0)
    page = kp_ref.shape[2]  # kp_ref: (L, P, page, kd)
    kd = kp_ref.shape[3]
    h_kv = ks_ref.shape[2]
    h, dh = q_ref.shape
    t = ppb * page
    length = len_ref[b]

    def compute_block_indices(b, i):
        """Next active (slot, block) — skips zero-length slots (stock
        kernel's advance logic, minus the head dimension)."""

        def advance_b():
            next_b = b + 1

            def skip_zero_lengths():
                nnb = next_b + 1
                return lax.fori_loop(
                    nnb, n_slots,
                    lambda _, x: jnp.where(
                        len_ref[lax.clamp(0, x, n_slots - 1)] == 0, x + 1, x),
                    nnb)

            nb = lax.cond(
                jnp.logical_and(
                    next_b < n_slots,
                    len_ref[lax.clamp(0, next_b, n_slots - 1)] == 0),
                skip_zero_lengths, lambda: next_b)
            return (nb, 0)

        return lax.cond(i * t < len_ref[lax.clamp(0, b, n_slots - 1)],
                        lambda: (b, i), advance_b)

    def copies(b, i, slot):
        return _BlockCopies(
            pt_ref, layer_ref[0], kp_ref, vp_ref, kbuf.at[slot],
            vbuf.at[slot], k_sems.at[slot], v_sems.at[slot],
            b, i, ppb, pages_per_seq)

    @pl.when(i * t < length)
    def _flash():
        init_flag = init_ref[0]
        init_ref[0] = 0
        slot = buf_ref[0]
        next_b, next_i = compute_block_indices(b, i + 1)

        @pl.when(init_flag)
        def _prefetch_first():
            copies(b, i, slot).start()

        @pl.when(i == 0)
        def _init():
            msc_ref[...] = jnp.full_like(msc_ref, -jnp.inf)
            lsc_ref[...] = jnp.zeros_like(lsc_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(next_b < n_slots)
        def _prefetch_next():
            next_slot = jnp.where(slot == 0, 1, 0)
            copies(next_b, next_i, next_slot).start()
            buf_ref[0] = next_slot

        copies(b, i, slot).wait()

        # Per-head int8 query, laid out block-diagonally: Qbd (KD, H).
        qf = q_ref[...].astype(jnp.float32)  # (H, Dh)
        qs = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=1, keepdims=True), 1e-30)  # (H, 1)
        q_int = jnp.rint(qf * (MAX_INT8 / qs))  # integral f32
        qt = q_int.T  # (Dh, H) — f32 transpose, tiny
        kh_of_row = lax.broadcasted_iota(jnp.int32, (kd, h), 0) // dh
        col_head = lax.broadcasted_iota(jnp.int32, (kd, h), 1)
        block_diag = (kh_of_row == col_head // groups).astype(jnp.float32)
        qbd = (jnp.tile(qt, (h_kv, 1)) * block_diag).astype(jnp.int8)

        k_blk = kbuf[slot].reshape(t, kd)  # int8
        s_i32 = lax.dot_general(
            k_blk, qbd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (T, H)

        ks_blk = ks_ref[...].reshape(t, h_kv)  # f32 per-token k scales
        if groups == 1:
            ks_rep = ks_blk
            vs_rep = vs_ref[...].reshape(t, h_kv)
        else:
            # ks_rep[t, h] = ks[t, h // groups]: tiny f32 matmul against
            # the group-expansion matrix (lane-interleave without a
            # gather/relayout).
            kh_g = lax.broadcasted_iota(jnp.int32, (h_kv, h), 0)
            col_g = lax.broadcasted_iota(jnp.int32, (h_kv, h), 1)
            expand = (kh_g == col_g // groups).astype(jnp.float32)
            ks_rep = jnp.dot(ks_blk, expand,
                             preferred_element_type=jnp.float32)
            vs_rep = jnp.dot(vs_ref[...].reshape(t, h_kv), expand,
                             preferred_element_type=jnp.float32)

        s = s_i32.astype(jnp.float32) * (
            qs.T * ks_rep / (MAX_INT8 * MAX_INT8))  # (T, H)
        tok = i * t + lax.broadcasted_iota(jnp.int32, (t, h), 0)
        s = jnp.where(tok < length, s, MASK_VALUE)

        m_prev, l_prev = msc_ref[...], lsc_ref[...]  # (1, H)
        m_blk = jnp.max(s, axis=0, keepdims=True)
        m_new = jnp.maximum(m_prev, m_blk)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # masked entries underflow to exactly 0
        lsc_ref[...] = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
        msc_ref[...] = m_new

        # V side: fold the per-token v-scale into the probabilities,
        # requantize per (head, block) row, int8 MXU again.
        w = p * (vs_rep / MAX_INT8)  # (T, H)
        wt = w.T  # (H, T) f32 transpose
        wscale = jnp.maximum(
            jnp.max(jnp.abs(wt), axis=1, keepdims=True), 1e-30)  # (H, 1)
        w_i8 = jnp.rint(wt * (MAX_INT8 / wscale)).astype(jnp.int8)
        v_blk = vbuf[slot].reshape(t, kd)
        o_i32 = lax.dot_general(
            w_i8, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)  # (H, KD)
        contrib = o_i32.astype(jnp.float32) * (wscale / MAX_INT8)
        acc_ref[...] = acc_ref[...] * alpha.T + contrib

        @pl.when((i + 1) * t >= length)
        def _finalize():
            l_t = jnp.maximum(lsc_ref[...].T, 1e-30)  # (H, 1)
            acc = acc_ref[...] / l_t
            for head in range(h):  # static unroll: per-head column slice
                kh = head // groups
                o_ref[head: head + 1, :] = acc[
                    head: head + 1, kh * dh: (kh + 1) * dh
                ].astype(o_ref.dtype)
            m_ref[...] = msc_ref[...]
            l_ref[...] = lsc_ref[...]


def _pick_ppb(pps: int, page: int, target_tokens: int = None) -> int:
    """Largest divisor of pages_per_seq whose block stays <= target.

    512-token blocks measured best across the serving envelope (24x512:
    34 ms/32-layer step vs 140 at 128-token blocks — the sequential grid's
    per-step overhead dominates small blocks; benchmarks/
    paged_attention_bench.py has the sweep). VMEM stays ~9 MB at 7B dims
    (2 double-buffered int8 K+V blocks of 512 x 4096 + the f32 acc)."""
    if target_tokens is None:
        import os

        target_tokens = int(os.environ.get("GPA_TARGET_TOKENS", "512"))
    best = 1
    for ppb in range(1, pps + 1):
        if pps % ppb == 0 and ppb * page <= target_tokens:
            best = ppb
    return best


@functools.partial(jax.jit, static_argnames=("pages_per_block", "interpret"))
def gathered_paged_attention_int8(
    q: jax.Array,  # (B, H, Dh) PRE-SCALED queries
    k_pool: jax.Array,  # (L, P, page, H_kv*Dh) int8 token-major, OR (P,...)
    v_pool: jax.Array,
    page_table: jax.Array,  # (B, pps) int32 logical page ids
    lengths: jax.Array,  # (B,) int32 resident tokens
    k_scales: jax.Array,  # (P, page, H_kv) f32 — ONE layer
    v_scales: jax.Array,
    *,
    pages_per_block: int,
    layer=None,  # () int32 — which pool layer to read; required for 4-D pools
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (out (B,H,Dh), m (B,H), l (B,H)) — the softmax-stats
    contract of ops/paged_attention_stats. Zero-length slots return
    out=0, m=-inf, l=0.

    The pools are passed FULL (all layers) with the layer selected by a
    scalar-prefetch index: inside the per-layer decode scan this keeps
    them loop constants in HBM. A per-layer dynamic-slice operand would
    force XLA to materialize a pool-sized copy every layer (~134 MB at 7B
    serving shapes — measured as the decode-step regression that made the
    paged engine collapse under load). Single-layer (P, page, KD) pools
    still work for direct callers/tests (layer defaults to 0)."""
    b, h, dh = q.shape
    if k_pool.ndim == 3:  # single-layer convenience form
        k_pool = k_pool[None]
        v_pool = v_pool[None]
    _, p_total, page, kd = k_pool.shape
    if layer is None:
        layer = jnp.zeros((), jnp.int32)
    h_kv = k_scales.shape[2]
    assert kd == h_kv * dh, (kd, h_kv, dh)
    groups = h // h_kv
    pps = page_table.shape[1]
    ppb = pages_per_block
    assert pps % ppb == 0, (pps, ppb)
    n_blocks = pps // ppb
    t = ppb * page

    # Pre-gather the per-token scales with XLA (tiny: 4 bytes per token
    # per kv-head) — their 32-lane minor dim can't be manually DMA'd
    # under Mosaic's 128-lane slice alignment, and as regular blocked
    # inputs they ride the automatic pipeline.
    ks_g = k_scales[page_table]  # (B, pps, page, H_kv)
    vs_g = v_scales[page_table]
    ks_g = ks_g.reshape(b, n_blocks, ppb, page, h_kv)
    vs_g = vs_g.reshape(b, n_blocks, ppb, page, h_kv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec((None, h, dh), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((None, None, ppb, page, h_kv),
                         lambda b, i, *_: (b, i, 0, 0, 0)),
            pl.BlockSpec((None, None, ppb, page, h_kv),
                         lambda b, i, *_: (b, i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, h, dh), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, 1, h), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, 1, h), lambda b, i, *_: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ppb, page, kd), jnp.int8),
            pltpu.VMEM((2, ppb, page, kd), jnp.int8),
            pltpu.VMEM((h, kd), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, m, l = pl.pallas_call(
        functools.partial(
            _gathered_kernel,
            pages_per_seq=pps, ppb=ppb, groups=groups),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, h), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, h), jnp.float32),
        ],
    )(
        lengths,
        page_table.reshape(-1),
        jnp.zeros((1,), jnp.int32),  # buffer index
        jnp.ones((1,), jnp.int32),  # init flag
        jnp.asarray(layer, jnp.int32).reshape(1),
        q.astype(jnp.float32),
        k_pool, v_pool, ks_g, vs_g,
    )
    # Slots with length 0 never ran: zero their (uninitialized) outputs.
    live = lengths > 0
    out = jnp.where(live[:, None, None], out, 0.0).astype(q.dtype)
    m = jnp.where(live[:, None], m.reshape(b, h), -jnp.inf)
    l = jnp.where(live[:, None], l.reshape(b, h), 0.0)
    return out, m, l


def attend_token_major_int8_stats(
    q: jax.Array,  # (B, H, Dh) pre-scaled
    k_pool: jax.Array,  # (P, page, H_kv*Dh) int8 — one layer, token-major
    v_pool: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    k_scales: jax.Array,  # (P, page, H_kv)
    v_scales: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """XLA statement of the token-major contract for CPU/tests and
    non-128 head dims: transposes the layer pool to head-major and
    reuses attend_pool_int8_stats (one source of truth for the int8
    numerics; the extra relayout only exists off the kernel path)."""
    from videollamb_tpu.ops.paged_attention_stats import attend_pool_int8_stats

    b, h, dh = q.shape
    p_total, page, kd = k_pool.shape
    h_kv = k_scales.shape[2]
    kp = k_pool.reshape(p_total, page, h_kv, dh).transpose(2, 0, 1, 3)
    vp = v_pool.reshape(p_total, page, h_kv, dh).transpose(2, 0, 1, 3)
    ks = k_scales.transpose(2, 0, 1)[..., None]
    vs = v_scales.transpose(2, 0, 1)[..., None]
    return attend_pool_int8_stats(q, kp, vp, page_table, lengths, ks, vs)
