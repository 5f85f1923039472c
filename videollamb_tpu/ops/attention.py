"""Unified multi-head attention dispatch.

One entry point for every attention in the framework (vision tower, Llama
prefill/training, bridge):

- ``pallas``  — the flash kernel (ops/flash_attention.py). TPU, forward-only.
- ``chunked`` — online-softmax lax.scan over KV blocks: same O(S*bkv)
  memory as flash, pure JAX so autodiff works. Used for training
  (replaces the reference's flash-attn backward).
- ``xla``     — naive dense attention (small sequences / CPU tests).
- ``auto``    — pallas on TPU inference, chunked when differentiating is
  needed (caller passes impl explicitly in training code), xla on CPU.

All implementations compute identical math: f32 logits, optional causal and
key-validity masks, grouped-query heads.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _backend() -> str:
    return jax.default_backend()


def use_tpu_kernels() -> bool:
    """One switch for every Pallas-attention dispatch. False on
    non-TPU backends, and force-off via VIDEOLLAMB_FORCE_XLA_ATTN=1 —
    needed by tools/aot_memory.py: topology-only AOT compiles cannot
    emit custom_partitioning ops (no runtime to host the callbacks), so
    the memory certificate uses the XLA statements, a strict upper
    bound on the kernels' live memory."""
    import os

    if os.environ.get("VIDEOLLAMB_FORCE_XLA_ATTN") == "1":
        return False
    return jax.default_backend() == "tpu"


def multihead_attention(
    q: jax.Array,  # (B, Sq, H, Dh)
    k: jax.Array,  # (B, Skv, Hkv, Dh)
    v: jax.Array,  # (B, Skv, Hkv, Dh)
    *,
    causal: bool = False,
    k_mask: Optional[jax.Array] = None,  # (B, Skv) bool
    scale: Optional[float] = None,
    window: Optional[int] = None,  # sliding-window size (causal only)
    impl: str = "auto",
    segment_ids: Optional[jax.Array] = None,  # (B, S) int; Sq == Skv
) -> jax.Array:
    """Returns (B, Sq, H, Dh) in q's dtype.

    ``segment_ids`` enables packed-sequence attention: token i may attend
    to token j only when segment_ids[b, i] == segment_ids[b, j] (composed
    with causal/k_mask). Requires Sq == Skv (training / no-cache forward —
    the packed-training path; the reference pads instead of packing, so
    this is a TPU-side extension with no reference counterpart)."""
    b, sq, h, dh = q.shape
    hkv = k.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(dh)

    if impl == "auto":
        impl = "pallas" if use_tpu_kernels() else "xla"
    if segment_ids is not None and impl == "pallas":
        # The flash kernel has no segment lane; the chunked online-softmax
        # path computes identical math with block-diagonal masking.
        impl = "chunked"

    if impl == "pallas" and window is None:
        # Kernel layout is (B, H, S, Dh); GQA by repeating kv heads (the
        # repeat is free relative to the attention itself on TPU).
        if hkv != h:
            k = jnp.repeat(k, h // hkv, axis=2)
            v = jnp.repeat(v, h // hkv, axis=2)
        # Via the custom_partitioning wrapper: GSPMD configs shard batch
        # and heads instead of erroring on the Mosaic call
        # (parallel/kernel_partition.py).
        from videollamb_tpu.parallel.kernel_partition import flash_attention_spmd

        out = flash_attention_spmd(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), k_mask, causal=causal, scale=scale,
        )
        return out.transpose(0, 2, 1, 3)

    if impl == "chunked":
        return _chunked_attention(q, k, v, causal=causal, k_mask=k_mask,
                                  scale=scale, window=window,
                                  segment_ids=segment_ids)

    return _xla_attention(q, k, v, causal=causal, k_mask=k_mask, scale=scale,
                          window=window, segment_ids=segment_ids)


def _grouped_scores(q, k, scale):
    """(B,Sq,Hkv,G,Dh) x (B,Skv,Hkv,Dh) -> (B,Hkv,G,Sq,Skv) f32."""
    return jnp.einsum(
        "bqhgd,bkhd->bhgqk", q, k, preferred_element_type=jnp.float32
    ) * scale


def _xla_attention(q, k, v, *, causal, k_mask, scale, window=None,
                   segment_ids=None):
    b, sq, h, dh = q.shape
    hkv = k.shape[2]
    g = h // hkv
    skv = k.shape[1]
    qg = q.reshape(b, sq, hkv, g, dh)
    s = _grouped_scores(qg, k, scale)  # (B,Hkv,G,Sq,Skv)

    mask = jnp.ones((b, sq, skv), bool)
    if causal:
        q_pos = jnp.arange(sq)[:, None] + (skv - sq)
        mask &= (q_pos >= jnp.arange(skv)[None, :])[None]
        if window is not None:
            mask &= (q_pos - jnp.arange(skv)[None, :] < window)[None]
    if k_mask is not None:
        mask &= k_mask[:, None, :]
    if segment_ids is not None:
        mask &= segment_ids[:, :, None] == segment_ids[:, None, :]
    s = jnp.where(mask[:, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return out.reshape(b, sq, h, dh)


def _chunked_attention(q, k, v, *, causal, k_mask, scale, window=None,
                       block_kv: int = 512, segment_ids=None):
    """Online-softmax over KV chunks via lax.scan — flash-attention math in
    pure JAX (differentiable; activation memory O(Sq * block_kv))."""
    b, sq, h, dh = q.shape
    hkv = k.shape[2]
    g = h // hkv
    skv = k.shape[1]
    bkv = min(block_kv, skv)
    n_chunks = -(-skv // bkv)
    pad = n_chunks * bkv - skv
    if pad:
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    km = jnp.ones((b, skv), bool) if k_mask is None else k_mask.astype(bool)
    km = jnp.pad(km, ((0, 0), (0, pad)))
    seg_k_c = None
    if segment_ids is not None:
        # Pad with -1 so padding never matches a real segment id.
        seg = jnp.pad(segment_ids.astype(jnp.int32), ((0, 0), (0, pad)),
                      constant_values=-1)
        seg_k_c = seg.reshape(b, n_chunks, bkv).transpose(1, 0, 2)

    qg = q.reshape(b, sq, hkv, g, dh)
    q_pos = jnp.arange(sq) + (skv - sq)

    k_c = k.reshape(b, n_chunks, bkv, hkv, dh).transpose(1, 0, 2, 3, 4)
    v_c = v.reshape(b, n_chunks, bkv, hkv, dh).transpose(1, 0, 2, 3, 4)
    m_c = km.reshape(b, n_chunks, bkv).transpose(1, 0, 2)
    idx_c = jnp.arange(n_chunks)

    def step(carry, xs):
        m_prev, l_prev, acc = carry
        if segment_ids is not None:
            kc, vc, mc, ci, segc = xs
        else:
            kc, vc, mc, ci = xs
        s = _grouped_scores(qg, kc, scale)  # (B,Hkv,G,Sq,bkv)
        k_pos = ci * bkv + jnp.arange(bkv)
        valid = mc[:, None, :] & jnp.ones((b, sq, bkv), bool)
        if causal:
            valid &= (q_pos[:, None] >= k_pos[None, :])[None]
            if window is not None:
                valid &= (q_pos[:, None] - k_pos[None, :] < window)[None]
        if segment_ids is not None:
            valid &= segment_ids[:, :, None] == segc[:, None, :]
        s = jnp.where(valid[:, None, None], s, NEG_INF)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum(
            "bhgqk,bkhd->bhgqd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32,
        )
        acc = acc * corr + pv
        return (m_new, l_new, acc), None

    m0 = jnp.full((b, hkv, g, sq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, sq, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, sq, dh), jnp.float32)
    # Remat the chunk body: without it, scan's backward saves every
    # chunk's f32 scores/probabilities — O(Sq*Skv) residuals (measured:
    # 2x512 MB f32 + 256 MB bf16 buffers at S=2048, the difference
    # between a 7B train step fitting one 16 GB chip or not). With it,
    # the backward recomputes each chunk's scores from q/k (flash-attn
    # backward), keeping activation memory O(Sq*bkv) as advertised.
    # prevent_cse=False is safe (and recommended) under lax.scan.
    step = jax.checkpoint(step, prevent_cse=False)
    xs = (k_c, v_c, m_c, idx_c)
    if segment_ids is not None:
        xs = xs + (seg_k_c,)
    (m_f, l_f, acc), _ = jax.lax.scan(step, (m0, l0, acc0), xs)

    out = acc / jnp.where(l_f == 0.0, 1.0, l_f)
    out = out.astype(q.dtype).transpose(0, 3, 1, 2, 4)  # (B,Sq,Hkv,G,Dh)
    return out.reshape(b, sq, h, dh)
