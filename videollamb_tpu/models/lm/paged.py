"""Paged KV cache: block-table cache pool + paged decode step.

Lifts the serving engine's static per-slot cache buckets (ROADMAP item 4):
instead of every slot owning a dense (L, S_max, H_kv, Dh) strip, all slots
share one page pool and hold a page table. HBM for context is allocated in
``page_size``-token pages on demand, so N slots no longer pay N x S_max and
a single long request can use most of the pool.

Beyond the reference (it serves one request at a time through HF
``generate``); the decode-attention core is JAX's stock TPU Pallas
paged-attention kernel (jax.experimental.pallas.ops.tpu.paged_attention),
which reads only the active pages of each sequence directly from HBM —
no gather materialization. On CPU (tests) an XLA gather fallback computes
identical logits.

Layout notes:
- one pool serves all layers, LAYER-MAJOR: pages are stored as
  ``(L, total_pages, H_kv, page_size, Dh)``-style ``(L, H_kv, P, page,
  Dh)`` so layer ``l``'s page range ``pool[l]`` is one CONTIGUOUS block.
  The decode attention (pool-int8 matmuls or the stock Pallas kernel)
  must materialize its per-layer operand either way; a contiguous
  leading-dim slice copies ~28%% faster than the old strided
  ``[:, l*P:(l+1)*P]`` layout (measured 2.34 vs 3.24 ms/step for the
  32-layer slice+dot loop at 7B batch 8 on v5e) and page ids stay purely
  logical — no ``p + l * total_pages`` physical-page arithmetic.
- logical page id 0 is reserved as a trash page: unused page-table entries
  point at it, so inserts/writes of padding land harmlessly.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import (
    KVCache,
    _final,
    _lproj,
    _rms_norm,
)
from videollamb_tpu.models.lm.rope import apply_rope, rope_cos_sin_cfg

Params = Dict[str, Any]

TRASH_PAGE = 0



class PagedKVCache(NamedTuple):
    # bf16 pools are HEAD-MAJOR (L, H_kv, total_pages, page_size, Dh) —
    # the stock Pallas kernel's layout. int8 pools are TOKEN-MAJOR
    # (L, total_pages, page_size, H_kv*Dh) with per-token scales
    # (L, total_pages, page_size, H_kv) — the gathered int8 kernel's
    # layout (ops/gathered_paged_attention.py). ``token_major`` /
    # ``page_axis`` discriminate by ndim.
    k_pages: jax.Array
    v_pages: jax.Array
    page_table: jax.Array  # (B_slots, pages_per_seq) int32 logical page ids
    lengths: jax.Array  # (B_slots,) int32 tokens written per slot
    k_scales: Optional[jax.Array] = None
    v_scales: Optional[jax.Array] = None

    @property
    def token_major(self) -> bool:
        return self.k_pages.ndim == 4

    @property
    def page_axis(self) -> int:
        """Axis of the total_pages dim in k_pages/v_pages (and scales)."""
        return 1 if self.token_major else 2

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2 if self.token_major else 3]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]


def total_pages_of(cache: PagedKVCache, cfg: LlamaConfig) -> int:
    return cache.k_pages.shape[cache.page_axis]


def init_paged_cache(
    cfg: LlamaConfig,
    num_slots: int,
    total_pages: int,
    page_size: int = 64,
    pages_per_seq: Optional[int] = None,
    dtype=jnp.bfloat16,
    quantize: bool = False,
) -> PagedKVCache:
    """``total_pages`` logical pages shared by all slots (page 0 = trash).

    ``quantize=True`` stores int8 pages + per-token absmax scales in the
    TOKEN-MAJOR layout ``(L, P, page, H_kv*Dh)`` with scales ``(L, P,
    page, H_kv)`` — a token's every head contiguous, which is what the
    gathered int8 decode kernel (ops/gathered_paged_attention.py) DMAs as
    a direct matmul operand. bf16 pools keep the head-major layout
    ``(L, H_kv, P, page, Dh)`` the stock Pallas kernel requires."""
    pps = pages_per_seq or total_pages
    if quantize:
        kd = cfg.num_key_value_heads * cfg.head_dim
        shape = (cfg.num_hidden_layers, total_pages, page_size, kd)
        return PagedKVCache(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            page_table=jnp.full((num_slots, pps), TRASH_PAGE, jnp.int32),
            lengths=jnp.zeros((num_slots,), jnp.int32),
            k_scales=jnp.zeros(shape[:-1] + (cfg.num_key_value_heads,),
                               jnp.float32),
            v_scales=jnp.zeros(shape[:-1] + (cfg.num_key_value_heads,),
                               jnp.float32),
        )
    shape = (cfg.num_hidden_layers, cfg.num_key_value_heads, total_pages,
             page_size, cfg.head_dim)
    return PagedKVCache(
        k_pages=jnp.zeros(shape, dtype),
        v_pages=jnp.zeros(shape, dtype),
        page_table=jnp.full((num_slots, pps), TRASH_PAGE, jnp.int32),
        lengths=jnp.zeros((num_slots,), jnp.int32),
    )


def _scatter_pages(
    cache: PagedKVCache,
    single: KVCache,
    page_ids: jax.Array,
    total_pages: int,
    skip_pages: int = 0,
) -> PagedKVCache:
    """Pool-only scatter: copy whole pages ``skip_pages..`` of a dense B=1
    cache into the pool at ``page_ids`` (table/lengths untouched).
    ``skip_pages`` skips logical pages whose content is already resident —
    the prefix-cache admission path, where the shared prefix pages were
    written once at registration."""
    l_layers, _, s_single, h_kv, dh = single.k.shape
    page = cache.page_size
    pps = page_ids.shape[0]
    n_copy = min(pps, s_single // page)  # whole pages in the dense buffer
    if n_copy <= skip_pages:
        return cache

    ids = page_ids[skip_pages:n_copy]  # logical == physical (layer-major)

    if cache.token_major:  # int8 token-major pool
        from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
            get_quantization_scales, to_int8,
        )

        def tm_rows(dense):
            # dense (L, s_single, H_kv, Dh) -> (L, n, page, H_kv, Dh)
            return dense[:, skip_pages * page: n_copy * page].reshape(
                l_layers, n_copy - skip_pages, page, h_kv, dh)

        k_src, v_src = tm_rows(single.k[:, 0]), tm_rows(single.v[:, 0])
        ks = get_quantization_scales(k_src.astype(jnp.float32))  # (...,1)
        vs = get_quantization_scales(v_src.astype(jnp.float32))
        k_i8 = to_int8(k_src.astype(jnp.float32), ks).reshape(
            l_layers, n_copy - skip_pages, page, h_kv * dh)
        v_i8 = to_int8(v_src.astype(jnp.float32), vs).reshape(
            l_layers, n_copy - skip_pages, page, h_kv * dh)
        return cache._replace(
            k_pages=cache.k_pages.at[:, ids].set(
                k_i8.astype(cache.k_pages.dtype), mode="drop"),
            v_pages=cache.v_pages.at[:, ids].set(
                v_i8.astype(cache.v_pages.dtype), mode="drop"),
            k_scales=cache.k_scales.at[:, ids].set(ks[..., 0], mode="drop"),
            v_scales=cache.v_scales.at[:, ids].set(vs[..., 0], mode="drop"),
        )

    def rows_of(dense):
        # dense: (L, s_single, H_kv, Dh) -> (L, H_kv, n_copy-skip, page, Dh)
        src = dense[:, skip_pages * page: n_copy * page].reshape(
            l_layers, n_copy - skip_pages, page, h_kv, dh)
        return src.transpose(0, 3, 1, 2, 4)

    def scatter(pool, src):
        return pool.at[:, :, ids].set(src.astype(pool.dtype), mode="drop")

    k_src, v_src = rows_of(single.k[:, 0]), rows_of(single.v[:, 0])
    return cache._replace(
        k_pages=scatter(cache.k_pages, k_src),
        v_pages=scatter(cache.v_pages, v_src),
    )


@partial(jax.jit, static_argnames=("total_pages",), donate_argnames=("cache",))
def scatter_prefix_pages(
    cache: PagedKVCache,
    single: KVCache,
    page_ids: jax.Array,  # (n_shared,) int32 — real page ids only
    total_pages: int,
) -> PagedKVCache:
    """Write a prefix's whole pages into the pool without touching any
    slot's table (prefix-cache registration)."""
    return _scatter_pages(cache, single, page_ids, total_pages)


@partial(jax.jit, static_argnames=("total_pages", "skip_pages"),
         donate_argnames=("cache",))
def paged_insert(
    cache: PagedKVCache,
    single: KVCache,  # dense B=1 cache from llama_prefill
    slot: jax.Array,  # () int32
    page_ids: jax.Array,  # (pages_per_seq,) int32; unused entries TRASH_PAGE
    total_pages: int,
    skip_pages: int = 0,
) -> PagedKVCache:
    """Copy a prefilled B=1 dense cache into the pool at ``page_ids`` and
    install the page table row for ``slot``.

    Every page-table entry is written (unused ones into the trash page), so
    the op compiles once regardless of the request length. ``skip_pages``
    logical pages are installed in the table but not re-copied (shared
    prefix pages already resident in the pool)."""
    cache = _scatter_pages(cache, single, page_ids, total_pages, skip_pages)
    return cache._replace(
        page_table=cache.page_table.at[slot].set(page_ids),
        lengths=cache.lengths.at[slot].set(single.length[0]),
    )


@partial(jax.jit, static_argnames=("cfg", "total_pages", "chunk"),
         donate_argnames=("cache", "all_logits"))
def fused_admit(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # (1, S_pad, D) right-padded splice buffer
    attention_mask: jax.Array,  # (1, S_pad)
    lengths: jax.Array,  # (1,) int32 actual prompt length
    cache: PagedKVCache,
    all_logits: jax.Array,  # (num_slots, V) engine logits (donated)
    slot: jax.Array,  # () int32
    page_ids: jax.Array,  # (pages_per_seq,) int32; unused = TRASH_PAGE
    total_pages: int,
    chunk: int = 256,
    adapter_idx: Optional[jax.Array] = None,
) -> Tuple[PagedKVCache, jax.Array]:
    """One-dispatch admission: chunked prefill + page insert + logits row.

    The split admission path (prepare splice -> init_kv_cache ->
    chunked_prefill -> paged_insert -> logits set) costs one host->device
    dispatch PER PHASE — ~26-46 ms each through the TPU tunnel regardless
    of compute, ~200-350 ms per admission, which at 4 req/s alone
    saturates the engine (benchmarks/admission_profile.py has the
    breakdown; the serving-load TTFT collapse follows). This fuses
    everything after the splice into ONE jitted graph: a
    ``lax.while_loop`` over ``chunk``-token windows keeps prefill compute
    proportional to the ACTUAL prompt length (the property chunked_prefill
    existed for) while the requant + pool scatter + page-table install +
    engine-logits row ride the same dispatch.

    Returns (pool cache, engine logits) — both donated in."""
    from videollamb_tpu.models.lm.llama import init_kv_cache, llama_extend

    b, s_pad, d = inputs_embeds.shape
    pad = (-s_pad) % chunk
    if pad:
        # Chunk windows must tile the buffer exactly: a clamped
        # dynamic_slice on the tail would re-read (and re-write at WRONG
        # positions) the previous window's tokens.
        inputs_embeds = jnp.pad(inputs_embeds, ((0, 0), (0, pad), (0, 0)))
        attention_mask = jnp.pad(attention_mask, ((0, 0), (0, pad)))
    s_cache = s_pad + pad
    single = init_kv_cache(cfg, b, s_cache, inputs_embeds.dtype)
    extend = llama_extend.__wrapped__  # trace inline (no inner dispatch)

    def run_chunk(i, single):
        e = jax.lax.dynamic_slice(inputs_embeds, (0, i * chunk, 0),
                                  (b, chunk, d))
        m = jax.lax.dynamic_slice(attention_mask, (0, i * chunk), (b, chunk))
        return extend(params, cfg, e, m, single, adapter_idx=adapter_idx)

    logits0, single = run_chunk(jnp.int32(0), single)  # prompts are >= 1 tok

    def cond(carry):
        i, _, _ = carry
        return i * chunk < jnp.max(lengths)

    def body(carry):
        i, single, logits = carry
        nxt, single = run_chunk(i, single)
        alive = (lengths > i * chunk)[:, None]
        return i + 1, single, jnp.where(alive, nxt, logits)

    _, single, logits = jax.lax.while_loop(cond, body,
                                           (jnp.int32(1), single, logits0))

    cache = _scatter_pages(cache, single, page_ids, total_pages)
    cache = cache._replace(
        page_table=cache.page_table.at[slot].set(page_ids),
        lengths=cache.lengths.at[slot].set(lengths[0]),
    )
    return cache, all_logits.at[slot].set(logits[0])


@jax.jit
def gather_slot_pages(cache: PagedKVCache, page_ids: jax.Array):
    """Gather pool pages for host offload (swap-out preemption).

    ``page_ids`` is a fixed power-of-two bucket padded with ``TRASH_PAGE``
    so recompiles are bounded by log2(pages_per_seq). Returns the raw page
    contents ``(k, v, k_scales, v_scales)`` — int8 pages stay int8 with
    their scales, so a swap-out/swap-in round trip through host memory is
    bit-exact. The page dim sits at ``cache.page_axis`` in each returned
    array (1 token-major, 2 head-major)."""
    if cache.token_major:
        return (cache.k_pages[:, page_ids], cache.v_pages[:, page_ids],
                cache.k_scales[:, page_ids], cache.v_scales[:, page_ids])
    k = cache.k_pages[:, :, page_ids]
    v = cache.v_pages[:, :, page_ids]
    ks = cache.k_scales[:, :, page_ids] if cache.k_scales is not None else None
    vs = cache.v_scales[:, :, page_ids] if cache.v_scales is not None else None
    return k, v, ks, vs


@partial(jax.jit, donate_argnames=("cache",))
def insert_raw_pages(
    cache: PagedKVCache,
    k_src: jax.Array,  # (L, H_kv, n_bucket, page, Dh) — raw page contents
    v_src: jax.Array,
    page_ids: jax.Array,  # (n_bucket,) int32; padding entries TRASH_PAGE
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
) -> PagedKVCache:
    """Exact inverse of :func:`gather_slot_pages` (swap-in preemption):
    write raw page contents back into the pool at fresh ``page_ids``.
    Padded entries write their garbage into the trash page. No
    requantization happens — int8 pages and their scales are restored
    verbatim."""
    if cache.token_major:
        return cache._replace(
            k_pages=cache.k_pages.at[:, page_ids].set(
                k_src.astype(cache.k_pages.dtype), mode="drop"),
            v_pages=cache.v_pages.at[:, page_ids].set(
                v_src.astype(cache.v_pages.dtype), mode="drop"),
            k_scales=cache.k_scales.at[:, page_ids].set(
                k_scales, mode="drop"),
            v_scales=cache.v_scales.at[:, page_ids].set(
                v_scales, mode="drop"),
        )
    cache = cache._replace(
        k_pages=cache.k_pages.at[:, :, page_ids].set(
            k_src.astype(cache.k_pages.dtype), mode="drop"),
        v_pages=cache.v_pages.at[:, :, page_ids].set(
            v_src.astype(cache.v_pages.dtype), mode="drop"),
    )
    if k_scales is not None:
        cache = cache._replace(
            k_scales=cache.k_scales.at[:, :, page_ids].set(
                k_scales, mode="drop"),
            v_scales=cache.v_scales.at[:, :, page_ids].set(
                v_scales, mode="drop"),
        )
    return cache


@partial(jax.jit, static_argnames=("cfg", "total_pages"), donate_argnames=("cache",))
def paged_decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jax.Array,  # (B_slots, 1, D)
    cache: PagedKVCache,
    total_pages: int,
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
) -> Tuple[jax.Array, PagedKVCache]:
    """One decode step over all slots against the paged pool —
    **attention-before-write** (VERDICT r2 #2).

    Per layer, attention runs over the ALREADY-RESIDENT pages only
    (lengths = pos, excluding this step's token) and the current token's
    self-attention is folded in exactly afterwards via the kernel's softmax
    stats (ops/paged_attention_stats.merge_one_token). Because nothing is
    written inside the layer loop, the pool is a loop CONSTANT: the Pallas
    custom call reads it in place (no per-layer slice copies — the carried
    pool previously forced a ~26 MB dynamic-slice per layer, and the
    per-slot DUS write chain serialized ~12 ms/step against the attention
    call). Fresh K/V for all layers are stacked by the scan and written
    once per step in a single batched scatter. Measured at 7B batch 8
    int8-KV on v5e: 29.4 -> ~17 ms/step (see docs/PERFORMANCE.md).

    Each row's token lands at (page_table[row, len//page], len%page); the
    caller must have a real page allocated there (the engine allocates
    ahead). Returns (logits (B, V), cache with lengths+1)."""
    from videollamb_tpu.ops.gathered_paged_attention import (
        _pick_ppb,
        attend_token_major_int8_stats,
    )
    from videollamb_tpu.parallel.kernel_partition import (
        gathered_paged_attention_int8_spmd as gathered_paged_attention_int8,
    )
    from videollamb_tpu.ops.paged_attention_stats import (
        attend_paged_with_stats_xla,
        merge_one_token,
        paged_attention_with_stats,
    )

    b = token_embeds.shape[0]
    page = cache.page_size
    pps = cache.pages_per_seq
    # Clamp: released slots keep advancing with the lock-step batch; their
    # trash-only table rows must never index past pps or claim more keys
    # than the table can address.
    pos = jnp.minimum(cache.lengths, pps * page - 1)  # (B,)
    rows = jnp.arange(b)
    write_logical = cache.page_table[rows, pos // page]  # (B,)
    write_off = pos % page
    cos, sin = rope_cos_sin_cfg(cfg, pos[:, None])
    h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    groups = h // h_kv
    scale = dh**-0.5
    kp, vp = cache.k_pages, cache.v_pages
    kp_s, vp_s = cache.k_scales, cache.v_scales
    quantized = kp_s is not None
    # Dispatch (regimes measured on v5e at 7B): int8 pools are
    # token-major and take the GATHERED int8 kernel
    # (ops/gathered_paged_attention.py) — each slot reads only its own
    # pages with all heads packed into one MXU matmul per block, so
    # compute and bandwidth track sum_b len_b (the r3 pool-int8 path
    # cost B x pool; the stock kernel cost a (1, B, H_kv) matvec grid —
    # docs/PERFORMANCE.md has the sweep). Off-TPU (tests) and non-128
    # head dims use the XLA statement of the same contract. Short bf16
    # contexts prefer the XLA gather; long bf16 contexts keep the stock
    # kernel (gather materializes the pool in float).
    from videollamb_tpu.ops.attention import use_tpu_kernels

    on_tpu = use_tpu_kernels()
    gathered_ppb = _pick_ppb(pps, page) if quantized else 1
    # int8 dispatch (VERDICT r4 #4, settled round 5): the gathered kernel
    # takes EVERY int8 shape. The r4 "small-pool crossover" (XLA twin
    # 31-ish vs kernel 34 ms/step at 8x512) compared the attend
    # statements in isolation — but on token-major pools the XLA twin
    # also pays a full per-layer pool transpose to reach the head-major
    # attend, which the isolated sweep never counted. End-to-end A/B at
    # 8x512 through bench_paged_batch (round 5, real chip, caches
    # cleared between variants): gathered 587.5 tok/s vs pool-int8+
    # transpose 425.0 — the kernel wins the supposed XLA sweet spot by
    # 38%, and its lead only grows with slots/context (24x512, 8x3072:
    # docs/PERFORMANCE.md).
    use_gathered_kernel = (quantized and on_tpu and dh % 128 == 0
                           and (gathered_ppb * page) % 32 == 0)
    use_kernel = (on_tpu and dh % 128 == 0 and not quantized
                  and pps >= 16)
    block = 8
    while pps % block:
        block //= 2

    def body(hidden, xs):
        l, lp = xs
        normed = _rms_norm(lp["input_layernorm"], hidden, cfg.rms_norm_eps)
        q = _lproj(lp, "q_proj", normed, adapter_idx).reshape(b, 1, h, dh)
        k = _lproj(lp, "k_proj", normed, adapter_idx).reshape(b, 1, h_kv, dh)
        v = _lproj(lp, "v_proj", normed, adapter_idx).reshape(b, 1, h_kv, dh)
        q = apply_rope(q, cos, sin)[:, 0] * scale  # (B, H, Dh) pre-scaled
        k_new = apply_rope(k, cos, sin)[:, 0]  # (B, H_kv, Dh)
        v_new = v[:, 0]

        # Layer l's page block: contiguous leading-dim slice (the pool is
        # layer-major; an XLA attention operand must be materialized either
        # way — a contiguous slice beats the old strided layout by ~28%).
        # The GATHERED kernel instead takes the FULL pool + a layer index
        # (scalar prefetch): the pool stays a scan constant in HBM and only
        # the addressed pages are DMA'd — slicing it per layer materialized
        # a ~134 MB copy per layer per step at 7B serving shapes. (The
        # stock kernel still gets the slice; handing IT the full pool made
        # XLA materialize every layer's page range, 242 ms/step measured.)
        def layer_pool(pool):
            return jax.lax.dynamic_index_in_dim(pool, l, 0, keepdims=False)

        if quantized and use_gathered_kernel:
            o_old, m_old, l_old = gathered_paged_attention_int8(
                q, kp, vp, cache.page_table, pos,
                layer_pool(kp_s), layer_pool(vp_s),
                pages_per_block=gathered_ppb, layer=l)
        elif quantized:
            o_old, m_old, l_old = attend_token_major_int8_stats(
                q, layer_pool(kp), layer_pool(vp), cache.page_table, pos,
                layer_pool(kp_s), layer_pool(vp_s))
        elif use_kernel:
            from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
                QuantizedTensor,
            )

            if quantized:
                k_in = QuantizedTensor(layer_pool(kp), layer_pool(kp_s))
                v_in = QuantizedTensor(layer_pool(vp), layer_pool(vp_s))
            else:
                k_in, v_in = layer_pool(kp), layer_pool(vp)
            o_old, m_old, l_old = paged_attention_with_stats(
                q, k_in, v_in, pos, cache.page_table,
                pages_per_compute_block=block)
        else:
            o_old, m_old, l_old = attend_paged_with_stats_xla(
                q, layer_pool(kp), layer_pool(vp), cache.page_table, pos,
                k_scales=None if kp_s is None else layer_pool(kp_s),
                v_scales=None if vp_s is None else layer_pool(vp_s))

        # Current token's self-attention, folded in exactly (GQA: q head j
        # reads kv head j // groups).
        qg = q.reshape(b, h_kv, groups, dh).astype(jnp.float32)
        s_self = jnp.einsum("bkgd,bkd->bkg", qg,
                            k_new.astype(jnp.float32)).reshape(b, h)
        v_b = jnp.broadcast_to(
            v_new[:, :, None], (b, h_kv, groups, dh)).reshape(b, h, dh)
        attn = merge_one_token(o_old, m_old, l_old, s_self, v_b)

        attn = _lproj(lp, "o_proj", attn.reshape(b, 1, cfg.hidden_size),
                      adapter_idx)
        hidden = hidden + attn
        normed = _rms_norm(lp["post_attention_layernorm"], hidden, cfg.rms_norm_eps)
        gate = jax.nn.silu(
            _lproj(lp, "gate_proj", normed, adapter_idx).astype(jnp.float32)
        ).astype(hidden.dtype)
        up = _lproj(lp, "up_proj", normed, adapter_idx)
        hidden = hidden + _lproj(lp, "down_proj", gate * up, adapter_idx)

        # Stack this layer's fresh K/V for the single post-loop scatter.
        if quantized:  # token-major: (B, H_kv*Dh) rows + (B, H_kv) scales
            from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
                get_quantization_scales, to_int8,
            )

            ks = get_quantization_scales(k_new.astype(jnp.float32))
            vs = get_quantization_scales(v_new.astype(jnp.float32))
            k_vals = to_int8(k_new.astype(jnp.float32), ks).astype(
                kp.dtype).reshape(b, h_kv * dh)
            v_vals = to_int8(v_new.astype(jnp.float32), vs).astype(
                vp.dtype).reshape(b, h_kv * dh)
            return hidden, (k_vals, v_vals, ks[..., 0], vs[..., 0])
        k_vals = k_new.transpose(1, 0, 2)  # (H_kv, B, Dh)
        v_vals = v_new.transpose(1, 0, 2)
        return hidden, (k_vals.astype(kp.dtype), v_vals.astype(vp.dtype))

    n_layers = cfg.num_hidden_layers
    x, fresh = jax.lax.scan(
        body, token_embeds,
        (jnp.arange(n_layers, dtype=jnp.int32), params["layers"]),
    )
    logits = _final(params, cfg, x)[:, 0]

    # Install all layers' fresh K/V (and scales) at
    # [l, :, write_logical[i], write_off[i]] as an UNROLLED
    # dynamic_update_slice chain, not an advanced-index scatter: the
    # scatter lowering costs 4.6 ms/pool on v5e at this shape while the
    # DUS chain is 1.56 ms (both still pay one pool copy — XLA does not
    # alias the donated pool through either form; measured round 3).
    def scatter(pool, vals):
        # vals: (L, H_kv, B, last)
        for i in range(b):
            for layer in range(n_layers):
                upd = vals[layer, :, i][None, :, None, None, :]
                pool = jax.lax.dynamic_update_slice(
                    pool, upd.astype(pool.dtype),
                    (layer, 0, write_logical[i], write_off[i], 0))
        return pool

    def scatter_tm(pool, vals):
        # vals: (L, B, last) -> token-major pool (L, P, page, last)
        for i in range(b):
            for layer in range(n_layers):
                upd = vals[layer, i][None, None, None, :]
                pool = jax.lax.dynamic_update_slice(
                    pool, upd.astype(pool.dtype),
                    (layer, write_logical[i], write_off[i], 0))
        return pool

    if quantized:
        k_vals, v_vals, ks, vs = fresh
        # Scale rows (32-lane minor) stay on the XLA chain — their pools
        # are 128x smaller, the copy is noise.
        kp_s = scatter_tm(kp_s, ks)
        vp_s = scatter_tm(vp_s, vs)
        if use_gathered_kernel or (on_tpu and dh % 128 == 0
                                   and (gathered_ppb * page) % 32 == 0):
            # One-dispatch install (ops/paged_fresh_write.py): the DUS
            # chain is 2·B·L tiny ops whose dispatch cost dominates —
            # 0.45 ms/step vs 0.22 ms for the kernel at serving-load
            # shapes (benchmarks/paged_step_bisect.py). The install is
            # layout-only (token-major pools), so the small-pool XLA
            # attention path uses it too.
            from videollamb_tpu.ops.paged_fresh_write import paged_fresh_write

            kp, vp = paged_fresh_write(
                kp, vp, k_vals.astype(kp.dtype), v_vals.astype(vp.dtype),
                write_logical, write_off)
        else:
            kp = scatter_tm(kp, k_vals)
            vp = scatter_tm(vp, v_vals)
    else:
        k_vals, v_vals = fresh
        kp = scatter(kp, k_vals)
        vp = scatter(vp, v_vals)
    return logits, PagedKVCache(
        k_pages=kp, v_pages=vp,
        page_table=cache.page_table, lengths=cache.lengths + 1,
        k_scales=kp_s, v_scales=vp_s,
    )


class PageAllocator:
    """Host-side refcounted free-list over logical pages (page 0 = trash).

    Refcounts enable prefix caching: shared prefix pages are ``retain``-ed
    once per slot that maps them, and return to the free list only when the
    last reference (slots + the registration itself) drops."""

    def __init__(self, total_pages: int):
        self.total_pages = total_pages
        self._free: List[int] = list(range(total_pages - 1, 0, -1))
        self._rc: Dict[int, int] = {}

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> Optional[List[int]]:
        if n > len(self._free):
            return None
        pages = [self._free.pop() for _ in range(n)]
        for p in pages:
            self._rc[p] = 1
        return pages

    def retain(self, pages: List[int]) -> None:
        for p in pages:
            if p != TRASH_PAGE:
                self._rc[p] += 1

    def free(self, pages: List[int]) -> None:
        for p in pages:
            if p == TRASH_PAGE:
                continue
            self._rc[p] -= 1
            if self._rc[p] == 0:
                del self._rc[p]
                self._free.append(p)

    def pages_needed(self, tokens: int, page_size: int) -> int:
        return max(1, math.ceil(tokens / page_size))
