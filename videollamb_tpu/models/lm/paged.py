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
- one pool serves all layers: pages are stored as
  ``(H_kv, L * total_pages, page_size, Dh)`` and layer ``l`` of logical
  page ``p`` lives at physical page ``p + l * total_pages``. This keeps the
  layer loop a ``lax.scan`` whose carry is the pool (donated, updated by
  one scatter per step) — indexing a per-layer pool inside the scan would
  dynamic-slice-copy the whole layer pool each step.
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
    _grouped_attention,
    _lproj,
    _rms_norm,
)
from videollamb_tpu.models.lm.rope import apply_rope, rope_cos_sin

Params = Dict[str, Any]

TRASH_PAGE = 0


class PagedKVCache(NamedTuple):
    k_pages: jax.Array  # (H_kv, L * total_pages, page_size, Dh); int8 if quantized
    v_pages: jax.Array  # (H_kv, L * total_pages, page_size, Dh)
    page_table: jax.Array  # (B_slots, pages_per_seq) int32 logical page ids
    lengths: jax.Array  # (B_slots,) int32 tokens written per slot
    # int8 KV quantization (halves pool HBM + decode KV bandwidth): per-token
    # per-head absmax scales, trailing dim 1 (stock QuantizedTensor layout).
    k_scales: Optional[jax.Array] = None  # (H_kv, L * total_pages, page_size, 1)
    v_scales: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[2]

    @property
    def pages_per_seq(self) -> int:
        return self.page_table.shape[1]


def total_pages_of(cache: PagedKVCache, cfg: LlamaConfig) -> int:
    return cache.k_pages.shape[1] // cfg.num_hidden_layers


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

    ``quantize=True`` stores int8 pages + per-token absmax scales."""
    pps = pages_per_seq or total_pages
    shape = (cfg.num_key_value_heads, cfg.num_hidden_layers * total_pages,
             page_size, cfg.head_dim)
    if quantize:
        return PagedKVCache(
            k_pages=jnp.zeros(shape, jnp.int8),
            v_pages=jnp.zeros(shape, jnp.int8),
            page_table=jnp.full((num_slots, pps), TRASH_PAGE, jnp.int32),
            lengths=jnp.zeros((num_slots,), jnp.int32),
            k_scales=jnp.zeros(shape[:-1] + (1,), jnp.float32),
            v_scales=jnp.zeros(shape[:-1] + (1,), jnp.float32),
        )
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

    phys = (page_ids[None, skip_pages:n_copy]
            + jnp.arange(l_layers, dtype=jnp.int32)[:, None] * total_pages)

    def rows_of(dense):
        # dense: (L, s_single, H_kv, Dh) -> (H_kv, L, n_copy-skip, page, Dh)
        src = dense[:, skip_pages * page: n_copy * page].reshape(
            l_layers, n_copy - skip_pages, page, h_kv, dh)
        return src.transpose(3, 0, 1, 2, 4)

    def scatter(pool, src):
        # Physical page of (layer l, logical page j): page_ids[j] + l * P.
        return pool.at[:, phys].set(src.astype(pool.dtype), mode="drop")

    k_src, v_src = rows_of(single.k[:, 0]), rows_of(single.v[:, 0])
    k_scales, v_scales = cache.k_scales, cache.v_scales
    if cache.k_scales is not None:
        from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
            get_quantization_scales, to_int8,
        )

        ks = get_quantization_scales(k_src.astype(jnp.float32))
        vs = get_quantization_scales(v_src.astype(jnp.float32))
        k_scales = cache.k_scales.at[:, phys].set(ks, mode="drop")
        v_scales = cache.v_scales.at[:, phys].set(vs, mode="drop")
        k_src = to_int8(k_src.astype(jnp.float32), ks)
        v_src = to_int8(v_src.astype(jnp.float32), vs)
    return cache._replace(
        k_pages=scatter(cache.k_pages, k_src),
        v_pages=scatter(cache.v_pages, v_src),
        k_scales=k_scales,
        v_scales=v_scales,
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


def _attend_paged(
    q: jax.Array,  # (B, H, Dh) — current-token queries
    k_pages: jax.Array,  # (H_kv, L*P, page, Dh); int8 when scales given
    v_pages: jax.Array,
    page_indices: jax.Array,  # (B, pps) physical page ids for this layer
    lengths: jax.Array,  # (B,) keys to attend per row (>= 1)
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
) -> jax.Array:
    """Stock Pallas paged attention on TPU, XLA gather fallback elsewhere.
    With scales, pages are int8 and dequantized in-kernel (QuantizedTensor).

    The stock kernel needs lane-aligned tiles (head_dim a multiple of 128);
    unaligned (test-sized) configs fall back to the gather path even on TPU
    — Mosaic rejects their block shapes at lowering time.

    Short UNQUANTIZED contexts take the gather path: at 7B batch 8 with
    6-8 bf16 pages per sequence the kernel's small compute blocks measure
    ~8 ms/step slower than gather-then-dense (31 vs 39.5 ms). With int8
    pages the kernel's in-kernel dequant wins at any length (35 vs 43 ms —
    the gather path pays a materialized from_int8 pass), and for long
    contexts (16+ pages) the kernel's read-only-active-pages advantage
    dominates either way. All three regimes measured on v5e at 7B."""
    use_kernel = (k_scales is not None) or page_indices.shape[1] >= 16
    if (jax.default_backend() == "tpu" and k_pages.shape[-1] % 128 == 0
            and use_kernel):
        from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention
        from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
            QuantizedTensor,
        )

        pps = page_indices.shape[1]
        block = 8
        while pps % block:
            block //= 2
        # The stock kernel computes raw q.k — pre-scale q (the dense path's
        # _grouped_attention scales inside).
        scale = k_pages.shape[-1] ** -0.5
        k_in = (QuantizedTensor(k_pages, k_scales) if k_scales is not None
                else k_pages)
        v_in = (QuantizedTensor(v_pages, v_scales) if v_scales is not None
                else v_pages)
        return paged_attention(
            q * scale, k_in, v_in, lengths, page_indices,
            pages_per_compute_block=block,
        )
    # Fallback: gather pages -> dense (B, S_virt, H_kv, Dh) + masked attention.
    from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
        from_int8,
    )

    b = q.shape[0]
    page = k_pages.shape[2]
    s_virt = page_indices.shape[1] * page
    k = k_pages[:, page_indices]  # (H_kv, B, pps, page, Dh)
    v = v_pages[:, page_indices]
    if k_scales is not None:
        k = from_int8(k, k_scales[:, page_indices], q.dtype)
        v = from_int8(v, v_scales[:, page_indices], q.dtype)
    k = k.transpose(1, 2, 3, 0, 4).reshape(b, s_virt, k_pages.shape[0], -1)
    v = v.transpose(1, 2, 3, 0, 4).reshape(b, s_virt, v_pages.shape[0], -1)
    mask = (jnp.arange(s_virt, dtype=jnp.int32)[None] < lengths[:, None])[:, None]
    out = _grouped_attention(q[:, None].astype(k.dtype), k, v, mask)
    return out[:, 0].astype(q.dtype)


@partial(jax.jit, static_argnames=("cfg", "total_pages"), donate_argnames=("cache",))
def paged_decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jax.Array,  # (B_slots, 1, D)
    cache: PagedKVCache,
    total_pages: int,
) -> Tuple[jax.Array, PagedKVCache]:
    """One decode step over all slots against the paged pool.

    Each row's token is written at (page_table[row, len//page], len%page);
    the caller must have a real page allocated there (the engine allocates
    ahead). Returns (logits (B, V), cache with lengths+1)."""
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
    cos, sin = rope_cos_sin(pos[:, None], cfg.head_dim, cfg.rope_theta)
    h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    def body(l, carry):
        hidden, kp, vp, kp_s, vp_s = carry
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        normed = _rms_norm(lp["input_layernorm"], hidden, cfg.rms_norm_eps)
        q = _lproj(lp, "q_proj", normed).reshape(b, 1, h, dh)
        k = _lproj(lp, "k_proj", normed).reshape(b, 1, h_kv, dh)
        v = _lproj(lp, "v_proj", normed).reshape(b, 1, h_kv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        phys_write = write_logical + l * total_pages  # (B,)
        k_vals = k[:, 0].transpose(1, 0, 2)  # (H_kv, B, Dh)
        v_vals = v[:, 0].transpose(1, 0, 2)
        ks = vs = None
        if kp_s is not None:
            from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
                get_quantization_scales, to_int8,
            )

            ks = get_quantization_scales(k_vals.astype(jnp.float32))
            vs = get_quantization_scales(v_vals.astype(jnp.float32))
            k_vals = to_int8(k_vals.astype(jnp.float32), ks)
            v_vals = to_int8(v_vals.astype(jnp.float32), vs)
        k_vals = k_vals.astype(kp.dtype)
        v_vals = v_vals.astype(vp.dtype)
        # Per-row dynamic_update_slice, unrolled over the (static) slot
        # count — NOT an advanced-index scatter: the scatter schedules
        # ~6 ms/step worse against the attention custom call at 7B batch 8
        # (30.3 vs 36.1 ms measured; the DUS chain fuses and aliases
        # cleanly with the donated pool).
        for i in range(b):
            at = (jnp.int32(0), phys_write[i], write_off[i], jnp.int32(0))
            kp = jax.lax.dynamic_update_slice(kp, k_vals[:, i][:, None, None, :], at)
            vp = jax.lax.dynamic_update_slice(vp, v_vals[:, i][:, None, None, :], at)
            if kp_s is not None:
                kp_s = jax.lax.dynamic_update_slice(
                    kp_s, ks[:, i][:, None, None, :], at)
                vp_s = jax.lax.dynamic_update_slice(
                    vp_s, vs[:, i][:, None, None, :], at)

        # Attend over a per-layer SLICE of the pool, not the whole carried
        # pool: the Pallas paged-attention custom call cannot alias a
        # fori_loop carry, so passing the full pool forces XLA to copy all
        # L x total_pages pages EVERY layer (measured 195 ms/step at 7B
        # batch 8 — 12x the dense cache). Slicing layer l's page range
        # first makes the custom-call operand a fresh ~2 x 26 MB buffer
        # (~4 ms/step total) while the scatter writes above keep updating
        # the donated pool in place. Same trick as the dense decode path's
        # ck_all[l].
        def layer_pool(pool):
            return jax.lax.dynamic_slice_in_dim(
                pool, l * total_pages, total_pages, axis=1)

        attn = _attend_paged(
            q[:, 0], layer_pool(kp), layer_pool(vp), cache.page_table,
            jnp.maximum(pos + 1, 1),
            k_scales=None if kp_s is None else layer_pool(kp_s),
            v_scales=None if vp_s is None else layer_pool(vp_s),
        )
        attn = _lproj(lp, "o_proj", attn.reshape(b, 1, cfg.hidden_size))
        hidden = hidden + attn
        normed = _rms_norm(lp["post_attention_layernorm"], hidden, cfg.rms_norm_eps)
        gate = jax.nn.silu(
            _lproj(lp, "gate_proj", normed).astype(jnp.float32)
        ).astype(hidden.dtype)
        up = _lproj(lp, "up_proj", normed)
        hidden = hidden + _lproj(lp, "down_proj", gate * up)
        return hidden, kp, vp, kp_s, vp_s

    # fori_loop, NOT lax.scan: scan ping-pongs its carries, copying the
    # multi-GB pool once per layer (measured 305 ms/step at 7B); the
    # while-loop lowering aliases the donated pool so the per-layer write
    # is just the (H_kv, B, Dh) scatter (16-17 ms/step, on par with the
    # dense cache). Same reasoning as llama_decode_step.
    x, kp, vp, kp_s, vp_s = jax.lax.fori_loop(
        0, cfg.num_hidden_layers, body,
        (token_embeds, cache.k_pages, cache.v_pages,
         cache.k_scales, cache.v_scales),
    )
    logits = _final(params, cfg, x)[:, 0]
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
