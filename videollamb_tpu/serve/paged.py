"""Continuous-batching serving engine over a paged KV cache.

Same slot/admission/step protocol as :class:`ServingEngine` (serve/server.py)
but context HBM is allocated in pages from one shared pool
(models/lm/paged.py) instead of a dense per-slot (L, S_max, H, Dh) strip:

- admission allocates ceil(prompt_len / page) pages and installs the slot's
  page table row; if the pool is short the request waits in the queue
  (backpressure instead of a static bucket limit);
- before every decode step the engine allocates pages to cover the next k
  tokens of each active slot (host-side free list; one small device update
  per new page);
- finished slots return their pages immediately.

Decode attention dispatches per regime (models/lm/paged.py): shared-pool
int8 MXU attention for the serving sweet spot, the stock TPU Pallas
paged-attention kernel for big-pool/long-context, an XLA gather for short
bf16 contexts — logits agree across paths within the int8 bounds.

Prefix caching (register_prefix / Request.prefix_id): the long shared
prompt prefix (system + video tokens) is prefilled ONCE; its whole pages
are mapped read-only into every consumer slot's page table (refcounted),
and each admission prefills only the request suffix via llama_extend over
a copy of the prefix's dense cache — vLLM-style shared prompt pages,
natural on the paged pool. Decode never writes a shared page: writes land
at positions >= prefix_len, which live in slot-private pages.

AUTOMATIC prefix caching (Request.prefix_batch): callers that cannot (or
do not want to) manage prefix ids submit the prefix content itself; the
engine content-hashes it (batch_signature), reuses an already-registered
prefix on a hit and registers on a miss. Cached prefixes are refcounted
by live consumer slots and LRU-evicted when the cache exceeds
``prefix_cache_size`` or when the page pool runs dry — eviction of an
idle cached prefix is always preferred over swap-preempting an active
request. This is the vLLM "automatic prefix caching" serving feature,
here at batch granularity: the natural video-QA unit (one system + video
prompt, many questions) is exactly one batch.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.assembly import Params, prepare_multimodal_embeds_fast
from videollamb_tpu.models.lm.llama import (
    KVCache,
    chunked_prefill,
    embed_tokens,
    init_kv_cache,
    llama_extend,
)
from videollamb_tpu.models.lm.paged import (
    TRASH_PAGE,
    PageAllocator,
    PagedKVCache,
    fused_admit,
    gather_slot_pages,
    init_paged_cache,
    insert_raw_pages,
    paged_decode_step,
    paged_insert,
    scatter_prefix_pages,
)
from videollamb_tpu.serve.server import (
    Request,
    ServingEngine,
    _shared_consume,
    grammar_mask_logits,
    grammar_transition,
    logprobs_of,
    sample_rows,
)


def batch_signature(batch) -> bytes:
    """Content hash of a MultimodalBatch — the automatic prefix cache key.

    Splicing is deterministic, so equal signatures (token ids, masks, and
    every media tensor byte-for-byte) imply identical prefill KV; hashing
    a 16-frame video tensor is ~ms against a ~100 ms prefill."""
    h = hashlib.sha256()

    def arr(a):
        if a is None:
            h.update(b"\x00")
            return
        a = np.asarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())

    arr(batch.input_ids)
    arr(batch.attention_mask)
    arr(batch.videos)
    arr(batch.images)
    arr(batch.image_specs)
    if batch.blocks is None:
        h.update(b"\x00")
    else:
        for modality, pixels in batch.blocks:
            h.update(modality.encode())
            arr(pixels)
    return h.digest()


@partial(jax.jit, static_argnames=("cfg", "k", "total_pages", "top_k"),
         donate_argnames=("cache",))
def paged_greedy_decode_steps(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, adapter_idx=None, top_k: int = 0,
):
    """k greedy steps fully on device (pages for positions len..len+k-1 must
    already be allocated). Returns (tokens (B, k), logits, cache); with
    ``top_k`` > 0 also per-step logprob data, as in
    serve/server.greedy_decode_steps."""

    def body(carry, _):
        logits, cache = carry
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        # The embedding table keeps the model's COMPUTE dtype (it is never
        # int8-quantized — gathers need the full-precision table), so its
        # output needs no cast. Never cast to the page dtype: with
        # quantize_kv the pages are int8 and an astype there rounds the
        # embeddings to near-zero integers; and logits are always f32
        # (_final), so casting to logits.dtype would silently run the k>1
        # greedy path in f32 while the k=1 path runs bf16.
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx,
        )
        return (logits, cache), out

    (logits, cache), out = jax.lax.scan(body, (logits, cache), None, length=k)
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache
    return out.T, logits, cache


@partial(jax.jit,
         static_argnames=("cfg", "k", "total_pages", "top_k", "filter_topkp"),
         donate_argnames=("cache",))
def paged_sampled_decode_steps(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, rng: jax.Array, temps: jax.Array, top_ks: jax.Array,
    top_ps: jax.Array, adapter_idx=None, top_k: int = 0,
    filter_topkp: bool = True,
):
    """Paged twin of serve/server.sampled_decode_steps: k sampled steps
    fully on device over the page pool, rng carried through the scan and
    returned so the engines' host-path rng mirror stays in sync."""

    def body(carry, _):
        logits, cache, rng = carry
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(logits, sub, temps, top_ks, top_ps,
                          filter_topkp=filter_topkp)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        # Embeddings keep the compute dtype — see paged_greedy_decode_steps.
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx,
        )
        return (logits, cache, rng), out

    (logits, cache, rng), out = jax.lax.scan(
        body, (logits, cache, rng), None, length=k)
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache, rng
    return out.T, logits, cache, rng


@partial(jax.jit,
         static_argnames=("cfg", "k", "total_pages", "top_k", "filter_topkp",
                          "eos"),
         donate_argnames=("cache",))
def paged_sampled_decode_steps_controls(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, rng: jax.Array, temps: jax.Array, top_ks: jax.Array,
    top_ps: jax.Array, bias: jax.Array, pres: jax.Array, freq: jax.Array,
    counts0: jax.Array, min_left: jax.Array, eos: int, adapter_idx=None,
    top_k: int = 0, filter_topkp: bool = True,
):
    """Paged twin of serve/server.sampled_decode_steps_controls: sampling
    controls enforced on device over the page pool (counts carried in the
    scan; same adjustment math and op order as the host path)."""
    rowix = jnp.arange(logits.shape[0])

    def body(carry, step):
        logits, cache, rng, counts = carry
        adj = bias - freq[:, None] * counts - pres[:, None] * (counts > 0)
        if eos >= 0:
            adj = adj.at[:, eos].add(
                jnp.where(step < min_left, np.float32(-1e9), 0.0))
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(logits + adj, sub, temps, top_ks, top_ps,
                          filter_topkp=filter_topkp)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        counts = counts.at[rowix, nxt].add(1.0)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx,
        )
        return (logits, cache, rng, counts), out

    (logits, cache, rng, _), out = jax.lax.scan(
        body, (logits, cache, rng, counts0), jnp.arange(k, dtype=jnp.int32))
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache, rng
    return out.T, logits, cache, rng


@partial(jax.jit, static_argnames=("cfg", "k", "total_pages", "top_k"),
         donate_argnames=("cache",))
def paged_greedy_decode_steps_grammar(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, pool_costs: jax.Array, pool_next: jax.Array,
    sid2slot: jax.Array, slots0: jax.Array, remaining0: jax.Array,
    adapter_idx=None, top_k: int = 0,
):
    """Paged twin of server.greedy_decode_steps_grammar: on-device
    grammar masks/transitions from the HBM state pool inside the paged
    k-step scan. Same freeze semantics (see that docstring); garbage
    steps write into already-allocated pages and get overwritten after
    the lengths rewind. ``top_k`` > 0 adds base-distribution logprob
    extraction."""
    from videollamb_tpu.serve.server import _lp_transpose

    def body(carry, step):
        logits, cache, slot, remaining, invalid_at, frozen_logits = carry
        nxt = jnp.argmax(
            grammar_mask_logits(logits, slot, remaining, pool_costs),
            -1).astype(jnp.int32)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        new_slot, invalid_at = grammar_transition(
            nxt, slot, invalid_at, step, k, pool_next, sid2slot)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits2, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        return (logits2, cache, new_slot, remaining - 1, invalid_at,
                frozen_logits), out

    b = logits.shape[0]
    init = (logits, cache, slots0, remaining0,
            jnp.full((b,), k, jnp.int32), jnp.zeros_like(logits))
    (logits, cache, _, _, invalid_at, frozen_logits), out = jax.lax.scan(
        body, init, jnp.arange(k, dtype=jnp.int32))
    if top_k:
        toks, lp = _lp_transpose(out)
        return toks, lp, logits, cache, invalid_at, frozen_logits
    return out.T, logits, cache, invalid_at, frozen_logits


@partial(jax.jit,
         static_argnames=("cfg", "k", "total_pages", "filter_topkp",
                          "top_k"),
         donate_argnames=("cache",))
def paged_sampled_decode_steps_grammar(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, rng: jax.Array, temps: jax.Array, top_ks: jax.Array,
    top_ps: jax.Array, pool_costs: jax.Array, pool_next: jax.Array,
    sid2slot: jax.Array, slots0: jax.Array, remaining0: jax.Array,
    adapter_idx=None, filter_topkp: bool = True, top_k: int = 0,
):
    """Paged twin of serve/server.sampled_decode_steps_grammar: grammar
    mask + sample_rows per step over the page pool, rng carried."""
    from videollamb_tpu.serve.server import _lp_transpose

    def body(carry, step):
        logits, cache, rng, slot, remaining, invalid_at, frozen_logits = carry
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(
            grammar_mask_logits(logits, slot, remaining, pool_costs), sub,
            temps, top_ks, top_ps, filter_topkp=filter_topkp)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        new_slot, invalid_at = grammar_transition(
            nxt, slot, invalid_at, step, k, pool_next, sid2slot)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits2, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        return (logits2, cache, rng, new_slot, remaining - 1, invalid_at,
                frozen_logits), out

    b = logits.shape[0]
    init = (logits, cache, rng, slots0, remaining0,
            jnp.full((b,), k, jnp.int32), jnp.zeros_like(logits))
    (logits, cache, rng, _, _, invalid_at, frozen_logits), out = jax.lax.scan(
        body, init, jnp.arange(k, dtype=jnp.int32))
    if top_k:
        toks, lp = _lp_transpose(out)
        return toks, lp, logits, cache, invalid_at, frozen_logits, rng
    return out.T, logits, cache, invalid_at, frozen_logits, rng


@partial(jax.jit,
         static_argnames=("cfg", "k", "total_pages", "filter_topkp",
                          "top_k", "eos"),
         donate_argnames=("cache",))
def paged_sampled_decode_steps_grammar_controls(
    params: Params, cfg, logits: jax.Array, cache: PagedKVCache, k: int,
    total_pages: int, rng: jax.Array, temps: jax.Array, top_ks: jax.Array,
    top_ps: jax.Array, bias: jax.Array, pres: jax.Array, freq: jax.Array,
    counts0: jax.Array, min_left: jax.Array, pool_costs: jax.Array,
    pool_next: jax.Array, sid2slot: jax.Array, slots0: jax.Array,
    remaining0: jax.Array, eos: int, adapter_idx=None,
    filter_topkp: bool = True, top_k: int = 0,
):
    """Paged twin of serve/server.sampled_decode_steps_grammar_controls:
    grammar mask + count-dependent control adjustments + sample_rows per
    step over the page pool (counts and grammar state carried on device,
    rng carried; same op order as the dense scan)."""
    from videollamb_tpu.serve.server import _lp_transpose

    rowix = jnp.arange(logits.shape[0])

    def body(carry, step):
        (logits, cache, rng, counts, slot, remaining, invalid_at,
         frozen_logits) = carry
        adj = bias - freq[:, None] * counts - pres[:, None] * (counts > 0)
        if eos >= 0:
            adj = adj.at[:, eos].add(
                jnp.where(step < min_left, np.float32(-1e9), 0.0))
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(
            grammar_mask_logits(logits + adj, slot, remaining, pool_costs),
            sub, temps, top_ks, top_ps, filter_topkp=filter_topkp)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        counts = counts.at[rowix, nxt].add(1.0)
        new_slot, invalid_at = grammar_transition(
            nxt, slot, invalid_at, step, k, pool_next, sid2slot)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits2, cache = paged_decode_step(
            params["lm"], cfg.lm, tok_embeds, cache, total_pages,
            adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        return (logits2, cache, rng, counts, new_slot, remaining - 1,
                invalid_at, frozen_logits), out

    b = logits.shape[0]
    init = (logits, cache, rng, counts0, slots0, remaining0,
            jnp.full((b,), k, jnp.int32), jnp.zeros_like(logits))
    (logits, cache, rng, _, _, _, invalid_at, frozen_logits), out = (
        jax.lax.scan(body, init, jnp.arange(k, dtype=jnp.int32)))
    if top_k:
        toks, lp = _lp_transpose(out)
        return toks, lp, logits, cache, invalid_at, frozen_logits, rng
    return out.T, logits, cache, invalid_at, frozen_logits, rng


@jax.jit
def _paged_fix_frozen(logits, cache: PagedKVCache, frozen_mask,
                      frozen_logits, garbage):
    logits = jnp.where(frozen_mask[:, None], frozen_logits, logits)
    lengths = cache.lengths - jnp.where(frozen_mask, garbage, 0)
    return logits, cache._replace(lengths=lengths)


class PagedServingEngine(ServingEngine):
    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        *,
        num_slots: int = 4,
        page_size: int = 64,
        total_pages: Optional[int] = None,
        pages_per_seq: Optional[int] = None,
        eos_token_id: int = 2,
        seed: int = 0,
        quantize_kv: bool = False,
        adapter_registry=None,
        preemption: str = "swap",
        prefix_cache_size: int = 8,
    ):
        if preemption not in ("swap", "off"):
            raise ValueError(f"preemption={preemption!r}: 'swap' or 'off'")
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        # Speculation is a dense-engine feature (a ragged verify over the
        # page pool would need a paged multi-token extend; plain decode
        # here).
        self.speculative = None
        self.spec_rounds = 0
        self.spec_committed = 0
        # Multi-LoRA (models/lm/mlora.py): same protocol as the dense
        # engine — per-slot indices ride every decode step.
        self.adapter_registry = adapter_registry
        self.adapter_idx = (
            jnp.full((num_slots,), -1, jnp.int32)
            if adapter_registry is not None else None
        )
        self._adapter_host = np.full((num_slots,), -1, np.int32)
        # Shape signatures whose host spliced-length formula has been
        # verified against the device sum (see server._resolve_prompt_len).
        self._len_verified: set = set()
        self.page_size = page_size
        # Default pool: enough for every slot to hold max_length + 512 —
        # dense-parity capacity; real deployments oversubscribe. Rounded up
        # to a multiple of 8 so the stock kernel can use 8-page compute
        # blocks (its block size must divide pages_per_seq; a power-of-2
        # remainder like 6 forces 2-page blocks — 3x the grid programs).
        per_slot = -(-(cfg.max_length + 512) // page_size)
        per_slot = (per_slot + 7) // 8 * 8
        self.total_pages = total_pages or (1 + num_slots * per_slot)
        self.pages_per_seq = pages_per_seq or per_slot
        self.max_seq_len = self.pages_per_seq * page_size
        self.eos = eos_token_id
        self.rng = jax.random.PRNGKey(seed)

        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        self.cache = init_paged_cache(
            cfg.lm, num_slots, self.total_pages, page_size,
            self.pages_per_seq, dtype, quantize=quantize_kv,
        )
        self.allocator = PageAllocator(self.total_pages)
        self.slot_pages: List[List[int]] = [[] for _ in range(num_slots)]
        # Host mirror of per-slot lengths (avoids a device sync per step).
        self._host_len = np.zeros((num_slots,), np.int64)
        # Host mirror of the page table. Host-side mutations (page growth,
        # slot release) write HERE and mark the table dirty; _sync_table
        # uploads the WHOLE fixed-shape table once before the next device
        # dispatch. The old per-mutation ``.at[idx].set`` route compiled a
        # fresh scatter (plus broadcast/concat/squeeze helpers) for every
        # distinct update count and slot index — ~0.45 s each through the
        # remote compile service, ~8 s of first-convoy stalls in the
        # serving-load bench (the paged-TTFT collapse; measured 2026-08,
        # benchmarks/serving_load.py). Device-side writers (fused_admit,
        # paged_insert) keep writing their row in-graph; the mirror is
        # updated to match so a later upload never clobbers them.
        self._table_host = np.full((num_slots, self.pages_per_seq),
                                   TRASH_PAGE, np.int32)
        self._table_dirty = False
        self.slots: List[Optional[Request]] = [None] * num_slots
        self.logits = jnp.zeros((num_slots, cfg.lm.vocab_size), jnp.float32)
        import queue

        self.pending: "queue.Queue[Request]" = queue.Queue()
        self._dropped: List[Request] = []
        # Prefix cache: pid -> dict(pages, dense, logits, len). Shared full
        # pages are mapped read-only into each consumer slot's page table;
        # decode never writes them (writes land at position >= prefix_len).
        self._prefixes = {}
        self._next_prefix_id = 0
        # Automatic prefix caching (Request.prefix_batch): signature ->
        # pid in LRU->MRU order, refcounted by live consumer slots.
        # ``prefix_cache_size`` caps the number of cached prefixes (each
        # holds its shared pages PLUS a dense single-row cache for
        # suffix-only prefills — the HBM bound callers size against).
        self.prefix_cache_size = max(1, prefix_cache_size)
        self._auto_prefix: "OrderedDict[bytes, int]" = OrderedDict()
        self._prefix_refs = {}  # pid -> live consumer slot count
        self._slot_prefix: List[Optional[int]] = [None] * num_slots
        self.prefix_hits = 0
        self.prefix_misses = 0
        self.prefix_evictions = 0
        # Preemption (swap-out/swap-in): when page growth mid-decode
        # exhausts the pool, the YOUNGEST active request's pages are
        # offloaded to host memory (raw bytes — int8 pages round-trip
        # bit-exact) and it waits in _swapped until a slot AND its pages
        # fit again. Converts the r2 "pool exhausted mid-decode"
        # RuntimeError into graceful FCFS degradation under
        # oversubscription (vLLM-style swap preemption, TPU-native:
        # two jitted gather/scatter ops + one D2H/H2D DMA each way).
        self.preemption = preemption
        self.preempted = 0  # swap-out count
        self.resumed = 0  # swap-in count
        self._swapped: List[dict] = []  # FIFO resume order
        self._admit_seq = 0  # admission order; youngest = max
        self._slot_seq = np.zeros((num_slots,), np.int64)

    # ------------------------------------------------------------------
    # Prefix caching (beyond the reference: amortizes the long system +
    # media prompt across requests — vLLM-style shared prompt pages, natural
    # on the paged pool).
    def register_prefix(self, batch) -> Optional[int]:
        """Prefill a shared prompt prefix once; returns a prefix id for
        Request.prefix_id, or None if the pool cannot hold it. The prefix's
        whole pages are written into the pool and shared (refcounted) by
        every consumer slot; its dense cache is kept so each admission only
        prefills the request suffix (llama_extend)."""
        spliced = prepare_multimodal_embeds_fast(
            self.params, self.cfg, batch, deterministic=True
        )
        prefix_len = int(np.asarray(jnp.sum(spliced.attention_mask)))
        n_full = prefix_len // self.page_size
        dense = init_kv_cache(self.cfg.lm, 1, self.cfg.max_length, self._dtype)
        logits, dense = chunked_prefill(
            self.params["lm"], self.cfg.lm,
            spliced.embeds.astype(self._dtype), spliced.attention_mask, dense,
            lengths=prefix_len,
        )
        pages = self.allocator.alloc(n_full) if n_full else []
        if pages is None:
            return None
        if pages:
            self.cache = scatter_prefix_pages(
                self.cache, dense, jnp.asarray(pages, jnp.int32),
                self.total_pages,
            )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        self._prefixes[pid] = {
            "pages": pages, "dense": dense, "logits": logits,
            "len": prefix_len,
        }
        self._prefix_refs[pid] = 0
        return pid

    def release_prefix(self, pid: int) -> None:
        info = self._prefixes.pop(pid)
        self._prefix_refs.pop(pid, None)
        self.allocator.free(info["pages"])

    # ------------------------------------------------------------------
    # Automatic prefix caching (Request.prefix_batch).
    def _evict_idle_prefix(self, exclude=None) -> bool:
        """Drop the least-recently-used auto-cached prefix with no live
        consumer slot, freeing its pages (and its dense suffix-prefill
        cache). Returns False when every cached prefix is in use.
        ``exclude`` protects one pid (the prefix a request is currently
        being admitted against)."""
        for sig, pid in self._auto_prefix.items():
            if pid != exclude and self._prefix_refs.get(pid, 0) == 0:
                del self._auto_prefix[sig]
                self.release_prefix(pid)
                self.prefix_evictions += 1
                return True
        return False

    def _resolve_auto_prefix(self, req: Request) -> str:
        """Map ``req.prefix_batch`` to a cached prefix id, registering on a
        miss. Returns 'ok' (req.prefix_id set), 'wait' (pool too tight
        right now — leave the request queued), or 'reject' (the prefix can
        never fit: pool idle, everything evictable evicted, still no
        pages)."""
        sig = batch_signature(req.prefix_batch)
        pid = self._auto_prefix.get(sig)
        if pid is not None:
            self._auto_prefix.move_to_end(sig)
            self.prefix_hits += 1
            req.prefix_id = pid
            return "ok"
        self.prefix_misses += 1
        while len(self._auto_prefix) >= self.prefix_cache_size:
            if not self._evict_idle_prefix():
                break  # every entry in use: overshoot until slots release
        pid = self.register_prefix(req.prefix_batch)
        while pid is None and self._evict_idle_prefix():
            pid = self.register_prefix(req.prefix_batch)
        if pid is None:
            pool_idle = (not any(r is not None for r in self.slots)
                         and not self._prefixes and not self._swapped)
            return "reject" if pool_idle else "wait"
        self._auto_prefix[sig] = pid
        req.prefix_id = pid
        return "ok"

    def _admit_prefix(self, req: Request, slot: int) -> bool:
        """Admission for a prefix-cached request: suffix-only prefill over a
        copy of the prefix's dense cache, shared pages mapped by refcount.
        Returns False on backpressure (leave the request queued)."""
        info = self._prefixes[req.prefix_id]
        spliced = prepare_multimodal_embeds_fast(
            self.params, self.cfg, req.batch, deterministic=True
        )
        suffix_len = int(np.asarray(jnp.sum(spliced.attention_mask)))
        total_len = info["len"] + suffix_len
        n_pages = self.allocator.pages_needed(total_len, self.page_size)
        n_full = len(info["pages"])
        if n_pages > self.pages_per_seq:
            self.pending.get()
            req.done = True  # reject: exceeds per-sequence budget
            req.error = (
                f"rejected: prefix+suffix needs {n_pages} pages, "
                f"per-sequence budget is {self.pages_per_seq}")
            self._dropped.append(req)
            _shared_consume(req)
            return True
        private = self.allocator.alloc(n_pages - n_full)
        if private is None and req.prefix_batch is not None:
            # Auto-cached prefix: reclaim OTHER idle cached prefixes first;
            # if the pool is otherwise idle and the suffix's private pages
            # still don't fit beside the prefix, no future release will
            # ever help — reject instead of backpressuring forever.
            while private is None and self._evict_idle_prefix(
                    exclude=req.prefix_id):
                private = self.allocator.alloc(n_pages - n_full)
            if (private is None
                    and not any(r is not None for r in self.slots)
                    and not self._swapped):
                self.pending.get()
                req.done = True
                req.error = (
                    f"rejected: prefix+suffix needs {n_pages} pages and "
                    "cannot fit the page pool even with the cache empty")
                self._dropped.append(req)
                _shared_consume(req)
                return True
        if private is None:
            return False  # pool exhausted — backpressure
        self.pending.get()
        # Suffix-only prefill: extend a COPY of the prefix dense cache
        # (llama_extend donates its input).
        dense = KVCache(k=jnp.array(info["dense"].k),
                        v=jnp.array(info["dense"].v),
                        length=jnp.array(info["dense"].length))
        logits, dense = llama_extend(
            self.params["lm"], self.cfg.lm,
            spliced.embeds.astype(self._dtype), spliced.attention_mask, dense,
        )
        self.allocator.retain(info["pages"])
        pages = list(info["pages"]) + private
        page_ids = np.full((self.pages_per_seq,), TRASH_PAGE, np.int32)
        page_ids[: len(pages)] = pages
        self.cache = paged_insert(
            self.cache, dense, jnp.asarray(slot), jnp.asarray(page_ids),
            self.total_pages, skip_pages=n_full,
        )
        self.logits = self.logits.at[slot].set(logits[0])
        self._install_constraint(req)  # prefix requests constrain too
        self.slot_pages[slot] = pages
        self._host_len[slot] = total_len
        self._table_host[slot] = page_ids  # device row set in-graph
        self.slots[slot] = req
        self._slot_prefix[slot] = req.prefix_id
        if req.prefix_id in self._prefix_refs:
            self._prefix_refs[req.prefix_id] += 1
        self._mark_admitted(slot)
        _shared_consume(req)
        return True

    def _mark_admitted(self, slot: int) -> None:
        self._slot_seq[slot] = self._admit_seq
        self._admit_seq += 1

    def _sync_table(self) -> None:
        """Upload the host page-table/lengths mirror if host-side
        mutations (releases, page growth) made it dirty. One fixed-shape
        device_put — no data-dependent compiles — called before every
        device dispatch that reads the cache (step top + pre-decode)."""
        if not self._table_dirty:
            return
        self.cache = self.cache._replace(
            page_table=jnp.asarray(self._table_host),
            lengths=jnp.asarray(self._host_len.astype(np.int32)),
        )
        self._table_dirty = False

    def _release(self, slot: int) -> None:
        # Base release also clears the slot's multi-LoRA state — without
        # it a finished adapter request's index leaks into the next
        # occupant (a prefix-cached base request would decode with the
        # stale adapter) and _live_adapter_idx never gates off again.
        super()._release(slot)
        pid = self._slot_prefix[slot]
        if pid is not None:
            self._slot_prefix[slot] = None
            if pid in self._prefix_refs:
                self._prefix_refs[pid] -= 1
        self.allocator.free(self.slot_pages[slot])
        self.slot_pages[slot] = []
        self._host_len[slot] = 0
        # Mirror-only: the freed pages may be reallocated by the very next
        # admission, so the TRASH row must land on device before the next
        # decode dispatch — _sync_table at the top of step() guarantees it.
        self._table_host[slot] = TRASH_PAGE
        self._table_dirty = True

    def _prefetch_admissions(self) -> None:
        """Batch the per-admission device syncs of one admission convoy.

        Every plain (non-prefix, non-fork-group) pending request that will
        fit the free slots gets its splice DISPATCHED here (async), and
        all splices whose spliced length is not host-known share ONE
        device->host readback of their stacked mask sums. Under convoy
        admission (all slots free at once — the common pattern when a
        batch of same-length requests finishes together) the old
        per-request ``int(jnp.sum(mask))`` sync serialized the pipeline
        at one tunnel round trip per admission; this makes it one round
        trip per convoy. Results ride ``req._spliced_cache`` and are
        consumed by _admit's fast path."""
        free = sum(r is None for r in self.slots)
        if free <= 1 or self.pending.empty():
            return
        todo = []
        for req in list(self.pending.queue)[:free]:
            if (req.cancelled or req.prefix_id is not None
                    or req.prefix_batch is not None
                    or getattr(req, "_shared_prefill", None) is not None
                    or getattr(req, "_spliced_cache", None) is not None):
                continue
            spliced = prepare_multimodal_embeds_fast(
                self.params, self.cfg, req.batch, deterministic=True
            )
            hint = self._host_prompt_len(req)
            if hint is not None and (hint[1] is None
                                     or hint[1] in self._len_verified):
                req._spliced_cache = (spliced, hint[0])
            else:
                todo.append((req, spliced,
                             jnp.sum(spliced.attention_mask)))
        if not todo:
            return
        sums = np.asarray(jnp.stack([s for _, _, s in todo]))  # ONE sync
        for (req, spliced, _), val in zip(todo, sums):
            prompt_len = int(val)
            hint = self._host_prompt_len(req)
            if hint is not None:
                if hint[0] != prompt_len:
                    raise RuntimeError(
                        f"host spliced-length formula gave {hint[0]} but "
                        f"the device splice produced {prompt_len} for "
                        f"signature {hint[1]}; the request's prompt_len "
                        "must be the row's attention-mask sum with "
                        "exactly one media sentinel")
                self._len_verified.add(hint[1])
            req._spliced_cache = (spliced, prompt_len)

    def _admit(self) -> None:
        # Swapped requests resume first: they hold decode progress and
        # predate everything still pending (FCFS).
        self._readmit_swapped()
        self._prefetch_admissions()
        while not self.pending.empty():
            slot = self._free_slot()
            if slot is None:
                return
            req = self.pending.queue[0]  # peek: only pop if pages fit
            if req.cancelled:
                self.pending.get()
                req.done = True
                req._spliced_cache = None
                self._dropped.append(req)
                _shared_consume(req)
                continue
            if req.adapter is not None and (
                self.adapter_registry is None
                or req.adapter not in self.adapter_registry
            ):
                self.pending.get()
                req.error = (
                    f"unknown adapter {req.adapter!r}"
                    if self.adapter_registry is not None
                    else "engine has no adapter registry")
                req.done = True
                req._spliced_cache = None
                self._dropped.append(req)
                _shared_consume(req)
                continue
            if req.adapter is not None and (req.prefix_id is not None
                                            or req.prefix_batch is not None):
                # A shared prefix's KV was prefilled by the BASE model;
                # splicing an adapter suffix onto it would silently decode
                # against mismatched context. Refuse instead.
                self.pending.get()
                req.error = ("rejected: adapter requests cannot reuse a "
                             "shared prefix (prefix KV is base-model)")
                req.done = True
                self._dropped.append(req)
                _shared_consume(req)
                continue
            if (req.prefix_batch is not None and req.prefix_id is not None
                    and req.prefix_id not in self._prefixes):
                # Auto-resolved pid evicted while this request waited in
                # backpressure (refcount was still 0): re-resolve.
                req.prefix_id = None
            if req.prefix_batch is not None and req.prefix_id is None:
                state = self._resolve_auto_prefix(req)
                if state == "wait":
                    return  # backpressure: retry once slots/pages free
                if state == "reject":
                    self.pending.get()
                    req.done = True
                    req.error = ("rejected: prefix exceeds the page pool "
                                 "even with the cache empty")
                    self._dropped.append(req)
                    _shared_consume(req)
                    continue
            if req.prefix_id is not None:
                if not self._admit_prefix(req, slot):
                    return  # backpressure
                continue
            shared = getattr(req, "_shared_prefill", None)
            have_shared = shared is not None and shared["data"] is not None
            if have_shared:
                # Fork group (serve/server.share_prefill): a sibling paid
                # the splice+prefill; reuse its result and prompt length.
                logits, single, prompt_len = shared["data"]
                spliced = None
            elif getattr(req, "_spliced_cache", None) is not None:
                # Convoy prefetch already spliced and resolved the length
                # with one shared readback (_prefetch_admissions).
                spliced, prompt_len = req._spliced_cache
            else:
                spliced = prepare_multimodal_embeds_fast(
                    self.params, self.cfg, req.batch, deterministic=True
                )
                # Host-known length (text rows by contract, image rows by
                # the verified-once splice formula) saves the
                # per-admission device sync — the sync serializes the
                # admission pipeline under load.
                prompt_len = self._resolve_prompt_len(req, spliced)
            n_pages = self.allocator.pages_needed(prompt_len, self.page_size)
            if n_pages > self.pages_per_seq:
                self.pending.get()
                req.done = True  # reject: exceeds per-sequence budget
                req.error = (
                    f"rejected: prompt needs {n_pages} pages, per-sequence "
                    f"budget is {self.pages_per_seq}")
                req._spliced_cache = None
                self._dropped.append(req)
                _shared_consume(req)
                continue
            pages = self.allocator.alloc(n_pages)
            if pages is None:
                return  # pool exhausted — backpressure until slots free
            self.pending.get()
            aidx1 = None
            if self.adapter_idx is not None:
                val = (self.adapter_registry[req.adapter]
                       if req.adapter is not None else -1)
                if val >= 0:
                    aidx1 = jnp.asarray([val], jnp.int32)
                self.adapter_idx = self.adapter_idx.at[slot].set(val)
                self._adapter_host[slot] = val
            page_ids = np.full((self.pages_per_seq,), TRASH_PAGE, np.int32)
            page_ids[: len(pages)] = pages
            if not have_shared and shared is None:
                # Fast path (the common case): splice -> ONE fused
                # dispatch for chunked prefill + requant + page scatter +
                # table row + engine-logits row (models/lm/paged.py
                # fused_admit). The split path cost one tunnel round-trip
                # per phase — the TTFT collapse under load
                # (benchmarks/admission_profile.py).
                self.cache, self.logits = fused_admit(
                    self.params["lm"], self.cfg.lm,
                    spliced.embeds.astype(self._dtype),
                    spliced.attention_mask,
                    jnp.asarray([prompt_len], jnp.int32),
                    self.cache, self.logits, jnp.asarray(slot),
                    jnp.asarray(page_ids), self.total_pages,
                    adapter_idx=aidx1,
                )
                _shared_consume(req)
                req._spliced_cache = None  # free the prefetch's embeds
                self._install_constraint(req)
                self.slot_pages[slot] = pages
                self._host_len[slot] = prompt_len
                self._table_host[slot] = page_ids  # device row set in-graph
                self.slots[slot] = req
                self._mark_admitted(slot)
                continue
            if not have_shared:
                single = init_kv_cache(self.cfg.lm, 1, self.cfg.max_length,
                                       self._dtype)
                # Fork-group payer: the sibling requests need the dense
                # single cache, so keep the split path here (rare).
                logits, single = chunked_prefill(
                    self.params["lm"], self.cfg.lm,
                    spliced.embeds.astype(self._dtype),
                    spliced.attention_mask, single,
                    lengths=prompt_len, adapter_idx=aidx1,
                )
                shared["data"] = (logits, single, prompt_len)
            _shared_consume(req)
            self.cache = paged_insert(
                self.cache, single, jnp.asarray(slot), jnp.asarray(page_ids),
                self.total_pages,
            )
            self.logits = self.logits.at[slot].set(logits[0])
            self._install_constraint(req)
            self.slot_pages[slot] = pages
            self._host_len[slot] = prompt_len
            self._table_host[slot] = page_ids  # device row set in-graph
            self.slots[slot] = req
            self._mark_admitted(slot)

    # ------------------------------------------------------------------
    # Preemption (swap): youngest-victim page offload under pool pressure.
    def has_work(self) -> bool:
        return super().has_work() or bool(self._swapped)

    def _pick_victim(self) -> Optional[int]:
        """The youngest active slot (max admission seq) — FCFS: older
        requests keep their pages and finish first."""
        victim, best = None, -1
        for i, r in enumerate(self.slots):
            if r is not None and self._slot_seq[i] > best:
                victim, best = i, self._slot_seq[i]
        return victim

    def _swap_out(self, slot: int) -> None:
        """Offload a slot's resident KV pages to host memory and free them.

        Only the pages holding committed tokens are saved (growth pages
        allocated ahead are empty); page ids are padded to a power-of-two
        bucket so gather compiles stay bounded. The request keeps its live
        host state (tokens, constraint cursor, sampling counts) — nothing
        is recomputed on resume."""
        req = self.slots[slot]
        length = int(self._host_len[slot])
        n_data = min(self.allocator.pages_needed(length, self.page_size),
                     len(self.slot_pages[slot]))
        bucket = max(1, 1 << (n_data - 1).bit_length()) if n_data else 1
        ids = np.full((bucket,), TRASH_PAGE, np.int32)
        ids[:n_data] = self.slot_pages[slot][:n_data]
        k, v, ks, vs = gather_slot_pages(self.cache, jnp.asarray(ids))
        pax = self.cache.page_axis  # page dim in the gathered arrays

        def trim(a):
            if a is None:
                return None
            sl = [slice(None)] * a.ndim
            sl[pax] = slice(None, n_data)
            return np.asarray(a)[tuple(sl)]

        ent = {
            "req": req,
            "len": length,
            "n": n_data,
            "k": trim(k),
            "v": trim(v),
            "ks": trim(ks),
            "vs": trim(vs),
            "logits": np.asarray(self.logits[slot]),
            "adapter": int(self._adapter_host[slot]),
        }
        self._swapped.append(ent)
        self.preempted += 1
        self._release(slot)

    def _readmit_swapped(self) -> None:
        """Resume swapped requests (FIFO) when a slot and their pages —
        plus one token of decode headroom, to avoid immediate
        re-preemption thrash — fit again."""
        while self._swapped:
            ent = self._swapped[0]
            req = ent["req"]
            if req.cancelled:
                self._swapped.pop(0)
                req.done = True
                self._dropped.append(req)
                continue
            slot = self._free_slot()
            if slot is None:
                return
            n_pages = self.allocator.pages_needed(ent["len"] + 1,
                                                  self.page_size)
            pages = self.allocator.alloc(n_pages)
            if pages is None:
                return  # pool still tight — resume next step
            self._swapped.pop(0)
            n = ent["n"]
            bucket = max(1, 1 << (n - 1).bit_length()) if n else 1
            ids = np.full((bucket,), TRASH_PAGE, np.int32)
            ids[:n] = pages[:n]

            pax = self.cache.page_axis

            def pad(a):
                if a is None or a.shape[pax] == bucket:
                    return None if a is None else jnp.asarray(a)
                padded = np.zeros(a.shape[:pax] + (bucket,)
                                  + a.shape[pax + 1:], a.dtype)
                sl = [slice(None)] * a.ndim
                sl[pax] = slice(None, n)
                padded[tuple(sl)] = a
                return jnp.asarray(padded)

            self.cache = insert_raw_pages(
                self.cache, pad(ent["k"]), pad(ent["v"]), jnp.asarray(ids),
                pad(ent["ks"]), pad(ent["vs"]),
            )
            row = np.full((self.pages_per_seq,), TRASH_PAGE, np.int32)
            row[: len(pages)] = pages
            self.cache = self.cache._replace(
                page_table=self.cache.page_table.at[slot].set(
                    jnp.asarray(row)),
                lengths=self.cache.lengths.at[slot].set(ent["len"]),
            )
            self.logits = self.logits.at[slot].set(jnp.asarray(ent["logits"]))
            if self.adapter_idx is not None and ent["adapter"] >= 0:
                self.adapter_idx = self.adapter_idx.at[slot].set(
                    ent["adapter"])
                self._adapter_host[slot] = ent["adapter"]
            # The request's constraint cursor / token history live on the
            # Request object and were never touched — do NOT re-install.
            self.slot_pages[slot] = pages
            self._host_len[slot] = ent["len"]
            self._table_host[slot] = row  # device row set above
            self.slots[slot] = req
            self._mark_admitted(slot)
            self.resumed += 1

    def _sampled_scan(self, k: int, vecs, top_k: int):
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        fil = self._needs_filter(vecs)
        if top_k:
            toks, lp, self.logits, self.cache, self.rng = (
                paged_sampled_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    self.total_pages, self.rng, temps, top_ks, top_ps,
                    adapter_idx=self._live_adapter_idx(), top_k=top_k,
                    filter_topkp=fil))
        else:
            toks, self.logits, self.cache, self.rng = (
                paged_sampled_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    self.total_pages, self.rng, temps, top_ks, top_ps,
                    adapter_idx=self._live_adapter_idx(), filter_topkp=fil))
            lp = None
        self._host_len += k  # finished rows zeroed by _release at commit
        return toks, lp

    def _sampled_scan_controls(self, k: int, vecs, ctrl, top_k: int):
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        bias, pres, freq, counts0, min_left = (jnp.asarray(c) for c in ctrl)
        fil = self._needs_filter(vecs)
        args = (self.params, self.cfg, self.logits, self.cache, k,
                self.total_pages, self.rng, temps, top_ks, top_ps, bias,
                pres, freq, counts0, min_left)
        kw = dict(eos=self.eos if self.eos is not None else -1,
                  adapter_idx=self._live_adapter_idx(), filter_topkp=fil)
        if top_k:
            toks, lp, self.logits, self.cache, self.rng = (
                paged_sampled_decode_steps_controls(*args, top_k=top_k, **kw))
        else:
            toks, self.logits, self.cache, self.rng = (
                paged_sampled_decode_steps_controls(*args, **kw))
            lp = None
        self._host_len += k
        return toks, lp

    def _grammar_scan(self, k: int, dt, slots0, remaining0, top_k: int = 0):
        args = (self.params, self.cfg, self.logits, self.cache, k,
                self.total_pages, dt.costs, dt.next_sid, dt.sid2slot,
                jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(adapter_idx=self._live_adapter_idx())
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at,
             frozen_logits) = paged_greedy_decode_steps_grammar(
                *args, top_k=top_k, **kw)
        else:
            toks, self.logits, self.cache, invalid_at, frozen_logits = (
                paged_greedy_decode_steps_grammar(*args, **kw))
            lp = None
        self._host_len += k  # mirrors lengths+k; frozen rows rewound below
        return toks, lp, invalid_at, frozen_logits

    def _grammar_scan_sampled(self, k: int, dt, slots0, remaining0,
                              top_k: int = 0):
        from videollamb_tpu.serve.server import slot_sampling_vectors

        vecs = slot_sampling_vectors(self.slots)
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        args = (self.params, self.cfg, self.logits, self.cache, k,
                self.total_pages, self.rng, temps, top_ks, top_ps,
                dt.costs, dt.next_sid, dt.sid2slot,
                jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(adapter_idx=self._live_adapter_idx(),
                  filter_topkp=self._needs_filter(vecs))
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = paged_sampled_decode_steps_grammar(
                *args, top_k=top_k, **kw)
        else:
            (toks, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = paged_sampled_decode_steps_grammar(*args, **kw)
            lp = None
        self._host_len += k  # frozen rows rewound by _grammar_fix
        return toks, lp, invalid_at, frozen_logits

    def _grammar_scan_controls(self, k: int, dt, slots0, remaining0,
                               top_k: int = 0):
        from videollamb_tpu.serve.server import (
            build_control_tensors,
            slot_sampling_vectors,
        )

        vecs = slot_sampling_vectors(self.slots)
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        ctrl = build_control_tensors(self.slots, self.cfg.lm.vocab_size)
        bias, pres, freq, counts0, min_left = (jnp.asarray(c) for c in ctrl)
        args = (self.params, self.cfg, self.logits, self.cache, k,
                self.total_pages, self.rng, temps, top_ks, top_ps, bias,
                pres, freq, counts0, min_left, dt.costs, dt.next_sid,
                dt.sid2slot, jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(eos=self.eos if self.eos is not None else -1,
                  adapter_idx=self._live_adapter_idx(),
                  filter_topkp=self._needs_filter(vecs))
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = paged_sampled_decode_steps_grammar_controls(
                *args, top_k=top_k, **kw)
        else:
            (toks, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = paged_sampled_decode_steps_grammar_controls(
                *args, **kw)
            lp = None
        self._host_len += k  # frozen rows rewound by _grammar_fix
        return toks, lp, invalid_at, frozen_logits

    def _grammar_fix(self, frozen, frozen_logits, garbage) -> None:
        self._host_len -= garbage  # garbage already zeroed on healthy rows
        self.logits, self.cache = _paged_fix_frozen(
            self.logits, self.cache, jnp.asarray(frozen), frozen_logits,
            jnp.asarray(garbage))

    def _ensure_pages(self, k: int) -> None:
        """Allocate pages so every active slot can write k more tokens.

        Pool exhaustion here preempts the youngest active request
        (``preemption='swap'``, the default): its pages are offloaded to
        host memory and it resumes — exact state, no recompute — once
        capacity frees. ``preemption='off'`` keeps the hard error."""
        for i in range(self.num_slots):
            if self.slots[i] is None:
                continue
            need = self.allocator.pages_needed(int(self._host_len[i]) + k,
                                               self.page_size)
            while (self.slots[i] is not None
                   and len(self.slot_pages[i]) < min(need,
                                                     self.pages_per_seq)):
                got = self.allocator.alloc(1)
                if got is None:
                    # An idle cached prefix is the cheapest page source —
                    # evict before swap-preempting an active request.
                    if self._evict_idle_prefix():
                        continue
                    victim = (self._pick_victim()
                              if self.preemption == "swap" else None)
                    only_active = sum(
                        r is not None for r in self.slots) == 1
                    if victim is None or (victim == i and only_active):
                        raise RuntimeError(
                            "page pool exhausted mid-decode and no request "
                            "can be preempted; size the pool for at least "
                            "one full sequence plus headroom"
                        )
                    # The victim's mirror row (including pages just grown
                    # this flush) is TRASH'd wholesale by the swap-out
                    # release, so freed page ids never alias another
                    # slot's next allocation.
                    self._swap_out(victim)
                    continue  # retry the allocation (slot i may be gone)
                j = len(self.slot_pages[i])
                self.slot_pages[i].append(got[0])
                self._table_host[i, j] = got[0]
                self._table_dirty = True

    def step(self, k: int = 1) -> List[Request]:
        # Flush releases from the previous step's commit BEFORE admission:
        # fused_admit may reuse a freed slot's pages, and its in-graph row
        # write only covers its own slot.
        self._sync_table()
        self._admit()
        dropped = self._drain_dropped()
        if not any(self._active_mask()):
            return dropped
        self._ensure_pages(max(k, 1))
        self._sync_table()

        all_greedy = all((r is None or r.temperature == 0.0) for r in self.slots)
        unconstrained = all(
            getattr(r, "_constraint", None) is None for r in self.slots
        )
        no_controls = all(
            (r is None or not r.has_sampling_controls) for r in self.slots
        )
        if k > 1 and all_greedy and unconstrained and no_controls:
            lp_host = None
            if self._wants_logprobs():
                from videollamb_tpu.serve.server import TOP_LOGPROBS_K

                toks, lp, self.logits, self.cache = paged_greedy_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    self.total_pages, adapter_idx=self._live_adapter_idx(),
                    top_k=TOP_LOGPROBS_K,
                )
                lp_host = tuple(np.asarray(a) for a in lp)
            else:
                toks, self.logits, self.cache = paged_greedy_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    self.total_pages, adapter_idx=self._live_adapter_idx(),
                )
            self._host_len += k
            return self._commit_k_tokens(np.asarray(toks), lp_host, k, dropped)

        if k > 1 and no_controls:
            # Device-side grammar enforcement over the paged pool — the
            # production serving config keeps guaranteed-valid JSON in
            # the k-step device loop (serve/device_grammar.py), greedy
            # or sampled, with logprob extraction riding either scan.
            setup = self._grammar_device_setup()
            if setup is not None:
                return self._step_device_grammar(k, setup, dropped,
                                                 sampled=not all_greedy)

        if k > 1 and unconstrained:
            # Sampled batches ride the paged k-step device scan (see
            # serve/server.step — bit-identical to the host path); controls
            # carry their generated-token counts on device.
            return self._step_device_sampled(k, dropped,
                                             with_controls=not no_controls)

        self.rng, sub = jax.random.split(self.rng)
        from videollamb_tpu.serve.constrained import build_constraint_masks
        from videollamb_tpu.serve.server import (
            build_control_adjustments,
            sample_slot_tokens,
        )

        cmask = build_constraint_masks(self.slots, self.cfg.lm.vocab_size)
        adj = build_control_adjustments(self.slots, self.cfg.lm.vocab_size,
                                        self.eos)
        logits = self.logits
        if cmask is not None:
            logits = logits + jnp.asarray(cmask)
        if adj is not None:
            logits = logits + jnp.asarray(adj)
        nxt = sample_slot_tokens(logits, sub, self.slots)
        # Raw pre-mask logits: logprobs report the base distribution.
        lp = (logprobs_of(self.logits, nxt) if self._wants_logprobs()
              else None)

        tok_embeds = embed_tokens(self.params["lm"], nxt[:, None]).astype(self._dtype)
        self.logits, self.cache = paged_decode_step(
            self.params["lm"], self.cfg.lm, tok_embeds, self.cache,
            self.total_pages, adapter_idx=self._live_adapter_idx(),
        )

        lp_host = (tuple(np.asarray(a) for a in lp) if lp is not None
                   else None)
        self._host_len += 1
        nxt_host = np.asarray(nxt)
        finished: List[Request] = dropped
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            if req.cancelled:
                req.done = True
                finished.append(req)
                self._release(i)
                continue
            tok = int(nxt_host[i])
            req.tokens.append(tok)
            if lp_host is not None and req.logprobs:
                self._commit_logprob(req, lp_host[0][i], lp_host[1][i],
                                     lp_host[2][i])
            if req.on_token is not None:
                req.on_token(req, tok)
            con = getattr(req, "_constraint", None)
            if con is not None:
                con.advance(tok)
            if (tok == self.eos or len(req.tokens) >= req.max_new_tokens
                    or (con is not None and con.finished)):
                req.done = True
                finished.append(req)
                self._release(i)
        return finished
