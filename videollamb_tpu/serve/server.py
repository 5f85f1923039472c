"""Slot-based continuous-batching serving engine.

Goes beyond the reference (which generates one request at a time through HF
``generate``): a fixed pool of KV-cache slots decodes in lock-step while new
requests prefill independently and hot-swap into free slots — the standard
TPU serving pattern (orbit/JetStream style), built on the same
prefill/decode primitives as the offline engine.

- prefill runs at B=1 on bucketed lengths (a handful of compiled shapes);
- `insert` copies the prefilled rows into the batch cache at a free slot;
- one decode step advances ALL active slots (weights read once per step —
  aggregate throughput scales with occupancy: measured 210 tok/s at 4 slots
  for the int8 7B vs 84 tok/s single-stream);
- per-slot EOS/budget tracking; finished slots free immediately.
"""

from __future__ import annotations

import dataclasses
import queue
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.assembly import MultimodalBatch, Params, prepare_multimodal_embeds_fast
from videollamb_tpu.models.engine import sample_token
from videollamb_tpu.models.lm.llama import (
    KVCache,
    chunked_prefill,
    embed_tokens,
    init_kv_cache,
    llama_decode_step,
)


@partial(jax.jit, donate_argnames=("batch_cache",))
def insert_into_cache(
    batch_cache: KVCache, single_cache: KVCache, slot: jax.Array
) -> KVCache:
    """Copy a prefilled B=1 cache into row ``slot`` of the batch cache."""
    s_single = single_cache.k.shape[2]

    def put(buf, row):
        # buf: (L, B, S, H, Dh); row: (L, 1, s_single, H, Dh)
        return jax.lax.dynamic_update_slice(
            buf, row.astype(buf.dtype), (0, slot, 0, 0, 0)
        )

    pad = batch_cache.k.shape[2] - s_single
    k_row = jnp.pad(single_cache.k, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    v_row = jnp.pad(single_cache.v, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return KVCache(
        k=put(batch_cache.k, k_row),
        v=put(batch_cache.v, v_row),
        length=batch_cache.length.at[slot].set(single_cache.length[0]),
    )


def build_control_adjustments(slots, vocab_size: int,
                              eos: int) -> Optional[np.ndarray]:
    """(B, V) additive logit adjustments for slots carrying sampling
    controls (logit_bias / presence / frequency / min_tokens), or None
    when no slot does. min_tokens suppresses EOS SOFTLY (-1e9, not the
    constraint mask's -1e30) so grammar forced closing still wins when
    the grammar leaves only EOS legal."""
    rows: Optional[np.ndarray] = None
    for i, r in enumerate(slots):
        if r is None or not r.has_sampling_controls:
            continue
        if rows is None:
            rows = np.zeros((len(slots), vocab_size), np.float32)
        if r.logit_bias:
            for t, b in r.logit_bias.items():
                t = int(t)
                if 0 <= t < vocab_size:
                    rows[i, t] += float(b)
        if (r.presence_penalty or r.frequency_penalty) and r.tokens:
            counts = np.bincount(np.asarray(r.tokens, np.int64),
                                 minlength=vocab_size)[:vocab_size]
            rows[i] -= np.float32(r.frequency_penalty) * counts
            rows[i] -= np.float32(r.presence_penalty) * (counts > 0)
        if len(r.tokens) < r.min_tokens and 0 <= eos < vocab_size:
            rows[i, eos] -= 1e9
    return rows


def sample_rows(logits: jax.Array, rng: jax.Array, temps: jax.Array,
                top_ks: jax.Array, top_ps: jax.Array,
                filter_topkp: bool = True) -> jax.Array:
    """Pure-jnp per-row sampling core shared by the host per-step path
    (sample_slot_tokens) and the device k-step scan (sampled_decode_steps):
    scale each row's logits by its own temperature, keep its top-k, mask
    below its nucleus threshold (HF semantics), sample once, then override
    greedy (temp==0) rows with argmax. Every block applies unconditionally
    — disabled rows (top_k==0 / top_p==1) pass through unchanged by
    construction, so the two call sites produce bit-identical tokens for
    the same inputs and rng.

    ``filter_topkp`` is a STATIC fast-path switch: when the caller knows
    every row has top_k==0 and top_p==1 (pure temperature sampling — the
    common serving mix), False skips the full-vocab sort/cumsum, which
    costs ~2 ms/step at (8, 32k). The filtered and unfiltered graphs
    agree bit-for-bit on filter-free rows only when the WHOLE batch is
    filter-free (the sort path's -inf masking never fires then), which is
    exactly the condition under which callers may pass False."""
    nxt_greedy = jnp.argmax(logits, -1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temps, 1e-6)[:, None]
    if not filter_topkp:
        nxt_sampled = jax.random.categorical(rng, scaled, axis=-1).astype(
            jnp.int32)
        return jnp.where(temps > 0, nxt_sampled, nxt_greedy)
    v = scaled.shape[-1]
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    kth_idx = jnp.where(top_ks > 0, jnp.minimum(top_ks, v) - 1, v - 1)
    kth = jnp.take_along_axis(sorted_desc, kth_idx[:, None], 1)
    keep = (scaled >= kth) | (top_ks == 0)[:, None]
    scaled = jnp.where(keep, scaled, -jnp.inf)
    # The top-k mask is purely value-based (scaled >= kth), so the masked
    # row sorts to the same descending prefix with -inf after it — derive
    # the second sorted array instead of paying a second full-vocab sort.
    sorted_logits = jnp.where(
        (sorted_desc >= kth) | (top_ks == 0)[:, None], sorted_desc, -jnp.inf)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_ps[:, None]
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
        keepdims=True)
    scaled = jnp.where(scaled >= threshold, scaled, -jnp.inf)
    nxt_sampled = jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)
    return jnp.where(temps > 0, nxt_sampled, nxt_greedy)


def slot_sampling_vectors(slots):
    """(temps, top_ks, top_ps) numpy vectors from the slot list."""
    temps = np.asarray([(r.temperature if r is not None else 0.0)
                        for r in slots], np.float32)
    top_ps = np.asarray([(r.top_p if r is not None else 1.0)
                         for r in slots], np.float32)
    top_ks = np.asarray([(getattr(r, "top_k", 0) if r is not None else 0)
                         for r in slots], np.int32)
    return temps, top_ks, top_ps


def build_control_tensors(slots, vocab_size: int):
    """Per-row control tensors for the device k-step scan
    (sampled_decode_steps_controls): static logit_bias rows, penalty
    coefficients, the current generated-token counts (the scan carries
    and updates them on device), and min_tokens budget left. Rows without
    a control are all-zeros, so the device math is uniform."""
    b = len(slots)
    bias = np.zeros((b, vocab_size), np.float32)
    pres = np.zeros((b,), np.float32)
    freq = np.zeros((b,), np.float32)
    counts = np.zeros((b, vocab_size), np.float32)
    min_left = np.zeros((b,), np.int32)
    for i, r in enumerate(slots):
        if r is None:
            continue
        if r.logit_bias:
            for t, v in r.logit_bias.items():
                t = int(t)
                if 0 <= t < vocab_size:
                    bias[i, t] += float(v)
        if r.presence_penalty or r.frequency_penalty:
            pres[i] = np.float32(r.presence_penalty)
            freq[i] = np.float32(r.frequency_penalty)
            if r.tokens:
                counts[i] = np.bincount(
                    np.asarray(r.tokens, np.int64),
                    minlength=vocab_size)[:vocab_size]
        min_left[i] = max(0, r.min_tokens - len(r.tokens))
    return bias, pres, freq, counts, min_left


def sample_slot_tokens(logits: jax.Array, rng: jax.Array, slots) -> jax.Array:
    """Per-slot sampling honoring each Request's temperature, top_k, AND
    top_p — the host per-step path (constraint masks / control adjustments
    already folded into ``logits`` by the caller)."""
    temps, top_ks, top_ps = slot_sampling_vectors(slots)
    if not (temps > 0).any():
        return jnp.argmax(logits, -1).astype(jnp.int32)
    return sample_rows(logits, rng, jnp.asarray(temps), jnp.asarray(top_ks),
                       jnp.asarray(top_ps),
                       filter_topkp=bool((top_ks > 0).any()
                                         or (top_ps < 1.0).any()))


# One static top-k bucket for logprob extraction (the OpenAI API caps
# top_logprobs at 20) — a single bucket means at most one extra compiled
# graph per engine regardless of what mix of k values clients ask for.
TOP_LOGPROBS_K = 20


@partial(jax.jit, static_argnames=("top_k",))
def logprobs_of(logits: jax.Array, nxt: jax.Array, top_k: int = TOP_LOGPROBS_K):
    """Per-row logprob of the chosen token + the top-k alternatives under
    the BASE model distribution (f32 log-softmax of the raw logits —
    temperature/top_p/constraint masks do not change what is reported,
    matching the OpenAI semantics of logprobs)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(logp, top_k)
    return chosen, top_vals, top_ids


@partial(jax.jit, static_argnames=("cfg", "k", "top_k"),
         donate_argnames=("cache",))
def greedy_decode_steps(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    adapter_idx=None, top_k: int = 0,
):
    """Run k greedy decode steps fully on device -> (tokens (B, k), logits,
    cache). Lets the engine sync with the host every k tokens instead of
    every token (EOS rows decode garbage that is discarded host-side; slot
    reuse overwrites their cache rows, and attention is length-masked).

    With ``top_k`` > 0 (static: one extra graph) each step also extracts
    chosen-token logprobs and the top-k alternatives, and the return is
    (tokens, (chosen (B,k), top_vals (B,k,top_k), top_ids), logits, cache).
    """

    def body(carry, _):
        logits, cache = carry
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        if top_k:
            out = (nxt,) + logprobs_of(logits, nxt, top_k)
        else:
            out = nxt
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(cache.k.dtype)
        logits, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds, cache,
                                          adapter_idx=adapter_idx)
        return (logits, cache), out

    (logits, cache), out = jax.lax.scan(body, (logits, cache), None, length=k)
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache
    return out.T, logits, cache  # (B, k)


@partial(jax.jit, static_argnames=("cfg", "k", "top_k", "filter_topkp"),
         donate_argnames=("cache",))
def sampled_decode_steps(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    rng: jax.Array, temps: jax.Array, top_ks: jax.Array, top_ps: jax.Array,
    adapter_idx=None, top_k: int = 0, filter_topkp: bool = True,
):
    """k SAMPLED decode steps fully on device — the sampled twin of
    greedy_decode_steps. Each step splits the carried rng exactly as the
    host per-step path does (``rng, sub = split(rng)``) and draws with the
    shared :func:`sample_rows` core, so the token stream is bit-identical
    to k host-synced steps from the same starting rng; temp==0 rows take
    argmax inside the same call, so mixed greedy/sampled batches ride one
    graph. Returns (tokens (B, k), [logprob data], logits, cache, rng) —
    the caller stores the carried rng back so host and device paths stay
    interchangeable mid-stream.
    """

    def body(carry, _):
        logits, cache, rng = carry
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(logits, sub, temps, top_ks, top_ps,
                          filter_topkp=filter_topkp)
        if top_k:
            out = (nxt,) + logprobs_of(logits, nxt, top_k)
        else:
            out = nxt
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(cache.k.dtype)
        logits, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds, cache,
                                          adapter_idx=adapter_idx)
        return (logits, cache, rng), out

    (logits, cache, rng), out = jax.lax.scan(
        body, (logits, cache, rng), None, length=k)
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache, rng
    return out.T, logits, cache, rng  # (B, k)


@partial(jax.jit,
         static_argnames=("cfg", "k", "top_k", "filter_topkp", "eos"),
         donate_argnames=("cache",))
def sampled_decode_steps_controls(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    rng: jax.Array, temps: jax.Array, top_ks: jax.Array, top_ps: jax.Array,
    bias: jax.Array, pres: jax.Array, freq: jax.Array, counts0: jax.Array,
    min_left: jax.Array, eos: int, adapter_idx=None, top_k: int = 0,
    filter_topkp: bool = True,
):
    """sampled_decode_steps with the count-dependent sampling controls
    enforced ON DEVICE: the scan carries each row's generated-token counts
    (updated per step), so presence/frequency penalties, logit_bias, and
    min_tokens EOS suppression match the host per-step path exactly —
    adjusted = logits + bias - freq*counts - pres*[count>0], EOS softly
    suppressed while the row's min_tokens budget remains (same -1e9 and
    op order as build_control_adjustments). Logprobs still report the
    BASE distribution (raw logits, pre-adjustment)."""
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
        if top_k:
            out = (nxt,) + logprobs_of(logits, nxt, top_k)
        else:
            out = nxt
        counts = counts.at[rowix, nxt].add(1.0)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(cache.k.dtype)
        logits, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds,
                                          cache, adapter_idx=adapter_idx)
        return (logits, cache, rng, counts), out

    (logits, cache, rng, _), out = jax.lax.scan(
        body, (logits, cache, rng, counts0),
        jnp.arange(k, dtype=jnp.int32))
    if top_k:
        toks, chosen, top_vals, top_ids = out
        lp = (chosen.T, top_vals.transpose(1, 0, 2), top_ids.transpose(1, 0, 2))
        return toks.T, lp, logits, cache, rng
    return out.T, logits, cache, rng


def grammar_mask_logits(logits: jax.Array, slot: jax.Array,
                        remaining: jax.Array,
                        pool_costs: jax.Array) -> jax.Array:
    """Budget-aware grammar mask, gathered from the HBM state pool by slot:
    a token stays legal iff its closing cost fits the remaining budget
    after emitting it (same rule as the host path's set_remaining)."""
    mask = pool_costs[slot] <= (remaining - 1)[:, None]
    return jnp.where(mask, logits, -jnp.inf)


def grammar_transition(nxt: jax.Array, slot: jax.Array, invalid_at: jax.Array,
                       step, k: int, pool_next: jax.Array,
                       sid2slot: jax.Array):
    """Post-token grammar bookkeeping shared by the greedy and sampled
    scans of both engines: machine transition via the pool's next-sid row,
    freeze on not-yet-uploaded states (see module docstring of
    serve/device_grammar.py). Returns (new_slot, invalid_at)."""
    sid_cap = sid2slot.shape[0]
    nsid = jnp.take_along_axis(pool_next[slot], nxt[:, None], 1)[:, 0]
    mapped = sid2slot[jnp.clip(nsid, 0, sid_cap - 1)]
    unknown = ((nsid >= 0) & ((nsid >= sid_cap) | (mapped == -1))
               | (nsid == -1))
    froze_now = unknown & (invalid_at == k)
    invalid_at = jnp.where(froze_now, step, invalid_at)
    new_slot = jnp.where(nsid >= 0, jnp.maximum(mapped, 0), 0)
    # Frozen rows decode unconstrained garbage (discarded host-side).
    new_slot = jnp.where(invalid_at <= step, 0, new_slot)
    return new_slot, invalid_at


def _lp_transpose(out):
    """Scan logprob outputs (k-major) -> engine layout (B-major)."""
    toks, chosen, top_vals, top_ids = out
    return toks.T, (chosen.T, top_vals.transpose(1, 0, 2),
                    top_ids.transpose(1, 0, 2))


@partial(jax.jit, static_argnames=("cfg", "k", "top_k"),
         donate_argnames=("cache",))
def greedy_decode_steps_grammar(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    pool_costs: jax.Array, pool_next: jax.Array, sid2slot: jax.Array,
    slots0: jax.Array, remaining0: jax.Array, adapter_idx=None,
    top_k: int = 0,
):
    """k greedy decode steps with grammar constraints enforced ON DEVICE
    (serve/device_grammar.py): per step, each row gathers its state's
    closing-cost row from the HBM pool, masks by remaining budget, takes
    the argmax, and transitions via the pool's next-sid row — no per-token
    host sync or (B, V) mask transfer.

    Returns (tokens (B, k), [logprob data,] logits, cache, invalid_at
    (B,), frozen_logits (B, V)). ``invalid_at[i] == t < k`` means row i
    transitioned into a not-yet-uploaded state after emitting the (valid)
    token at step t: tokens (t, k) are garbage, ``frozen_logits[i]``
    holds the logits right after token t, and the engine must rewind the
    row's cache length by k - 1 - t (the garbage writes get overwritten).
    With ``top_k`` > 0, per-step base-distribution logprobs of the chosen
    token + top-k alternatives ride along (extracted from the RAW logits,
    pre-mask — the OpenAI logprob semantics).
    """
    def body(carry, step):
        logits, cache, slot, remaining, invalid_at, frozen_logits = carry
        nxt = jnp.argmax(
            grammar_mask_logits(logits, slot, remaining, pool_costs),
            -1).astype(jnp.int32)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        new_slot, invalid_at = grammar_transition(
            nxt, slot, invalid_at, step, k, pool_next, sid2slot)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(
            cache.k.dtype)
        logits2, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds,
                                           cache, adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        carry = (logits2, cache, new_slot, remaining - 1, invalid_at,
                 frozen_logits)
        return carry, out

    b = logits.shape[0]
    init = (logits, cache, slots0, remaining0,
            jnp.full((b,), k, jnp.int32), jnp.zeros_like(logits))
    (logits, cache, _, _, invalid_at, frozen_logits), out = jax.lax.scan(
        body, init, jnp.arange(k, dtype=jnp.int32))
    if top_k:
        toks, lp = _lp_transpose(out)
        return toks, lp, logits, cache, invalid_at, frozen_logits
    return out.T, logits, cache, invalid_at, frozen_logits


@partial(jax.jit, static_argnames=("cfg", "k", "filter_topkp", "top_k"),
         donate_argnames=("cache",))
def sampled_decode_steps_grammar(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    rng: jax.Array, temps: jax.Array, top_ks: jax.Array, top_ps: jax.Array,
    pool_costs: jax.Array, pool_next: jax.Array, sid2slot: jax.Array,
    slots0: jax.Array, remaining0: jax.Array, adapter_idx=None,
    filter_topkp: bool = True, top_k: int = 0,
):
    """Grammar-constrained SAMPLED decoding on device: the k-step scan
    applies the budget-aware grammar mask, draws with the shared
    sample_rows core (greedy rows argmax inside the same call), and
    transitions state slots — guaranteed-valid JSON with temperature
    stays in the device loop. Same freeze semantics as the greedy scan;
    note that garbage steps after a freeze still consume rng splits, so
    freeze recovery is distribution-correct but not split-for-split
    identical to host stepping (warm tables never freeze). Returns
    (tokens, [logprob data,] logits, cache, invalid_at, frozen_logits,
    rng)."""

    def body(carry, step):
        logits, cache, rng, slot, remaining, invalid_at, frozen_logits = carry
        rng, sub = jax.random.split(rng)
        nxt = sample_rows(
            grammar_mask_logits(logits, slot, remaining, pool_costs), sub,
            temps, top_ks, top_ps, filter_topkp=filter_topkp)
        out = (nxt,) + logprobs_of(logits, nxt, top_k) if top_k else nxt
        new_slot, invalid_at = grammar_transition(
            nxt, slot, invalid_at, step, k, pool_next, sid2slot)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(
            cache.k.dtype)
        logits2, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds,
                                           cache, adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        carry = (logits2, cache, rng, new_slot, remaining - 1, invalid_at,
                 frozen_logits)
        return carry, out

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
         static_argnames=("cfg", "k", "filter_topkp", "top_k", "eos"),
         donate_argnames=("cache",))
def sampled_decode_steps_grammar_controls(
    params: Params, cfg, logits: jax.Array, cache: KVCache, k: int,
    rng: jax.Array, temps: jax.Array, top_ks: jax.Array, top_ps: jax.Array,
    bias: jax.Array, pres: jax.Array, freq: jax.Array, counts0: jax.Array,
    min_left: jax.Array, pool_costs: jax.Array, pool_next: jax.Array,
    sid2slot: jax.Array, slots0: jax.Array, remaining0: jax.Array,
    eos: int, adapter_idx=None, filter_topkp: bool = True, top_k: int = 0,
):
    """Grammar constraints AND count-dependent sampling controls in ONE
    device scan — the last decode class that used to leave the k-step
    loop (JSON mode + penalties, constrained rows with logit_bias...).
    Per step: adjusted = logits + bias - freq*counts - pres*[count>0]
    (EOS softly suppressed under min_tokens), then the budget-aware
    grammar mask, then the shared sample_rows draw (temp==0 rows argmax —
    all-greedy control batches ride the same graph), then the machine
    transition. Masking composes with the adjustments exactly as the host
    path's additive (logits + cmask + adj): the -inf mask excludes the
    same token set regardless of finite adjustments, and grammar forced
    closing still beats the soft (-1e9) EOS suppression. Counts are
    carried on device; freeze-garbage steps may pollute them, but callers
    rebuild counts from committed tokens each sync so nothing persists.
    Logprobs (``top_k`` > 0) report the BASE distribution. Returns
    (tokens, [logprob data,] logits, cache, invalid_at, frozen_logits,
    rng)."""
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
        tok_embeds = embed_tokens(params["lm"], nxt[:, None]).astype(
            cache.k.dtype)
        logits2, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds,
                                           cache, adapter_idx=adapter_idx)
        frozen_logits = jnp.where((invalid_at == step)[:, None],
                                  logits2, frozen_logits)
        carry = (logits2, cache, rng, counts, new_slot, remaining - 1,
                 invalid_at, frozen_logits)
        return carry, out

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
def _fix_frozen_rows(logits, cache, frozen_mask, frozen_logits, garbage):
    """Restore frozen rows after a grammar scan: logits from the last
    valid step, cache length rewound over the garbage tokens (dense cache
    writes land at ``length``, so the next steps overwrite them)."""
    logits = jnp.where(frozen_mask[:, None], frozen_logits, logits)
    length = cache.length - jnp.where(frozen_mask, garbage, 0)
    return logits, KVCache(k=cache.k, v=cache.v, length=length)


@dataclasses.dataclass
class Request:
    uid: Any
    batch: MultimodalBatch  # B=1
    max_new_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    # Sampling controls (OpenAI surface + common extensions). The device
    # k-step scans carry the generated-token counts, so control-carrying
    # requests stay in the device loop (with or without a grammar/choice
    # constraint). Semantics (vLLM-convention, documented in
    # docs/SERVING.md): adjusted = logits + logit_bias
    #   - presence_penalty * 1[count > 0] - frequency_penalty * count,
    # counts over GENERATED tokens only; EOS is suppressed (softly, so
    # grammar forced-closing still wins) while len(tokens) < min_tokens.
    logit_bias: Optional[Dict[int, float]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    min_tokens: int = 0
    # 0 = disabled; otherwise sample only among the top_k logits (applied
    # before top_p, both per-slot).
    top_k: int = 0
    # Paged engine only: id from PagedServingEngine.register_prefix. When
    # set, ``batch`` holds ONLY the suffix (e.g. the user question) — the
    # prompt prefix (system + media) comes from the shared cached pages.
    prefix_id: Any = None
    # Paged engine only: AUTOMATIC prefix caching. When set, ``batch``
    # again holds only the suffix; the engine content-hashes this batch
    # (serve/paged.batch_signature), reuses an already-cached prefix on a
    # hit, and registers it on a miss (LRU-evicted under capacity or page
    # pressure). Mutually exclusive with ``prefix_id``.
    prefix_batch: Any = None
    # Multi-LoRA serving (models/lm/mlora.py): name of the adapter this
    # request decodes with; None = base model. The engine must have been
    # built with the matching adapter registry.
    adapter: Optional[str] = None
    # Constrained decoding (serve/constrained.py): token-id sequences the
    # output must be one of (host CLIs tokenize strings into these).
    # Choice tries ride the device grammar scan when every constrained
    # slot shares one choice-set signature (the MC-eval shape); mixed
    # tables fall back to per-step host masks.
    choices: Optional[List[List[int]]] = None
    # Grammar-constrained decoding (serve/grammar.py): a pre-built
    # GrammarConstraint (the tokenizer lives host-side, so CLIs/HTTP build
    # it — e.g. json_constraint(tokenizer) for OpenAI response_format
    # json_object). Mutually exclusive with ``choices``.
    grammar: Any = None
    # Optional host-known prompt length (valid tokens in attention_mask).
    # Used ONLY for text-only batches, where the spliced length equals the
    # mask sum — it saves the one device->host sync per admission that
    # chunked prefill otherwise needs to size its chunk loop. Ignored for
    # rows with visual content (their spliced length is device-computed).
    prompt_len: Optional[int] = None
    # Per-token logprob extraction (OpenAI "logprobs"). When ``logprobs``
    # is set the engine records the chosen token's logprob per committed
    # token; ``top_logprobs`` (<= TOP_LOGPROBS_K) additionally records the
    # top alternatives. Logprobs are always reported under the BASE model
    # distribution (raw f32 log-softmax; see logprobs_of).
    logprobs: bool = False
    top_logprobs: int = 0
    # filled by the engine
    tokens: List[int] = dataclasses.field(default_factory=list)
    token_logprobs: List[float] = dataclasses.field(default_factory=list)
    # Per position: list of (token_id, logprob), length = top_logprobs.
    top_tokens: List[List[tuple]] = dataclasses.field(default_factory=list)
    done: bool = False
    # Set when the engine drops the request without decoding (e.g. the
    # paged engine rejects a prompt exceeding its per-sequence page
    # budget). A done request with error set produced no valid tokens.
    error: Optional[str] = None
    # Optional streaming hook: called with (request, token) as each token
    # is committed host-side (after every k-step sync at most).
    on_token: Any = None
    cancelled: bool = False
    # Engine-internal: convoy admission prefetch — (spliced, prompt_len)
    # staged by PagedServingEngine._prefetch_admissions, consumed and
    # cleared at admission.
    _spliced_cache: Any = None

    def __post_init__(self):
        if self.grammar is not None and self.choices:
            raise ValueError("'choices' and 'grammar' are mutually exclusive")
        if self.prefix_id is not None and self.prefix_batch is not None:
            raise ValueError(
                "'prefix_id' and 'prefix_batch' are mutually exclusive")

    @property
    def has_sampling_controls(self) -> bool:
        return bool(self.logit_bias or self.presence_penalty
                    or self.frequency_penalty
                    or len(self.tokens) < self.min_tokens)


def clone_request(req: Request) -> Request:
    """An independent sibling of an UNSTARTED request: shares the
    (read-only) multimodal batch — media decode cost paid once — with
    fresh per-request state (uid left for the caller, fresh grammar
    cursor over the same table, empty token buffers). The OpenAI n>1
    path forks choices this way; combine with :func:`share_prefill` to
    also share the admission splice+prefill."""
    from videollamb_tpu.serve.grammar import GrammarConstraint

    grammar = (GrammarConstraint(req.grammar.table)
               if req.grammar is not None else None)
    return Request(
        uid=None, batch=req.batch, max_new_tokens=req.max_new_tokens,
        temperature=req.temperature, top_p=req.top_p, top_k=req.top_k,
        logit_bias=dict(req.logit_bias) if req.logit_bias else None,
        presence_penalty=req.presence_penalty,
        frequency_penalty=req.frequency_penalty,
        min_tokens=req.min_tokens, prefix_id=req.prefix_id,
        # An already-resolved auto-prefix request carries both fields;
        # siblings share the resolved pid (post_init forbids carrying both).
        prefix_batch=req.prefix_batch if req.prefix_id is None else None,
        adapter=req.adapter,
        choices=[list(c) for c in req.choices] if req.choices else None,
        grammar=grammar, prompt_len=req.prompt_len,
        logprobs=req.logprobs, top_logprobs=req.top_logprobs)


def spliced_prompt_len_host(cfg: ModelConfig, batch: MultimodalBatch,
                            text_len: int) -> Optional[int]:
    """Exact post-splice prompt length, computed on the HOST, for the
    shapes serving admission actually sees — or None when the length is
    only knowable on device.

    ``text_len`` is the caller-asserted token count of the row
    (``attention_mask`` sum, media sentinel included). The splice replaces
    the one media sentinel with the bridge's visual tokens
    (models/splice.py:_splice_one). For a single IMAGE through an
    rmt-family projector the visual block is always tokens_per_frame
    valid tokens (models/bridge/builder.py image branches emit an
    all-ones mask over one pooled frame), so the spliced length is
    ``text_len - 1 + tokens_per_frame``.

    VIDEO rows return None: the rmt-family splice carries only the LAST
    SceneTilling segment's tokens (models/bridge/rmt_r.py: tokens =
    all_proj[-1], token_mask = seg_mask[-1]) and the last segment's valid
    frame count depends on where the learned boundaries fall — only the
    device knows. Engines batch those device syncs per admission convoy
    instead (PagedServingEngine._prefetch_admissions). Mixed blocks,
    anyres, batched rows, and non-rmt projector kinds also return None.
    Engines verify the formula against the device sum once per shape
    signature before trusting it (_resolve_prompt_len)."""
    b = batch
    if b.images is None or b.videos is not None or b.blocks is not None:
        return None
    if b.images.ndim != 4 or b.images.shape[0] != 1:
        return None
    br = cfg.bridge
    if br.kind not in ("rmt_transformer", "rmt_r_transformer"):
        return None
    return min(text_len - 1 + br.tokens_per_frame, cfg.max_length)


def share_prefill(reqs: List[Request]) -> None:
    """Mark sibling requests (same batch — see clone_request) to share
    ONE admission prefill: the first sibling admitted computes the
    splice + chunked prefill, the rest copy its cached single-row result
    into their slots (insert does not donate it). The shared cache is
    dropped once every sibling has consumed it (or was dropped/rejected
    at admission — see _shared_consume)."""
    shared = {"data": None, "left": len(reqs)}
    for r in reqs:
        r._shared_prefill = shared


def _shared_consume(req: Request) -> None:
    """One fork-group sibling is done with admission (prefilled, dropped,
    or rejected): release its claim so the shared single-row cache frees
    as soon as the last sibling passes through."""
    shared = getattr(req, "_shared_prefill", None)
    if shared is not None:
        shared["left"] -= 1
        if shared["left"] <= 0:
            shared["data"] = None


class ServingEngine:
    def __init__(
        self,
        params: Params,
        cfg: ModelConfig,
        *,
        num_slots: int = 4,
        max_seq_len: Optional[int] = None,
        eos_token_id: int = 2,
        seed: int = 0,
        adapter_registry: Optional[Dict[str, int]] = None,
        speculative: Optional[str] = None,
        spec_k: int = 8,
        draft_params: Optional[Params] = None,
        draft_cfg=None,
    ):
        # Batched speculation: all-greedy unconstrained batches verify up
        # to spec_k tokens per slot in ONE ragged cache-extend
        # (models/speculative.verify_chunks_batched).
        # - 'lookup': draft-free prompt-lookup proposals (host n-gram
        #   match; one host sync per round). Wins on prompt-parroting
        #   outputs; low-acceptance streams run at per-step-sync speed.
        # - 'draft': a draft LM proposes on device (same tokenizer AND
        #   hidden size — the multimodal splice embeds feed its prefill;
        #   e.g. a shallow same-width distillation or an int8 copy).
        #   The whole round is device-side except one fused readback.
        # Output is exactly the target's greedy chain in both modes.
        if speculative not in (None, "lookup", "draft"):
            raise ValueError(
                f"speculative={speculative!r}: 'lookup' or 'draft'")
        if speculative == "draft":
            if draft_params is None or draft_cfg is None:
                raise ValueError("speculative='draft' needs draft_params "
                                 "and draft_cfg")
            if draft_cfg.hidden_size != cfg.lm.hidden_size:
                raise ValueError(
                    "draft hidden_size must match the target's "
                    f"({draft_cfg.hidden_size} != {cfg.lm.hidden_size}): "
                    "the spliced prompt embeds feed the draft prefill")
            self.draft_lm = (draft_params["lm"] if "lm" in draft_params
                             else draft_params)
            self.draft_cfg = draft_cfg
        self.speculative = speculative
        self.spec_k = spec_k
        self.spec_rounds = 0
        self.spec_committed = 0
        self.params = params
        self.cfg = cfg
        self.num_slots = num_slots
        # Multi-LoRA: name -> index into the stacked adapter params
        # (models/lm/mlora.add_multi_lora_params). Per-slot indices ride
        # every decode step; -1 rows run the pure base model.
        self.adapter_registry = adapter_registry
        self.adapter_idx = (
            jnp.full((num_slots,), -1, jnp.int32)
            if adapter_registry is not None else None
        )
        # Host mirror: measured on-chip, the mlora einsums cost ~2.3
        # ms/step at 7B B=8 even when every row is gated off (-1), so the
        # engine passes adapter_idx=None — compiling the adapter-free
        # graph — whenever no ACTIVE slot carries an adapter.
        self._adapter_host = np.full((num_slots,), -1, np.int32)
        # Shape signatures whose host spliced-length formula has been
        # verified against the device sum (see _host_prompt_len).
        self._len_verified: set = set()
        self.max_seq_len = max_seq_len or (cfg.max_length + 512)
        self.eos = eos_token_id
        self.rng = jax.random.PRNGKey(seed)

        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self._dtype = dtype
        self.cache = init_kv_cache(cfg.lm, num_slots, self.max_seq_len, dtype)
        if speculative == "draft":
            self.draft_cache = init_kv_cache(self.draft_cfg, num_slots,
                                             self.max_seq_len, dtype)
        self.slots: List[Optional[Request]] = [None] * num_slots
        # Last logits per slot (B, V); inactive rows are garbage but masked.
        self.logits = jnp.zeros((num_slots, cfg.lm.vocab_size), jnp.float32)
        self.pending: "queue.Queue[Request]" = queue.Queue()
        # Requests dropped at admission (cancelled while pending, or
        # rejected). step() returns them with the finished list so callers
        # waiting on completion always get a signal.
        self._dropped: List[Request] = []

    # ------------------------------------------------------------------
    def _host_prompt_len(self, req: Request):
        """Host-known spliced prompt length for this request, if any.

        Returns None (device sum required), or ``(length, sig)`` where
        ``sig`` is None for exact-by-contract lengths (text-only rows:
        spliced length == mask sum) and a shape signature for formula
        lengths (simple video rows, spliced_prompt_len_host) that must be
        verified against the device sum once before being trusted. The
        per-admission device sync this removes is what serializes the
        admission pipeline under load (~30-100 ms each through the TPU
        tunnel — benchmarks/serving_load.py)."""
        if req.prompt_len is None:
            return None
        b = req.batch
        if b.videos is None and b.images is None and b.blocks is None:
            return int(req.prompt_len), None
        val = spliced_prompt_len_host(self.cfg, b, int(req.prompt_len))
        if val is None:
            return None
        return val, (tuple(b.images.shape), int(req.prompt_len))

    def _resolve_prompt_len(self, req: Request, spliced) -> int:
        """Spliced prompt length: host arithmetic when available and
        verified, the device mask sum otherwise (verifying the host
        formula for its signature as a side effect)."""
        hint = self._host_prompt_len(req)
        if hint is not None and (hint[1] is None
                                 or hint[1] in self._len_verified):
            return hint[0]
        prompt_len = int(np.asarray(jnp.sum(spliced.attention_mask)))
        if hint is not None:
            if hint[0] != prompt_len:
                raise RuntimeError(
                    f"host spliced-length formula gave {hint[0]} but the "
                    f"device splice produced {prompt_len} for signature "
                    f"{hint[1]}; the request's prompt_len must be the "
                    "row's attention-mask sum with exactly one media "
                    "sentinel")
            self._len_verified.add(hint[1])
        return prompt_len

    def submit(self, request: Request) -> None:
        self.pending.put(request)

    def _free_slot(self) -> Optional[int]:
        for i, r in enumerate(self.slots):
            if r is None:
                return i
        return None

    def _admit(self) -> None:
        while not self.pending.empty():
            slot = self._free_slot()
            if slot is None:
                return
            req = self.pending.get()
            if req.cancelled:
                req.done = True
                self._dropped.append(req)
                _shared_consume(req)
                continue
            if req.prefix_id is not None or req.prefix_batch is not None:
                # Silently decoding the suffix as a full prompt would be
                # wrong output, not degraded output — refuse loudly.
                req.error = ("prefix caching (prefix_id/prefix_batch) "
                             "requires the paged engine")
                req.done = True
                self._dropped.append(req)
                _shared_consume(req)
                continue
            if req.adapter is not None and (
                self.adapter_registry is None
                or req.adapter not in self.adapter_registry
            ):
                req.error = (
                    f"unknown adapter {req.adapter!r}"
                    if self.adapter_registry is not None
                    else "engine has no adapter registry"
                )
                req.done = True
                self._dropped.append(req)
                _shared_consume(req)
                continue
            aidx1 = None
            if self.adapter_idx is not None:
                val = (self.adapter_registry[req.adapter]
                       if req.adapter is not None else -1)
                if val >= 0:
                    aidx1 = jnp.asarray([val], jnp.int32)
                self.adapter_idx = self.adapter_idx.at[slot].set(val)
                self._adapter_host[slot] = val
            shared = getattr(req, "_shared_prefill", None)
            draft_single = None
            if shared is not None and shared["data"] is not None:
                # Fork group (share_prefill): a sibling already paid the
                # splice+prefill; copy its single-row cache into this slot.
                if self.speculative == "draft":
                    logits, single, draft_single = shared["data"]
                else:
                    logits, single = shared["data"]
            else:
                spliced = prepare_multimodal_embeds_fast(
                    self.params, self.cfg, req.batch, deterministic=True
                )
                single = init_kv_cache(self.cfg.lm, 1, self.cfg.max_length,
                                       self._dtype)
                # Chunked admission: one compiled extend shape for the
                # whole engine lifetime, prefill compute proportional to
                # the ACTUAL prompt length, not the padded splice buffer.
                # The host-known length (text rows by contract, simple
                # video rows by the verified-once splice formula) saves
                # the per-admission device sync.
                host_len = None
                hint = self._host_prompt_len(req)
                if hint is not None and (hint[1] is None
                                         or hint[1] in self._len_verified):
                    host_len = hint[0]
                elif hint is not None:
                    host_len = self._resolve_prompt_len(req, spliced)
                logits, single = chunked_prefill(
                    self.params["lm"], self.cfg.lm,
                    spliced.embeds.astype(self._dtype),
                    spliced.attention_mask, single,
                    lengths=host_len,
                    adapter_idx=aidx1,
                )
                if self.speculative == "draft":
                    # The draft tracks the same context from the same
                    # spliced embeds (hidden sizes match by construction).
                    dsingle = init_kv_cache(self.draft_cfg, 1,
                                            self.cfg.max_length, self._dtype)
                    _, draft_single = chunked_prefill(
                        self.draft_lm, self.draft_cfg,
                        spliced.embeds.astype(self._dtype),
                        spliced.attention_mask, dsingle,
                        lengths=host_len,
                    )
                if shared is not None:
                    shared["data"] = ((logits, single, draft_single)
                                      if self.speculative == "draft"
                                      else (logits, single))
            _shared_consume(req)
            self.cache = insert_into_cache(self.cache, single, jnp.asarray(slot))
            if self.speculative == "draft":
                self.draft_cache = insert_into_cache(
                    self.draft_cache, draft_single, jnp.asarray(slot))
            self.logits = self.logits.at[slot].set(logits[0])
            self._install_constraint(req)
            self.slots[slot] = req
            # Admission rewrote a logits row: the speculation path's
            # carried next-argmax is stale; recompute next round.
            self._spec_nxt0 = None

    def set_adapters(self, params: Params, registry) -> None:
        """Hot-swap the multi-LoRA stack (load/unload at runtime).

        Callers must serialize with step() — the HTTP server applies it
        on the engine worker thread between steps, and only while no
        ACTIVE slot carries an adapter (in-flight adapter requests pin
        the old index space). The next adapter-carrying step compiles
        fresh graphs for the new K."""
        if (self._adapter_host >= 0).any():
            raise RuntimeError("adapter requests in flight; retry when drained")
        self.params = params
        self.adapter_registry = registry
        if registry is not None:
            if self.adapter_idx is None:
                self.adapter_idx = jnp.full((self.num_slots,), -1, jnp.int32)
        else:
            self.adapter_idx = None

    def _install_constraint(self, req: Request) -> None:
        """Install the decode constraint, if any: a pre-built grammar
        cursor (serve/grammar.py — budget extended to its minimal
        completion so forced closing always has room), or the choice-set
        trie (serve/constrained.py — budget extended to the longest
        choice so no row is cut off mid-choice with a partial string)."""
        if req.grammar is not None:
            req._constraint = req.grammar
            req.max_new_tokens = max(
                req.max_new_tokens, getattr(req.grammar, "min_tokens", 1))
            return
        if not req.choices:
            return
        from videollamb_tpu.serve.constrained import (
            ChoiceConstraint,
            ChoiceTable,
            TokenTrie,
        )

        # Choice tables are cached per choice-set SIGNATURE: a batch of
        # same-choice requests (the constrained MC-eval shape — every row
        # offers the same option letters) then shares ONE table and rides
        # the device grammar scan instead of per-step host masks.
        table = None
        trie = None
        if self.eos is not None and self.eos >= 0:
            sig = tuple(tuple(int(t) for t in c) for c in req.choices)
            cache = getattr(self, "_choice_tables", None)
            if cache is None:
                cache = self._choice_tables = {}
            table = cache.get(sig)
            if table is None:
                if len(cache) >= 256:  # bound the per-engine table cache
                    cache.clear()
                table = cache[sig] = ChoiceTable(TokenTrie(req.choices),
                                                 self.eos)
            trie = table.trie
        if trie is None:
            trie = TokenTrie(req.choices)
        req._constraint = ChoiceConstraint(trie, eos_token_id=self.eos,
                                           table=table)
        req.max_new_tokens = max(req.max_new_tokens, trie.max_len)

    def _live_adapter_idx(self):
        """The device index vector iff any active slot has an adapter;
        None otherwise (adapter-free graph — zero mlora cost)."""
        if self.adapter_idx is None or not (self._adapter_host >= 0).any():
            return None
        return self.adapter_idx

    def _active_mask(self) -> np.ndarray:
        return np.asarray([r is not None for r in self.slots])

    def _wants_logprobs(self) -> bool:
        """True iff any active slot asked for logprob extraction — the
        hot path compiles the logprob-free graphs otherwise (same gating
        discipline as the multi-LoRA adapter_idx)."""
        return any(r is not None and r.logprobs for r in self.slots)

    @staticmethod
    def _commit_logprob(req, chosen, top_vals, top_ids) -> None:
        """Record one committed token's logprob data on the request.
        ``chosen`` scalar; ``top_vals``/``top_ids``: (TOP_LOGPROBS_K,)."""
        req.token_logprobs.append(float(chosen))
        if req.top_logprobs > 0:
            n = min(req.top_logprobs, len(top_ids))
            req.top_tokens.append(
                [(int(top_ids[j]), float(top_vals[j])) for j in range(n)])

    def has_work(self) -> bool:
        """True iff a step() could make progress (shared by the HTTP
        worker loop and the load generator)."""
        return any(r is not None for r in self.slots) or not self.pending.empty()

    def _drain_dropped(self) -> List[Request]:
        dropped, self._dropped = self._dropped, []
        return dropped

    def _commit_k_tokens(self, toks_host: np.ndarray, lp_host, k: int,
                         finished: List[Request]) -> List[Request]:
        """Commit the host-side bookkeeping for one k-step device scan:
        append each slot's tokens up to EOS/budget, record logprobs, fire
        streaming hooks, release finished slots. Shared by the greedy and
        sampled k-step paths of both engines."""
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            if req.cancelled:
                req.done = True
                finished.append(req)
                self._release(i)
                continue
            for t in range(k):
                tok = int(toks_host[i, t])
                req.tokens.append(tok)
                if lp_host is not None and req.logprobs:
                    self._commit_logprob(req, lp_host[0][i, t],
                                         lp_host[1][i, t], lp_host[2][i, t])
                if req.on_token is not None:
                    req.on_token(req, tok)
                if tok == self.eos or len(req.tokens) >= req.max_new_tokens:
                    req.done = True
                    finished.append(req)
                    self._release(i)
                    break
        return finished

    @staticmethod
    def _needs_filter(vecs) -> bool:
        """Static fast-path switch: False iff every row is pure temperature
        sampling (no top_k / top_p), which skips the full-vocab sort in
        sample_rows — same tokens either way for such batches."""
        _, top_ks, top_ps = vecs
        return bool((top_ks > 0).any() or (top_ps < 1.0).any())

    def _sampled_scan(self, k: int, vecs, top_k: int):
        """Run the on-device sampled k-step scan, updating logits/cache/rng.
        Overridden by the paged engine (paged cache + host_len mirror)."""
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        fil = self._needs_filter(vecs)
        if top_k:
            toks, lp, self.logits, self.cache, self.rng = sampled_decode_steps(
                self.params, self.cfg, self.logits, self.cache, k, self.rng,
                temps, top_ks, top_ps, adapter_idx=self._live_adapter_idx(),
                top_k=top_k, filter_topkp=fil)
            return toks, lp
        toks, self.logits, self.cache, self.rng = sampled_decode_steps(
            self.params, self.cfg, self.logits, self.cache, k, self.rng,
            temps, top_ks, top_ps, adapter_idx=self._live_adapter_idx(),
            filter_topkp=fil)
        return toks, None

    def _sampled_scan_controls(self, k: int, vecs, ctrl, top_k: int):
        """Controls-aware twin of _sampled_scan (counts carried on device).
        Overridden by the paged engine."""
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        bias, pres, freq, counts0, min_left = (jnp.asarray(c) for c in ctrl)
        fil = self._needs_filter(vecs)
        args = (self.params, self.cfg, self.logits, self.cache, k, self.rng,
                temps, top_ks, top_ps, bias, pres, freq, counts0, min_left)
        kw = dict(eos=self.eos if self.eos is not None else -1,
                  adapter_idx=self._live_adapter_idx(), filter_topkp=fil)
        if top_k:
            toks, lp, self.logits, self.cache, self.rng = (
                sampled_decode_steps_controls(*args, top_k=top_k, **kw))
            return toks, lp
        toks, self.logits, self.cache, self.rng = (
            sampled_decode_steps_controls(*args, **kw))
        return toks, None

    def _step_device_sampled(self, k: int, dropped,
                             with_controls: bool = False) -> List[Request]:
        """k sampled decode steps fully on device (mixed greedy/sampled
        batches, no choice/grammar constraints in flight; count-dependent
        sampling controls ride the controls scan, which carries the
        generated-token counts on device). Bit-identical tokens to k
        host-synced steps from the same rng."""
        vecs = slot_sampling_vectors(self.slots)
        top_k = TOP_LOGPROBS_K if self._wants_logprobs() else 0
        if with_controls:
            ctrl = build_control_tensors(self.slots, self.cfg.lm.vocab_size)
            toks, lp = self._sampled_scan_controls(k, vecs, ctrl, top_k)
        else:
            toks, lp = self._sampled_scan(k, vecs, top_k)
        lp_host = (tuple(np.asarray(a) for a in lp) if lp is not None
                   else None)
        return self._commit_k_tokens(np.asarray(toks), lp_host, k, dropped)

    def _release(self, slot: int) -> None:
        """Free a slot (hook: the paged engine also returns its pages)."""
        self.slots[slot] = None
        if self.adapter_idx is not None and self._adapter_host[slot] >= 0:
            self._adapter_host[slot] = -1
            self.adapter_idx = self.adapter_idx.at[slot].set(-1)

    def _spec_context(self, req: Request) -> List[int]:
        """Host-side token context for prompt-lookup proposals: the VALID
        text prompt ids (media sentinels included — they never collide
        with generated ids) plus everything generated so far. Right
        bucket-padding is sliced off by the attention mask: a tail n-gram
        matching near the end of the prompt — exactly the parroting
        regime speculation targets — must propose the real continuation,
        not pad zeros."""
        ctx = getattr(req, "_spec_prompt_ids", None)
        if ctx is None:
            n_valid = int(np.asarray(req.batch.attention_mask[0]).sum())
            ids = np.asarray(req.batch.input_ids[0])[:n_valid]
            ctx = [int(t) for t in ids]
            req._spec_prompt_ids = ctx
        return ctx + req.tokens

    def _step_speculative(self, dropped) -> List[Request]:
        """One speculation round: propose up to spec_k-1 continuations per
        slot (prompt lookup on host, or the draft model on device), verify
        all slots in ONE ragged cache-extend, commit each row's accepted
        prefix. Token-identical to plain greedy (acceptance keeps only
        argmax-matching tokens)."""
        from videollamb_tpu.models.speculative import (
            _argmax_rows,
            draft_propose_batched,
            propose_lookup,
            roll_draft_cache,
            verify_chunks_batched,
        )

        b, kk = self.num_slots, self.spec_k
        if self.speculative == "draft":
            # Whole round on device: draft scan -> verify -> one fused
            # readback. Chunk row 0 is each row's committed-next token
            # (the draft scan embeds it first and emits it back).
            chunks_dev, self.draft_cache = draft_propose_batched(
                self.draft_lm, self.draft_cfg, _argmax_rows(self.logits),
                self.draft_cache, kk)
            mask = np.zeros((b, kk), np.int32)
            for i, r in enumerate(self.slots):
                if r is not None:
                    room = max(1, min(kk, r.max_new_tokens - len(r.tokens)))
                    mask[i, :room] = 1
            accepted, self.logits, next_argmax, self.cache = (
                verify_chunks_batched(
                    self.params, self.cfg, chunks_dev, jnp.asarray(mask),
                    self.cache, adapter_idx=self._live_adapter_idx()))
            self.draft_cache = roll_draft_cache(self.draft_cache, accepted,
                                                kk)
            acc_host, self._spec_nxt0, chunks = jax.device_get(
                (accepted, next_argmax, chunks_dev))
            self.spec_rounds += 1
            return self._spec_commit(chunks, acc_host, dropped)

        # One host sync per round: nxt0 rides the PREVIOUS verify's
        # readback (next_argmax). Recompute only when admissions changed
        # the logits rows (self._spec_nxt0 invalidated in _admit).
        nxt0 = getattr(self, "_spec_nxt0", None)
        if nxt0 is None:
            nxt0 = np.asarray(_argmax_rows(self.logits))  # (B,) readback
        chunks = np.zeros((b, kk), np.int32)
        mask = np.zeros((b, kk), np.int32)
        for i, r in enumerate(self.slots):
            if r is None:
                continue
            chunks[i, 0] = nxt0[i]
            mask[i, 0] = 1
            room = min(kk - 1, r.max_new_tokens - len(r.tokens) - 1)
            if room > 0 and nxt0[i] != self.eos:
                prop = propose_lookup(
                    self._spec_context(r) + [int(nxt0[i])], k=room)
                for j, t in enumerate(prop):
                    chunks[i, j + 1] = t
                    mask[i, j + 1] = 1
        accepted, self.logits, next_argmax, self.cache = verify_chunks_batched(
            self.params, self.cfg, jnp.asarray(chunks), jnp.asarray(mask),
            self.cache, adapter_idx=self._live_adapter_idx())
        acc_host, self._spec_nxt0 = jax.device_get((accepted, next_argmax))
        self.spec_rounds += 1
        return self._spec_commit(chunks, acc_host, dropped)

    def _spec_commit(self, chunks, acc_host, dropped) -> List[Request]:
        finished: List[Request] = dropped
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            if req.cancelled:
                req.done = True
                finished.append(req)
                self._release(i)
                continue
            for t in range(int(acc_host[i])):
                tok = int(chunks[i, t])
                req.tokens.append(tok)
                # Count only tokens actually DELIVERED (device acceptance
                # past an EOS/budget break would overstate the stats).
                self.spec_committed += 1
                if req.on_token is not None:
                    req.on_token(req, tok)
                if tok == self.eos or len(req.tokens) >= req.max_new_tokens:
                    req.done = True
                    finished.append(req)
                    self._release(i)
                    break
        return finished

    def step(self, k: int = 1) -> List[Request]:
        """Admit pending requests, advance every active slot by up to ``k``
        tokens (multi-step only when all active slots are greedy). Returns
        requests completed this step."""
        self._admit()
        dropped = self._drain_dropped()
        if not any(self._active_mask()):
            return dropped

        all_greedy = all(
            (r is None or r.temperature == 0.0) for r in self.slots
        )
        unconstrained = all(
            getattr(r, "_constraint", None) is None for r in self.slots
        )
        # Sampling controls depend on per-token generated counts -> the
        # per-step path (same gating discipline as logprobs/adapters: the
        # control-free hot path compiles no extra graphs).
        no_controls = all(
            (r is None or not r.has_sampling_controls) for r in self.slots
        )
        if (self.speculative in ("lookup", "draft") and all_greedy
                and unconstrained and no_controls
                and not self._wants_logprobs()):
            return self._step_speculative(dropped)
        # Any non-speculative path rewrites logits rows -> the carried
        # next-argmax (spec path) is stale.
        self._spec_nxt0 = None
        if k > 1 and all_greedy and unconstrained and no_controls:
            lp_host = None
            if self._wants_logprobs():
                toks, lp, self.logits, self.cache = greedy_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    adapter_idx=self._live_adapter_idx(), top_k=TOP_LOGPROBS_K,
                )
                lp_host = tuple(np.asarray(a) for a in lp)
            else:
                toks, self.logits, self.cache = greedy_decode_steps(
                    self.params, self.cfg, self.logits, self.cache, k,
                    adapter_idx=self._live_adapter_idx(),
                )
            return self._commit_k_tokens(np.asarray(toks), lp_host, k, dropped)

        if k > 1:
            # Constrained rows can stay in the device loop: state tables
            # (JSON grammars AND choice-set tries) live in HBM
            # (serve/device_grammar.py) and the scan masks/transitions by
            # state slot — no per-token host sync. Sampled batches route
            # through the sampled grammar scan (guaranteed-valid JSON with
            # temperature, still on device); count-dependent sampling
            # controls ride the combined grammar+controls scan; logprob
            # extraction rides any of them (base distribution).
            setup = self._grammar_device_setup()
            if setup is not None:
                return self._step_device_grammar(
                    k, setup, dropped,
                    sampled=not all_greedy or not no_controls,
                    with_controls=not no_controls)

        if k > 1 and unconstrained:
            # Sampled (or mixed greedy/sampled) batches stay in the device
            # loop too: the k-step scan carries the rng and draws with the
            # same sample_rows core per step, so leaving the host sync out
            # changes nothing but speed (measured 166 -> 492 tok/s at
            # int8 7B batch-8; docs/PERFORMANCE.md). Count-dependent
            # sampling controls ride the controls scan (counts on device).
            return self._step_device_sampled(k, dropped,
                                             with_controls=not no_controls)

        self.rng, sub = jax.random.split(self.rng)
        from videollamb_tpu.serve.constrained import build_constraint_masks

        cmask = build_constraint_masks(self.slots, self.cfg.lm.vocab_size)
        adj = build_control_adjustments(self.slots, self.cfg.lm.vocab_size,
                                        self.eos)
        logits = self.logits
        if cmask is not None:
            logits = logits + jnp.asarray(cmask)
        if adj is not None:
            logits = logits + jnp.asarray(adj)
        nxt = sample_slot_tokens(logits, sub, self.slots)
        # Logprobs come from the RAW pre-mask logits (base distribution),
        # extracted before self.logits is overwritten by the next step.
        lp = (logprobs_of(self.logits, nxt) if self._wants_logprobs()
              else None)

        tok_embeds = embed_tokens(self.params["lm"], nxt[:, None]).astype(self._dtype)
        self.logits, self.cache = llama_decode_step(
            self.params["lm"], self.cfg.lm, tok_embeds, self.cache,
            adapter_idx=self._live_adapter_idx(),
        )

        lp_host = (tuple(np.asarray(a) for a in lp) if lp is not None
                   else None)
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

    def _grammar_device_setup(self):
        """(device table, slots0, remaining0) when every constrained slot
        rides a device-resident table — a GrammarConstraint's grammar
        table or a ChoiceConstraint's choice trie (both speak the
        serve/device_grammar protocol) — and the HBM pools have room;
        None -> the per-step host-mask path. A batch mixing DIFFERENT
        tables (JSON mode + a choice set in flight together) rides a
        CombinedDeviceTable: per-table pools rebased into one global
        slot/sid space, so the scans run unchanged (VERDICT r4 #5).
        Unconstrained rows ride the reserved FREE slot 0."""
        from videollamb_tpu.serve.device_grammar import (
            FREE_REMAINING,
            combined_table_for,
            device_table_for,
        )

        tables = []  # distinct, ordered by first appearance
        for r in self.slots:
            c = getattr(r, "_constraint", None) if r is not None else None
            if c is None:
                continue
            if getattr(c, "table", None) is None or c.node is None:
                return None
            if all(c.table is not t for t in tables):
                tables.append(c.table)
        if not tables:
            return None
        dts = [device_table_for(t, self.cfg.lm.vocab_size) for t in tables]
        # Upload every constrained slot's current state FIRST (mutates the
        # member pools), then combine — refresh() folds the uploads in.
        local = {}
        for i, r in enumerate(self.slots):
            c = getattr(r, "_constraint", None) if r is not None else None
            if c is None:
                continue
            ti = next(j for j, t in enumerate(tables) if t is c.table)
            s = dts[ti].slot(c.node)
            if s is None:
                return None  # pool capacity exhausted
            local[i] = (ti, s)
        if len(dts) == 1:
            dt, slot_base = dts[0], (0,)
        else:
            dt = combined_table_for(dts)
            slot_base = dt.slot_base
        slots0 = np.zeros((self.num_slots,), np.int32)
        remaining0 = np.full((self.num_slots,), FREE_REMAINING, np.int32)
        for i, (ti, s) in local.items():
            slots0[i] = int(slot_base[ti]) + s
            r = self.slots[i]
            remaining0[i] = max(1, r.max_new_tokens - len(r.tokens))
        return dt, slots0, remaining0

    def _grammar_scan(self, k: int, dt, slots0, remaining0, top_k: int = 0):
        """Run the on-device constrained scan, updating logits/cache.
        Overridden by the paged engine (paged cache + host_len mirror)."""
        args = (self.params, self.cfg, self.logits, self.cache, k,
                dt.costs, dt.next_sid, dt.sid2slot,
                jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(adapter_idx=self._live_adapter_idx())
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at,
             frozen_logits) = greedy_decode_steps_grammar(
                *args, top_k=top_k, **kw)
            return toks, lp, invalid_at, frozen_logits
        toks, self.logits, self.cache, invalid_at, frozen_logits = (
            greedy_decode_steps_grammar(*args, **kw))
        return toks, None, invalid_at, frozen_logits

    def _grammar_scan_sampled(self, k: int, dt, slots0, remaining0,
                              top_k: int = 0):
        """Sampled twin of _grammar_scan (grammar mask + sample_rows in
        one device scan). Overridden by the paged engine."""
        vecs = slot_sampling_vectors(self.slots)
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        args = (self.params, self.cfg, self.logits, self.cache, k, self.rng,
                temps, top_ks, top_ps, dt.costs, dt.next_sid, dt.sid2slot,
                jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(adapter_idx=self._live_adapter_idx(),
                  filter_topkp=self._needs_filter(vecs))
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = sampled_decode_steps_grammar(
                *args, top_k=top_k, **kw)
            return toks, lp, invalid_at, frozen_logits
        (toks, self.logits, self.cache, invalid_at, frozen_logits,
         self.rng) = sampled_decode_steps_grammar(*args, **kw)
        return toks, None, invalid_at, frozen_logits

    def _grammar_scan_controls(self, k: int, dt, slots0, remaining0,
                               top_k: int = 0):
        """Grammar + sampling-controls twin of _grammar_scan (counts AND
        grammar state carried on device). Overridden by the paged engine."""
        vecs = slot_sampling_vectors(self.slots)
        temps, top_ks, top_ps = (jnp.asarray(v) for v in vecs)
        ctrl = build_control_tensors(self.slots, self.cfg.lm.vocab_size)
        bias, pres, freq, counts0, min_left = (jnp.asarray(c) for c in ctrl)
        args = (self.params, self.cfg, self.logits, self.cache, k, self.rng,
                temps, top_ks, top_ps, bias, pres, freq, counts0, min_left,
                dt.costs, dt.next_sid, dt.sid2slot,
                jnp.asarray(slots0), jnp.asarray(remaining0))
        kw = dict(eos=self.eos if self.eos is not None else -1,
                  adapter_idx=self._live_adapter_idx(),
                  filter_topkp=self._needs_filter(vecs))
        if top_k:
            (toks, lp, self.logits, self.cache, invalid_at, frozen_logits,
             self.rng) = sampled_decode_steps_grammar_controls(
                *args, top_k=top_k, **kw)
            return toks, lp, invalid_at, frozen_logits
        (toks, self.logits, self.cache, invalid_at, frozen_logits,
         self.rng) = sampled_decode_steps_grammar_controls(*args, **kw)
        return toks, None, invalid_at, frozen_logits

    def _grammar_fix(self, frozen: np.ndarray, frozen_logits,
                     garbage: np.ndarray) -> None:
        """Repair frozen rows post-scan (logits restore + length rewind)."""
        self.logits, self.cache = _fix_frozen_rows(
            self.logits, self.cache, jnp.asarray(frozen), frozen_logits,
            jnp.asarray(garbage))

    def _step_device_grammar(self, k: int, setup, dropped,
                             sampled: bool = False,
                             with_controls: bool = False) -> List[Request]:
        """k-step decode with on-device grammar enforcement; commits the
        valid prefixes, then repairs rows that froze on a first-visit
        state (logits restore + cache-length rewind — see
        greedy_decode_steps_grammar). ``sampled`` routes through the
        sampled scan (grammar mask + sample_rows per step);
        ``with_controls`` through the combined grammar+controls scan."""
        dt, slots0, remaining0 = setup
        if with_controls:
            scan = self._grammar_scan_controls
        elif sampled:
            scan = self._grammar_scan_sampled
        else:
            scan = self._grammar_scan
        top_k = TOP_LOGPROBS_K if self._wants_logprobs() else 0
        toks, lp, invalid_at, frozen_logits = scan(k, dt, slots0, remaining0,
                                                   top_k)
        toks_host = np.asarray(toks)
        lp_host = (tuple(np.asarray(a) for a in lp) if lp is not None
                   else None)
        invalid_host = np.asarray(invalid_at)
        finished: List[Request] = dropped
        frozen = np.zeros((self.num_slots,), bool)
        for i, req in enumerate(self.slots):
            if req is None:
                continue
            if req.cancelled:
                req.done = True
                finished.append(req)
                self._release(i)
                continue
            con = getattr(req, "_constraint", None)
            valid = k if con is None else min(k, int(invalid_host[i]) + 1)
            done_row = False
            for t in range(valid):
                tok = int(toks_host[i, t])
                req.tokens.append(tok)
                if lp_host is not None and req.logprobs:
                    self._commit_logprob(req, lp_host[0][i, t],
                                         lp_host[1][i, t], lp_host[2][i, t])
                if req.on_token is not None:
                    req.on_token(req, tok)
                if con is not None:
                    con.advance(tok)  # interns the next state for upload
                if (tok == self.eos or len(req.tokens) >= req.max_new_tokens
                        or (con is not None and con.finished)):
                    req.done = True
                    finished.append(req)
                    self._release(i)
                    done_row = True
                    break
            if not done_row and con is not None and invalid_host[i] < k:
                frozen[i] = True
        if frozen.any():
            garbage = np.where(frozen, k - 1 - invalid_host, 0).astype(np.int32)
            self._grammar_fix(frozen, frozen_logits, garbage)
        return finished

    def cancel(self, uid) -> bool:
        """Cancel a pending or running request by uid: pending requests are
        dropped at admission, running ones release their slot (and pages,
        in the paged engine) at the next step boundary."""
        hit = False
        for r in list(self.pending.queue):
            if r.uid == uid:
                r.cancelled = True
                hit = True
        for r in self.slots:
            if r is not None and r.uid == uid:
                r.cancelled = True
                hit = True
        return hit

    def run_until_drained(self, max_steps: int = 100000, k: int = 1) -> List[Request]:
        """Drive until the queue and all slots are empty."""
        done: List[Request] = []
        for _ in range(max_steps):
            done += self.step(k)
            # has_work, not just pending+active: the paged engine may hold
            # swapped-out (preempted) requests that need future steps.
            if not self.has_work():
                break
        return done
