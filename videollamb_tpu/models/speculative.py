"""Prompt-lookup speculative decoding.

A draft-model-free accelerator for greedy decode (beyond the reference,
which has no speculative path): candidate continuations are proposed by
matching the last n-gram of the context against earlier context
(prompt-lookup decoding, Saxon et al. / transformers'
prompt_lookup_num_tokens) and verified in ONE cache-extend forward.

Why it fits this stack:
- verification reuses ``llama_extend`` (models/lm/llama.py): the chunk is
  written into the running KV cache at its true positions, and a rejected
  suffix is "rolled back" by only shrinking ``cache.length`` — stale slots
  past the length are never attended and are overwritten in place by the
  next write before they ever could be (same invariant llama_extend
  already relies on for right-padding);
- a verify step is weight-bandwidth-bound like a single decode step
  (reading 7B weights dominates; the extra k tokens of FLOPs are noise on
  the MXU), so throughput multiplies by roughly the mean accepted length;
- output is EXACTLY the greedy chain — acceptance only keeps tokens whose
  argmax matches, so this is a pure latency optimization.

Video QA/captioning answers repeat prompt phrases heavily, which is the
regime where prompt lookup shines.

Caveats (measured on v5e, 7B random weights):
- acceptance needs genuinely repetitive OUTPUT; on random weights the
  mean accepted length is ~1.0, where speculation is cost-neutral (its
  k-wide verify step is weight-bandwidth-bound like one decode step);
- "identical to greedy" is exact in f32 (tests assert it token for
  token, including after rollbacks); in bf16 the S=1 and S=k matmul
  shapes can round argmax TIES differently, so chains may diverge at
  near-tie positions — the standard caveat for batched-verify
  speculative decoding on low-precision hardware.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import (
    KVCache,
    embed_tokens,
    llama_decode_step,
    llama_extend,
)

Params = Dict[str, Any]


def propose_lookup(
    context: List[int], ngram: int = 3, k: int = 8
) -> List[int]:
    """Longest-recency prompt-lookup proposal: find the most recent earlier
    occurrence of the final ``ngram`` tokens and return up to ``k`` tokens
    that followed it. Falls back to shorter n-grams; [] if nothing hits."""
    for n in range(ngram, 0, -1):
        if len(context) <= n:
            continue
        tail = context[-n:]
        # Search right-to-left, excluding the tail occurrence itself.
        for start in range(len(context) - n - 1, -1, -1):
            if context[start: start + n] == tail:
                cont = context[start + n: start + n + k]
                if cont:
                    return cont
                break
    return []


@jax.jit
def _argmax_rows(logits: jax.Array) -> jax.Array:
    return jnp.argmax(logits, -1).astype(jnp.int32)


def verify_chunks_batched(
    params: Params,
    cfg,  # ModelConfig (engine-level: cfg.lm is the LlamaConfig)
    chunks: jax.Array,  # (B, k) int32; [:, 0] = each row's committed-next token
    chunk_mask: jax.Array,  # (B, k) 1 = real token (0-padded proposals)
    cache: KVCache,
    adapter_idx: Optional[jax.Array] = None,
):
    """BATCHED greedy verification for the continuous-batching engine:
    one ragged cache-extend writes every slot's chunk at its own length
    (llama_extend takes per-row start positions), the longest
    argmax-matching prefix per row is accepted on device, and lengths
    roll back to start + accepted — stale slots past the length are
    never attended and are overwritten in place before they could be
    (the same invariant the B=1 path relies on).

    Returns (accepted (B,), next_logits (B, V), next_argmax (B,), cache):
    ``accepted`` in [0, k] (0 only for all-padding rows, i.e. inactive
    slots, whose length is untouched); ``next_logits`` predicts the
    position after each row's last accepted token, and ``next_argmax`` is
    its argmax — returned so the NEXT round's chunk[:, 0] rides the same
    host sync (one round-trip per round, not two; the tunnel RTT is the
    dominant round cost).
    """
    return _verify_chunks_jit(params, cfg, chunks, chunk_mask, cache,
                              adapter_idx)


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def _verify_chunks_jit(params, cfg, chunks, chunk_mask, cache, adapter_idx):
    start = cache.length
    embeds = embed_tokens(params["lm"], chunks).astype(cache.k.dtype)
    all_logits, cache = llama_extend(
        params["lm"], cfg.lm, embeds, chunk_mask, cache, return_all=True,
        adapter_idx=adapter_idx,
    )
    greedy = jnp.argmax(all_logits, -1).astype(jnp.int32)  # (B, k)
    valid = chunk_mask.astype(bool)
    # chunk[:, 0] is already committed-next (it WAS the greedy token);
    # position i's greedy output verifies chunk[:, i + 1].
    match = jnp.concatenate(
        [valid[:, :1], (chunks[:, 1:] == greedy[:, :-1]) & valid[:, 1:]],
        axis=1)
    accepted = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)
    cache = KVCache(k=cache.k, v=cache.v,
                    length=start + accepted.astype(start.dtype))
    b = chunks.shape[0]
    rows = jnp.arange(b)
    acc_pos = jnp.maximum(accepted - 1, 0)
    next_logits = all_logits[rows, acc_pos]
    next_argmax = greedy[rows, acc_pos]
    return accepted, next_logits.astype(jnp.float32), next_argmax, cache


@partial(jax.jit, static_argnames=("cfg", "k"),
         donate_argnames=("draft_cache",))
def draft_propose_batched(
    params: Params,
    cfg,  # the DRAFT LlamaConfig
    nxt0: jax.Array,  # (B,) each row's committed-next token
    draft_cache: KVCache,
    k: int,
):
    """Batched draft phase for engine speculation: k greedy decode steps
    on the draft model, emitting the token WRITTEN at each step — so the
    emitted (B, k) matrix is [nxt0, p0, ..., p_{k-2}], exactly the chunk
    layout verify_chunks_batched expects, and the draft cache ends
    holding K/V for every chunk position. After the verify, roll the
    draft cache with roll_draft_cache(acc, k): accepted positions hold
    the right K/V already (acceptance means the draft proposed them),
    the correction token arrives as next round's nxt0."""

    def body(carry, _):
        tok, cache = carry
        emb = embed_tokens(params, tok[:, None]).astype(cache.k.dtype)
        logits, cache = llama_decode_step(params, cfg, emb, cache)
        return (jnp.argmax(logits, -1).astype(jnp.int32), cache), tok

    (_, draft_cache), written = jax.lax.scan(
        body, (nxt0.astype(jnp.int32), draft_cache), None, length=k)
    return written.T, draft_cache  # (B, k)


@partial(jax.jit, static_argnames=("k",), donate_argnames=("draft_cache",))
def roll_draft_cache(draft_cache: KVCache, accepted: jax.Array,
                     k: int) -> KVCache:
    """Roll the draft cache back over rejected proposals: the propose
    scan advanced every row by k; keep start + accepted (inactive rows
    have accepted == 0, netting their length unchanged)."""
    length = draft_cache.length - k + accepted.astype(draft_cache.length.dtype)
    return KVCache(k=draft_cache.k, v=draft_cache.v, length=length)


def _verify_chunk(
    lm: Params,
    cfg: LlamaConfig,
    cache: KVCache,
    chunk: List[int],
    k: int,
    done,
) -> Tuple[List[int], KVCache, jax.Array, int]:
    """One cache-extend verify pass: write ``chunk`` (padded to k) into the
    target cache, accept the longest greedy-matching prefix. Returns
    (accepted, cache, all_logits, start_len) — the caller handles rollback
    semantics (shrink ``cache.length``; stale slots are overwritten in
    place before they can ever be attended)."""
    ids = np.zeros((1, k), np.int32)
    ids[0, : len(chunk)] = chunk
    mask = np.zeros((1, k), np.int32)
    mask[0, : len(chunk)] = 1
    # Snapshot to host: llama_extend donates the cache, which deletes the
    # device buffer `cache.length` refers to.
    start_len = int(cache.length[0])
    all_logits, cache = llama_extend(
        lm, cfg, embed_tokens(lm, jnp.asarray(ids)), jnp.asarray(mask),
        cache, return_all=True,
    )
    greedy = np.asarray(jnp.argmax(all_logits[0, : len(chunk)], axis=-1))
    # chunk[0] is already verified (it WAS the greedy token); position i
    # verifies chunk[i+1].
    accepted = [chunk[0]]
    for i in range(1, len(chunk)):
        if done(accepted[-1]) or greedy[i - 1] != chunk[i]:
            break
        accepted.append(chunk[i])
    return accepted, cache, all_logits, start_len


def speculative_decode(
    params: Params,
    cfg: LlamaConfig,
    cache: KVCache,
    first_logits: jax.Array,  # (1, V) — logits for the next position
    context_ids: List[int],  # prompt tokens (for lookup proposals)
    *,
    max_new_tokens: int,
    eos_token_id: int,
    stop_ids: Optional[set] = None,
    ngram: int = 3,
    k: int = 8,
) -> Tuple[List[int], KVCache, jax.Array, Dict[str, float]]:
    """Greedy decode with prompt-lookup speculation (B=1).

    Returns (tokens, cache, next_logits, stats): token-for-token identical
    to plain greedy decode; ``next_logits`` predicts the position after the
    last returned token (so callers can continue decoding seamlessly);
    ``stats`` reports acceptance behavior.
    """
    stop_ids = stop_ids or set()
    lm = params["lm"] if "lm" in params else params
    toks: List[int] = []
    logits = first_logits
    steps = 0
    proposed_total = 0
    accepted_total = 0

    def done(t: int) -> bool:
        return t == eos_token_id or t in stop_ids

    while len(toks) < max_new_tokens:
        t1 = int(jnp.argmax(logits[0]))
        if done(t1):
            break
        draft = propose_lookup(context_ids + toks + [t1], ngram, k - 1)
        chunk = [t1] + draft[: max(0, min(len(draft), max_new_tokens - len(toks) - 1))]
        steps += 1
        proposed_total += len(chunk) - 1

        if len(chunk) == 1:
            toks.append(t1)
            logits, cache = llama_decode_step(
                lm, cfg, embed_tokens(lm, jnp.asarray([[t1]])), cache
            )
            continue

        accepted, cache, all_logits, start_len = _verify_chunk(
            lm, cfg, cache, chunk, k, done)
        accepted_total += len(accepted) - 1
        toks.extend(accepted)
        if done(accepted[-1]):
            toks.pop()
            # Roll the cache back past the stop token too.
            cache = KVCache(k=cache.k, v=cache.v,
                            length=jnp.asarray([start_len + len(accepted) - 1],
                                               jnp.int32))
            break
        # Roll back rejected suffix: shrink length only; stale slots are
        # overwritten in place before they can ever be attended.
        cache = KVCache(k=cache.k, v=cache.v,
                        length=jnp.asarray([start_len + len(accepted)], jnp.int32))
        logits = all_logits[:, len(accepted) - 1]

    stats = {
        "steps": steps,
        "tokens": len(toks),
        "proposed": proposed_total,
        "accepted": accepted_total,
        "tokens_per_step": len(toks) / max(steps, 1),
    }
    return toks, cache, logits, stats


def speculative_decode_draft(
    params: Params,
    cfg: LlamaConfig,
    cache: KVCache,
    first_logits: jax.Array,  # (1, V) — target logits for the next position
    *,
    draft_params: Params,
    draft_cfg: LlamaConfig,
    draft_cache: KVCache,  # prefilled over the SAME context as ``cache``
    max_new_tokens: int,
    eos_token_id: int,
    stop_ids: Optional[set] = None,
    k: int = 8,
) -> Tuple[List[int], KVCache, jax.Array, Dict[str, float]]:
    """Greedy decode with a DRAFT MODEL proposing chunks (B=1).

    Classic two-model speculation (Leviathan et al. 2023, greedy variant):
    a small draft LM autoregressively proposes ``k - 1`` tokens, the target
    verifies the whole chunk in ONE weight-bandwidth-bound cache-extend
    forward, and the longest greedy-matching prefix is kept — output is
    token-for-token the target's greedy chain regardless of draft quality
    (acceptance only affects speed). Complements ``speculative_decode``:
    prompt lookup needs repetitive output, a draft model pays off on any
    output, costing draft_size/target_size extra bandwidth per token.

    The draft keeps its own KV cache, synced each round with the tokens the
    target committed (one padded k-wide extend — same static shape as the
    verify pass) and rolled back over rejected proposals by shrinking
    ``length`` only, the same stale-slot invariant the target cache uses.

    Returns (tokens, cache, next_logits, stats); ``stats['accept_rate']``
    is the fraction of proposed draft tokens the target kept.
    """
    stop_ids = stop_ids or set()
    lm = params["lm"] if "lm" in params else params
    dlm = draft_params["lm"] if "lm" in draft_params else draft_params
    toks: List[int] = []
    logits = first_logits
    steps = 0
    draft_steps = 0
    proposed_total = 0
    accepted_total = 0
    # Committed tokens not yet written into the draft cache; at most k per
    # round (k-1 accepted continuations + the next verified token).
    pending: List[int] = []

    def done(t: int) -> bool:
        return t == eos_token_id or t in stop_ids

    while len(toks) < max_new_tokens:
        t1 = int(jnp.argmax(logits[0]))
        if done(t1):
            break
        budget = max_new_tokens - len(toks)
        steps += 1

        # --- draft phase: sync committed tokens, then propose greedily.
        pending.append(t1)
        ids = np.zeros((1, k), np.int32)
        ids[0, : len(pending)] = pending
        mask = np.zeros((1, k), np.int32)
        mask[0, : len(pending)] = 1
        d_all, draft_cache = llama_extend(
            dlm, draft_cfg, embed_tokens(dlm, jnp.asarray(ids)),
            jnp.asarray(mask), draft_cache, return_all=True,
        )
        draft_len = int(draft_cache.length[0])  # context + all committed + t1
        d_logits = d_all[:, len(pending) - 1]
        pending = []

        d_toks: List[int] = []
        n_propose = max(0, min(k - 1, budget - 1))
        for _ in range(n_propose):
            dt = int(jnp.argmax(d_logits[0]))
            if done(dt):
                break
            d_toks.append(dt)
            draft_steps += 1
            d_logits, draft_cache = llama_decode_step(
                dlm, draft_cfg, embed_tokens(dlm, jnp.asarray([[dt]])),
                draft_cache,
            )
        # Roll the draft back over its own proposals (they are uncommitted).
        draft_cache = KVCache(k=draft_cache.k, v=draft_cache.v,
                              length=jnp.asarray([draft_len], jnp.int32))
        proposed_total += len(d_toks)

        # --- target verify phase.
        chunk = [t1] + d_toks
        if len(chunk) == 1:
            toks.append(t1)
            logits, cache = llama_decode_step(
                lm, cfg, embed_tokens(lm, jnp.asarray([[t1]])), cache
            )
            continue

        accepted, cache, all_logits, start_len = _verify_chunk(
            lm, cfg, cache, chunk, k, done)
        accepted_total += len(accepted) - 1
        toks.extend(accepted)
        pending = accepted[1:]  # draft already holds t1
        if done(accepted[-1]):
            toks.pop()
            cache = KVCache(k=cache.k, v=cache.v,
                            length=jnp.asarray([start_len + len(accepted) - 1],
                                               jnp.int32))
            break
        cache = KVCache(k=cache.k, v=cache.v,
                        length=jnp.asarray([start_len + len(accepted)], jnp.int32))
        logits = all_logits[:, len(accepted) - 1]

    stats = {
        "steps": steps,
        "draft_steps": draft_steps,
        "tokens": len(toks),
        "proposed": proposed_total,
        "accepted": accepted_total,
        "accept_rate": accepted_total / max(proposed_total, 1),
        "tokens_per_step": len(toks) / max(steps, 1),
    }
    return toks, cache, logits, stats
