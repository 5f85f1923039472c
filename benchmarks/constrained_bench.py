"""Constrained-decoding overhead at the production shape.

Grammar/choice-constrained rows leave the engines' device-side k-step
greedy loop (one host sync per k tokens) for a per-step path: host mask
build (numpy over the state's allowed-token table) + a (B, V) mask
transfer + one decode dispatch per token. This benchmark quantifies that
cost on the 7B int8 batch-8 dense configuration (the serving sweet spot
measured in bench.py) so docs/PERFORMANCE.md can state the real price of
guaranteed-valid JSON:

    python benchmarks/constrained_bench.py [--steps 48]

Prints one JSON line: unconstrained k-step tok/s, per-step-sync tok/s
(the floor any per-token-host feature pays), and grammar-masked tok/s.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _token_strs(vocab: int) -> List[Optional[str]]:
    """Realistic surface distribution: mostly word-ish content pieces
    (allowed inside JSON strings -> large allowed sets, the expensive
    case for mask building), plus the JSON structural singles."""
    pool = [" the", " and", "ing", "er", " of", " to", "a", "s", "d",
            " in", "re", " it", "on", " is", "en", " was", " for", "an",
            " city", " temp", "value", " name", "data", "x", "y", "z"]
    strs: List[Optional[str]] = [None] * vocab
    structural = list('{}[]":, 0123456789.-+eE') + list("truefalsn") + [
        "\\", "\t"]
    i = 3
    for ch in dict.fromkeys(structural):
        strs[i] = ch
        i += 1
    for j in range(i, vocab):
        strs[j] = pool[j % len(pool)]
    return strs


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--slots", type=int, default=8)
    args = p.parse_args(argv)

    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        init_llama_params,
        llama_prefill,
    )
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.serve.constrained import build_constraint_masks
    from videollamb_tpu.serve.grammar import json_constraint

    cfg = LlamaConfig()  # 7B
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = quantize_llama_params(params)
    jax.block_until_ready(params)

    B, prompt = args.slots, 256
    cache = init_kv_cache(cfg, B, prompt + args.steps + 64, jnp.bfloat16)
    embeds = jax.random.normal(jax.random.PRNGKey(1),
                               (B, prompt, cfg.hidden_size), jnp.bfloat16)
    logits0, cache0 = llama_prefill(
        params, cfg, embeds, jnp.ones((B, prompt), jnp.int32), cache)
    jax.block_until_ready(logits0)

    import collections

    from videollamb_tpu.models.lm.llama import embed_tokens, llama_decode_step
    from videollamb_tpu.serve.server import greedy_decode_steps

    cfgns = collections.namedtuple("CfgNS", "lm")(cfg)
    pwrap = {"lm": params}

    out = {}

    # (a) the unconstrained device-side k-step loop (k=8).
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    _, logits, cache = greedy_decode_steps(pwrap, cfgns, logits, cache, 8)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        _, logits, cache = greedy_decode_steps(pwrap, cfgns, logits, cache, 8)
    float(jnp.sum(logits))
    out["unconstrained_k8_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)

    # (b) per-step host sync, no masks (the floor for any per-token host
    # feature: sampling with per-step state, streaming hooks, masks...).
    @jax.jit
    def step_once(params, logits, cache, mask=None):
        l = logits if mask is None else logits + mask
        nxt = jnp.argmax(l, -1).astype(jnp.int32)
        emb = embed_tokens(params, nxt[:, None]).astype(jnp.bfloat16)
        logits2, cache = llama_decode_step(params, cfg, emb, cache)
        return nxt, logits2, cache

    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    nxt, logits, cache = step_once(params, logits, cache)
    np.asarray(nxt)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        nxt, logits, cache = step_once(params, logits, cache)
        np.asarray(nxt)  # the host sync the constrained path pays
    out["per_step_sync_tok_s"] = round(
        args.steps * B / (time.perf_counter() - t0), 1)

    # (c) the full grammar path: host mask build + (B, V) f32 transfer +
    # masked step, advancing real GrammarConstraint cursors.
    class Tok:
        eos_token_id = 2

    strs = _token_strs(cfg.vocab_size)
    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(B)]

    class Row:
        def __init__(self, c):
            self._constraint = c
            self.max_new_tokens = 10_000
            self.tokens = []

    rows = [Row(c) for c in cons]
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    mask = build_constraint_masks(rows, cfg.vocab_size)
    nxt, logits, cache = step_once(params, logits, cache, jnp.asarray(mask))
    np.asarray(nxt)
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.steps):
        mask = build_constraint_masks(rows, cfg.vocab_size)
        nxt, logits, cache = step_once(
            params, logits, cache,
            None if mask is None else jnp.asarray(mask))
        toks = np.asarray(nxt)
        for r, t in zip(rows, toks):
            if r._constraint.node is not None:
                r.tokens.append(int(t))
                r._constraint.advance(int(t))
        n += 1
    out["grammar_masked_tok_s"] = round(
        n * B / (time.perf_counter() - t0), 1)
    out["constrained_overhead_vs_k8"] = round(
        1 - out["grammar_masked_tok_s"] / out["unconstrained_k8_tok_s"], 3)

    # (d) device-side grammar (serve/device_grammar.py): state tables in
    # HBM, the k-step scan gathers masks/transitions by slot — the fix.
    from videollamb_tpu.serve.device_grammar import (
        FREE_REMAINING,
        device_table_for,
    )
    from videollamb_tpu.serve.server import greedy_decode_steps_grammar

    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(B)]
    dt = device_table_for(cons[0].table, cfg.vocab_size)
    # Warm the pool with the states this decode will visit (one host-side
    # shadow decode — production warms organically via advance()).
    shadow = json_constraint(Tok(), token_strs=strs)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    slots0 = np.asarray([dt.slot(c.node) for c in cons], np.int32)
    remaining0 = np.full((B,), FREE_REMAINING, np.int32)
    toks, logits, cache, inv, fro = greedy_decode_steps_grammar(
        pwrap, cfgns, logits, cache, 8, dt.costs, dt.next_sid, dt.sid2slot,
        jnp.asarray(slots0), jnp.asarray(remaining0))
    # Walk the emitted tokens host-side to intern+upload the states, then
    # re-run warm (the steady-state regime).
    for t in np.asarray(toks)[0][: int(np.asarray(inv)[0]) + 1]:
        shadow.advance(int(t))
        if shadow.node is not None:
            dt.slot(shadow.node)
    float(jnp.sum(logits))
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(B)]
    t0 = time.perf_counter()
    emitted = 0
    for _ in range(args.steps // 8):
        slots = []
        ok = True
        for c in cons:
            s = dt.slot(c.node) if c.node is not None else 0
            if s is None:
                ok = False
                break
            slots.append(s)
        if not ok:
            break
        toks, logits, cache, inv, fro = greedy_decode_steps_grammar(
            pwrap, cfgns, logits, cache, 8, dt.costs, dt.next_sid,
            dt.sid2slot, jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(remaining0))
        toks_h, inv_h = np.asarray(toks), np.asarray(inv)
        for i, c in enumerate(cons):
            for t in toks_h[i][: min(8, int(inv_h[i]) + 1)]:
                if c.node is None:
                    break
                c.advance(int(t))
                if c.node is not None:
                    dt.slot(c.node)
            emitted += min(8, int(inv_h[i]) + 1)
    out["grammar_device_tok_s"] = round(
        emitted / (time.perf_counter() - t0), 1)

    # (e) grammar + SAMPLING on device (round-3 continuation): the table
    # is warm from (d); temperature rows ride sampled_decode_steps_grammar.
    from videollamb_tpu.serve.server import sampled_decode_steps_grammar

    temps = jnp.full((B,), 0.8, jnp.float32)
    zk = jnp.zeros((B,), jnp.int32)
    op = jnp.ones((B,), jnp.float32)
    rng = jax.random.PRNGKey(3)
    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(B)]
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    t_first = None
    emitted = 0
    for it in range(args.steps // 8):
        slots = []
        ok = True
        for c in cons:
            s = dt.slot(c.node) if c.node is not None else 0
            if s is None:
                ok = False
                break
            slots.append(s)
        if not ok:
            break
        toks, logits, cache, inv, fro, rng = sampled_decode_steps_grammar(
            pwrap, cfgns, logits, cache, 8, rng, temps, zk, op,
            dt.costs, dt.next_sid, dt.sid2slot,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(remaining0))
        toks_h, inv_h = np.asarray(toks), np.asarray(inv)
        if t_first is None:  # first call compiles; time the rest
            t_first = time.perf_counter()
            emitted = 0
        for i, c in enumerate(cons):
            for t in toks_h[i][: min(8, int(inv_h[i]) + 1)]:
                if c.node is None:
                    break
                c.advance(int(t))
                if c.node is not None:
                    dt.slot(c.node)
            emitted += min(8, int(inv_h[i]) + 1)
    out["grammar_device_sampled_tok_s"] = round(
        emitted / (time.perf_counter() - t_first), 1) if t_first else 0.0

    # (f) choice-set constraints on device (round 4): the MC-eval path.
    # Choice tries are prewarmed (every state uploaded at table build) so
    # the scan NEVER freezes; rows reset to the trie root each scan (real
    # MC decodes finish in 1-3 tokens — this measures the steady-state
    # cost of keeping choice batches in the k-step loop).
    from videollamb_tpu.serve.constrained import ChoiceTable, TokenTrie

    letter_ids = [[40 + j] for j in range(5)]  # five single-token options
    letter_ids += [[40 + j, 50 + j] for j in range(3)]  # multi-token tails
    ct = ChoiceTable(TokenTrie(letter_ids), eos_token_id=2)
    cdt = device_table_for(ct, cfg.vocab_size)
    root_slot = cdt.slot(ct.start)
    cslots = jnp.full((B,), root_slot, jnp.int32)
    cremaining = jnp.full((B,), 8, jnp.int32)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    toks, logits, cache, inv, fro = greedy_decode_steps_grammar(
        pwrap, cfgns, logits, cache, 8, cdt.costs, cdt.next_sid,
        cdt.sid2slot, cslots, cremaining)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        toks, logits, cache, inv, fro = greedy_decode_steps_grammar(
            pwrap, cfgns, logits, cache, 8, cdt.costs, cdt.next_sid,
            cdt.sid2slot, cslots, cremaining)
        np.asarray(toks)
    out["choices_device_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)

    # (g) grammar + count-dependent sampling CONTROLS in one scan (round
    # 4): penalties/bias/min_tokens with guaranteed-valid JSON, no host
    # path. Table warm from (d)/(e).
    from videollamb_tpu.serve.server import (
        sampled_decode_steps_grammar_controls,
    )

    bias = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    pres = jnp.full((B,), 0.3, jnp.float32)
    freq = jnp.full((B,), 0.5, jnp.float32)
    counts0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    min_left = jnp.full((B,), 4, jnp.int32)
    rng = jax.random.PRNGKey(5)
    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(B)]
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    t_first = None
    emitted = 0
    for it in range(args.steps // 8):
        slots = []
        ok = True
        for c in cons:
            s = dt.slot(c.node) if c.node is not None else 0
            if s is None:
                ok = False
                break
            slots.append(s)
        if not ok:
            break
        (toks, logits, cache, inv, fro,
         rng) = sampled_decode_steps_grammar_controls(
            pwrap, cfgns, logits, cache, 8, rng, temps, zk, op,
            bias, pres, freq, counts0, min_left,
            dt.costs, dt.next_sid, dt.sid2slot,
            jnp.asarray(np.asarray(slots, np.int32)),
            jnp.asarray(remaining0), eos=2)
        toks_h, inv_h = np.asarray(toks), np.asarray(inv)
        if t_first is None:  # first call compiles; time the rest
            t_first = time.perf_counter()
            emitted = 0
        for i, c in enumerate(cons):
            for t in toks_h[i][: min(8, int(inv_h[i]) + 1)]:
                if c.node is None:
                    break
                c.advance(int(t))
                if c.node is not None:
                    dt.slot(c.node)
            emitted += min(8, int(inv_h[i]) + 1)
    out["grammar_controls_device_tok_s"] = round(
        emitted / (time.perf_counter() - t_first), 1) if t_first else 0.0

    # (h) MIXED tables in one batch (round 5): half the rows decode under
    # the JSON grammar, half under the choice trie, through ONE combined
    # global pool (serve/device_grammar.combined_table_for) — before the
    # combined table, any batch mixing tables fell back to the per-step
    # host path (c). Grammar rows advance real cursors (warm table from
    # (d)); choice rows reset to the trie root each scan like (f). The
    # bar: within noise of the single-table device rates (the scan does
    # the same per-row gathers — only the pool rows moved).
    from videollamb_tpu.serve.device_grammar import combined_table_for

    half = B // 2
    cons = [json_constraint(Tok(), token_strs=strs) for _ in range(half)]
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    t_first = None
    emitted = 0
    for it in range(args.steps // 8):
        mslots = np.zeros((B,), np.int32)
        ok = True
        for i, c in enumerate(cons):
            s = dt.slot(c.node) if c.node is not None else 0
            if s is None:
                ok = False
                break
            mslots[i] = s if s else 0
        if not ok:
            break
        mt = combined_table_for([dt, cdt])  # refresh folds new uploads in
        mslots[half:] = int(mt.slot_base[1]) + root_slot
        mremaining = np.full((B,), FREE_REMAINING, np.int32)
        for i, c in enumerate(cons):
            mremaining[i] = 10_000
        mremaining[half:] = 8
        toks, logits, cache, inv, fro = greedy_decode_steps_grammar(
            pwrap, cfgns, logits, cache, 8, mt.costs, mt.next_sid,
            mt.sid2slot, jnp.asarray(mslots), jnp.asarray(mremaining))
        toks_h, inv_h = np.asarray(toks), np.asarray(inv)
        if t_first is None:  # first call compiles; time the rest
            t_first = time.perf_counter()
            emitted = 0
        for i, c in enumerate(cons):
            for t in toks_h[i][: min(8, int(inv_h[i]) + 1)]:
                if c.node is None:
                    break
                c.advance(int(t))
                if c.node is not None:
                    dt.slot(c.node)
        emitted += sum(min(8, int(inv_h[i]) + 1) for i in range(half))
        emitted += (B - half) * 8
    out["mixed_tables_device_tok_s"] = round(
        emitted / (time.perf_counter() - t_first), 1) if t_first else 0.0
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
