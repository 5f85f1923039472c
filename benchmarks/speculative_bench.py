"""Batched speculation economics at the production shape.

The engine's speculation round (models/speculative.verify_chunks_batched)
costs one ragged cache-extend (weight-bandwidth-bound like a decode step)
plus one host sync, and commits 1..k tokens per slot depending on
acceptance. This measures the real round time at 7B int8 batch-8 and
reports throughput at both ends of the acceptance range:

    python benchmarks/speculative_bench.py [--rounds 12]

- full acceptance (proposals = the model's own greedy chain, k=8): the
  ceiling for prompt-parroting outputs;
- zero acceptance (random proposals, 1 committed/round): the floor any
  non-repetitive stream pays (≈ per-step host sync speed).
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> dict:
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=12)
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--k", type=int, default=8)
    args = p.parse_args(argv)

    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        init_llama_params,
        llama_prefill,
    )
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.models.speculative import verify_chunks_batched

    cfg = LlamaConfig()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = quantize_llama_params(params)
    jax.block_until_ready(params)

    B, K, prompt = args.slots, args.k, 256
    cfgns = collections.namedtuple("CfgNS", "lm")(cfg)
    pwrap = {"lm": params}

    def fresh():
        cache = init_kv_cache(cfg, B, prompt + args.rounds * K + 64,
                              jnp.bfloat16)
        embeds = jax.random.normal(jax.random.PRNGKey(1),
                                   (B, prompt, cfg.hidden_size), jnp.bfloat16)
        logits, cache = llama_prefill(
            params, cfg, embeds, jnp.ones((B, prompt), jnp.int32), cache)
        return logits, cache

    out = {}

    # The VERIFY path's own greedy chain (1-valid-token rounds): replaying
    # it as proposals is guaranteed full acceptance — the k-wide extend is
    # bit-identical regardless of how many chunk slots are valid (invalid
    # keys sit past every query's position), so this measures the true
    # ceiling. A chain from the k-step decode scan does NOT work for this
    # on random weights: near-tie argmaxes flip between the S=1 and S=k
    # matmul shapes (the documented bf16 caveat), truncating acceptance.
    logits, cache = fresh()
    rec = []
    nxt0 = np.asarray(jnp.argmax(logits, -1))
    for _ in range(args.rounds * K):
        chunks = np.zeros((B, K), np.int32)
        chunks[:, 0] = nxt0
        mask = np.zeros((B, K), np.int32)
        mask[:, 0] = 1
        _, logits, nxt, cache = verify_chunks_batched(
            pwrap, cfgns, jnp.asarray(chunks), jnp.asarray(mask), cache)
        rec.append(nxt0.copy())
        nxt0 = np.asarray(nxt)
    chain = np.stack(rec, axis=1)  # (B, rounds*K), the verify-greedy chain

    def run(propose):
        """The engine's cadence: one host sync per round (next round's
        chunk[:, 0] rides the previous verify's next_argmax readback)."""
        logits, cache = fresh()
        committed = 0
        progress = np.zeros((B,), np.int64)
        nxt0 = np.asarray(jnp.argmax(logits, -1))
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            chunks, mask = propose(progress, nxt0)
            acc, logits, nxt, cache = verify_chunks_batched(
                pwrap, cfgns, jnp.asarray(chunks), jnp.asarray(mask), cache)
            acc_h, nxt0 = jax.device_get((acc, nxt))  # one fused readback
            committed += int(acc_h.sum())
            progress += acc_h
        dt = time.perf_counter() - t0
        return committed / dt, committed / (args.rounds * B), dt / args.rounds

    def full_accept(progress, nxt0):
        chunks = np.zeros((B, K), np.int32)
        for b in range(B):
            chunks[b, 0] = nxt0[b]
            seq = chain[b, progress[b] + 1: progress[b] + K]
            chunks[b, 1: 1 + len(seq)] = seq
        return chunks, np.ones((B, K), np.int32)

    rng = np.random.default_rng(9)

    def no_accept(progress, nxt0):
        chunks = rng.integers(4, cfg.vocab_size, size=(B, K)).astype(np.int32)
        chunks[:, 0] = nxt0
        return chunks, np.ones((B, K), np.int32)

    tps, mean_acc, round_s = run(full_accept)
    out["spec_full_accept_tok_s"] = round(tps, 1)
    out["spec_full_accept_mean"] = round(mean_acc, 2)
    out["spec_round_ms"] = round(round_s * 1e3, 2)
    tps, mean_acc, _ = run(no_accept)
    out["spec_no_accept_tok_s"] = round(tps, 1)

    # Draft-model round economics: a shallow same-width draft (2 of 32
    # layers, bf16) proposes ON DEVICE (draft_propose_batched), verify as
    # above, one fused readback — measures the round time a real
    # distilled draft would pay (acceptance is weight-dependent; random
    # weights accept ~1, so only the ROUND COST is meaningful here).
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.speculative import (
        _argmax_rows,
        draft_propose_batched,
        roll_draft_cache,
    )

    dcfg = LlamaConfig(num_hidden_layers=2)
    dparams = init_llama_params(jax.random.PRNGKey(7), dcfg, dtype=jnp.bfloat16)
    jax.block_until_ready(dparams)
    logits, cache = fresh()
    dcache = init_kv_cache(dcfg, B, prompt + args.rounds * K + 64,
                           jnp.bfloat16)
    dembeds = jax.random.normal(jax.random.PRNGKey(1),
                                (B, prompt, dcfg.hidden_size), jnp.bfloat16)
    _, dcache = llama_prefill(dparams, dcfg, dembeds,
                              jnp.ones((B, prompt), jnp.int32), dcache)
    mask_all = jnp.ones((B, K), jnp.int32)

    def draft_round(logits, cache, dcache):
        chunks, dcache = draft_propose_batched(
            dparams, dcfg, _argmax_rows(logits), dcache, K)
        acc, logits, nxt, cache = verify_chunks_batched(
            pwrap, cfgns, chunks, mask_all, cache)
        dcache = roll_draft_cache(dcache, acc, K)
        acc_h, _ = jax.device_get((acc, nxt))
        return int(acc_h.sum()), logits, cache, dcache

    n, logits, cache, dcache = draft_round(logits, cache, dcache)  # compile
    logits, cache = fresh()
    committed = 0
    t0 = time.perf_counter()
    for _ in range(args.rounds):
        n, logits, cache, dcache = draft_round(logits, cache, dcache)
        committed += n
    dt = time.perf_counter() - t0
    out["draft_round_ms"] = round(dt / args.rounds * 1e3, 2)
    out["draft_mean_accept"] = round(committed / (args.rounds * B), 2)
    out["draft_full_accept_ceiling_tok_s"] = round(
        args.rounds * K * B / dt, 1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
