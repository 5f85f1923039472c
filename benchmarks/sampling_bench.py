"""Sampled-decoding throughput at the production shape.

Before round 3's sampled device scan, any temperature>0 request dropped
both engines from the device-side k-step loop to one host sync per token
— measured at ~3.4x the cost on the tunnel (constrained_bench.py's
per_step_sync floor). This benchmark quantifies the fix on the 7B int8
batch-8 dense configuration:

    python benchmarks/sampling_bench.py [--steps 48]

Prints one JSON line: greedy k-step tok/s (ceiling), per-step host
sampling tok/s (the old sampled path), and the device sampled scan
(serve/server.sampled_decode_steps) tok/s.
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
    p.add_argument("--steps", type=int, default=48)
    p.add_argument("--slots", type=int, default=8)
    args = p.parse_args(argv)

    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        embed_tokens,
        init_kv_cache,
        init_llama_params,
        llama_decode_step,
        llama_prefill,
    )
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.serve.server import (
        greedy_decode_steps,
        sample_rows,
        sampled_decode_steps,
    )

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

    cfgns = collections.namedtuple("CfgNS", "lm")(cfg)
    pwrap = {"lm": params}
    # The engine mix: hot sampling, nucleus rows, one greedy row.
    temps = jnp.asarray([0.8, 1.0, 0.7, 0.9, 1.2, 0.8, 1.0, 0.0][:B])
    top_ks = jnp.asarray([0, 50, 0, 40, 0, 0, 20, 0][:B], jnp.int32)
    top_ps = jnp.asarray([0.95, 1.0, 0.9, 1.0, 0.8, 0.95, 1.0, 1.0][:B])
    out = {}

    # (a) greedy device k-step loop: the ceiling.
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    _, logits, cache = greedy_decode_steps(pwrap, cfgns, logits, cache, 8)
    float(jnp.sum(logits))
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        _, logits, cache = greedy_decode_steps(pwrap, cfgns, logits, cache, 8)
    float(jnp.sum(logits))
    out["greedy_k8_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)

    # (b) per-step host sampling (the pre-round-3 sampled path): one
    # dispatch + readback per token, sample_rows on device per step.
    @jax.jit
    def step_sampled(params, logits, cache, sub):
        nxt = sample_rows(logits, sub, temps, top_ks, top_ps)
        emb = embed_tokens(params, nxt[:, None]).astype(jnp.bfloat16)
        logits2, cache = llama_decode_step(params, cfg, emb, cache)
        return nxt, logits2, cache

    rng = jax.random.PRNGKey(7)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    rng, sub = jax.random.split(rng)
    nxt, logits, cache = step_sampled(params, logits, cache, sub)
    np.asarray(nxt)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        rng, sub = jax.random.split(rng)
        nxt, logits, cache = step_sampled(params, logits, cache, sub)
        np.asarray(nxt)  # the host sync the old path paid
    out["host_per_step_sampled_tok_s"] = round(
        args.steps * B / (time.perf_counter() - t0), 1)

    # (c) the device sampled scan (round-3 fix): rng carried, k=8.
    rng = jax.random.PRNGKey(7)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    toks, logits, cache, rng = sampled_decode_steps(
        pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        toks, logits, cache, rng = sampled_decode_steps(
            pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps)
        np.asarray(toks)  # one sync per k tokens (the engine's cadence)
    out["device_sampled_k8_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)
    out["speedup_vs_host_path"] = round(
        out["device_sampled_k8_tok_s"] / out["host_per_step_sampled_tok_s"], 2)

    # (d) pure temperature sampling (no top_k/top_p anywhere): the static
    # fast path skips the full-vocab sort/cumsum.
    temps_pure = jnp.where(temps > 0, temps, 0.8)
    zk = jnp.zeros_like(top_ks)
    op = jnp.ones_like(top_ps)
    rng = jax.random.PRNGKey(7)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    toks, logits, cache, rng = sampled_decode_steps(
        pwrap, cfgns, logits, cache, 8, rng, temps_pure, zk, op,
        filter_topkp=False)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        toks, logits, cache, rng = sampled_decode_steps(
            pwrap, cfgns, logits, cache, 8, rng, temps_pure, zk, op,
            filter_topkp=False)
        np.asarray(toks)
    out["device_sampled_pure_temp_k8_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)

    # (e) sampling controls on device (penalties + bias + min_tokens):
    # counts carried in the scan, control tensors uploaded once per k.
    from videollamb_tpu.serve.server import sampled_decode_steps_controls

    bias = jnp.zeros((B, cfg.vocab_size), jnp.float32).at[:, 11].set(2.0)
    pres = jnp.full((B,), 0.5, jnp.float32)
    freq = jnp.full((B,), 0.3, jnp.float32)
    counts0 = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    min_left = jnp.full((B,), 16, jnp.int32)
    rng = jax.random.PRNGKey(7)
    logits, cache = jnp.array(logits0), jax.tree.map(jnp.array, cache0)
    toks, logits, cache, rng = sampled_decode_steps_controls(
        pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps,
        bias, pres, freq, counts0, min_left, eos=2)
    np.asarray(toks)
    t0 = time.perf_counter()
    for _ in range(args.steps // 8):
        toks, logits, cache, rng = sampled_decode_steps_controls(
            pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps,
            bias, pres, freq, counts0, min_left, eos=2)
        np.asarray(toks)
    out["device_controls_k8_tok_s"] = round(
        (args.steps // 8) * 8 * B / (time.perf_counter() - t0), 1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
