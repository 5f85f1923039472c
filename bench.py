"""Headline benchmark: 7B decode throughput + LanguageBind encode fps.

Prints ONE JSON line. Primary metric: single-chip 7B decode tok/s vs the
BASELINE.md north star (>= 30 tok/s on v5e-8 — we measure on ONE chip).
The second north star (encode fps) rides along in "extra" so every round
records both (VERDICT r1 asked for exactly this: the r1 bench silently
dropped the encode miss).

Roofline note for the encode target: 2,000 frames/s of ViT-L LanguageBind
(~200 GFLOP/frame with temporal attention) needs ~400 TFLOP/s — above the
v5e bf16 peak of 197 TFLOP/s, so the north star is not reachable on one
chip; the honest target is the compute roofline (~900-1000 frames/s at
100% MXU) and our progress toward it.
"""

import atexit
import json
import os
import signal
import sys
import threading
import time

import jax
import jax.numpy as jnp

# Persistent XLA compilation cache: the bench's dominant fixed cost is
# compiles through the axon tunnel (full-tower ~3-8 min cold). Caching them
# under the repo makes every rerun (and the driver's timed run, if the repo
# dir persists) start from warm executables instead of re-paying it.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_TOK_S = 30.0
BASELINE_ENCODE_FPS = 2000.0

# ---------------------------------------------------------------------------
# Time-boxing (VERDICT r4 #1): the driver allows ~30 min; round 4's bench
# grew past it and rc=124 lost EVERY number. Three defenses, in order:
#   1. a hard budget (BENCH_BUDGET_S, default 25 min) with per-section
#      estimates — sections that don't fit are skipped and recorded in
#      extra["skipped_for_budget"], never silently;
#   2. reserve accounting — optional sections only run if the time left
#      after them still covers every not-yet-run MUST section (the
#      north-star metrics can't be starved by nice-to-have rows);
#   3. the JSON line is emitted from atexit + SIGTERM/SIGINT handlers, so
#      even a hard timeout flushes whatever was measured;
#   4. a daemon WATCHDOG THREAD force-emits and exits 0 at budget+60 s —
#      signal handlers only run between Python bytecodes, so a main thread
#      blocked inside a C++ XLA compile / PJRT backend init (the observed
#      wedge mode of the axon tunnel) would otherwise swallow SIGTERM and
#      die output-less at the driver's hard kill. The thread keeps running
#      while the main thread is blocked in C (the GIL is released there).
# ---------------------------------------------------------------------------
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))
_T0 = time.monotonic()
_STATE = {"printed": False, "tok_s": None, "extra": {}}


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _emit() -> None:
    if _STATE["printed"]:
        return
    _STATE["printed"] = True
    extra = _STATE["extra"]
    extra["bench_elapsed_s"] = round(_elapsed(), 1)
    tok_s = _STATE["tok_s"]
    if tok_s is not None:
        line = {
            "metric": "decode_tokens_per_sec_7b",
            "value": round(tok_s, 1),
            "unit": "tok/s",
            "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            "extra": extra,
        }
    else:
        line = {
            "metric": "languagebind_encode_fps",
            "value": extra.get("encode_fps", 0.0),
            "unit": "frames/s",
            "vs_baseline": extra.get("encode_vs_north_star", 0.0),
            "extra": extra,
        }
    print(json.dumps(line), flush=True)


def _on_signal(sig, frame):  # noqa: ARG001
    _STATE["extra"]["interrupted_by_signal"] = int(sig)
    _emit()
    os._exit(124 if sig == signal.SIGTERM else 130)


def _watchdog() -> None:
    time.sleep(max(BUDGET_S + 60.0 - _elapsed(), 1.0))
    if not _STATE["printed"]:
        _STATE["extra"]["watchdog_fired"] = True
        _emit()
        os._exit(0)


def bench_encode() -> dict:
    """LanguageBind ViT-L encode frames/s at batch 256 (packed-layout
    Pallas cores on TPU; ops/{temporal,spatial}_attention.py), bf16 AND
    int8 (weights + dynamic per-row activations, int8 MXU dots —
    models/vision/quant.py), plus the int8-vs-bf16 output error bound.

    Steady-state protocol: calls are CHAINED through a scalar carried into
    the next input (distinct executions, so the tunnel can't replay a
    cached result) with ONE readback at the end — per-call blocking reads
    pay the ~25-45 ms tunnel round-trip per batch, understating the
    pipelined production throughput by ~8%."""
    from videollamb_tpu.config import VisionConfig
    from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode
    from videollamb_tpu.models.vision.quant import quantize_vision_params

    cfg = VisionConfig()
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    batch, frames = 32, 8
    bufs = [jax.random.normal(jax.random.PRNGKey(i), (batch, frames, 3, 224, 224),
                              jnp.bfloat16) for i in range(4)]
    # ONE jitted tower graph per dtype variant, shared between the parity
    # check and the timing loop — the r5 probe showed the remote Mosaic
    # compile dominating this section (4 tower compiles, 551 s); timing
    # chains through a tiny jitted reduction instead of folding the sum
    # into the tower graph.
    feats_fn = jax.jit(lambda p, x, s: vision_encode(
        p, x + s * jnp.bfloat16(0), cfg))
    chain_fn = jax.jit(
        lambda f: jnp.mean(jnp.abs(f.astype(jnp.float32))).astype(jnp.bfloat16))
    err_fn = jax.jit(lambda got, ref: jnp.mean(jnp.abs(got - ref))
                     / jnp.mean(jnp.abs(ref)))

    def run(params, buf0_feats=None):
        f = (buf0_feats if buf0_feats is not None
             else feats_fn(params, bufs[0], jnp.bfloat16(0)))
        s = chain_fn(f)
        float(s)  # compile + warm
        best = None
        for _ in range(2):
            start = time.perf_counter()
            for buf in bufs:
                s = chain_fn(feats_fn(params, buf, s))
            float(s)  # single forced readback for the whole chain
            elapsed = (time.perf_counter() - start) / len(bufs)
            best = elapsed if best is None else min(best, elapsed)
        return batch * frames / best

    out = {}
    t_sec = time.monotonic()
    ref = feats_fn(params, bufs[0], jnp.bfloat16(0)).astype(jnp.float32)
    out["encode_fps"] = round(run(params, buf0_feats=ref), 1)
    # The remote compile/load service's latency is wildly variable (the
    # bf16 tower alone has taken 60 s to 20 min across same-code runs).
    # The bf16 number is the north star; the int8 tower is a second
    # remote compile — skip it when the bf16 half already ran well past
    # an ordinary cold compile (450 s ≈ 1.5x the worst calibrated cold
    # run), so one slow compile can't also invite a second one. The cap
    # is NOT tied to BUDGET_S: half of a 25-min budget (750 s) only
    # fires after the damage is done.
    if time.monotonic() - t_sec > min(450.0, 0.5 * BUDGET_S):
        out["encode_int8_skipped_for_budget"] = True
        return out
    params = quantize_vision_params(params)  # consumes the bf16 kernels
    got = feats_fn(params, bufs[0], jnp.bfloat16(0)).astype(jnp.float32)
    out["encode_int8_rel_err"] = round(float(err_fn(got, ref)), 4)
    del ref
    out["encode_int8_fps"] = round(run(params, buf0_feats=got), 1)
    return out


def init_7b(quant: str = "none"):
    """One shared 7B param tree per precision: random-init (and quantize)
    once, reuse across bench sections — four independent inits blew the
    driver's 30-minute budget."""
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import init_llama_params

    cfg = LlamaConfig()  # Vicuna-7B dims
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    if quant == "int8":
        from videollamb_tpu.models.lm.quant import quantize_llama_params

        params = quantize_llama_params(params)
        jax.block_until_ready(params)
    return cfg, params


def bench_decode(cfg, params) -> float:
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        llama_decode_step,
        llama_prefill,
    )

    batch, prompt_len, cache_len = 1, 256, 2048
    cache = init_kv_cache(cfg, batch, cache_len, dtype=jnp.bfloat16)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (batch, prompt_len, cfg.hidden_size), jnp.bfloat16
    )
    mask = jnp.ones((batch, prompt_len), jnp.int32)
    logits, cache = llama_prefill(params, cfg, embeds, mask, cache)
    float(jnp.sum(logits))

    tok = jnp.zeros((batch, 1, cfg.hidden_size), jnp.bfloat16)
    logits, cache = llama_decode_step(params, cfg, tok, cache)  # compile
    float(jnp.sum(logits))

    n_steps = 64
    start = time.perf_counter()
    for _ in range(n_steps):
        logits, cache = llama_decode_step(params, cfg, tok, cache)
    float(jnp.sum(logits))  # forced readback: the TPU tunnel lies otherwise
    elapsed = time.perf_counter() - start
    return n_steps * batch / elapsed


def bench_decode_devloop(lcfg, lm, k: int = 8) -> float:
    """Single-stream decode through the engine's device-side k-step loop
    (serve/server.greedy_decode_steps): the host syncs every k tokens, so
    per-step tunnel dispatch is amortized — the steady-state serving
    protocol, vs bench_decode's one-dispatch-per-token."""
    import collections

    from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill
    from videollamb_tpu.serve.server import greedy_decode_steps

    params = {"lm": lm}
    # Hashable wrapper: greedy_decode_steps takes cfg as a static jit arg.
    cfg = collections.namedtuple("CfgNS", "lm")(lcfg)

    cache = init_kv_cache(lcfg, 1, 2048, jnp.bfloat16)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (1, 256, lcfg.hidden_size), jnp.bfloat16)
    logits, cache = llama_prefill(
        lm, lcfg, embeds, jnp.ones((1, 256), jnp.int32), cache)
    _, logits, cache = greedy_decode_steps(params, cfg, logits, cache, k)
    float(jnp.sum(logits))  # compile + warm

    n_chunks = 8
    start = time.perf_counter()
    for _ in range(n_chunks):
        _, logits, cache = greedy_decode_steps(params, cfg, logits, cache, k)
    float(jnp.sum(logits))
    elapsed = time.perf_counter() - start
    return n_chunks * k / elapsed


def bench_dense_batch(cfg, params, num_slots: int = 8) -> float:
    """Aggregate decode throughput with the DENSE per-slot cache at batch
    ``num_slots`` — the max-throughput serving configuration (the paged
    engine below trades ~2x step time for elastic memory: measured 16.4 vs
    31-37 ms/step at 7B batch 8; the gather/paged indexing is the cost)."""
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        llama_decode_step,
        llama_prefill,
    )

    cache = init_kv_cache(cfg, num_slots, 448, jnp.bfloat16)
    embeds = jax.random.normal(
        jax.random.PRNGKey(2), (num_slots, 256, cfg.hidden_size), jnp.bfloat16)
    _, cache = llama_prefill(
        params, cfg, embeds, jnp.ones((num_slots, 256), jnp.int32), cache)
    tok = jnp.zeros((num_slots, 1, cfg.hidden_size), jnp.bfloat16)
    logits, cache = llama_decode_step(params, cfg, tok, cache)
    float(jnp.sum(logits))  # compile + warm
    n_steps = 32
    start = time.perf_counter()
    for _ in range(n_steps):
        logits, cache = llama_decode_step(params, cfg, tok, cache)
    float(jnp.sum(logits))
    elapsed = time.perf_counter() - start
    return n_steps * num_slots / elapsed


def bench_sampled_batch(cfg, params, num_slots: int = 8) -> float:
    """Aggregate SAMPLED decode throughput (temperature/top-p mix) via the
    round-3 device k-step sampled scan (serve/server.sampled_decode_steps)
    — production traffic mostly samples; before the scan this path paid
    one host sync per token (~166 vs ~492 tok/s measured, see
    benchmarks/sampling_bench.py and docs/PERFORMANCE.md)."""
    import collections

    from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill
    from videollamb_tpu.serve.server import sampled_decode_steps

    cache = init_kv_cache(cfg, num_slots, 448, jnp.bfloat16)
    embeds = jax.random.normal(
        jax.random.PRNGKey(2), (num_slots, 256, cfg.hidden_size), jnp.bfloat16)
    logits, cache = llama_prefill(
        params, cfg, embeds, jnp.ones((num_slots, 256), jnp.int32), cache)
    cfgns = collections.namedtuple("CfgNS", "lm")(cfg)
    pwrap = {"lm": params}
    temps = jnp.asarray([0.8, 1.0, 0.7, 0.9, 1.2, 0.8, 1.0, 0.0]
                        * (num_slots // 8 + 1))[:num_slots]
    top_ks = jnp.asarray(([0, 50, 0, 40, 0, 0, 20, 0]
                          * (num_slots // 8 + 1))[:num_slots], jnp.int32)
    top_ps = jnp.asarray([0.95, 1.0, 0.9, 1.0, 0.8, 0.95, 1.0, 1.0]
                         * (num_slots // 8 + 1))[:num_slots]
    rng = jax.random.PRNGKey(5)
    toks, logits, cache, rng = sampled_decode_steps(
        pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps)
    float(jnp.sum(logits))  # compile + warm
    n_chunks = 4
    start = time.perf_counter()
    for _ in range(n_chunks):
        toks, logits, cache, rng = sampled_decode_steps(
            pwrap, cfgns, logits, cache, 8, rng, temps, top_ks, top_ps)
    float(jnp.sum(logits))
    return n_chunks * 8 * num_slots / (time.perf_counter() - start)


def bench_paged_batch(cfg, params, num_slots: int = 8,
                      pages_per_seq: int = 8, prompt_len: int = 256) -> float:
    """Aggregate 7B decode throughput with ``num_slots`` concurrent
    sequences over the paged KV pool (int8 weights AND int8 KV pages — the
    production serving config; bf16 weights + the pool exceed the 16 GB
    chip). The dispatcher routes this regime to the shared-pool int8 MXU
    attention (ops/paged_attention_stats.attend_pool_int8_stats): every
    slot attends over the whole layer pool under an ownership mask, which
    turns the per-slot matvecs into one true matmul per head and keeps
    K/V int8 to the MXU (r2's stock-kernel dispatch measured 21 ms/step
    of grid overhead at this shape). The reference serves one request at
    a time through HF generate; batching amortizes the weight read across
    slots, so aggregate tok/s approaches num_slots x the single-stream
    rate until KV reads bite."""
    import numpy as np

    from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill
    from videollamb_tpu.models.lm.paged import (
        TRASH_PAGE,
        PageAllocator,
        init_paged_cache,
        paged_decode_step,
        paged_insert,
    )

    page, n_steps = 64, 32
    total_pages = 1 + num_slots * pages_per_seq
    cache = init_paged_cache(cfg, num_slots, total_pages, page,
                             pages_per_seq, jnp.bfloat16, quantize=True)
    alloc = PageAllocator(total_pages)

    dense = init_kv_cache(cfg, 1, prompt_len + page, jnp.bfloat16)
    embeds = jax.random.normal(
        jax.random.PRNGKey(1), (1, prompt_len, cfg.hidden_size), jnp.bfloat16)
    _, dense = llama_prefill(
        params, cfg, embeds, jnp.ones((1, prompt_len), jnp.int32), dense)
    # Park the prefilled source on HOST so decode's peak HBM holds the
    # pool + ONE per-slot device copy instead of pool + dense + copy —
    # at the long-context shape that co-residency was the difference
    # between fitting and RESOURCE_EXHAUSTED (r5 bench runs 2-4).
    dense_host = jax.tree.map(lambda a: np.asarray(a), dense)
    del dense
    for slot in range(num_slots):
        pages = alloc.alloc(pages_per_seq)
        page_ids = np.full((pages_per_seq,), TRASH_PAGE, np.int32)
        page_ids[: len(pages)] = pages
        # Re-upload the prefilled context per slot; paged_insert donates
        # its source, so each slot gets a fresh device copy.
        src = jax.tree.map(jnp.asarray, dense_host)
        cache = paged_insert(cache, src, jnp.asarray(slot),
                             jnp.asarray(page_ids), total_pages)
    del dense_host  # the source must not ride decode

    tok = jnp.zeros((num_slots, 1, cfg.hidden_size), jnp.bfloat16)
    logits, cache = paged_decode_step(params, cfg, tok, cache, total_pages)
    float(jnp.sum(logits))  # compile + warm
    start = time.perf_counter()
    for _ in range(n_steps):
        logits, cache = paged_decode_step(params, cfg, tok, cache, total_pages)
    float(jnp.sum(logits))  # forced readback
    elapsed = time.perf_counter() - start
    return n_steps * num_slots / elapsed


def bench_ttft(lcfg, lm_params, minutes: float = 1.0, runs: int = 3) -> float:
    """p50 time-to-first-token per minute of video (BASELINE.md north-star
    row): 1-fps frames -> ViT -> Memory Bridge -> splice -> 7B prefill ->
    argmax. Same pipeline as benchmarks/ttft.py, reusing the already-
    quantized LM so the bench stays inside the driver budget."""
    import numpy as np

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        MultimodalBatch,
        prepare_multimodal_embeds,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                                          dtype=jnp.bfloat16),
        "lm": lm_params,
    }
    n_frames = max(8, int(minutes * 60) // 8 * 8)
    text_len = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, text_len)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX

    def make_batch(seed):
        videos = jax.random.normal(
            jax.random.PRNGKey(seed), (1, n_frames, 3, 224, 224), jnp.bfloat16)
        return MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, text_len), jnp.int32),
            labels=None, videos=videos, images=None)

    # The engines' admission path (serve/server._admit): splice, then
    # CHUNKED prefill — LM compute proportional to the actual prompt
    # length (~200 tokens here) instead of the 2048-padded splice buffer.
    from videollamb_tpu.models.lm.llama import chunked_prefill

    @jax.jit
    def encode_and_splice(params, batch):
        return prepare_multimodal_embeds(params, cfg, batch)

    def first_token(params, batch, cache):
        spliced = encode_and_splice(params, batch)
        logits, cache = chunked_prefill(
            params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask, cache)
        return jnp.argmax(logits, -1), cache

    cache = init_kv_cache(cfg.lm, 1, cfg.max_length + 64, dtype=jnp.bfloat16)
    tok, _ = first_token(params, make_batch(0), cache)  # compile
    int(tok[0])
    times = []
    for i in range(runs):
        batch = make_batch(i + 1)
        jax.block_until_ready(batch.videos)
        cache = init_kv_cache(cfg.lm, 1, cfg.max_length + 64, dtype=jnp.bfloat16)
        start = time.perf_counter()
        tok, _ = first_token(params, batch, cache)
        int(tok[0])  # forced readback
        times.append(time.perf_counter() - start)
    times.sort()
    return times[len(times) // 2] / minutes


def bench_train_adapter(lm_params_int8, runs: int = 6) -> float:
    """Stage-1 (adapter) train-step time at the production shape on ONE
    chip: frozen int8 7B backbone + frozen bf16 ViT-L tower, AdamW on the
    Memory Bridge projector, 16 frames + text spliced to the full
    2048-token context, remat backbone + rematted chunked attention. This
    is the reference's pretrain configuration (freeze LM+tower, tune
    mm_projector — train.py flag surface; BASELINE.md records its
    full-recipe wall-clock on 4xA800), on the QLoRA-style quantized-
    backbone path: the int8 dequant-matmul is plain XLA and fully
    differentiable w.r.t. activations, so projector grads are exact for
    the quantized model. A bf16 frozen backbone misses one 16 GB chip by
    ~0.7 GB at S=2048 (13.44 GB weights + ~3 GB step temps, measured) —
    bf16 stage-1 and full-backbone training run on the sharded FSDP path
    certified by dryrun_multichip.

    Returns median step time in ms."""
    import numpy as np
    import optax

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        MultimodalBatch,
        causal_lm_loss,
        videollamb_forward,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig()
    k1, k2, _ = jax.random.split(jax.random.PRNGKey(11), 3)
    frozen = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
        "lm": lm_params_int8,
    }
    proj = init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                             dtype=jnp.bfloat16)
    jax.block_until_ready(jax.tree.leaves(frozen["video_tower"])[0])
    tx = optax.adamw(1e-3)
    opt = tx.init(proj)

    text_len = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, text_len)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX

    def make_batch(seed):
        return MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, text_len), jnp.int32),
            labels=jnp.asarray(ids),
            videos=jax.random.normal(
                jax.random.PRNGKey(seed), (1, 16, 3, 224, 224), jnp.bfloat16),
            images=None)

    # `frozen` MUST be a jit argument, not a closure: closed-over arrays
    # are baked into the lowered module as constants — 14.25 GB of
    # captured weights made lowering/compile take >25 min (measured).
    @jax.jit
    def step(frozen, proj, opt, batch):
        def loss_fn(p):
            # chunked = the differentiable online-softmax attention the
            # train step uses (the flash kernel has no VJP).
            logits, spliced = videollamb_forward(
                dict(frozen, mm_projector=p), cfg, batch, remat=True,
                attn_impl="chunked")
            loss, n = causal_lm_loss(logits, spliced.labels)
            return loss, n

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(proj)
        updates, opt = tx.update(grads, opt, proj)
        return optax.apply_updates(proj, updates), opt, loss

    proj, opt, loss = step(frozen, proj, opt, make_batch(0))  # compile
    float(loss)
    times = []
    for i in range(runs):
        batch = make_batch(i + 1)
        jax.block_until_ready(batch.videos)
        t0 = time.perf_counter()
        proj, opt, loss = step(frozen, proj, opt, batch)
        float(loss)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1000.0


def bench_train_qlora(lm_params_int8, runs: int = 4) -> dict:
    """Stage-2-shaped train step on ONE chip: QLoRA full-LM recipe —
    int8 frozen 7B base + LoRA adapters on ALL linears + Memory Bridge
    projector trainable, frozen bf16 ViT-L tower, B=1, ctx 2048, 16
    frames, remat + chunked attention. This is the recipe the reference
    spent 23 h on 4x A800 for (scripts/finetune_video_image.slurm:19-56,
    modulo bf16-full-weights -> int8+LoRA, its documented QLoRA variant
    train.py:896-986), exercised through the REAL trainer machinery
    (create_optimizer tune_mode='lora' + trainable_mask + make_train_step).

    Reports ms/step, per-chip samples/s, and the projected v5e-8
    data-parallel rate (8x the per-chip rate; FSDP sharding of this step
    is certified by dryrun_multichip and the AOT memory analysis in
    tools/aot_memory.py)."""
    import numpy as np

    from videollamb_tpu.config import ModelConfig, TrainConfig
    from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.lora import add_lora_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.train.step import (
        create_optimizer,
        create_train_state,
        make_train_step,
        trainable_mask,
    )

    cfg = ModelConfig()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(17), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                                          dtype=jnp.bfloat16),
        "lm": lm_params_int8,
    }
    params = add_lora_params(params, cfg.lm, r=128, alpha=256.0, rng=k3,
                             dtype=jnp.bfloat16)
    tcfg = TrainConfig(tune_mode="lora", warmup_ratio=0.0)
    tx = create_optimizer(tcfg, total_steps=1000, params=params)
    state = create_train_state(params, tx)
    step = jax.jit(
        make_train_step(cfg, tx, remat=True, attn_impl="chunked",
                        mask=trainable_mask(tcfg, params)),
        donate_argnums=(0,),
    )

    text_len = 64
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, text_len)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX

    def make_batch(seed):
        labels = np.where(np.arange(text_len)[None] < text_len // 2,
                          IGNORE_INDEX, ids)
        return MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, text_len), jnp.int32),
            labels=jnp.asarray(labels),
            videos=jax.random.normal(
                jax.random.PRNGKey(seed), (1, 16, 3, 224, 224), jnp.bfloat16),
            images=None)

    state, metrics = step(state, make_batch(0), jax.random.PRNGKey(0))
    float(metrics["loss"])  # compile + warm
    times = []
    for i in range(runs):
        batch = make_batch(i + 1)
        jax.block_until_ready(batch.videos)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        float(metrics["loss"])
        times.append(time.perf_counter() - t0)
    times.sort()
    ms = times[len(times) // 2] * 1000.0
    sps = 1000.0 / ms
    return {
        "train_qlora_step_ms": round(ms, 1),
        "train_qlora_samples_s": round(sps, 3),
        # 8-way data parallel on a v5e-8 (per-chip step is self-contained:
        # int8 weights + adapters fit one chip; gradient all-reduce of the
        # small adapter/projector trees rides ICI).
        "train_qlora_v5e8_samples_s": round(8 * sps, 2),
        "train_qlora_v5e8_hours_per_1m_samples": round(
            1e6 / (8 * sps) / 3600, 1),
    }


def bench_train_packed(lm_params_int8, runs: int = 3, cfg=None) -> dict:
    """Packed vs padded stage-1 throughput on the SAME four image
    conversations (mixed text lengths 48..224): the static splice pads
    every row to the full 2048-token context (models/splice.py), so the
    padded step runs (4, 2048) through the 7B while the packed step
    (train/dataset.PackedCollator + segment-ID block-causal attention)
    fits all four conversations in ONE (1, 2048) row. Same samples, same
    supervision, ~4x fewer LM token-slots — this measures how much of
    that comes back as real step time on the chip.

    Returns {padded samples/s, packed samples/s, speedup}."""
    import numpy as np
    import optax

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        causal_lm_loss,
        measure_block_tokens,
        videollamb_forward,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.train.dataset import Collator, PackedCollator

    cfg = cfg or ModelConfig()
    k1, k2, _ = jax.random.split(jax.random.PRNGKey(13), 3)
    frozen = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
        "lm": lm_params_int8,
    }
    proj = init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                             dtype=jnp.bfloat16)
    tx = optax.adamw(1e-3)

    rng = np.random.default_rng(0)
    img_size = cfg.vision.image_size
    lens = (48, 96, 160, 224)

    def make_samples(seed):
        out = []
        r = np.random.default_rng(seed)
        for n in lens:
            ids = rng.integers(4, cfg.lm.vocab_size, size=n).astype(np.int32)
            ids[1] = IMAGE_TOKEN_INDEX
            labels = ids.copy()
            labels[: n // 2] = IGNORE_INDEX
            out.append({
                "input_ids": ids, "labels": labels,
                "image": r.normal(size=(3, img_size, img_size)).astype(np.float32),
            })
        return out

    block = measure_block_tokens(dict(frozen, mm_projector=proj), cfg,
                                 "image")
    col_pad = Collator(max_length=cfg.max_length)
    col_pack = PackedCollator(max_length=cfg.max_length, block_tokens=block,
                              k_max=len(lens), rows_bucket=1)

    @jax.jit
    def step(frozen, proj, opt, batch):
        def loss_fn(p):
            logits, spliced = videollamb_forward(
                dict(frozen, mm_projector=p), cfg, batch, remat=True,
                attn_impl="chunked")
            return causal_lm_loss(logits, spliced.labels)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(proj)
        updates, opt = tx.update(grads, opt, proj)
        return optax.apply_updates(proj, updates), opt, loss

    def measure(collator):
        opt = tx.init(proj)
        p, opt, loss = step(frozen, proj, opt, collator(make_samples(1)))
        float(loss)
        times = []
        for i in range(runs):
            batch = collator(make_samples(i + 2))
            jax.block_until_ready(batch.images)
            t0 = time.perf_counter()
            p, opt, loss = step(frozen, p, opt, batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        times.sort()
        return len(lens) / times[len(times) // 2]

    padded = measure(col_pad)
    packed = measure(col_pack)
    return {
        "train_padded_samples_s": round(padded, 2),
        "train_packed_samples_s": round(packed, 2),
        "train_pack_speedup": round(packed / padded, 2),
    }


def _sec_encode(ctx, extra):
    enc = bench_encode()
    extra.update(enc)
    fps = max(enc.get("encode_fps", 0.0), enc.get("encode_int8_fps", 0.0))
    extra["encode_vs_north_star"] = round(fps / BASELINE_ENCODE_FPS, 3)
    extra["encode_note"] = (
        "north star 2000 f/s exceeds the v5e single-chip roofline; the "
        "sustained large-GEMM rate measured through this chip's tunnel "
        "is ~139 TF/s bf16 and ~144 TOP/s int8 (int8 MXU is only ~3% "
        "faster here, not the datasheet 2x), essential-FLOP ceiling "
        "~680 f/s bf16. Aggregate path: params-replicated data-parallel "
        "encode (certified in dryrun_multichip) scales linearly — "
        "8 chips x the single-chip rate clears 2000 f/s on a v5e-8"
    )
    jax.clear_caches()


def _sec_init7b(ctx, extra):
    ctx["cfg7b"], ctx["params7b"] = init_7b()


def _sec_decode(ctx, extra):
    _STATE["tok_s"] = bench_decode(ctx["cfg7b"], ctx["params7b"])


def _sec_devloop(ctx, extra):
    extra["decode_devloop_tok_s"] = round(
        bench_decode_devloop(ctx["cfg7b"], ctx["params7b"], 8), 1)


def _sec_quant(ctx, extra):
    from videollamb_tpu.models.lm.quant import quantize_llama_params

    params = quantize_llama_params(ctx.pop("params7b"))
    jax.block_until_ready(params)
    ctx["params7b"] = params


def _sec_decode_int8(ctx, extra):
    extra["decode_int8_tok_s"] = round(
        bench_decode(ctx["cfg7b"], ctx["params7b"]), 1)


def _sec_dense8(ctx, extra):
    extra["dense_batch8_int8_tok_s"] = round(
        bench_dense_batch(ctx["cfg7b"], ctx["params7b"], 8), 1)


def _sec_paged8(ctx, extra):
    extra["paged_batch8_int8_tok_s"] = round(
        bench_paged_batch(ctx["cfg7b"], ctx["params7b"], 8), 1)


def _sec_paged24(ctx, extra):
    # The serving sweet spot after the round-3 dispatch remeasure: the
    # paged engine scales past the old 8-slot config (24 slots = the
    # measured aggregate peak at 512-token ctx).
    extra["paged_batch24_int8_tok_s"] = round(
        bench_paged_batch(ctx["cfg7b"], ctx["params7b"], 24), 1)


def _sec_paged8_long(ctx, extra):
    # Long-context paged row (VERDICT r4 #4): 8 slots each holding ~2.8k
    # resident tokens in a 3072-capacity table — the regime the gathered
    # kernel was built for (per-slot page DMA, compute ∝ Σ len).
    extra["paged_batch8_ctx2304_int8_tok_s"] = round(
        bench_paged_batch(ctx["cfg7b"], ctx["params7b"], 8,
                          pages_per_seq=40, prompt_len=2304), 1)


def _sec_sampled8(ctx, extra):
    extra["sampled_batch8_int8_tok_s"] = round(
        bench_sampled_batch(ctx["cfg7b"], ctx["params7b"], 8), 1)


def _sec_ttft(ctx, extra):
    extra["ttft_s_per_min_p50"] = round(
        bench_ttft(ctx["cfg7b"], ctx["params7b"]), 3)


def _sec_stream(ctx, extra):
    # Streaming (BASELINE config #5 trail): 12 stream-minutes through the
    # bounded-state LiveInfer at production shapes — enough ticks (~180)
    # for steady-state fps/p99 and the zero-recompile claim; the full-hour
    # run stays in benchmarks/stream_hour.py (recorded in
    # docs/PERFORMANCE.md) so the driver budget holds 12 more minutes of
    # measurements (r4's in-bench 60-minute stream was the budget buster).
    jax.clear_caches()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.stream_hour import run as stream_hour_run
    from videollamb_tpu.config import ModelConfig as _MC
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    _scfg = _MC(max_length=2048)
    _k1, _k2 = jax.random.split(jax.random.PRNGKey(23))
    stream_params = {
        "video_tower": init_vision_params(_k1, _scfg.vision,
                                          dtype=jnp.bfloat16),
        "mm_projector": init_rmt_r_params(_k2, _scfg.bridge,
                                          _scfg.lm.hidden_size,
                                          dtype=jnp.bfloat16),
        "lm": ctx["params7b"],
    }
    # The streaming loop itself is wall-bounded: leave room for the must
    # sections still pending (qlora ~270 s) plus warmup compile slack, so
    # a slower-than-estimated stream degrades to fewer folded minutes
    # instead of blowing the budget (r5 probe: 12 min took >830 s because
    # warmup compiles + per-tick host time were underestimated).
    # Warmup of the streaming shapes (tower kernels, extend buckets,
    # detector, bridge) costs ~150 s after a cache clear; the 12-minute
    # stream needs ~180 ticks of steady state on top — give the section
    # room whenever the budget has it (run 5: 330 s of budget went unused
    # while the stream truncated at 1.7 min).
    deadline = max(60.0, min(480.0, _remaining() - 400.0))
    extra.update(stream_hour_run(minutes=12.0, params=stream_params,
                                 deadline_s=deadline))
    del stream_params
    # No clear_caches here: _sec_niavh drives the SAME streaming engine at
    # the same shapes — sharing the compile cache saves it minutes of
    # remote Mosaic compiles (the r5 probe lost niavh/qlora to exactly
    # that overhead).


def _sec_niavh(ctx, extra):
    # Trimmed NIAVH (VERDICT r4 #3): one 8-minute haystack, two depths,
    # through the SAME streaming engine + real-BPE-tokenizer path as the
    # full hour grid (benchmarks/niavh_hour.py, recorded in
    # docs/PERFORMANCE.md). In-bench this certifies the retention margin
    # stays > 0 and the sustained stream f/s at production shapes; the
    # depth x length decay curve needs the standalone hour run.
    # (No clear_caches: reuses _sec_stream's compiled engine graphs.)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.niavh_hour import run as niavh_run
    from videollamb_tpu.config import ModelConfig as _MC
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    _ncfg = _MC(max_length=2048)
    _k1, _k2 = jax.random.split(jax.random.PRNGKey(29))
    nparams = {
        "video_tower": init_vision_params(_k1, _ncfg.vision,
                                          dtype=jnp.bfloat16),
        "mm_projector": init_rmt_r_params(_k2, _ncfg.bridge,
                                          _ncfg.lm.hidden_size,
                                          dtype=jnp.bfloat16),
        "lm": ctx["params7b"],
    }
    res = niavh_run(lengths=(480,), depths=(0.25, 0.75), params=nparams,
                    cfg=_ncfg, key_prefix="niavh8m",
                    deadline_s=max(60.0, min(270.0, _remaining() - 330.0)))
    res.pop("niavh8m_cells", None)  # per-cell detail stays out of the line
    extra.update(res)
    del nparams
    jax.clear_caches()


def _sec_adapter(ctx, extra):
    jax.clear_caches()  # drop decode-bench executables before training
    extra["train_adapter_step_ms"] = round(
        bench_train_adapter(ctx["params7b"]), 1)


def _sec_packed(ctx, extra):
    extra.update(bench_train_packed(ctx["params7b"]))
    jax.clear_caches()


def _sec_qlora(ctx, extra):
    # LAST 7B section: the train state donates (and thus consumes) the
    # int8 tree — cheapest way to keep the step's peak HBM at one copy of
    # the optimizer state.
    jax.clear_caches()
    extra.update(bench_train_qlora(ctx.pop("params7b")))


# (name, estimated seconds, must) in dependency order. Estimates are the
# calibrated section times from the round-5 full run on the real chip
# (extra["section_s"]) x ~1.3 headroom; re-calibrate whenever a section
# changes. "must" sections carry the north-star metrics — optional
# sections only run if the remaining budget covers them PLUS every
# must-section still pending. Encode runs FIRST: it needs no 7B and the
# second north-star metric must survive even a blown budget downstream.
_SECTIONS = (
    ("encode", 280.0, True, _sec_encode),
    ("init7b", 60.0, True, _sec_init7b),
    ("decode", 45.0, True, _sec_decode),
    ("devloop", 45.0, False, _sec_devloop),
    ("quant", 30.0, True, _sec_quant),
    ("decode_int8", 30.0, True, _sec_decode_int8),
    ("dense8", 60.0, False, _sec_dense8),
    ("paged8", 50.0, True, _sec_paged8),
    ("ttft", 75.0, True, _sec_ttft),
    ("stream12", 400.0, True, _sec_stream),
    ("niavh", 300.0, False, _sec_niavh),
    # Optional paged shapes AFTER the must sections: their gathered-kernel
    # executables recompile remotely every run (Mosaic custom calls miss
    # the persistent cache), 200-430 s each — early placement squeezed the
    # stream/niavh deadlines to nothing (runs 5-7), and run 8 showed an
    # optimistic estimate here OVERRUNNING into the qlora must's reserve.
    # Estimates are the observed COLD compile+run costs; these sections
    # only run when the budget genuinely has that much slack. qlora stays
    # last: it donates params7b into the train state.
    ("paged24", 380.0, False, _sec_paged24),
    ("paged8_long", 450.0, False, _sec_paged8_long),
    ("sampled8", 45.0, False, _sec_sampled8),
    ("adapter", 150.0, False, _sec_adapter),
    ("packed", 270.0, False, _sec_packed),
    ("qlora", 270.0, True, _sec_qlora),
)

# Sections that need the 7B params; skipped (as dep_failed) if init7b or
# quant failed rather than raising AttributeError noise.
_NEEDS_7B = {s[0] for s in _SECTIONS} - {"encode", "init7b"}


def main():
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    atexit.register(_emit)
    threading.Thread(target=_watchdog, daemon=True).start()
    extra = _STATE["extra"]
    extra["budget_s"] = BUDGET_S
    section_s = extra.setdefault("section_s", {})
    ctx = {}
    for i, (name, est, must, fn) in enumerate(_SECTIONS):
        if name in _NEEDS_7B and "params7b" not in ctx:
            extra.setdefault("skipped_dep_failed", []).append(name)
            continue
        reserve = sum(e for n, e, m, _ in _SECTIONS[i + 1:] if m)
        need = est if must else est + reserve
        if _remaining() < need:
            extra.setdefault("skipped_for_budget", []).append(name)
            continue
        t0 = time.monotonic()
        try:
            fn(ctx, extra)
        except Exception as e:  # noqa: BLE001 — e.g. RESOURCE_EXHAUSTED
            extra[f"{name}_error"] = type(e).__name__
            # First line of the message: enough to tell RESOURCE_EXHAUSTED
            # from a wedged tunnel without bloating the JSON line.
            extra[f"{name}_error_msg"] = str(e).split("\n")[0][:160]
            if name in ("init7b", "quant"):
                ctx.pop("params7b", None)
            # Recovery: drop the failed section's executables/arrays and
            # give the async deallocator a beat — without this, one
            # RESOURCE_EXHAUSTED poisoned every later section (r5 run 3).
            jax.clear_caches()
            import gc

            gc.collect()
            time.sleep(3.0)
        section_s[name] = round(time.monotonic() - t0, 1)
        # Free device memory between sections: with the warm persistent
        # cache ALL sections run back-to-back and their pools/caches/
        # executable scratch accumulate — runs 2/3 of round 5 died with
        # RESOURCE_EXHAUSTED at varying sections (paged24 / paged8_long)
        # purely from this buildup, while every section passed standalone.
        # gc frees section-local device arrays; clear_caches additionally
        # drops executables (+ their scratch) after each HBM-heavy 7B
        # section — recompiles reload from the persistent .jax_cache in
        # seconds. stream12->niavh intentionally share live caches.
        import gc

        gc.collect()
        if name in ("dense8", "paged8", "paged24", "paged8_long",
                    "sampled8", "ttft"):
            jax.clear_caches()
            gc.collect()
    _emit()


if __name__ == "__main__":
    main()
