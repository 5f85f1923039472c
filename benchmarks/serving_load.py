"""Open-loop serving load benchmark: Poisson arrivals -> SLA percentiles.

The throughput benches in bench.py measure closed-loop aggregate tok/s at
full occupancy; production serving is judged on LATENCY UNDER LOAD. This
driver offers requests to the continuous-batching engines
(serve/server.ServingEngine, serve/paged.PagedServingEngine) at a Poisson
rate and reports time-to-first-token and end-to-end percentiles — the
numbers a deployment actually SLAs on. Open-loop (arrivals don't wait for
completions), so queueing delay is visible in TTFT when the offered rate
exceeds capacity.

Workload: a configurable fraction of requests carry 16 video frames
through the full tower -> bridge -> splice admission path; the rest are
text-only. One prompt-length bucket per modality keeps the compile count
at two admission graphs (warmed up before the timed phase).

Usage (real chip):
    python benchmarks/serving_load.py --engine dense --rate 4 --n 48
    python benchmarks/serving_load.py --engine paged --video-frac 0.5
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from typing import List, Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _percentile(xs: List[float], p: float) -> float:
    return float(np.percentile(np.asarray(xs), p)) if xs else float("nan")


def build_requests(cfg, n: int, seed: int, video_frac: float,
                   prompt_len: int, max_new: int,
                   temperature: float = 0.0):
    """n requests; deterministic per seed. Video rows share one frame
    buffer (the content doesn't matter for timing; admission compute is
    identical), text rows share one ids template with per-request noise."""
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    # 8 frames = one bridge segment = 8 x tokens_per_frame visual tokens;
    # make_engine sizes the context to hold them unclipped. (16-frame
    # prompts exceed even the production 2048 context at 7B — that is the
    # reference's own truncation regime, not a serving-latency workload.)
    frames = jax.random.normal(
        jax.random.PRNGKey(seed), (1, 8, 3, cfg.vision.image_size,
                                   cfg.vision.image_size), jnp.bfloat16)
    reqs = []
    for i in range(n):
        ids = rng.integers(4, cfg.lm.vocab_size,
                           size=(1, prompt_len)).astype(np.int32)
        with_video = rng.random() < video_frac
        if with_video:
            ids[0, 2] = VIDEO_TOKEN_INDEX
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, prompt_len), jnp.int32),
            labels=None,
            videos=frames if with_video else None,
            images=None,
        )
        # prompt_len is the row's mask sum for ALL rows — video rows use
        # the engine's verified-once host splice formula, killing the
        # per-admission device sync (serve/server.spliced_prompt_len_host).
        reqs.append(Request(uid=i, batch=batch, max_new_tokens=max_new,
                            temperature=temperature, prompt_len=prompt_len))
    return reqs


def run_load(engine, requests, rate: float, k: int = 4,
             timeout_s: float = 600.0) -> dict:
    """Offer ``requests`` at Poisson ``rate`` (req/s); drive the engine;
    return SLA metrics. TTFT/e2e are measured from each request's
    SCHEDULED arrival, so queueing counts against the SLA (open loop)."""
    rng = np.random.default_rng(1234)
    arrivals = np.cumsum(rng.exponential(1.0 / rate, size=len(requests)))
    meta = {r.uid: {} for r in requests}

    t0 = time.perf_counter()

    def on_token(req, tok, _t0=t0):
        m = meta[req.uid]
        if "first" not in m:
            m["first"] = time.perf_counter() - _t0

    for r in requests:
        r.on_token = on_token

    submitted = 0
    n_done = 0
    total_tokens = 0
    while n_done < len(requests):
        now = time.perf_counter() - t0
        if now > timeout_s:
            raise TimeoutError(f"load run exceeded {timeout_s}s "
                               f"({n_done}/{len(requests)} done)")
        while submitted < len(requests) and arrivals[submitted] <= now:
            engine.submit(requests[submitted])
            submitted += 1
        if not engine.has_work():
            if submitted < len(requests):
                time.sleep(min(0.005, max(0.0, arrivals[submitted] - now)))
            continue
        for req in engine.step(k):
            m = meta[req.uid]
            m["done"] = time.perf_counter() - t0
            total_tokens += len(req.tokens)
            n_done += 1
    makespan = time.perf_counter() - t0

    # Requests the engine dropped (rejected/cancelled) completed without a
    # first token — count them, keep them out of the latency percentiles.
    rejected = sum(1 for r in requests if r.error is not None)
    ttft = [meta[r.uid]["first"] - arrivals[i]
            for i, r in enumerate(requests) if "first" in meta[r.uid]]
    e2e = [meta[r.uid]["done"] - arrivals[i]
           for i, r in enumerate(requests) if "first" in meta[r.uid]]
    return {
        "n_requests": len(requests),
        "rejected": rejected,
        "rate_rps": rate,
        "k": k,
        "ttft_p50_s": round(_percentile(ttft, 50), 4),
        "ttft_p99_s": round(_percentile(ttft, 99), 4),
        "e2e_p50_s": round(_percentile(e2e, 50), 4),
        "e2e_p99_s": round(_percentile(e2e, 99), 4),
        "aggregate_tok_s": round(total_tokens / makespan, 1),
        "total_tokens": total_tokens,
        "makespan_s": round(makespan, 2),
    }


def make_engine(args, cfg=None, params=None):
    """Build the (int8 7B by default) engine. ``cfg``/``params`` may be
    injected (tests use the tiny config)."""
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    if cfg is None:
        # Short-context serving profile: the context must hold the
        # LONGEST spliced prompt — video rows splice in 8 frames x
        # tokens_per_frame visual tokens (they replace the one sentinel)
        # — plus the decode budget. A blanket 2048 buffer would only slow
        # admission and (dense) blow 8 slots past HBM; too-small and the
        # splice silently truncates the video tokens, understating video
        # admission cost (code-review finding, round 3).
        base = ModelConfig()
        visual = (8 * base.bridge.tokens_per_frame
                  if args.video_frac > 0 else 0)
        need = args.prompt_len - 1 + visual + args.max_new + 64
        ctx = 64 * (-(-need // 64))
        cfg = dataclasses.replace(base, max_length=ctx)
    if params is None:
        from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
        from videollamb_tpu.models.lm.llama import init_llama_params
        from videollamb_tpu.models.lm.quant import quantize_llama_params
        from videollamb_tpu.models.vision.clip_vit import init_vision_params

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        lm = init_llama_params(k3, cfg.lm, dtype=jnp.bfloat16)
        jax.block_until_ready(lm)
        lm = quantize_llama_params(lm)
        params = {
            "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
            "mm_projector": init_rmt_r_params(k2, cfg.bridge,
                                              cfg.lm.hidden_size,
                                              dtype=jnp.bfloat16),
            "lm": lm,
        }
        jax.block_until_ready(params["video_tower"])
    if args.engine == "paged":
        engine = PagedServingEngine(params, cfg, num_slots=args.slots,
                                    quantize_kv=True,
                                    total_pages=args.total_pages)
    else:
        engine = ServingEngine(params, cfg, num_slots=args.slots,
                               max_seq_len=cfg.max_length + 128)
    return engine, cfg, params


def main(argv: Optional[List[str]] = None, cfg=None, params=None) -> dict:
    args = parse_args(argv)
    engine, cfg, params = make_engine(args, cfg, params)

    # Warmup: a FULL convoy — one slot-count's worth of mixed-modality
    # requests submitted together and drained. Covers both admission
    # graphs, the decode loop at full occupancy, admission into every
    # slot, slot release, and the video rows' one-time host-splice-length
    # verification sync (serve/server._resolve_prompt_len). A 2-request
    # warmup left the first timed convoy paying those (and, before the
    # host page-table mirror, ~8 s of per-update-count scatter compiles —
    # the round-3 paged TTFT collapse).
    warm = (build_requests(cfg, max(1, args.slots // 2), seed=999,
                           video_frac=1.0, prompt_len=args.prompt_len,
                           max_new=4, temperature=args.temperature)
            + build_requests(cfg, max(1, args.slots // 2), seed=998,
                             video_frac=0.0, prompt_len=args.prompt_len,
                             max_new=4, temperature=args.temperature))
    for r in warm:
        engine.submit(r)
    engine.run_until_drained(k=args.k)

    reqs = build_requests(cfg, args.n, args.seed, args.video_frac,
                          args.prompt_len, args.max_new,
                          temperature=args.temperature)
    out = run_load(engine, reqs, args.rate, k=args.k,
                   timeout_s=args.timeout)
    out.update({
        "engine": args.engine,
        "num_slots": args.slots,
        "video_frac": args.video_frac,
        "prompt_len": args.prompt_len,
        "max_new": args.max_new,
        "temperature": args.temperature,
    })
    print(json.dumps(out))
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--engine", choices=("dense", "paged"), default="dense")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--rate", type=float, default=4.0, help="requests/sec")
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--video-frac", type=float, default=0.25)
    p.add_argument("--prompt-len", type=int, default=192)
    p.add_argument("--max-new", type=int, default=48)
    p.add_argument("--k", type=int, default=4,
                   help="device-side decode steps per host sync")
    p.add_argument("--total-pages", type=int, default=None,
                   help="paged engine pool size (oversubscribe: slots "
                        "backpressure when the pool is full; default = "
                        "full per-slot capacity, which exceeds HBM past "
                        "~12 slots at video contexts)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="per-request sampling temperature (sampled "
                        "requests ride the round-3 device sampled scan)")
    p.add_argument("--timeout", type=float, default=600.0)
    return p.parse_args(argv)


if __name__ == "__main__":
    main()
