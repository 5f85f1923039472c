"""Per-phase profile of the paged engine's TTFT path vs the dense engine.

The serving-load bench (benchmarks/serving_load.py) shows WHERE the SLA
stands; this script shows WHY: it times each admission phase (splice,
chunked prefill, page insert) and the steady-state step(k) for both
engines at the load-bench shapes, printing one JSON line.

Usage:  python benchmarks/paged_ttft_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.serving_load import build_requests, make_engine, parse_args


def _t(fn, n=3):
    fn()  # warm
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def profile_engine(kind: str, cfg=None, params=None):
    args = parse_args(["--engine", kind])
    engine, cfg, params = make_engine(args, cfg, params)
    out = {}

    # Warm both admission graphs + decode.
    warm = (build_requests(cfg, 1, seed=999, video_frac=1.0, prompt_len=192,
                           max_new=4)
            + build_requests(cfg, 1, seed=998, video_frac=0.0, prompt_len=192,
                             max_new=4))
    for r in warm:
        engine.submit(r)
    engine.run_until_drained(k=4)

    # Admission timing (one request at a time, drained after).
    for label, vf in (("video", 1.0), ("text", 0.0)):
        def admit(vf=vf):
            reqs = build_requests(cfg, 1, seed=7, video_frac=vf,
                                  prompt_len=192, max_new=4)
            engine.submit(reqs[0])
            engine._admit()
            jax.block_until_ready(engine.logits)
            # Drain the admitted request.
            while engine.has_work():
                engine.step(4)

        out[f"admit_{label}_ms"] = round(_t(admit) * 1000, 1)

    # Steady-state step(k=4) with all slots active.
    reqs = build_requests(cfg, engine.num_slots, seed=11, video_frac=0.0,
                          prompt_len=192, max_new=10_000)
    for r in reqs:
        engine.submit(r)
    engine._admit()
    jax.block_until_ready(engine.logits)

    def step4():
        engine.step(4)

    out["step_k4_full_ms"] = round(_t(step4, n=5) * 1000, 1)
    for r in reqs:
        r.cancelled = True
    while engine.has_work():
        engine.step(4)
    return out, cfg, params


def main():
    out = {}
    cfg = params = None
    for kind in ("dense", "paged"):
        res, cfg, params = profile_engine(kind, cfg, params)
        out[kind] = res
        jax.clear_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
