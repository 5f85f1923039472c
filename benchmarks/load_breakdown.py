"""Wall-clock breakdown of the serving-load run: admission vs decode.

Monkey-instruments PagedServingEngine._admit and the decode portion of
step() during a serving_load run and prints where the makespan went.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from benchmarks.serving_load import build_requests, make_engine, parse_args, run_load


def main():
    args = parse_args(["--engine", "paged", "--rate", "4", "--n", "48"])
    engine, cfg, params = make_engine(args)

    stats = {"admit_s": 0.0, "admit_n": 0, "step_s": 0.0, "step_n": 0,
             "admitted": 0}

    orig_admit = engine._admit
    orig_step = engine.step

    def timed_admit():
        before = sum(r is not None for r in engine.slots)
        t0 = time.perf_counter()
        orig_admit()
        dt = time.perf_counter() - t0
        after = sum(r is not None for r in engine.slots)
        if after > before:
            stats["admit_s"] += dt
            stats["admit_n"] += 1
            stats["admitted"] += after - before

    def timed_step(k=1):
        engine._admit = timed_admit
        t0 = time.perf_counter()
        out = orig_step(k)
        stats["step_s"] += time.perf_counter() - t0
        stats["step_n"] += 1
        return out

    engine.step = timed_step
    engine._admit = timed_admit

    warm = (build_requests(cfg, 1, seed=999, video_frac=1.0, prompt_len=192,
                           max_new=4)
            + build_requests(cfg, 1, seed=998, video_frac=0.0, prompt_len=192,
                             max_new=4))
    for r in warm:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for key in stats:
        stats[key] = 0 if isinstance(stats[key], int) else 0.0

    reqs = build_requests(cfg, args.n, args.seed, args.video_frac,
                          args.prompt_len, args.max_new)
    out = run_load(engine, reqs, args.rate, k=args.k, timeout_s=args.timeout)
    out["admit_total_s"] = round(stats["admit_s"], 2)
    out["admit_calls_with_admission"] = stats["admit_n"]
    out["admissions"] = stats["admitted"]
    out["admit_ms_per_admission"] = round(
        1000 * stats["admit_s"] / max(1, stats["admitted"]), 1)
    out["step_total_s"] = round(stats["step_s"], 2)
    out["step_calls"] = stats["step_n"]
    out["decode_total_s"] = round(stats["step_s"] - stats["admit_s"], 2)
    out["decode_ms_per_step_call"] = round(
        1000 * (stats["step_s"] - stats["admit_s"]) / max(1, stats["step_n"]),
        1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
