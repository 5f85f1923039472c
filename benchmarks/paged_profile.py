"""Where does the paged engine's time go? (VERDICT r3 #2: paged TTFT p50
was 13x dense at 4 req/s short-context — this breaks the pipeline into
admission vs step costs so the fix targets the real term.)

Measures, on the real chip at the serving_load.py shape (int8 7B, 8
slots, 192-token prompts, 25%% 8-frame video):

  - admission wall time per request class (text / video), split into
    prepare+prefill vs engine bookkeeping (insert for paged);
  - step(k=4) wall time at full occupancy;
  - paged_insert standalone vs pool size (the pool-copy hypothesis);
  - chunked_prefill standalone.

    python benchmarks/paged_profile.py [--slots 8]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--prompt-len", type=int, default=192)
    p.add_argument("--max-new", type=int, default=48)
    p.add_argument("--reps", type=int, default=6)
    return p.parse_args(argv)


def main(argv=None) -> dict:
    args = _args(argv)
    sys.argv = [sys.argv[0]]

    from benchmarks.serving_load import build_requests, make_engine

    class LoadArgs:
        engine = "paged"
        slots = args.slots
        video_frac = 0.25
        prompt_len = args.prompt_len
        max_new = args.max_new
        total_pages = None

    engine, cfg, params = make_engine(LoadArgs())
    def emit(k, v):
        out[k] = v
        print(json.dumps({k: v}), flush=True)

    out = {"ctx": cfg.max_length, "page_size": engine.page_size,
           "total_pages": engine.total_pages,
           "pages_per_seq": engine.pages_per_seq}
    pool_bytes = sum(
        int(np.prod(a.shape)) * a.dtype.itemsize
        for a in (engine.cache.k_pages, engine.cache.v_pages))
    out["pool_mb"] = round(pool_bytes / 2**20, 1)

    reqs = build_requests(cfg, 64, seed=0, video_frac=0.0,
                          prompt_len=args.prompt_len, max_new=args.max_new)
    vreqs = build_requests(cfg, 64, seed=1, video_frac=1.0,
                           prompt_len=args.prompt_len, max_new=args.max_new)

    # Warm all admission graphs + decode.
    engine.submit(reqs[0]); engine.submit(vreqs[0])
    engine.run_until_drained(k=4)

    # --- admission cost, text and video (engine.step with empty slots =>
    # pure admission; k=0 decode steps by measuring _admit directly).
    def time_admissions(pool, n):
        ts = []
        for i in range(1, n + 1):
            r = pool[i]
            engine.submit(r)
            t0 = time.perf_counter()
            engine._admit()
            jax.block_until_ready(engine.logits)
            ts.append(time.perf_counter() - t0)
            # drain to free the slot
            engine.run_until_drained(k=8)
        return float(np.median(ts))

    emit("admit_text_s", round(time_admissions(reqs, args.reps), 4))
    emit("admit_video_s", round(time_admissions(vreqs, args.reps), 4))

    # --- step cost at full occupancy.
    for i in range(args.slots):
        engine.submit(reqs[8 + i])
    engine._admit()
    jax.block_until_ready(engine.logits)
    t0 = time.perf_counter()
    nsteps = 4
    for _ in range(nsteps):
        engine.step(k=4)
    jax.block_until_ready(engine.logits)
    emit("step_k4_s", round((time.perf_counter() - t0) / nsteps, 4))
    out["step_ms_per_token_row"] = round(
        1000 * out["step_k4_s"] / 4, 2)
    engine.run_until_drained(k=8)
    # Free the engine pool before the standalone allocations (the two
    # together exceeded HBM next to the 7B weights — first run OOMed).
    page_size, total_pages, pps = (engine.page_size, engine.total_pages,
                                   engine.pages_per_seq)
    del engine
    import gc
    gc.collect()

    # --- paged_insert standalone (the pool-copy hypothesis): insert a
    # prompt_len-token single cache into pools of growing size.
    from videollamb_tpu.models.lm.llama import init_kv_cache
    from videollamb_tpu.models.lm.paged import (
        init_paged_cache,
        paged_insert,
    )

    single = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.bfloat16)
    single = single._replace(length=jnp.asarray([args.prompt_len]))
    for total in (total_pages // 4, total_pages):
        cache = init_paged_cache(cfg.lm, args.slots, total,
                                 page_size=page_size,
                                 pages_per_seq=pps, quantize=True)
        ids = np.full((pps,), 0, np.int32)
        ids[: pps] = np.arange(1, pps + 1)
        f = jax.jit(lambda c, s: paged_insert(c, s, jnp.asarray(0),
                                              jnp.asarray(ids), total))
        c2 = f(cache, single)
        jax.block_until_ready(c2.k_pages)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            c2 = f(cache, single)
            jax.block_until_ready(c2.k_pages)
        emit(f"paged_insert_p{total}_s", round(
            (time.perf_counter() - t0) / args.reps, 4))

    # --- chunked_prefill standalone at the spliced prompt shape.
    from videollamb_tpu.models.lm.llama import chunked_prefill

    for length, tag in ((args.prompt_len, "text"),
                        (cfg.max_length, "spliced_max")):
        emb = jax.random.normal(jax.random.PRNGKey(0),
                                (1, cfg.max_length, cfg.lm.hidden_size),
                                jnp.bfloat16)
        mask = jnp.asarray(
            (np.arange(cfg.max_length) < length)[None].astype(np.int32))
        sc = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.bfloat16)
        f = jax.jit(lambda e, m, c, n: chunked_prefill(
            params["lm"], cfg.lm, e, m, c, lengths=n))
        logits, c2 = f(emb, mask, sc, length)
        jax.block_until_ready(logits)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            logits, c2 = f(emb, mask, sc, length)
            jax.block_until_ready(logits)
        emit(f"chunked_prefill_{tag}_s", round(
            (time.perf_counter() - t0) / args.reps, 4))

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
