"""Micro-profile of the admission path phases (splice / prefill / insert).

Times each device phase of one paged-engine admission with forced
completion between phases (block_until_ready), separating compute from
the host-sync and dispatch overheads that dominate TTFT under load.
Prints one JSON line.
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
    fn()
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best or 1e9, time.perf_counter() - t0)
    return best * 1000


def main():
    from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
    from videollamb_tpu.models.lm.llama import chunked_prefill, init_kv_cache
    from videollamb_tpu.models.lm.paged import paged_insert

    args = parse_args(["--engine", "paged"])
    engine, cfg, params = make_engine(args)
    out = {}

    for label, vf in (("video", 1.0), ("text", 0.0)):
        req = build_requests(cfg, 1, seed=7, video_frac=vf,
                             prompt_len=192, max_new=4)[0]

        def splice():
            s = prepare_multimodal_embeds_fast(params, cfg, req.batch,
                                               deterministic=True)
            jax.block_until_ready(s.embeds)
            return s

        out[f"{label}_splice_ms"] = round(_t(splice), 1)
        spliced = splice()

        def plen():
            return int(np.asarray(jnp.sum(spliced.attention_mask)))

        out[f"{label}_len_sync_ms"] = round(_t(plen), 1)
        prompt_len = plen()
        out[f"{label}_prompt_len"] = prompt_len

        def cache_init():
            c = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.bfloat16)
            jax.block_until_ready(c.k)
            return c

        out[f"{label}_cache_init_ms"] = round(_t(cache_init), 1)
        single = cache_init()

        def prefill():
            lg, c = chunked_prefill(params["lm"], cfg.lm,
                                    spliced.embeds.astype(jnp.bfloat16),
                                    spliced.attention_mask,
                                    cache_init(), lengths=prompt_len)
            jax.block_until_ready(lg)
            return lg, c

        out[f"{label}_prefill_ms"] = round(_t(prefill), 1)
        _, single = prefill()

        n_pages = engine.allocator.pages_needed(prompt_len, engine.page_size)
        page_ids = np.full((engine.pages_per_seq,), 0, np.int32)
        page_ids[:n_pages] = np.arange(1, n_pages + 1)

        def insert():
            engine.cache = paged_insert(engine.cache, single, jnp.asarray(0),
                                        jnp.asarray(page_ids),
                                        engine.total_pages)
            jax.block_until_ready(engine.cache.lengths)

        out[f"{label}_insert_ms"] = round(_t(insert), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
