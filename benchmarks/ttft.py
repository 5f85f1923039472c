"""End-to-end serving latency: time-to-first-token per minute of video.

Tracked north-star metric (BASELINE.md "p50 TTFT per minute of video").
Pipeline measured on the real chip with the flagship topology (random
weights — latency is weight-value independent): 60 frames (1 fps) ->
LanguageBind ViT -> Memory Bridge -> splice -> 7B prefill -> first decoded
token. Prints a JSON summary.

Usage: python benchmarks/ttft.py [--minutes 1] [--runs 3] [--int8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--minutes", type=float, default=1.0)
    parser.add_argument("--runs", type=int, default=3)
    parser.add_argument("--bf16", action="store_true", help="full-precision LM (needs >16GB with the tower+cache; int8 is the default serving config)")
    args = parser.parse_args()

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
    from videollamb_tpu.models.assembly import MultimodalBatch, prepare_multimodal_embeds
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import (
        embed_tokens, init_kv_cache, init_llama_params, llama_prefill,
        llama_decode_step,
    )
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision, dtype=jnp.bfloat16),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size,
                                          dtype=jnp.bfloat16),
        "lm": init_llama_params(k3, cfg.lm, dtype=jnp.bfloat16),
    }
    if not args.bf16:
        from videollamb_tpu.models.lm.quant import quantize_llama_params

        params["lm"] = quantize_llama_params(params["lm"])

    # 1 fps frames for the requested duration, multiple of 8 (processor rule).
    n_frames = int(args.minutes * 60)
    n_frames = max(8, n_frames - n_frames % 8)
    text_len = 64

    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, text_len)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX

    def make_batch(seed):
        videos = jax.random.normal(
            jax.random.PRNGKey(seed), (1, n_frames, 3, 224, 224), jnp.bfloat16)
        return MultimodalBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, text_len), jnp.int32),
            labels=None, videos=videos, images=None)

    cache0 = init_kv_cache(cfg.lm, 1, cfg.max_length + 64, dtype=jnp.bfloat16)

    @jax.jit
    def first_token(params, batch, cache):
        spliced = prepare_multimodal_embeds(params, cfg, batch)
        logits, cache = llama_prefill(
            params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask, cache)
        return jnp.argmax(logits, -1), cache

    tok, cache = first_token(params, make_batch(0), cache0)  # compile
    int(tok[0])

    times = []
    for i in range(args.runs):
        batch = make_batch(i + 1)
        jax.block_until_ready(batch.videos)
        cache = init_kv_cache(cfg.lm, 1, cfg.max_length + 64, dtype=jnp.bfloat16)
        start = time.perf_counter()
        tok, cache = first_token(params, batch, cache)
        int(tok[0])  # forced readback
        times.append(time.perf_counter() - start)

    times.sort()
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": "ttft_per_minute_of_video",
        "value": round(p50 / args.minutes, 3),
        "unit": "s",
        "frames": n_frames,
        "runs": args.runs,
        "int8": not args.bf16,
    }))


if __name__ == "__main__":
    main()
