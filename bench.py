"""Headline benchmark: 7B autoregressive decode throughput on one chip.

Prints ONE JSON line:
  {"metric": "decode_tokens_per_sec_7b", "value": N, "unit": "tok/s",
   "vs_baseline": N / 30}

Baseline: the rebuild north-star of >= 30 tokens/sec 7B decode on TPU v5e-8
(BASELINE.md). This measures the full engine path — bf16 Vicuna-7B weights,
static 2048-token KV cache, per-step dynamic_update_slice writes, donated
cache buffers — on a SINGLE v5e chip (the harness exposes one), so any
vs_baseline > 1 beats the 8-chip target on 1/8th the hardware.

The secondary north star (LanguageBind encode fps) is tracked in README
perf notes; the encoder currently runs ~330 frames/s/chip (XLA path,
temporal-attention core is the known bottleneck).
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_TOK_S = 30.0
BASELINE_ENCODE_FPS = 2000.0


def encode_fallback():
    """Secondary metric (LanguageBind encode fps) if the 7B doesn't fit —
    the shared tunnel occasionally leaves the chip with residual
    allocations."""
    from videollamb_tpu.config import VisionConfig
    from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode

    cfg = VisionConfig()
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    batch, frames = 8, 32
    bufs = [jax.random.normal(jax.random.PRNGKey(i), (batch, frames, 3, 224, 224),
                              jnp.bfloat16) for i in range(4)]
    fn = jax.jit(lambda p, x: jnp.sum(vision_encode(p, x, cfg).astype(jnp.float32)))
    float(fn(params, bufs[0]))
    times = []
    for buf in bufs:
        start = time.perf_counter()
        float(fn(params, buf))
        times.append(time.perf_counter() - start)
    fps = batch * frames / min(times)
    print(json.dumps({
        "metric": "languagebind_encode_fps",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_ENCODE_FPS, 3),
    }))


def main():
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        init_llama_params,
        llama_decode_step,
        llama_prefill,
    )

    cfg = LlamaConfig()  # Vicuna-7B dims
    params = init_llama_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    jax.block_until_ready(params)

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

    tok_s = n_steps * batch / elapsed
    print(json.dumps({
        "metric": "decode_tokens_per_sec_7b",
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — e.g. RESOURCE_EXHAUSTED
        import sys

        print(f"primary decode bench failed ({type(e).__name__}); "
              "falling back to encode fps", file=sys.stderr)
        encode_fallback()
