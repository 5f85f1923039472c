"""Headline benchmark: LanguageBind ViT-L/14 encode throughput on one chip.

Prints ONE JSON line:
  {"metric": "languagebind_encode_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N / 2000}

Baseline: the rebuild north-star of 2,000 frames/sec/chip for the video
tower (BASELINE.md). The tower dominates the offline pipeline's device time
(24 transformer layers x 257 tokens per frame, plus temporal attention).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 2000.0


def main():
    from videollamb_tpu.config import VisionConfig
    from videollamb_tpu.models.vision.clip_vit import (
        init_vision_params,
        vision_encode,
    )

    cfg = VisionConfig()  # ViT-L/14 @224, temporal attention, 24 layers
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    batch, frames = 8, 32  # 256 frames per step
    # Distinct inputs + a forced scalar readback per iteration: the remote
    # TPU tunnel caches identical executions and reports async dispatch as
    # done, so naive timing wildly over-reports.
    bufs = [
        jax.random.normal(jax.random.PRNGKey(i), (batch, frames, 3, 224, 224),
                          jnp.bfloat16)
        for i in range(4)
    ]
    jax.block_until_ready(bufs)

    fn = jax.jit(
        lambda p, x: jnp.sum(vision_encode(p, x, cfg).astype(jnp.float32))
    )
    float(fn(params, bufs[0]))  # compile

    times = []
    for buf in bufs:
        start = time.perf_counter()
        float(fn(params, buf))
        times.append(time.perf_counter() - start)

    fps = (batch * frames) / min(times)
    print(json.dumps({
        "metric": "languagebind_encode_fps",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
