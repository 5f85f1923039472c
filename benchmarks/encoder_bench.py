"""Encoder ablation bench: XLA vs fused Pallas cores (temporal + spatial).

Usage (on the TPU host):
    python benchmarks/encoder_bench.py [--batch 32] [--frames 8]

Reports frames/s for three variants of the LanguageBind ViT-L tower:
  1. XLA everything (round-1 baseline, ~330 f/s)
  2. fused temporal core only
  3. fused temporal + fused spatial cores (current default on TPU)

Timing rules per the axon tunnel quirks: distinct inputs per call and a
scalar readback each iteration.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import videollamb_tpu.models.vision.clip_vit as cv
from videollamb_tpu.config import VisionConfig


def bench(fn, bufs, tag, batch, frames, iters=3):
    for x in bufs[1:3]:
        float(jnp.sum(fn(x)))
    t0 = time.time()
    for x in bufs[3:3 + iters]:
        float(jnp.sum(fn(x)))
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt * 1000:.1f} ms  ({batch * frames / dt:.0f} frames/s)",
          flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    cfg = VisionConfig()
    params = cv.init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    bufs = [
        jax.random.normal(jax.random.PRNGKey(i),
                          (args.batch, args.frames, 3, 224, 224), jnp.bfloat16)
        for i in range(6)
    ]

    orig_temporal = cv._use_fused_temporal
    orig_backend = jax.default_backend()
    results = {}

    # 3. full fused (current default).
    fn0 = jax.jit(lambda p, x: cv.vision_encode(p, x, cfg))
    fn = lambda x: fn0(params, x)  # params as jit ARG: a closed-over tree
    # would constant-fold the in-trace layer stack at compile time
    t0 = time.time()
    float(jnp.sum(fn(bufs[0])))
    print(f"[fused t+s] compile: {time.time() - t0:.1f}s", flush=True)
    results["fused_both"] = bench(fn, bufs, "fused temporal+spatial",
                                  args.batch, args.frames)

    # 2. fused temporal only (spatial back to XLA via dispatch monkeypatch).
    import videollamb_tpu.ops.spatial_attention as sa

    real_core = sa.spatial_core
    sa.spatial_core = sa._xla_core
    fn2j = jax.jit(lambda p, x: cv.vision_encode(p, x, cfg, select_layer=-2))
    fn2 = lambda x: fn2j(params, x)
    t0 = time.time()
    float(jnp.sum(fn2(bufs[0])))
    print(f"[fused t] compile: {time.time() - t0:.1f}s", flush=True)
    results["fused_temporal"] = bench(fn2, bufs, "fused temporal only",
                                      args.batch, args.frames)
    sa.spatial_core = real_core

    # 1. XLA everything.
    cv._use_fused_temporal = lambda *a: False
    sa.spatial_core = sa._xla_core
    fn3j = jax.jit(lambda p, x: cv.vision_encode(p, x, cfg,
                                                 select_layer=-3))  # distinct trace
    fn3 = lambda x: fn3j(params, x)
    # select_layer=-3 drops one layer; scale the time by 23/22 for fairness.
    t0 = time.time()
    float(jnp.sum(fn3(bufs[0])))
    print(f"[xla] compile: {time.time() - t0:.1f}s", flush=True)
    dt = bench(fn3, bufs, "xla (22 of 23 layers, scaled)", args.batch, args.frames)
    results["xla"] = dt * 23 / 22
    sa.spatial_core = real_core
    cv._use_fused_temporal = orig_temporal

    print(f"\nspeedup fused-both vs xla: {results['xla'] / results['fused_both']:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
