"""Video ingest pipeline benchmark: host vs on-device preprocessing.

The encoder benches (encoder_bench.py, bench.py) measure the ViT alone on
pre-staged tensors. Real ingest is decode -> preprocess -> H2D -> encode,
and on a small host the per-frame cv2 resize dominates long before the
chip does. This measures, for a synthetic 360p stream:

  1. host preprocess (data/processing.VideoProcessor) throughput;
  2. on-device preprocess (data/device_preprocess) throughput, including
     the uint8 H2D transfer;
  3. the combined preprocess+encode rate both ways.

Run: python benchmarks/ingest_bench.py [--frames 256] [--h 360] [--w 640]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--h", type=int, default=360)
    p.add_argument("--w", type=int, default=640)
    p.add_argument("--encode", action="store_true",
                   help="also run the ViT-L encoder on the result")
    args = p.parse_args(argv)

    from videollamb_tpu.data.device_preprocess import device_video_preprocess
    from videollamb_tpu.data.processing import VideoProcessor

    rng = np.random.default_rng(0)
    t = args.frames
    clips = [rng.integers(0, 256, size=(t, args.h, args.w, 3)).astype(np.uint8)
             for _ in range(3)]

    host_proc = VideoProcessor(size=224)
    # Warm both paths.
    host_proc(clips[0][:8])
    out = device_video_preprocess(jnp.asarray(clips[0]), size=224,
                                  out_dtype=jnp.bfloat16)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for c in clips:
        host_out = host_proc(c)
    host_s = (time.perf_counter() - start) / len(clips)
    print(f"host preprocess ({t}f {args.h}x{args.w}): "
          f"{host_s*1e3:.1f} ms/clip = {t/host_s:.0f} frames/s")

    start = time.perf_counter()
    for c in clips:
        out = device_video_preprocess(jnp.asarray(c), size=224,
                                      out_dtype=jnp.bfloat16)
    jax.block_until_ready(out)
    dev_s = (time.perf_counter() - start) / len(clips)
    print(f"device preprocess (incl. uint8 H2D): "
          f"{dev_s*1e3:.1f} ms/clip = {t/dev_s:.0f} frames/s")
    print(f"speedup: {host_s/dev_s:.1f}x")

    if args.encode:
        from videollamb_tpu.config import VisionConfig
        from videollamb_tpu.models.vision.clip_vit import (
            init_vision_params,
            vision_encode,
        )

        vcfg = VisionConfig()
        params = init_vision_params(jax.random.PRNGKey(0), vcfg)
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

        def encode_from(pixels):
            return vision_encode(params, pixels.reshape(
                t // vcfg.num_frames, vcfg.num_frames, 3, 224, 224), vcfg)

        # Warm.
        jax.block_until_ready(encode_from(out))

        start = time.perf_counter()
        for c in clips:
            host_px = jnp.asarray(host_proc(c), jnp.bfloat16)
            feats = encode_from(host_px)
        jax.block_until_ready(feats)
        host_e = (time.perf_counter() - start) / len(clips)
        print(f"host preprocess + encode: {t/host_e:.0f} frames/s")

        start = time.perf_counter()
        for c in clips:
            px = device_video_preprocess(jnp.asarray(c), size=224,
                                         out_dtype=jnp.bfloat16)
            feats = encode_from(px)
        jax.block_until_ready(feats)
        dev_e = (time.perf_counter() - start) / len(clips)
        print(f"device preprocess + encode: {t/dev_e:.0f} frames/s")


if __name__ == "__main__":
    main()
