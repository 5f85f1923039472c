"""On-device video preprocessing: resize + crop + normalize on the TPU.

The reference preprocesses on the host (torchvision/cv2 — reference
languagebind/video/processing_video.py:49-60; our host counterpart is
data/processing.VideoProcessor). On a host with few cores the per-frame
cv2 resize becomes the ingest bottleneck long before the encoder does
(measured in benchmarks/ingest_bench.py). This module moves the affine
part of the pipeline onto the chip:

    uint8 (T, H, W, 3) host frames
      -> one small H2D transfer (uint8: 4x smaller than f32)
      -> bilinear short-side scale to `size` (jax.image.resize, half-pixel
         sampling like cv2.INTER_LINEAR)
      -> center crop
      -> /255, OpenAI mean/std normalize, (T, 3, size, size)

all inside ONE jitted graph per (T, H, W) shape, which XLA fuses with the
encoder when composed. Numerics: cv2's fixed-point bilinear differs from
the float bilinear by <1/255 per pixel; parity with VideoProcessor is
asserted to that tolerance in tests/test_device_preprocess.py.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from videollamb_tpu.data.processing import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


@partial(jax.jit, static_argnames=("size", "mean", "std", "out_dtype"))
def device_video_preprocess(
    frames: jax.Array,  # (T, H, W, 3) uint8
    size: int = 224,
    mean: Sequence[float] = OPENAI_DATASET_MEAN,
    std: Sequence[float] = OPENAI_DATASET_STD,
    out_dtype=jnp.float32,
) -> jax.Array:
    """(T, H, W, 3) uint8 -> (T, 3, size, size) normalized frames."""
    t, h, w, c = frames.shape
    x = frames.astype(jnp.float32)
    if h < w:
        new_h, new_w = size, int(w / h * size)
    else:
        new_h, new_w = int(h / w * size), size
    if (new_h, new_w) != (h, w):
        # antialias=False: cv2.INTER_LINEAR (the host processor and the
        # reference's torchvision ShortSideScale) is a plain 2-tap bilinear
        # sample; jax's default antialiased triangle kernel would low-pass
        # the frames differently on downscale.
        x = jax.image.resize(x, (t, new_h, new_w, c), method="linear",
                             antialias=False)
    top = (new_h - size) // 2
    left = (new_w - size) // 2
    x = jax.lax.dynamic_slice(
        x, (0, top, left, 0), (t, size, size, c)
    )
    m = jnp.asarray(mean, jnp.float32) * 255.0
    s = jnp.asarray(std, jnp.float32) * 255.0
    x = (x - m) / s
    return x.transpose(0, 3, 1, 2).astype(out_dtype)


class DeviceVideoProcessor:
    """Drop-in VideoProcessor replacement that returns a DEVICE array.

    Same call contract as data/processing.VideoProcessor (uint8 frames in,
    (T, 3, size, size) out); training-time horizontal flip stays on the
    host caller (a host RNG decision), so this is the inference-path
    processor. One compile per distinct (T, H, W) input shape — pad or
    bucket frame counts upstream for shape-stable streams.
    """

    def __init__(self, size: int = 224, mean=OPENAI_DATASET_MEAN,
                 std=OPENAI_DATASET_STD, out_dtype=jnp.float32):
        self.size = size
        self.mean = tuple(float(v) for v in mean)
        self.std = tuple(float(v) for v in std)
        self.out_dtype = out_dtype
        self.image_mean = mean

    def __call__(self, frames) -> jax.Array:
        arr = jnp.asarray(frames)
        if arr.ndim == 3:
            arr = arr[None]
        return device_video_preprocess(
            arr, size=self.size, mean=self.mean, std=self.std,
            out_dtype=self.out_dtype,
        )
