"""Per-component wall-clock breakdown of the LanguageBind ViT-L encoder.

Times (on the real chip) the full encode, the encode without temporal
attention, isolated spatial-attention core, isolated temporal kernel, and a
pure-GEMM lower bound (qkvo+mlp matmuls only) at production shapes, so the
gap to the ~950 f/s roofline is attributable per stage.
"""

import time

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode

B, T = 32, 8
FRAMES = B * T


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    times = []
    for _ in range(n):
        start = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - start)
    return min(times)


def main():
    cfg = VisionConfig()
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    px = jax.random.normal(jax.random.PRNGKey(1), (B, T, 3, 224, 224), jnp.bfloat16)

    full = timeit(jax.jit(lambda p, x: vision_encode(p, x, cfg)), params, px)
    print(f"full encode:          {full*1e3:8.1f} ms  {FRAMES/full:7.1f} f/s")

    cfg_img = VisionConfig(add_time_attn=False)
    p_img = init_vision_params(jax.random.PRNGKey(0), cfg_img, dtype=jnp.bfloat16)
    spatial_only = timeit(jax.jit(lambda p, x: vision_encode(p, x, cfg_img)), p_img, px)
    print(f"no temporal:          {spatial_only*1e3:8.1f} ms  {FRAMES/spatial_only:7.1f} f/s")
    print(f"temporal cost:        {(full-spatial_only)*1e3:8.1f} ms")

    # Isolated spatial core at production shape: (B*T, heads, N, e)
    from videollamb_tpu.ops.spatial_attention import spatial_core

    n, heads, e = 257, 16, 64
    q = jax.random.normal(jax.random.PRNGKey(2), (FRAMES, heads, n, e), jnp.bfloat16)
    sp = timeit(jax.jit(lambda a, b, c: spatial_core(a, b, c)), q, q, q)
    print(f"spatial core x23:     {sp*23*1e3:8.1f} ms  (one: {sp*1e3:.2f} ms)")

    # Pure-GEMM lower bound: qkvo (4 dxd) + mlp (2 dx4d) + temporal qkvo.
    d, inter = 1024, 4096
    x = jax.random.normal(jax.random.PRNGKey(3), (FRAMES * n, d), jnp.bfloat16)
    wq = jax.random.normal(jax.random.PRNGKey(4), (d, d), jnp.bfloat16)
    wm1 = jax.random.normal(jax.random.PRNGKey(5), (d, inter), jnp.bfloat16)
    wm2 = jax.random.normal(jax.random.PRNGKey(6), (inter, d), jnp.bfloat16)

    @jax.jit
    def gemms(x):
        h = x
        for _ in range(8):  # 4 spatial qkvo + 4 temporal qkvo
            h = jnp.dot(h, wq, preferred_element_type=jnp.bfloat16)
        h = jnp.dot(jnp.dot(h, wm1, preferred_element_type=jnp.bfloat16), wm2,
                    preferred_element_type=jnp.bfloat16)
        return h

    g = timeit(gemms, x)
    print(f"gemm floor x23:       {g*23*1e3:8.1f} ms")

    flops_frame = 23 * (8 * n * d * d * 2 + 16 * n * d * d // 2 * 2 + 4 * n * n * d)
    # report MXU utilization of full encode
    total_flops = FRAMES * (23 * (24 * n * d * d * 2 / 2 + 4 * n * n * d))
    print(f"approx util:          {total_flops/full/1e12:8.1f} TFLOP/s of 197 peak")


if __name__ == "__main__":
    main()
