"""Per-component wall-clock breakdown of the LanguageBind ViT-L encoder.

Times (on the real chip) the full encode, the encode without temporal
attention, the isolated attention cores, and a pure-GEMM lower bound at
production shapes, so the gap to the ~950 f/s roofline is attributable per
stage. Axon-tunnel rules: every timed call uses a distinct input and forces
a scalar readback.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import init_vision_params, vision_encode

B, T = 32, 8
FRAMES = B * T
N_ITER = 4


def timeit(make_fn, make_input, n=N_ITER):
    """make_fn() -> jitted fn returning a scalar; make_input(i) -> args."""
    fn = make_fn()
    float(fn(*make_input(999)))  # compile
    times = []
    for i in range(n):
        args = make_input(i)
        jax.block_until_ready(args)
        start = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - start)
    return min(times)


def main():
    cfg = VisionConfig()
    params = init_vision_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    def px(i):
        return (jax.random.normal(jax.random.PRNGKey(i), (B, T, 3, 224, 224),
                                  jnp.bfloat16),)

    def px_p(i):
        return (params,) + px(i)

    full = timeit(
        lambda: jax.jit(lambda p, x: jnp.sum(vision_encode(p, x, cfg)
                                             .astype(jnp.float32))), px_p)
    print(f"full encode:          {full*1e3:8.1f} ms  {FRAMES/full:7.1f} f/s")

    cfg_img = VisionConfig(add_time_attn=False)
    p_img = init_vision_params(jax.random.PRNGKey(0), cfg_img, dtype=jnp.bfloat16)
    def px_pi(i):
        return (p_img,) + px(i)

    sp_only = timeit(
        lambda: jax.jit(lambda p, x: jnp.sum(vision_encode(p, x, cfg_img)
                                             .astype(jnp.float32))), px_pi)
    print(f"no temporal:          {sp_only*1e3:8.1f} ms  {FRAMES/sp_only:7.1f} f/s")
    print(f"temporal cost:        {(full-sp_only)*1e3:8.1f} ms")

    # Isolated spatial core at production shape: (B*T, heads, N, e), x23.
    from videollamb_tpu.ops.spatial_attention import spatial_core

    n, heads, e = 257, 16, 64

    def qkv(i):
        k = jax.random.PRNGKey(i)
        mk = lambda s: jax.random.normal(jax.random.fold_in(k, s),
                                         (FRAMES, heads, n, e), jnp.bfloat16)
        return (mk(0), mk(1), mk(2))

    sp = timeit(
        lambda: jax.jit(lambda a, b, c: jnp.sum(spatial_core(a, b, c)
                                                .astype(jnp.float32))), qkv)
    print(f"spatial core x23:     {sp*23*1e3:8.1f} ms  (one: {sp*1e3:.2f} ms)")

    # Pure-GEMM lower bound: 8 dxd (spatial+temporal qkvo) + mlp, x23.
    d, inter = 1024, 4096
    wq = jax.random.normal(jax.random.PRNGKey(1), (d, d), jnp.bfloat16)
    wm1 = jax.random.normal(jax.random.PRNGKey(2), (d, inter), jnp.bfloat16)
    wm2 = jax.random.normal(jax.random.PRNGKey(3), (inter, d), jnp.bfloat16)

    def gemm_fn():
        @jax.jit
        def f(x, wq=wq, wm1=wm1, wm2=wm2):
            h = x
            for _ in range(8):
                h = jnp.dot(h, wq, preferred_element_type=jnp.bfloat16)
            h = jnp.dot(jnp.dot(h, wm1, preferred_element_type=jnp.bfloat16),
                        wm2, preferred_element_type=jnp.bfloat16)
            return jnp.sum(h.astype(jnp.float32))
        return f

    def xin(i):
        return (jax.random.normal(jax.random.PRNGKey(100 + i),
                                  (FRAMES * n, d), jnp.bfloat16),)

    g = timeit(gemm_fn, xin)
    gflop = (8 * 2 * FRAMES * n * d * d + 2 * 2 * FRAMES * n * d * inter) / 1e9
    print(f"gemm floor x23:       {g*23*1e3:8.1f} ms  "
          f"({gflop/g/1e3:.0f} TF/s on {gflop:.0f} GFLOP)")

    total_flops = FRAMES * 23 * (24 * n * d * d + 4 * n * n * d + 8 * n * d * d)
    print(f"full-encode util:     {total_flops/full/1e12:8.1f} TFLOP/s of 197 peak")


if __name__ == "__main__":
    main()
