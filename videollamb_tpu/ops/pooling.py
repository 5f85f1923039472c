"""Adaptive average pooling, expressed as matmuls (MXU-friendly).

Replaces torch.nn.AdaptiveAvgPool2d (reference:
rmt_r_transformer_projector.py:288 pools 16x16 patch grids to 12x12).
Window boundaries match torch exactly: window i covers rows
[floor(i*H/out), ceil((i+1)*H/out)). Since the pooling matrices are static,
XLA fuses the whole pool into two small matmuls instead of gather loops.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def _pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-averaging matrix with torch adaptive-pool windows."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool_2d(x: jax.Array, out_hw: tuple) -> jax.Array:
    """Adaptive average pool over the last two axes.

    Args:
      x: (..., H, W)
      out_hw: (out_h, out_w)
    Returns:
      (..., out_h, out_w), same dtype as x.
    """
    out_h, out_w = out_hw
    h, w = x.shape[-2], x.shape[-1]
    ph = jnp.asarray(_pool_matrix(h, out_h), dtype=x.dtype)
    pw = jnp.asarray(_pool_matrix(w, out_w), dtype=x.dtype)
    # (..., H, W) -> (..., out_h, W) -> (..., out_h, out_w)
    y = jnp.einsum("oh,...hw->...ow", ph, x)
    y = jnp.einsum("pw,...ow->...op", pw, y)
    return y


def pool_frame_tokens(patches: jax.Array, grid: int, out_h: int, out_w: int) -> jax.Array:
    """Pool per-frame patch tokens (N=grid*grid, d) -> (out_h*out_w, d).

    Mirrors the reference bridge's spatial pooling
    (rmt_r_transformer_projector.py:313-319): tokens are laid out row-major
    on a (grid, grid) spatial grid.
    """
    *lead, n, d = patches.shape
    assert n == grid * grid, (n, grid)
    x = patches.reshape(*lead, grid, grid, d)
    x = jnp.moveaxis(x, -1, -3)  # (..., d, grid, grid)
    y = adaptive_avg_pool_2d(x, (out_h, out_w))
    y = jnp.moveaxis(y, -3, -1)  # (..., out_h, out_w, d)
    return y.reshape(*lead, out_h * out_w, d)
