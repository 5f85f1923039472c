"""Anyres multi-patch feature merge, TPU-native.

Reference: llava/model/llava_arch.py:265-331 (encode_images 'spatial'/
'spatial_unpad'/'flat' patch merge) + llava_arch.py:222-250 (unpad_image).

The reference merges a variable number of per-patch CLIP feature grids into
one ragged token stream per image (base features + spatially rearranged
patch grid, optionally unpadded to the original aspect ratio, with a
learned "newline" token terminating every row). That is host-side ragged
torch code; here the merge is a single static-shape masked scatter so the
whole thing stays inside one compiled XLA graph:

- the (NPH, NPW) grid shape and the unpad crop are data (a small int spec
  computed on host in float64, exactly replicating the reference's
  ``int(original_height * scale_factor)`` arithmetic);
- every patch token computes its output slot from pure index arithmetic;
  tokens cropped by unpad (or beyond the sample's real grid) scatter out
  of bounds and are dropped;
- newline tokens are scattered into the end-of-row slots;
- the result is (N_max, D) + validity mask, which feeds the K-sentinel
  splice (models/splice.py) directly — no ragged concat anywhere.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.mm_utils import select_best_resolution


def anyres_spec(
    image_size: Tuple[int, int],
    grid_pinpoints: Sequence[Tuple[int, int]],
    vision_image_size: int,
    patches_per_side: int,
) -> np.ndarray:
    """Host-side: (NPH, NPW, pad_r, pad_c) int32 for one image.

    NPH/NPW from the best pinpoint resolution (reference mm_utils.py:105-117
    get_anyres_image_grid_shape); pad_r/pad_c are the unpad_image crop
    margins on the token grid (llava_arch.py:222-250), computed with the
    same float64 arithmetic as the reference so the kept-row count matches
    its ``int(original_height * scale_factor)`` exactly.
    """
    orig_w, orig_h = image_size
    best_w, best_h = select_best_resolution(image_size, grid_pinpoints)
    npw = best_w // vision_image_size
    nph = best_h // vision_image_size
    h_grid = nph * patches_per_side
    w_grid = npw * patches_per_side
    pad_r = pad_c = 0
    original_aspect = orig_w / orig_h
    current_aspect = w_grid / h_grid
    if original_aspect > current_aspect:
        scale_factor = w_grid / orig_w
        new_height = int(orig_h * scale_factor)
        pad_r = (h_grid - new_height) // 2
    else:
        scale_factor = h_grid / orig_h
        new_width = int(orig_w * scale_factor)
        pad_c = (w_grid - new_width) // 2
    return np.array([nph, npw, pad_r, pad_c], np.int32)


def anyres_max_tokens(num_patches: int, patches_per_side: int, merge_type: str) -> int:
    """Static output buffer length for a P-patch bucket (P includes the
    base resized image at index 0)."""
    hw = patches_per_side * patches_per_side
    if merge_type == "flat":
        return num_patches * hw
    if merge_type == "spatial":
        return num_patches * hw
    if merge_type == "spatial_unpad":
        # base + full grid + one newline per (worst-case) grid row.
        return num_patches * hw + (num_patches - 1) * patches_per_side
    raise ValueError(f"Unexpected mm_patch_merge_type: {merge_type}")


def anyres_merge(
    patch_tokens: jax.Array,  # (P, hw, D): [base, patch_0, ..., patch_{P-2}]
    spec: jax.Array,  # (4,) int32: nph, npw, pad_r, pad_c
    newline: jax.Array,  # (D,) learned image_newline (llava_arch.py:300-303)
    patches_per_side: int,
    merge_type: str = "spatial_unpad",
) -> Tuple[jax.Array, jax.Array]:
    """Merge per-patch projected features -> (N_max, D) tokens + mask.

    Semantics per reference llava_arch.py:
    - 'flat' (:283): all patches flattened in patch order;
    - 'spatial' (:307-309): base first, then the patch grid rearranged to
      raster order over the (NPH*h, NPW*w) token grid;
    - 'spatial_unpad' (:297-306): like 'spatial' but the grid is cropped by
      the unpad margins and every kept row is terminated by ``newline``.
    """
    p, hw, d = patch_tokens.shape
    h = w = patches_per_side
    assert hw == h * w, (hw, h, w)
    n_max = anyres_max_tokens(p, patches_per_side, merge_type)

    if merge_type == "flat":
        return patch_tokens.reshape(n_max, d), jnp.ones((n_max,), bool)

    nph, npw, pad_r, pad_c = spec[0], spec[1], spec[2], spec[3]
    grid_h = nph * h
    grid_w = npw * w

    # Token-grid coordinates of every spatial-patch token.
    p_idx = jnp.arange(p - 1, dtype=jnp.int32)
    ph = p_idx // jnp.maximum(npw, 1)
    pw = p_idx % jnp.maximum(npw, 1)
    r = jnp.arange(h, dtype=jnp.int32)
    c = jnp.arange(w, dtype=jnp.int32)
    big_r = ph[:, None, None] * h + r[None, :, None]  # (P-1, h, 1)
    big_c = pw[:, None, None] * w + c[None, None, :]  # (P-1, 1, w)
    in_grid = (p_idx < nph * npw)[:, None, None]

    spatial = patch_tokens[1:].reshape(p - 1, h, w, d)
    buf = jnp.zeros((n_max, d), patch_tokens.dtype)
    buf = buf.at[:hw].set(patch_tokens[0])  # base features first (:311)

    if merge_type == "spatial":
        ok = in_grid & jnp.ones((1, h, w), bool)
        out_idx = hw + big_r * grid_w + big_c
        total = hw + nph * npw * hw
    else:  # spatial_unpad
        keep_h = grid_h - 2 * pad_r
        keep_w = grid_w - 2 * pad_c
        row_ok = (big_r >= pad_r) & (big_r < grid_h - pad_r)
        col_ok = (big_c >= pad_c) & (big_c < grid_w - pad_c)
        ok = in_grid & row_ok & col_ok
        out_idx = hw + (big_r - pad_r) * (keep_w + 1) + (big_c - pad_c)
        # Newline token at the end of every kept row.
        rows = jnp.arange((p - 1) * h, dtype=jnp.int32)
        nl_idx = jnp.where(rows < keep_h, hw + rows * (keep_w + 1) + keep_w, n_max)
        nl_rows = jnp.broadcast_to(
            newline.astype(patch_tokens.dtype), (rows.shape[0], d)
        )
        buf = buf.at[nl_idx].set(nl_rows, mode="drop")
        total = hw + keep_h * (keep_w + 1)

    out_idx = jnp.where(ok, out_idx, n_max)
    buf = buf.at[out_idx.reshape(-1)].set(spatial.reshape(-1, d), mode="drop")
    mask = jnp.arange(n_max, dtype=jnp.int32) < total
    return buf, mask
