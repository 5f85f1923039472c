"""SceneTilling semantic video segmentation — TPU-native.

Splits a video into semantic segments by detecting "depth" minima in the
cosine-similarity curve of adjacent frame CLS embeddings.

Behavioral parity with the reference (llava/model/multimodal_projector/
self_segment.py): ``cal_depth_score`` walks left/right along monotone runs of
the similarity curve to find the local peaks around each position
(self_segment.py:3-21). That O(n^2) Python loop has an exact O(n) recurrence:

    the left peak of position i equals the left peak of i-1 whenever
    sim[i-1] >= sim[i] (the walk from i immediately steps into the walk of
    i-1), and sim[i] otherwise.

which maps onto ``lax.scan`` / ``lax.associative_scan`` with static shapes —
no data-dependent control flow, fully jittable and vmappable.

All functions return fixed-shape arrays with validity masks so the caller can
stay inside one compiled graph regardless of how many boundaries fire.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_similarity(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Row-wise cosine similarity between two (n, d) arrays.

    Matches torch.cosine_similarity's eps clamping (denominator floored at
    eps per vector norm).
    """
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def _monotone_run_peaks(sim: jax.Array, *, reverse: bool) -> jax.Array:
    """Peak value at the end of the maximal non-decreasing run left (or right)
    of each position. O(n) scan replacing the reference's nested loops."""

    def step(carry, x):
        prev_sim, prev_peak = carry
        peak = jnp.where(prev_sim >= x, prev_peak, x)
        return (x, peak), peak

    init = (sim[-1] if reverse else sim[0], sim[-1] if reverse else sim[0])
    xs = sim[::-1] if reverse else sim
    (_, _), peaks = jax.lax.scan(step, init, xs[1:])
    peaks = jnp.concatenate([xs[:1], peaks])
    return peaks[::-1] if reverse else peaks


def depth_scores(sim: jax.Array) -> jax.Array:
    """Depth score per adjacent-frame similarity (reference
    self_segment.py:3-21): lpeak + rpeak - 2*sim."""
    lpeak = _monotone_run_peaks(sim, reverse=False)
    rpeak = _monotone_run_peaks(sim, reverse=True)
    return lpeak + rpeak - 2.0 * sim


def left_depth_scores(sim: jax.Array) -> jax.Array:
    """Causal (streaming) depth score: lpeak - sim (reference
    self_segment.py:62-74). Only looks left, usable online."""
    lpeak = _monotone_run_peaks(sim, reverse=False)
    return lpeak - sim


def _frame_sims(features: jax.Array) -> jax.Array:
    return cosine_similarity(features[:-1, :], features[1:, :])


@partial(jax.jit, static_argnames=("k",))
def segment_topk(features: jax.Array, k: int = 3) -> jax.Array:
    """Top-k SceneTilling boundaries (production path).

    Equivalent to reference ``segment(features, k=k)``
    (self_segment.py:24-60): top-k depth-score indices, sorted ascending,
    with the final frame index appended (topk indices range over the T-1
    similarity positions 0..T-2, so T-1 is always appended).

    Args:
      features: (T, d) per-frame CLS embeddings, T >= k+1.
    Returns:
      (k+1,) int32 sorted segment-end frame indices; last entry is T-1.
    """
    t = features.shape[0]
    sims = _frame_sims(features)
    depths = depth_scores(sims)
    _, idx = jax.lax.top_k(depths, k)
    bounds = jnp.sort(idx)
    return jnp.concatenate([bounds, jnp.array([t - 1], dtype=bounds.dtype)]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("max_boundaries",))
def segment_threshold(
    features: jax.Array, alpha: float = 0.5, max_boundaries: int = 15
) -> Tuple[jax.Array, jax.Array]:
    """Threshold-mode SceneTilling (reference self_segment.py:33-39).

    Boundaries where depth > mean + alpha*std (unbiased std, as torch);
    if more than ``max_boundaries`` fire, fall back to top-``max_boundaries``.
    The final frame index is always appended (threshold indices are <= T-2).

    Returns:
      bounds: (max_boundaries + 1,) int32, sorted valid entries first
        (invalid slots padded with T-1).
      valid:  (max_boundaries + 1,) bool mask.
    """
    t = features.shape[0]
    sims = _frame_sims(features)
    depths = depth_scores(sims)
    std = jnp.std(depths, ddof=1)
    mean = jnp.mean(depths)
    cond = depths > (mean + alpha * std)
    n_fired = jnp.sum(cond)

    # Threshold selection, packed to the front (size max_boundaries).
    mk = min(max_boundaries, depths.shape[0])  # static clamp for short videos
    positions = jnp.arange(depths.shape[0], dtype=jnp.int32)
    fired_pos = jnp.where(cond, positions, depths.shape[0])  # invalid -> +inf rank
    fired_sorted = jnp.pad(
        jnp.sort(fired_pos)[:mk], (0, max_boundaries - mk), constant_values=t - 1
    )

    # Top-k fallback when too many fired.
    _, top_idx = jax.lax.top_k(depths, mk)
    top_sorted = jnp.pad(
        jnp.sort(top_idx).astype(jnp.int32), (0, max_boundaries - mk),
        constant_values=t - 1,
    )

    use_topk = n_fired > mk
    n_valid = jnp.where(use_topk, mk, n_fired)
    raw = jnp.where(use_topk, top_sorted, fired_sorted)

    slot = jnp.arange(max_boundaries + 1, dtype=jnp.int32)
    # Always append final frame right after the valid prefix.
    bounds = jnp.full((max_boundaries + 1,), t - 1, dtype=jnp.int32)
    bounds = jnp.where(slot < n_valid, raw[jnp.minimum(slot, max_boundaries - 1)], bounds)
    valid = slot <= n_valid
    return bounds, valid


@partial(jax.jit, static_argnames=("max_boundaries",))
def segment_left(
    features: jax.Array, alpha: float = 0.5, max_boundaries: int = 15
) -> Tuple[jax.Array, jax.Array]:
    """Streaming (causal) segmentation (reference self_segment.py:77-118).

    Threshold over *left* depth scores; no final-frame append unless no
    boundary fires (reference appends T-1 only when the list is empty).

    Returns (bounds, valid) with shape (max_boundaries,).
    """
    t = features.shape[0]
    sims = _frame_sims(features)
    depths = left_depth_scores(sims)
    std = jnp.std(depths, ddof=1)
    mean = jnp.mean(depths)
    cond = depths > (mean + alpha * std)
    n_fired = jnp.sum(cond)

    mk = min(max_boundaries, depths.shape[0])
    positions = jnp.arange(depths.shape[0], dtype=jnp.int32)
    fired_pos = jnp.where(cond, positions, depths.shape[0])
    fired_sorted = jnp.pad(
        jnp.sort(fired_pos)[:mk].astype(jnp.int32), (0, max_boundaries - mk),
        constant_values=t - 1,
    )

    slot = jnp.arange(max_boundaries, dtype=jnp.int32)
    empty = n_fired == 0
    bounds = jnp.where(slot < n_fired, fired_sorted, t - 1)
    valid = jnp.where(empty, slot == 0, slot < jnp.minimum(n_fired, mk))
    return bounds, valid


@partial(jax.jit, static_argnames=("max_frames",))
def segment_plan(
    bounds: jax.Array, t: jax.Array, max_frames: int = 8
) -> Tuple[jax.Array, jax.Array]:
    """Static-shape per-segment frame-subsample plan.

    For each segment s spanning [start_s, bounds_s], reproduces the
    reference's ``torch.linspace(index, bi, min(F, len)).to(int)`` subsample
    (rmt_r_transformer_projector.py:370) on a fixed (S, F) grid:

      idx[s, j] = start_s + trunc(j * (bounds_s - start_s) / max(nf-1, 1))

    computed in float32 exactly like torch.linspace, where
    nf = min(F, segment length).

    Args:
      bounds: (S,) int32 sorted segment-end frame indices (possibly padded;
        padding slots get degenerate but in-range plans — mask downstream).
      t: scalar total frame count (unused except for dtype safety; the plan
        only depends on bounds).
      max_frames: F, frames per segment fed to the bridge.
    Returns:
      idx:  (S, F) int32 frame gather indices.
      mask: (S, F) bool, True for the nf real slots.
    """
    del t
    starts = jnp.concatenate([jnp.zeros((1,), bounds.dtype), bounds[:-1] + 1])
    length = bounds - starts + 1
    nf = jnp.minimum(max_frames, length)
    denom = jnp.maximum(nf - 1, 1).astype(jnp.float32)
    j = jnp.arange(max_frames, dtype=jnp.float32)[None, :]
    span = (bounds - starts).astype(jnp.float32)[:, None]
    step = span / denom[:, None]
    idx = (starts.astype(jnp.float32)[:, None] + j * step).astype(jnp.int32)
    mask = jnp.arange(max_frames, dtype=jnp.int32)[None, :] < nf[:, None]
    # Clamp padded slots into range so downstream gathers are safe.
    idx = jnp.where(mask, idx, jnp.clip(idx, 0, jnp.maximum(bounds[-1], 0)))
    return idx, mask
