"""SceneTilling parity tests.

Golden oracle: the reference implementation itself
(/root/reference/llava/model/multimodal_projector/self_segment.py), imported
read-only and run on torch CPU. Our jitted lax.scan formulation must
reproduce its boundaries exactly.
"""

import numpy as np
import pytest

import conftest as _c

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from videollamb_tpu.ops.scene_tilling import (
    depth_scores,
    left_depth_scores,
    segment_left,
    segment_plan,
    segment_threshold,
    segment_topk,
)

ref_seg = _c.load_reference_module(
    "llava/model/multimodal_projector/self_segment.py", "ref_self_segment"
)


def _rand_features(t, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(t, d)).astype(np.float32)


@pytest.mark.parametrize("t,seed", [(16, 0), (16, 1), (64, 2), (128, 3), (33, 4)])
def test_depth_scores_match_reference(t, seed):
    feats = _rand_features(t, seed=seed)
    sims_t = torch.cosine_similarity(torch.from_numpy(feats[:-1]), torch.from_numpy(feats[1:]))
    ref = ref_seg.cal_depth_score(sims_t).numpy()
    sims = jnp.asarray(sims_t.numpy())
    ours = np.asarray(depth_scores(sims))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t,seed", [(16, 0), (64, 2), (128, 3)])
def test_left_depth_scores_match_reference(t, seed):
    feats = _rand_features(t, seed=seed)
    sims_t = torch.cosine_similarity(torch.from_numpy(feats[:-1]), torch.from_numpy(feats[1:]))
    ref = ref_seg.cal_left_depth_score(sims_t).numpy()
    ours = np.asarray(left_depth_scores(jnp.asarray(sims_t.numpy())))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t,seed", [(16, 0), (16, 7), (64, 2), (128, 3), (256, 5)])
def test_segment_topk_matches_reference(t, seed):
    feats = _rand_features(t, seed=seed)
    ref_bounds = ref_seg.segment(torch.from_numpy(feats), k=3)
    ours = np.asarray(segment_topk(jnp.asarray(feats), k=3))
    assert ours.tolist() == ref_bounds


@pytest.mark.parametrize("t,seed,alpha", [(16, 0, 0.5), (64, 2, 0.5), (200, 9, 0.5), (64, 3, 0.1)])
def test_segment_threshold_matches_reference(t, seed, alpha):
    feats = _rand_features(t, seed=seed)
    ref_bounds = ref_seg.segment(torch.from_numpy(feats), alpha=alpha)
    bounds, valid = segment_threshold(jnp.asarray(feats), alpha=alpha)
    ours = np.asarray(bounds)[np.asarray(valid)].tolist()
    assert ours == ref_bounds


@pytest.mark.parametrize("t,seed", [(16, 0), (64, 2), (200, 9)])
def test_segment_left_matches_reference(t, seed):
    feats = _rand_features(t, seed=seed)
    ref_bounds = ref_seg.segment_left(torch.from_numpy(feats))
    bounds, valid = segment_left(jnp.asarray(feats), max_boundaries=max(len(ref_bounds), 15))
    ours = np.asarray(bounds)[np.asarray(valid)].tolist()
    assert ours == ref_bounds


@pytest.mark.parametrize("t,seed", [(16, 0), (64, 2), (128, 3), (256, 5), (48, 11)])
def test_segment_plan_matches_reference_linspace(t, seed):
    """The (S, F) subsample plan must reproduce the reference's per-segment
    torch.linspace(index, bi, min(8, len)).to(int) frame selection
    (rmt_r_transformer_projector.py:368-374)."""
    feats = _rand_features(t, seed=seed)
    ref_bounds = ref_seg.segment(torch.from_numpy(feats), k=3)

    ref_plans = []
    index = 0
    for bi in ref_bounds:
        steps = torch.linspace(index, bi, min(8, bi - index + 1), dtype=torch.int)
        ref_plans.append(steps.tolist())
        index = bi + 1

    bounds = segment_topk(jnp.asarray(feats), k=3)
    idx, mask = segment_plan(bounds, t, max_frames=8)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for s, ref_plan in enumerate(ref_plans):
        ours = idx[s][mask[s]].tolist()
        assert ours == ref_plan, f"segment {s}: {ours} != {ref_plan}"


def test_segment_plan_padded_slots_in_range():
    bounds = jnp.array([3, 7, 9, 15], dtype=jnp.int32)
    idx, mask = segment_plan(bounds, 16, max_frames=8)
    assert idx.shape == (4, 8) and mask.shape == (4, 8)
    assert (np.asarray(idx) >= 0).all() and (np.asarray(idx) <= 15).all()
    # Short segment [8..9]: exactly 2 valid frames.
    assert np.asarray(mask)[2].sum() == 2
    assert np.asarray(idx)[2][:2].tolist() == [8, 9]
