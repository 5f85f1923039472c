"""Weight-surgery tool tests: delta roundtrip, projector extraction."""

import numpy as np

import conftest as _c  # noqa: F401

from videollamb_tpu.tools.weights import apply_delta, extract_mm_projector, make_delta


def test_delta_roundtrip():
    rng = np.random.default_rng(0)
    base = {"a": rng.normal(size=(4, 4)), "b": {"c": rng.normal(size=(3,))}}
    target = {"a": rng.normal(size=(4, 4)), "b": {"c": rng.normal(size=(3,))}}
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    for k in ("a",):
        np.testing.assert_allclose(np.asarray(back[k]), target[k], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back["b"]["c"]), target["b"]["c"], rtol=1e-6)


def test_delta_roundtrip_with_grown_embeddings():
    """Reference apply_delta handles vocab growth: delta rows beyond the
    base pass through."""
    rng = np.random.default_rng(1)
    base = {"emb": rng.normal(size=(10, 4))}
    target = {"emb": rng.normal(size=(12, 4))}  # +2 special tokens
    delta = make_delta(base, target)
    back = apply_delta(base, delta)
    np.testing.assert_allclose(np.asarray(back["emb"]), target["emb"], rtol=1e-6)


def test_extract_mm_projector():
    sd = {
        "model.mm_projector.projector.proj.0.weight": np.zeros((2, 2)),
        "model.layers.0.self_attn.q_proj.weight": np.zeros((2, 2)),
        "mm_projector.projector.read_memory_emb": np.zeros((2,)),
    }
    out = extract_mm_projector(sd)
    assert set(out) == {
        "model.mm_projector.projector.proj.0.weight",
        "mm_projector.projector.read_memory_emb",
    }
