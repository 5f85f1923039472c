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


def test_consolidate_and_extract_clis(tmp_path, monkeypatch):
    """The thin CLI mains run end to end on a real checkpoint dir."""
    import sys

    import torch

    from videollamb_tpu.tools.weights import consolidate_cli, extract_projector_cli

    sd = {
        "model.layers.0.self_attn.q_proj.weight": torch.randn(4, 4),
        "model.mm_projector.proj.weight": torch.randn(4, 4),
        "model.mm_projector.proj.bias": torch.randn(4),
    }
    src = tmp_path / "ckpt"
    src.mkdir()
    torch.save(sd, src / "pytorch_model.bin")

    dst = tmp_path / "consolidated.npz"
    monkeypatch.setattr(sys, "argv",
                        ["x", "--src", str(src), "--dst", str(dst)])
    consolidate_cli()
    back = np.load(str(dst))
    assert set(back.files) == set(sd)
    np.testing.assert_allclose(
        back["model.mm_projector.proj.bias"],
        sd["model.mm_projector.proj.bias"].numpy())

    out = tmp_path / "mm_projector.bin"
    monkeypatch.setattr(sys, "argv",
                        ["x", "--model-path", str(src), "--output", str(out)])
    extract_projector_cli()
    proj = torch.load(str(out), weights_only=True)
    assert set(proj) == {"model.mm_projector.proj.weight",
                         "model.mm_projector.proj.bias"}


def test_all_shell_launchers_parse():
    """Every scripts/*.sh (+ eval launchers) is valid bash."""
    import glob
    import os
    import subprocess

    scripts = sorted(glob.glob(os.path.join(_c.REPO_ROOT, "scripts", "**", "*.sh"),
                               recursive=True))
    assert len(scripts) >= 6, scripts
    for sh in scripts:
        subprocess.run(["bash", "-n", sh], check=True)
