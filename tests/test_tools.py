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


def test_export_roundtrip_llama_and_bridge(tmp_path):
    """JAX -> HF export -> JAX import reproduces the exact trees, and the
    full export loads through the production checkpoint loader."""
    import jax

    from videollamb_tpu.config import BridgeConfig, LlamaConfig
    from videollamb_tpu.models.bridge.convert import (
        convert_rmt_r_state_dict,
        export_rmt_r_state_dict,
    )
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.convert import (
        convert_llama_state_dict,
        export_llama_state_dict,
    )
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.tools.weights import export_hf_checkpoint

    lcfg = LlamaConfig.tiny()
    lm = init_llama_params(jax.random.PRNGKey(0), lcfg)
    sd = export_llama_state_dict(lm, root="model.")
    back = convert_llama_state_dict(sd)
    for a, b in zip(jax.tree.leaves(lm), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    bcfg = BridgeConfig.from_projector_type("rmt_r_transformer1x")
    bridge = init_rmt_r_params(jax.random.PRNGKey(1), bcfg, lcfg.hidden_size)
    bsd = export_rmt_r_state_dict(bridge)
    bback = convert_rmt_r_state_dict(bsd)
    ra, rb = jax.tree.leaves(bridge), jax.tree.leaves(bback)
    assert len(ra) == len(rb)
    for a, b in zip(ra, rb):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Full-file export loads through load_state_dict (builder path).
    from videollamb_tpu.models.builder import load_state_dict

    path = export_hf_checkpoint({"lm": lm, "mm_projector": bridge},
                                str(tmp_path / "export"))
    full = load_state_dict(str(tmp_path / "export"))
    assert "model.embed_tokens.weight" in full
    assert any(k.startswith("model.mm_projector.projector.layers.0")
               for k in full)
    lm_back = convert_llama_state_dict(
        {k: v for k, v in full.items() if "mm_projector" not in k})
    np.testing.assert_array_equal(
        np.asarray(lm_back["layers"]["q_proj"]), np.asarray(lm["layers"]["q_proj"]))
