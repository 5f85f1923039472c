"""Convert reference torch checkpoints of the Memory Bridge to JAX pytrees.

Handles the ``mm_projector.*`` key namespace used by both full checkpoints
and adapter-only ``mm_projector.bin`` files (reference:
llava/train/llava_trainer.py:246-265, llava_arch.py:208-213).
Torch Linear weights are (out, in); JAX kernels are (in, out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).T,
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _np(sd[f"{prefix}.weight"]),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _residual(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "dense": _dense(sd, f"{prefix}.dense"),
        "layernorm": _layernorm(sd, f"{prefix}.layernorm"),
    }


def _attention(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "q_proj": _dense(sd, f"{prefix}.q_proj"),
        "k_proj": _dense(sd, f"{prefix}.k_proj"),
        "v_proj": _dense(sd, f"{prefix}.v_proj"),
        "residual": _residual(sd, f"{prefix}.residual"),
    }


def _transformer_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    layer = {
        "selfattention": _attention(sd, f"{prefix}.selfattention"),
        "crossattention": _attention(sd, f"{prefix}.crossattention"),
    }
    # Projector layers have an FFN (mlp Sequential + layer residual);
    # retriever layers don't (reference self_retriever.py:122-131 commented
    # out — the modules are never created there).
    if f"{prefix}.mlp.0.weight" in sd:
        layer["mlp"] = {"dense": _dense(sd, f"{prefix}.mlp.0")}
    if f"{prefix}.residual.dense.weight" in sd:
        layer["residual"] = _residual(sd, f"{prefix}.residual")
    return layer


def _num_layers(sd: Mapping[str, Any], prefix: str) -> int:
    n = 0
    while f"{prefix}.{n}.selfattention.q_proj.weight" in sd or (
        f"{prefix}.{n}.crossattention.q_proj.weight" in sd
    ):
        n += 1
    return n


def convert_rmt_r_state_dict(sd: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Convert a reference RMTRTransformerProjector state_dict.

    ``prefix`` strips a leading namespace such as ``mm_projector.`` or
    ``model.mm_projector.`` when converting from a full-model checkpoint.
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    proj_depth = _num_layers(sd, "projector.layers")
    retr_depth = _num_layers(sd, "retrieval.layers")
    projector = {
        "layers": [
            _transformer_layer(sd, f"projector.layers.{i}") for i in range(proj_depth)
        ],
        "proj": {"dense": _dense(sd, "projector.proj.0")},
        "read_memory_emb": _np(sd["projector.read_memory_emb"]),
        "memory_tokens": _np(sd["projector.memory_tokens"]),
    }
    retrieval = {
        "layers": [
            _transformer_layer(sd, f"retrieval.layers.{i}") for i in range(retr_depth)
        ],
    }
    return {"projector": projector, "retrieval": retrieval}


# ---------------------------------------------------------------------------
# Inverse: JAX tree -> reference torch key namespace (export)
# ---------------------------------------------------------------------------


def _export_dense(out: Dict[str, np.ndarray], tree: Mapping[str, Any], prefix: str):
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T.copy()
    out[f"{prefix}.bias"] = np.asarray(tree["bias"]).copy()


def _export_layernorm(out, tree, prefix: str):
    out[f"{prefix}.weight"] = np.asarray(tree["scale"]).copy()
    out[f"{prefix}.bias"] = np.asarray(tree["bias"]).copy()


def _export_residual(out, tree, prefix: str):
    _export_dense(out, tree["dense"], f"{prefix}.dense")
    _export_layernorm(out, tree["layernorm"], f"{prefix}.layernorm")


def _export_attention(out, tree, prefix: str):
    for name in ("q_proj", "k_proj", "v_proj"):
        _export_dense(out, tree[name], f"{prefix}.{name}")
    _export_residual(out, tree["residual"], f"{prefix}.residual")


def _export_layer(out, tree, prefix: str):
    _export_attention(out, tree["selfattention"], f"{prefix}.selfattention")
    _export_attention(out, tree["crossattention"], f"{prefix}.crossattention")
    if "mlp" in tree:
        _export_dense(out, tree["mlp"]["dense"], f"{prefix}.mlp.0")
    if "residual" in tree:
        _export_residual(out, tree["residual"], f"{prefix}.residual")


def export_rmt_r_state_dict(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_rmt_r_state_dict`: JAX Memory Bridge tree
    -> the reference's torch key namespace, so adapter checkpoints trained
    here load back into the reference (mm_projector.bin interchange).
    Roundtrip-tested."""
    out: Dict[str, np.ndarray] = {}
    proj = tree["projector"]
    for i, layer in enumerate(proj["layers"]):
        _export_layer(out, layer, f"projector.layers.{i}")
    _export_dense(out, proj["proj"]["dense"], "projector.proj.0")
    out["projector.read_memory_emb"] = np.asarray(proj["read_memory_emb"]).copy()
    out["projector.memory_tokens"] = np.asarray(proj["memory_tokens"]).copy()
    for i, layer in enumerate(tree["retrieval"]["layers"]):
        _export_layer(out, layer, f"retrieval.layers.{i}")
    if prefix:
        out = {prefix + k: v for k, v in out.items()}
    return out
