"""Convert LanguageBind / HF CLIP vision-tower checkpoints to JAX pytrees.

Handles the ``vision_model.*`` namespace of LanguageBindVideo /
LanguageBindImage checkpoints (reference: llava/model/multimodal_encoder/
languagebind/video/modeling_video.py) including the temporal-attention
parameters. Torch Linear weights (out, in) transpose to (in, out) kernels;
the patchify conv weight (D, C, ph, pw) flattens to a (C*ph*pw, D) kernel.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _dense(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _attn(sd, prefix):
    return {
        "q_proj": _dense(sd, f"{prefix}.q_proj"),
        "k_proj": _dense(sd, f"{prefix}.k_proj"),
        "v_proj": _dense(sd, f"{prefix}.v_proj"),
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def convert_vision_state_dict(
    sd: Mapping[str, Any], prefix: str = "vision_model."
) -> Dict[str, Any]:
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    n_layers = 0
    while f"encoder.layers.{n_layers}.self_attn.q_proj.weight" in sd:
        n_layers += 1

    layers = []
    for i in range(n_layers):
        p = f"encoder.layers.{i}"
        layer = {
            "layer_norm1": _ln(sd, f"{p}.layer_norm1"),
            "self_attn": _attn(sd, f"{p}.self_attn"),
            "layer_norm2": _ln(sd, f"{p}.layer_norm2"),
            "mlp": {
                "fc1": _dense(sd, f"{p}.mlp.fc1"),
                "fc2": _dense(sd, f"{p}.mlp.fc2"),
            },
        }
        if f"{p}.temporal_attn.q_proj.weight" in sd:
            layer["temporal_attn"] = _attn(sd, f"{p}.temporal_attn")
            layer["temporal_layer_norm1"] = _ln(sd, f"{p}.temporal_layer_norm1")
            layer["temporal_embedding"] = _np(sd[f"{p}.temporal_embedding"]).reshape(
                -1, _np(sd[f"{p}.temporal_embedding"]).shape[-1]
            )
        layers.append(layer)

    patch_w = _np(sd["embeddings.patch_embedding.weight"])  # (D, C, ph, pw)
    d = patch_w.shape[0]
    return {
        "embeddings": {
            "class_embedding": _np(sd["embeddings.class_embedding"]).reshape(d),
            "patch_embedding": {"kernel": patch_w.reshape(d, -1).T},
            "position_embedding": _np(sd["embeddings.position_embedding.weight"]),
        },
        "pre_layrnorm": _ln(sd, "pre_layrnorm"),
        "layers": layers,
        "post_layernorm": _ln(sd, "post_layernorm"),
    }
