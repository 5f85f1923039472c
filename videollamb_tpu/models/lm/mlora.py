"""Multi-adapter LoRA serving: K unmerged adapters, selected per request.

The reference serves ONE fine-tune per process: its LoRA checkpoints are
merged into the base weights at load (llava/model/builder.py:57-91), so
serving N adapters means N model copies. Here K adapters stay unmerged and
stacked — ``{proj}_mlora_a``: (L, K, d_in, r), ``{proj}_mlora_b``:
(L, K, r, d_out) beside the base kernels in ``params['lm']['layers']`` —
and every LM entry point takes an ``adapter_idx`` (B,) vector that gathers
each row's adapter inside the projection helper (llama._mlora_delta).
One base-model weight read serves every adapter in the batch (S-LoRA-style
batched serving); a row with idx -1 runs the pure base model.

Adapters of different ranks co-serve: smaller ranks zero-pad to the widest
(zero A columns / B rows contribute nothing to x@A@B).

Scale convention matches models/lm/lora.py: alpha/r is folded into A at
load, so the stack needs no per-adapter scale vector at runtime.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from videollamb_tpu.models.lm.lora import LORA_TARGETS

Params = Dict[str, Any]


def load_peft_adapter(path: str, num_layers: int) -> Dict[str, Any]:
    """Load a PEFT-format LoRA adapter dir (adapter_config.json +
    adapter weights — the format the reference's training writes,
    llava/train/train.py:1128-1138) into the stacked adapter-dict layout
    ``{"{proj}_lora_a": (L, d_in, r), ...}`` that add_multi_lora_params
    consumes. The alpha/r scale is folded into A (models/lm/lora.py
    convention). Torch lora_A is (r, d_in) and lora_B is (d_out, r);
    both transpose to our (in, out) kernels."""
    from videollamb_tpu.models.builder import load_state_dict

    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    scale = acfg["lora_alpha"] / acfg["r"]
    sd = load_state_dict(path)

    per_target: Dict[str, Dict[int, Tuple[np.ndarray, np.ndarray]]] = {}
    for k in [k for k in sd if k.endswith("lora_A.weight")]:
        # base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight
        parts = k.split(".")
        try:
            li = parts.index("layers")
        except ValueError:
            continue  # non-LM module (e.g. projector) — not servable here
        layer = int(parts[li + 1])
        target = parts[-3]
        if target not in LORA_TARGETS:
            continue
        a = np.asarray(sd[k], np.float32).T * scale        # (d_in, r)
        b = np.asarray(sd[k.replace("lora_A", "lora_B")], np.float32).T
        per_target.setdefault(target, {})[layer] = (a, b)

    if not per_target:
        raise ValueError(f"{path}: no LM LoRA weights found")
    out: Dict[str, Any] = {}
    for target, rows in per_target.items():
        missing = sorted(set(range(num_layers)) - set(rows))
        if missing:
            raise ValueError(
                f"{path}: target {target!r} missing layers {missing[:4]}... "
                f"({len(missing)}/{num_layers}) — partial-layer adapters "
                "are not stackable")
        out[f"{target}_lora_a"] = np.stack(
            [rows[i][0] for i in range(num_layers)])
        out[f"{target}_lora_b"] = np.stack(
            [rows[i][1] for i in range(num_layers)])
    return out


def extract_lora_layers(params: Params) -> Dict[str, Any]:
    """Pull the single-adapter LoRA keys out of a trained params tree
    (models/lm/lora.add_lora_params layout) into a standalone adapter dict
    ``{"{proj}_lora_a": (L, d, r), "{proj}_lora_b": (L, r, d_out)}``."""
    layers = params["lm"]["layers"] if "lm" in params else params["layers"]
    out = {}
    for name in LORA_TARGETS:
        a = layers.get(f"{name}_lora_a")
        if a is not None:
            out[f"{name}_lora_a"] = a
            out[f"{name}_lora_b"] = layers[f"{name}_lora_b"]
    if not out:
        raise ValueError("params carry no LoRA adapter keys")
    return out


def _pad_rank(a: np.ndarray, b: np.ndarray, r_max: int):
    r = a.shape[-1]
    if r == r_max:
        return a, b
    pad_a = [(0, 0)] * (a.ndim - 1) + [(0, r_max - r)]
    pad_b = [(0, 0)] * (b.ndim - 2) + [(0, r_max - r), (0, 0)]
    return np.pad(a, pad_a), np.pad(b, pad_b)


def add_multi_lora_params(
    params: Params,
    adapters: Mapping[str, Dict[str, Any]],
    dtype=None,
) -> Tuple[Params, Dict[str, int]]:
    """Stack named adapters into the LM layer pytree.

    ``adapters``: name -> adapter dict (extract_lora_layers format). Every
    adapter must target the same projections; ranks may differ (zero-pad).

    Returns (new params, registry name -> adapter index). Pass the index
    of a request's adapter as its row of ``adapter_idx``; -1 = base model.
    """
    if not adapters:
        raise ValueError("no adapters given")
    names = list(adapters.keys())
    first = adapters[names[0]]
    targets = sorted(
        k[: -len("_lora_a")] for k in first if k.endswith("_lora_a")
    )
    if not targets:
        raise ValueError(f"adapter {names[0]!r} carries no LoRA keys")
    for n in names[1:]:
        t = sorted(k[: -len("_lora_a")] for k in adapters[n]
                   if k.endswith("_lora_a"))
        if t != targets:
            raise ValueError(
                f"adapter {n!r} targets {t} but {names[0]!r} targets "
                f"{targets} — co-served adapters must share targets"
            )

    layers = dict(params["lm"]["layers"])
    for name in targets:
        a_list: List[np.ndarray] = []
        b_list: List[np.ndarray] = []
        r_max = max(np.asarray(adapters[n][f"{name}_lora_a"]).shape[-1]
                    for n in names)
        for n in names:
            a = np.asarray(adapters[n][f"{name}_lora_a"])
            b = np.asarray(adapters[n][f"{name}_lora_b"])
            a, b = _pad_rank(a, b, r_max)
            a_list.append(a)
            b_list.append(b)
        # (L, K, d_in, r) / (L, K, r, d_out): L leads so the layer scan
        # slices per layer exactly like every other stacked key.
        ma = np.stack(a_list, axis=1)
        mb = np.stack(b_list, axis=1)
        dt = dtype or ma.dtype
        layers[f"{name}_mlora_a"] = jnp.asarray(ma, dt)
        layers[f"{name}_mlora_b"] = jnp.asarray(mb, dt)

    out = dict(params)
    out["lm"] = dict(params["lm"])
    out["lm"]["layers"] = layers
    registry = {n: i for i, n in enumerate(names)}
    return out, registry


def resolve_adapter_idx(
    registry: Mapping[str, int], adapter_names: List[Any]
) -> np.ndarray:
    """Map per-row adapter names (None = base) to an int32 index vector."""
    idx = np.full((len(adapter_names),), -1, np.int32)
    for i, n in enumerate(adapter_names):
        if n is None:
            continue
        if n not in registry:
            raise KeyError(f"unknown adapter {n!r}; have {sorted(registry)}")
        idx[i] = registry[n]
    return idx
