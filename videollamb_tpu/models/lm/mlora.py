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

from typing import Any, Dict, List, Mapping, Tuple

import jax.numpy as jnp
import numpy as np

from videollamb_tpu.models.lm.lora import LORA_TARGETS

Params = Dict[str, Any]


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
