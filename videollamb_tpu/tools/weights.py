"""Weight-surgery tools.

Counterparts of the reference checkpoint utilities:
- apply/make delta  (llava/model/apply_delta.py:13, make_delta.py:13)
- consolidate       (llava/model/consolidate.py:13)
- extract projector (scripts/extract_mm_projector.py)
- merge LoRA        (scripts/merge_lora_weights.py:6)

All operate on JAX pytrees saved via orbax or on torch state dicts from
reference-format checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict

import jax
import numpy as np


def apply_delta(base: Dict[str, Any], delta: Dict[str, Any]) -> Dict[str, Any]:
    """target = base + delta, leaf-wise; delta-only leaves pass through
    (reference apply_delta.py: embed-dim mismatch handling is the caller's
    concern at this layer)."""
    def add(b, d):
        b = np.asarray(b)
        d = np.asarray(d)
        if b.shape != d.shape:
            # Token-embedding rows added by special tokens: add over the
            # overlapping prefix (reference apply_delta.py behavior).
            out = d.copy()
            n = min(b.shape[0], d.shape[0])
            out[:n] = b[:n] + d[:n]
            return out
        return b + d

    return jax.tree.map(add, base, delta)


def make_delta(base: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, Any]:
    def sub(t, b):
        t = np.asarray(t)
        b = np.asarray(b)
        if t.shape != b.shape:
            out = t.copy()
            n = min(b.shape[0], t.shape[0])
            out[:n] = t[:n] - b[:n]
            return out
        return t - b

    return jax.tree.map(sub, target, base)


def extract_mm_projector(state_dict: Dict[str, Any], prefix: str = "mm_projector") -> Dict[str, Any]:
    """Pull only projector weights out of a full checkpoint state dict
    (reference scripts/extract_mm_projector.py)."""
    keys = [k for k in state_dict if prefix in k]
    return {k: state_dict[k] for k in keys}


def consolidate_cli():
    """Merge a sharded torch checkpoint dir into one state dict file."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    args = parser.parse_args()
    from videollamb_tpu.models.builder import load_state_dict

    sd = load_state_dict(args.src)
    np.savez(args.dst, **sd)
    print(f"consolidated {len(sd)} tensors -> {args.dst}")


def extract_projector_cli():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--output", required=True)
    args = parser.parse_args()
    from videollamb_tpu.models.builder import load_state_dict

    sd = load_state_dict(args.model_path)
    proj = extract_mm_projector(sd)
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in proj.items()},
               args.output)
    print(f"extracted {len(proj)} projector tensors -> {args.output}")


def merge_lora_cli():
    """Merge a LoRA checkpoint into its base and save as a full checkpoint
    (reference scripts/merge_lora_weights.py)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True, help="LoRA dir")
    parser.add_argument("--model-base", required=True)
    parser.add_argument("--save-model-path", required=True)
    args = parser.parse_args()
    from videollamb_tpu.models.builder import _merge_lora, load_state_dict

    base_sd = load_state_dict(args.model_base)
    merged = _merge_lora(base_sd, args.model_path)
    os.makedirs(args.save_model_path, exist_ok=True)
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in merged.items()},
               os.path.join(args.save_model_path, "pytorch_model.bin"))
    for name in ("config.json", "tokenizer_config.json", "tokenizer.model"):
        src = os.path.join(args.model_base, name)
        if os.path.exists(src):
            import shutil

            shutil.copy(src, os.path.join(args.save_model_path, name))
    print(f"merged -> {args.save_model_path}")


def export_hf_checkpoint(params: Dict[str, Any], out_dir: str) -> str:
    """Write a reference-format ``pytorch_model.bin`` from a JAX param tree
    (inverse of load_pretrained_model's conversion): LM under ``model.*`` +
    ``lm_head.weight``, Memory Bridge under ``model.mm_projector.*`` — so a
    model fine-tuned on TPU loads back into the reference codebase or
    transformers. Returns the written file path."""
    import torch

    from videollamb_tpu.models.bridge.convert import export_rmt_r_state_dict
    from videollamb_tpu.models.lm.convert import export_llama_state_dict

    sd: Dict[str, Any] = {}
    if "lm" in params:
        sd.update(export_llama_state_dict(params["lm"], root="model."))
    if "mm_projector" in params:
        sd.update(export_rmt_r_state_dict(
            params["mm_projector"], prefix="model.mm_projector."))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "pytorch_model.bin")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               path)
    return path
