"""Checkpointing: orbax-backed save/restore with adapter-only filtering.

Replaces the reference's HF Trainer + DeepSpeed checkpoint stack
(llava/train/llava_trainer.py:246-265 adapter-only `mm_projector.bin`,
train.py:126-177 ZeRO-3 gather, train.py:1120-1123 auto-resume):

- full checkpoints: the whole param tree + opt state + step, sharding-aware
  (orbax restores onto the live mesh layout);
- adapter-only checkpoints (``tune_mm_mlp_adapter``): just the
  ``mm_projector`` subtree (+ optionally embed_tokens), restorable into a
  fresh base model;
- save_total_limit rotation and latest-checkpoint auto-resume.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from videollamb_tpu.train.step import TrainState


def _ckpt_dirs(output_dir: str):
    if not os.path.isdir(output_dir):
        return []
    dirs = []
    for name in os.listdir(output_dir):
        m = re.match(r"^checkpoint-(\d+)$", name)
        if m and os.path.isdir(os.path.join(output_dir, name)):
            dirs.append((int(m.group(1)), os.path.join(output_dir, name)))
    return sorted(dirs)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    dirs = _ckpt_dirs(output_dir)
    return dirs[-1][1] if dirs else None


def save_checkpoint(
    output_dir: str,
    state: TrainState,
    *,
    step: Optional[int] = None,
    save_total_limit: int = 1,
    adapter_only: bool = False,
    include_embed_tokens: bool = False,
) -> str:
    """Write checkpoint-{step}; rotate old ones; return the path."""
    step = int(state.step) if step is None else step
    path = os.path.join(os.path.abspath(output_dir), f"checkpoint-{step}")

    if adapter_only:
        payload: Dict[str, Any] = {"mm_projector": state.params["mm_projector"]}
        if include_embed_tokens:
            payload["embed_tokens"] = state.params["lm"]["embed_tokens"]
        payload = {"params": payload, "step": step}
    else:
        payload = {"params": state.params, "opt_state": state.opt_state,
                   "step": step}

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()

    if adapter_only:
        # Also write the reference-format adapter file alongside orbax
        # (llava_trainer.py:246-265 semantics): a TPU-trained bridge drops
        # straight back into the reference's --pretrain_mm_mlp_adapter.
        try:
            import torch

            from videollamb_tpu.models.bridge.convert import export_rmt_r_state_dict

            sd = export_rmt_r_state_dict(
                jax.device_get(state.params["mm_projector"]),
                prefix="model.mm_projector.")
            if include_embed_tokens:
                sd["model.embed_tokens.weight"] = np.asarray(
                    jax.device_get(state.params["lm"]["embed_tokens"]))
            torch.save(
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in sd.items()},
                os.path.join(path, "mm_projector.bin"))
        except Exception as e:  # noqa: BLE001 — non-rmt_r bridges lack the layout
            print(f"mm_projector.bin export skipped: {type(e).__name__}: {e}")

    if save_total_limit and save_total_limit > 0:
        dirs = _ckpt_dirs(output_dir)
        for _, old in dirs[:-save_total_limit]:
            if os.path.abspath(old) != path:
                shutil.rmtree(old, ignore_errors=True)
    return path


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore a full checkpoint onto the (possibly sharded) template
    ``state`` — arrays come back with the template's shardings."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "opt_state": state.opt_state,
                "step": int(state.step)}
    restored = ckptr.restore(path, template)
    return TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )


def restore_adapter(path: str, params: Dict[str, Any]) -> Dict[str, Any]:
    """Load an adapter-only checkpoint into an existing param tree."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": {"mm_projector": params["mm_projector"]}, "step": 0}
    try:
        restored = ckptr.restore(path, template)
    except Exception:
        template["params"]["embed_tokens"] = params["lm"]["embed_tokens"]
        restored = ckptr.restore(path, template)
        params["lm"]["embed_tokens"] = restored["params"]["embed_tokens"]
    params["mm_projector"] = restored["params"]["mm_projector"]
    return params


def maybe_resume(output_dir: str, state: TrainState) -> TrainState:
    """Auto-resume from the newest checkpoint-* dir if present (reference
    train.py:1120-1123)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return state
    return restore_checkpoint(path, state)
