"""Training step: optax AdamW with projector LR group, sharded via GSPMD.

Replaces the reference's HF Trainer + DeepSpeed ZeRO stack
(llava/train/llava_trainer.py:149-271, scripts/zero*.json):

- separate ``mm_projector_lr`` parameter group (llava_trainer.py:166-244)
  via optax.multi_transform over top-level subtrees;
- cosine schedule with linear warmup (slurm --lr_scheduler_type cosine,
  --warmup_ratio 0.03);
- tune modes: 'full', 'adapter' (mm_projector only — the reference
  --tune_mm_mlp_adapter path), with frozen subtrees getting zero updates;
- optimizer state inherits parameter shardings (ZeRO-equivalent for free
  under GSPMD);
- gradient accumulation via optax.MultiSteps when configured.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from videollamb_tpu.config import ModelConfig, TrainConfig
from videollamb_tpu.models.assembly import (
    MultimodalBatch,
    causal_lm_loss,
    videollamb_forward,
)

Params = Dict[str, Any]


class TrainState(NamedTuple):
    step: jax.Array
    params: Params
    opt_state: Any


def lr_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    warmup = max(1, int(total_steps * cfg.warmup_ratio))
    if cfg.lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, warmup, max(total_steps, warmup + 1), end_value=0.0
        )
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, warmup),
         optax.constant_schedule(cfg.learning_rate)],
        [warmup],
    )


def _adamw(cfg: TrainConfig, schedule: optax.Schedule) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            schedule, b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )


def param_labels(cfg: TrainConfig, p: Params):
    """Per-leaf optimizer-group labels ('train' / 'projector' / 'frozen').

    One source of truth shared by create_optimizer (which maps labels to
    transforms) and trainable_mask (which stops gradients INTO frozen
    subtrees so autodiff never saves their activations)."""
    if cfg.tune_mode == "lora":
        # Train only LoRA adapters (+ projector, matching the reference
        # LoRA recipe where mm_projector stays trainable).
        def leaf_label(path, _):
            keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
            if "mm_projector" in keys:
                return ("projector" if cfg.mm_projector_lr is not None
                        else "train")
            if any(isinstance(k, str) and "_lora_" in k for k in keys):
                return "train"
            return "frozen"

        return jax.tree_util.tree_map_with_path(leaf_label, p)

    # Label top-level subtrees: projector vs rest vs frozen.
    labels = {}
    for key in p:
        if cfg.tune_mode == "adapter":
            labels[key] = "train" if key == "mm_projector" else "frozen"
        elif key == "mm_projector" and cfg.mm_projector_lr is not None:
            labels[key] = "projector"
        elif key in ("video_tower", "image_tower"):
            labels[key] = "frozen"  # towers are frozen in the prod recipe
        else:
            labels[key] = "train"
    return {k: jax.tree.map(lambda _: v, p[k]) for k, v in labels.items()}


def trainable_mask(cfg: TrainConfig, params: Params):
    """Boolean pytree (True = trainable) from the optimizer's own labels.

    Passed to make_train_step so frozen subtrees are stop_gradient-ed
    BEFORE the forward: without it, value_and_grad differentiates through
    the frozen vision tower (the reference freezes via requires_grad=False,
    llava/train/train.py:1029-1062, so its backward never touches the
    tower), saving every ViT layer's attention activations for a gradient
    that the optimizer then multiplies by zero — measured as the
    difference between the stage-2 step fitting a v5e-8 and not
    (tools/aot_memory.py)."""
    return jax.tree.map(lambda l: l != "frozen", param_labels(cfg, params))


def create_optimizer(
    cfg: TrainConfig, total_steps: int, params: Params
) -> optax.GradientTransformation:
    base = lr_schedule(cfg, total_steps)

    def label_fn(p):
        return param_labels(cfg, p)

    transforms = {"train": _adamw(cfg, base), "frozen": optax.set_to_zero()}
    if cfg.mm_projector_lr is not None:
        import dataclasses

        proj_cfg = dataclasses.replace(cfg, learning_rate=cfg.mm_projector_lr)
        transforms["projector"] = _adamw(proj_cfg, lr_schedule(proj_cfg, total_steps))
    tx = optax.multi_transform(transforms, label_fn)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


def create_train_state(
    params: Params, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)
    )


def make_train_step(
    model_cfg: ModelConfig,
    tx: optax.GradientTransformation,
    *,
    remat: bool = True,
    attn_impl: str = "chunked",
    rmt_loss: bool = False,
    mask: Any = None,
    act_sharding: Any = None,
) -> Callable:
    """Build the jittable train step: (state, batch, rng) -> (state, metrics).

    Default attention is the differentiable chunked/online-softmax impl (the
    training replacement for CUDA flash-attn backward). ``rmt_loss`` selects
    the retro path (per-segment LM loss, train/retro.py). ``mask`` — the
    trainable_mask(cfg, params) bool pytree — stops gradients into frozen
    subtrees so autodiff prunes their backward entirely (a frozen tower's
    activations are never saved; grads for frozen leaves come back as
    zeros, which the optimizer's set_to_zero group expected anyway).
    ``act_sharding`` — optional NamedSharding for the LM's remat-saved
    layer boundaries; pass P('data', 'model', None) under FSDP+TP to
    sequence-shard saved activations over the TP axis (required for the
    stage-2 recipe to fit a v5e — tools/aot_memory.py)."""

    def train_step(state: TrainState, batch: MultimodalBatch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        leaves, treedef = jax.tree.flatten(state.params)
        if mask is not None:
            mleaves = jax.tree.leaves(mask)
        else:
            mleaves = [True] * len(leaves)

        def compute_loss(params):
            if rmt_loss:
                from videollamb_tpu.train.retro import retro_loss

                return retro_loss(
                    params, model_cfg, batch, deterministic=False, rng=rng,
                    remat=remat, attn_impl=attn_impl,
                )
            logits, spliced = videollamb_forward(
                params, model_cfg, batch, deterministic=False, rng=rng,
                remat=remat, attn_impl=attn_impl, act_sharding=act_sharding,
            )
            loss, n = causal_lm_loss(logits, spliced.labels)
            return loss, n

        # Differentiate ONLY the trainable leaves: frozen leaves enter as
        # stop_gradient constants, so their backward is pruned and int8
        # (QLoRA base) leaves never reach grad's dtype check.
        def loss_fn(train_leaves):
            it = iter(train_leaves)
            full = [next(it) if m else jax.lax.stop_gradient(x)
                    for m, x in zip(mleaves, leaves)]
            return compute_loss(jax.tree.unflatten(treedef, full))

        train_leaves = [x for m, x in zip(mleaves, leaves) if m]
        (loss, n_tokens), tgrads = jax.value_and_grad(
            loss_fn, has_aux=True)(train_leaves)
        # Reassemble a full-structure grad tree (zeros at frozen leaves —
        # the optimizer's set_to_zero group; XLA folds the add-zero away).
        it = iter(tgrads)
        grads = jax.tree.unflatten(
            treedef, [next(it) if m else jnp.zeros_like(x)
                      for m, x in zip(mleaves, leaves)])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "tokens": n_tokens,
            # Trainable-leaf norm only — matches the reference, where
            # clip_grad_norm never sees requires_grad=False params.
            "grad_norm": optax.global_norm(tgrads),
        }
        return TrainState(step=state.step + 1, params=params, opt_state=opt_state), metrics

    return train_step
