"""Training entry point: ``python -m videollamb_tpu.train.cli ...``.

Counterpart of the reference training driver (llava/train/train.py:887-1141
+ the DeepSpeed slurm launcher scripts/finetune_video_image.slurm): parses
the same flag surface, builds the model (pretrained or fresh), towers,
projector, dataset, and runs the GSPMD Trainer. The ``--rmt_loss`` flag
selects the retro (per-segment LM loss) path, replacing the reference's
"_rmt"-in-model-path name dispatch (train.py:927-934).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser()
    # Model arguments (reference ModelArguments, train.py:56-85)
    p.add_argument("--model_name_or_path", type=str, required=True)
    p.add_argument("--version", type=str, default="v1")
    p.add_argument("--image_tower", type=str, default=None)
    p.add_argument("--video_tower", type=str, default=None)
    p.add_argument("--mm_projector_type", type=str, default="rmt_r_transformer1x")
    p.add_argument("--pretrain_mm_mlp_adapter", type=str, default=None)
    p.add_argument("--tune_mm_mlp_adapter", action="store_true")
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--mm_use_x_start_end", action="store_true")
    p.add_argument("--mm_vision_select_layer", type=int, default=-2)
    p.add_argument("--rmt_loss", action="store_true",
                   help="per-segment RMT LM loss (reference '_rmt' path)")
    # Data arguments (reference DataArguments)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--image_folder", type=str, default="")
    p.add_argument("--video_folder", type=str, default="")
    p.add_argument("--audio_folder", type=str, default="",
                   help="root for 'audio' (WAV) samples; pairs with an "
                        "audio --image_tower (AUDIO modality extension)")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--image_aspect_ratio", type=str, default="pad")
    # Training arguments (reference TrainingArguments + zero config)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--per_device_train_batch_size", type=int, default=8)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--mm_projector_lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--lr_scheduler_type", type=str, default="cosine")
    p.add_argument("--model_max_length", type=int, default=2048)
    p.add_argument("--save_steps", type=int, default=50000)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--bf16", type=lambda s: s.lower() == "true", default=True)
    p.add_argument("--gradient_checkpointing", type=lambda s: s.lower() == "true", default=True)
    p.add_argument("--seed", type=int, default=42)
    # Sharding (replaces DeepSpeed zero*.json)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="shard the spliced token stream over this many "
                        "chips (ring attention; long-video contexts)")
    p.add_argument("--lora_enable", action="store_true")
    p.add_argument("--lora_r", type=int, default=128)
    p.add_argument("--lora_alpha", type=int, default=256)
    p.add_argument("--pack_sequences", action="store_true",
                   help="pack several conversations per row (segment-ID "
                        "block-causal attention; each step trains "
                        "pack_factor x the samples at the same shape)")
    p.add_argument("--pack_factor", type=int, default=2)
    return p.parse_args()


def main():
    args = parse_args()

    from videollamb_tpu.config import TrainConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.builder import load_pretrained_model
    from videollamb_tpu.parallel import create_mesh, shard_params
    from videollamb_tpu.train.dataset import Collator, DataConfig, SupervisedDataset
    from videollamb_tpu.train.preprocess import set_default_conversation
    from videollamb_tpu.train.trainer import Trainer

    set_default_conversation(args.version)

    tokenizer, params, model_cfg, processors, _ = load_pretrained_model(
        args.model_name_or_path,
        video_tower_path=args.video_tower,
        image_tower_path=args.image_tower,
        dtype="float32",  # master weights f32; compute casts to bf16
    )
    if "mm_projector" not in params:
        from videollamb_tpu.models.bridge.builder import init_bridge_params
        from videollamb_tpu.config import BridgeConfig
        import dataclasses

        bridge_cfg = BridgeConfig.from_projector_type(args.mm_projector_type)
        model_cfg = dataclasses.replace(model_cfg, bridge=bridge_cfg)
        params["mm_projector"] = init_bridge_params(
            jax.random.PRNGKey(args.seed), bridge_cfg, model_cfg.lm.hidden_size
        )
    if args.pretrain_mm_mlp_adapter:
        import torch

        from videollamb_tpu.models.bridge.convert import convert_rmt_r_state_dict

        sd = torch.load(args.pretrain_mm_mlp_adapter, map_location="cpu",
                        weights_only=True)
        params["mm_projector"] = jax.tree.map(
            jnp.asarray, convert_rmt_r_state_dict(sd, prefix="mm_projector.")
        )

    if args.lora_enable:
        from videollamb_tpu.models.lm.lora import add_lora_params

        params = add_lora_params(
            params, model_cfg.lm, r=args.lora_r, alpha=args.lora_alpha,
            rng=jax.random.PRNGKey(args.seed + 1),
        )

    if args.sequence_parallel > 1:
        assert args.model_parallel == 1, "sequence_parallel excludes model_parallel"
        mesh = None  # params replicated; the SP step shards activations
    else:
        mesh = create_mesh(model_parallel=args.model_parallel)
        params = shard_params(mesh, params)

    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        mm_projector_lr=args.mm_projector_lr,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        lr_schedule=args.lr_scheduler_type,
        num_train_epochs=args.num_train_epochs,
        per_device_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        seed=args.seed,
        bf16=args.bf16,
        gradient_checkpointing=args.gradient_checkpointing,
        tune_mode="adapter" if args.tune_mm_mlp_adapter else (
            "lora" if args.lora_enable else "full"),
        lora_r=args.lora_r,
        lora_alpha=args.lora_alpha,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        logging_steps=args.logging_steps,
        output_dir=args.output_dir,
        rmt_loss=args.rmt_loss,
        pack_sequences=args.pack_sequences,
        pack_factor=args.pack_factor,
    )
    dcfg = DataConfig(
        data_path=args.data_path,
        image_folder=args.image_folder,
        video_folder=args.video_folder,
        audio_folder=args.audio_folder,
        num_frames=args.num_frames,
        mm_use_x_start_end=args.mm_use_x_start_end,
        model_max_length=args.model_max_length,
        image_aspect_ratio=args.image_aspect_ratio,
    )
    dataset = SupervisedDataset(
        args.data_path, tokenizer, dcfg,
        video_processor=VideoProcessor(training=True),
        image_processor=ImageProcessor(),
        seed=args.seed,
    )
    step_factory = None
    if args.sequence_parallel > 1:
        import numpy as _np
        from jax.sharding import Mesh

        from videollamb_tpu.parallel.seq_parallel import (
            make_seq_parallel_videollamb_step,
        )

        devs = jax.devices()
        n_seq = args.sequence_parallel
        n_data = max(1, len(devs) // n_seq)
        smesh = Mesh(_np.asarray(devs[: n_data * n_seq]).reshape(n_data, n_seq),
                     ("data", "seq"))

        def step_factory(mcfg, tx, tcfg_):
            return make_seq_parallel_videollamb_step(
                smesh, mcfg, tx,
                data_axis="data" if n_data > 1 else None,
                remat=tcfg_.gradient_checkpointing,
            )

    trainer = Trainer(
        model_cfg, tcfg, params, dataset,
        collator=Collator(pad_token_id=int(tokenizer.pad_token_id or 0),
                          max_length=args.model_max_length),
        mesh=mesh,
        step_factory=step_factory,
    )
    trainer.train()


if __name__ == "__main__":
    main()
