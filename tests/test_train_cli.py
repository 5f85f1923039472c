"""Train CLI smoke: the flag surface parses with the production recipe."""

import sys

import conftest as _c  # noqa: F401


def test_cli_flags_parse(monkeypatch):
    from videollamb_tpu.train import cli

    argv = [
        "prog",
        "--model_name_or_path", "ckpts/llava-v1.5-7b",
        "--version", "v1",
        "--data_path", "data/video_image.json",
        "--video_folder", "data",
        "--video_tower", "ckpts/LanguageBind_Video_merge",
        "--mm_projector_type", "rmt_r_transformer1x",
        "--num_frames", "16",
        "--mm_vision_select_layer", "-2",
        "--image_aspect_ratio", "pad",
        "--bf16", "True",
        "--num_train_epochs", "1",
        "--per_device_train_batch_size", "8",
        "--learning_rate", "2e-5",
        "--warmup_ratio", "0.03",
        "--lr_scheduler_type", "cosine",
        "--model_max_length", "2048",
        "--gradient_checkpointing", "True",
        "--output_dir", "out",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    args = cli.parse_args()
    assert args.mm_projector_type == "rmt_r_transformer1x"
    assert args.bf16 is True and args.gradient_checkpointing is True
    assert args.num_frames == 16 and args.model_max_length == 2048
    assert args.lora_enable is False and not args.rmt_loss
    assert args.sequence_parallel == 1 and args.audio_folder == ""
