#!/bin/bash
# Production fine-tune recipe (counterpart of the reference
# scripts/finetune_video_image.slurm:19-56 DeepSpeed launch): LLaVA-1.5-7B
# base, LanguageBind towers, rmt_r_transformer1x bridge, 16 frames, bf16,
# cosine lr 2e-5, ctx 2048. DeepSpeed ZeRO-1 -> GSPMD data-parallel mesh
# (one JAX process drives all local chips; no launcher needed).

MODEL_PATH=${MODEL_PATH:-"./checkpoints/llava-v1.5-7b"}
VIDEO_TOWER=${VIDEO_TOWER:-"./checkpoints/LanguageBind_Video_merge"}
IMAGE_TOWER=${IMAGE_TOWER:-"./checkpoints/LanguageBind_Image"}
DATA_PATH=${DATA_PATH:-"./data/magic_json/video_image.json"}
VIDEO_FOLDER=${VIDEO_FOLDER:-"./data"}
IMAGE_FOLDER=${IMAGE_FOLDER:-"./data"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/videollamb-llava-1.5-7b"}

python -m videollamb_tpu.train.cli \
    --model_name_or_path "$MODEL_PATH" \
    --version v1 \
    --data_path "$DATA_PATH" \
    --video_folder "$VIDEO_FOLDER" \
    --image_folder "$IMAGE_FOLDER" \
    --video_tower "$VIDEO_TOWER" \
    --image_tower "$IMAGE_TOWER" \
    --mm_projector_type rmt_r_transformer1x \
    --num_frames 16 \
    --mm_vision_select_layer -2 \
    --image_aspect_ratio pad \
    --bf16 True \
    --num_train_epochs 1 \
    --per_device_train_batch_size 8 \
    --gradient_accumulation_steps 1 \
    --learning_rate 2e-5 \
    --weight_decay 0. \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 50000 \
    --save_total_limit 1 \
    --model_max_length 2048 \
    --gradient_checkpointing True \
    --output_dir "$OUTPUT_DIR" \
    "$@"
