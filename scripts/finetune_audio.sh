#!/bin/bash
# Audio fine-tune recipe (beyond the reference: it vendors the LanguageBind
# audio encoder but never wires it to data or training — its own audio
# transform cannot even run, processing_audio.py:4). Here AUDIO is a
# first-class X modality: WAV samples ('audio' key, "<audio>" sentinel
# -202) become log-mel fbank images feeding the LanguageBind_Audio tower
# (rectangular 112x1036 mel position grid) through the same splice/bridge
# path as video. Data JSON rows: {"audio": "clip.wav", "conversations":
# [...~"<audio>\nwhat do you hear?"...]}.

MODEL_PATH=${MODEL_PATH:-"./checkpoints/llava-v1.5-7b"}
AUDIO_TOWER=${AUDIO_TOWER:-"LanguageBind/LanguageBind_Audio"}
DATA_PATH=${DATA_PATH:-"./data/audio_chat.json"}
AUDIO_FOLDER=${AUDIO_FOLDER:-"./data/audios"}
OUTPUT_DIR=${OUTPUT_DIR:-"./checkpoints/videollamb-audio-7b"}

python -m videollamb_tpu.train.cli \
    --model_name_or_path "$MODEL_PATH" \
    --version v1 \
    --data_path "$DATA_PATH" \
    --audio_folder "$AUDIO_FOLDER" \
    --image_tower "$AUDIO_TOWER" \
    --mm_projector_type mlp2x_gelu \
    --tune_mm_mlp_adapter \
    --mm_vision_select_layer -2 \
    --bf16 true \
    --num_train_epochs 1 \
    --per_device_train_batch_size 8 \
    --gradient_accumulation_steps 2 \
    --learning_rate 1e-3 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --model_max_length 2048 \
    --output_dir "$OUTPUT_DIR"
