#!/bin/bash
# NIAVH (Needle In A Video Haystack) pressure test: depth x length
# accuracy grid through the full-video path or the streaming engine.
# The reference README points at the external MM-NIAVH companion
# benchmark (README.md:144-149) and ships VideoLLaMB-7B-Mem for it; this
# driver synthesizes the protocol self-contained (eval/niavh.py).

CKPT_NAME=${CKPT_NAME:-"videollamb-mem-llava-1.5-7b"}
MODEL_PATH=${MODEL_PATH:-"./checkpoints/${CKPT_NAME}"}
VIDEO_TOWER=${VIDEO_TOWER:-"./checkpoints/LanguageBind_Video_merge"}
HAYSTACK=${HAYSTACK:-"./data/eval/niavh/haystack.mp4"}
NEEDLES=${NEEDLES:-"./data/eval/niavh/needles.json"}
OUTPUT_DIR=${OUTPUT_DIR:-"./results/niavh/${CKPT_NAME}"}
LENGTHS=${LENGTHS:-"32,64,128,256"}
DEPTHS=${DEPTHS:-"0.0,0.25,0.5,0.75,1.0"}
MODE=${MODE:-full}   # full | streaming

python -m videollamb_tpu.eval.niavh \
    --model-path "$MODEL_PATH" \
    --video-tower "$VIDEO_TOWER" \
    --haystack_video "$HAYSTACK" \
    --needle_json "$NEEDLES" \
    --lengths "$LENGTHS" \
    --depths "$DEPTHS" \
    --mode "$MODE" \
    --output_dir "$OUTPUT_DIR" \
    --output_name "niavh_${MODE}"
