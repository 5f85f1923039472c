#!/bin/bash
# EgoSchema MC eval: shard across N worker processes, merge, score.
# Counterpart of reference scripts/eval/egoschema.sh:14-48 (the reference
# shards by CUDA_VISIBLE_DEVICES; here each worker is a process — on a TPU
# pod, set CHUNKS=#hosts and run one worker per host).

CKPT_NAME=${CKPT_NAME:-"videollamb-llava-1.5-7b"}
MODEL_PATH=${MODEL_PATH:-"./checkpoints/${CKPT_NAME}"}
VIDEO_TOWER=${VIDEO_TOWER:-"./checkpoints/LanguageBind_Video_merge"}
VIDEO_DIR=${VIDEO_DIR:-"./data/eval/egoschema/videos"}
GT_Q=${GT_Q:-"./data/eval/egoschema/questions.json"}
GT_A=${GT_A:-"./data/eval/egoschema/answers.json"}
OUTPUT_DIR=${OUTPUT_DIR:-"./results/egoschema/${CKPT_NAME}"}
NUM_FRAMES=${NUM_FRAMES:-16}
CHUNKS=${CHUNKS:-1}

for IDX in $(seq 0 $((CHUNKS-1))); do
    python -m videollamb_tpu.eval.videoqa_mc \
        --model-path "$MODEL_PATH" \
        --video-tower "$VIDEO_TOWER" \
        --video_dir "$VIDEO_DIR" \
        --gt_file_question "$GT_Q" \
        --gt_file_answers "$GT_A" \
        --output_dir "$OUTPUT_DIR" \
        --output_name "pred_${CHUNKS}_${IDX}" \
        --num_chunks "$CHUNKS" \
        --chunk_idx "$IDX" \
        --batch_slots ${BATCH_SLOTS:-0} \
        --num_frames "$NUM_FRAMES" &
done
wait

cat "$OUTPUT_DIR"/pred_${CHUNKS}_*.json > "$OUTPUT_DIR/merge.jsonl"
python -m videollamb_tpu.eval.acc --src "$OUTPUT_DIR/merge.jsonl"
