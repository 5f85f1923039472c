"""Mixed-modality QA inference: image+video(+audio) blocks in ONE prompt.

TPU-native counterpart of the reference multi-X request protocol
(llava/eval/model_videoqa_act.py:82-88,117-120: an ``X`` feature list with
an ``X_modalities`` list per request, each tag spliced in order). Each GT
question row may name any subset of {"video_name", "image_name",
"audio_name"}; all named media join one prompt through the K-sentinel
splice (models/splice.py, assembly.encode_mixed), and the model answers
free-form for GPT-judge scoring (same output protocol as eval/videoqa.py).

Shard-and-merge follows the chunk-idx protocol of the other drivers.
"""

from __future__ import annotations

import argparse
import json
import os

from videollamb_tpu.eval.videoqa_mc import get_chunk, resolve_video_path


def _load_media(args, sample, chat):
    """Assemble the ordered (modality, processed-pixels) block list;
    None (skip the sample) when any named medium is missing/unreadable."""
    from videollamb_tpu.data.media import load_media_blocks

    video_path = (resolve_video_path(args.video_dir, sample["video_name"])
                  if sample.get("video_name") else None)
    if sample.get("video_name") and video_path is None:
        return None
    paths = {
        "VIDEO": video_path,
        "IMAGE": (os.path.join(args.image_dir or args.video_dir,
                               sample["image_name"])
                  if sample.get("image_name") else None),
        "AUDIO": (os.path.join(args.audio_dir or args.video_dir,
                               sample["audio_name"])
                  if sample.get("audio_name") else None),
    }
    blocks = load_media_blocks(paths, chat.processors,
                               num_frames=args.num_frames, strict=False)
    return blocks or None


def run_inference(args, chat=None):
    if chat is None:
        from videollamb_tpu.models.builder import load_pretrained_model
        from videollamb_tpu.serve.chat import Chat

        tokenizer, params, cfg, processors, _ = load_pretrained_model(
            args.model_path, args.model_base, video_tower_path=args.video_tower,
        )
        chat = Chat(tokenizer, params, cfg, processors)

    with open(args.gt_file_question) as f:
        gt_questions = json.load(f)
    with open(args.gt_file_answers) as f:
        gt_answers = json.load(f)
    pairs = get_chunk(list(zip(gt_questions, gt_answers)),
                      args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")
    n = 0
    with open(out_path, "w") as ans_file:
        for sample, gt in pairs:
            blocks = _load_media(args, sample, chat)
            if blocks is None:
                continue
            chat.reset()
            record = {
                "id": sample.get("question_id"),
                "question": sample["question"],
                "answer": gt["answer"],
                "modalities": [m for m, _ in blocks],
                "pred": chat.ask_mixed(
                    sample["question"], blocks,
                    max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature,
                    do_sample=args.temperature > 0,
                ),
            }
            n += 1
            ans_file.write(json.dumps(record) + "\n")
    return {"output": out_path, "n": n}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--video-tower", default=None)
    parser.add_argument("--video_dir", required=True)
    parser.add_argument("--image_dir", default=None)
    parser.add_argument("--audio_dir", default=None)
    parser.add_argument("--gt_file_question", required=True)
    parser.add_argument("--gt_file_answers", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--output_name", required=True)
    import jax

    parser.add_argument("--num_chunks", type=int, default=jax.process_count())
    parser.add_argument("--chunk_idx", type=int, default=jax.process_index())
    parser.add_argument("--num_frames", type=int, default=8)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--temperature", type=float, default=0.0)
    return parser.parse_args()


if __name__ == "__main__":
    run_inference(parse_args())
