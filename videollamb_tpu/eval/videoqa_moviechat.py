"""MovieChat evaluation: flat QA mode and global/breakpoint mode.

Counterparts of reference llava/eval/model_videoqa_moviechat.py (flat QA with
the '\\n Answer the question using several words or phrase.' suffix) and
model_videoqa_moviechat_ws.py:144-181 (per-video 'global' and 'breakpoint'
question sets, answers written back into the sample structure keyed by
'<video>.mp4').
"""

from __future__ import annotations

import argparse
import json
import os

from videollamb_tpu.eval.videoqa_mc import get_chunk, resolve_video_path

ANSWER_SUFFIX = "\n Answer the question using several words or phrase."


def _answer(chat, args, video_path: str, question: str) -> str:
    from videollamb_tpu.data.video_reader import load_video

    raw = load_video(video_path, num_frames=args.num_frames)
    frames = chat.processors["VIDEO"](raw)
    chat.reset()
    return chat.ask_about_video(
        question, frames, max_new_tokens=args.max_new_tokens,
        temperature=args.temperature, do_sample=args.temperature > 0,
    )


def run_inference(args, chat=None):
    """Flat MovieChat QA (reference model_videoqa_moviechat.py:108-180)."""
    if chat is None:
        from videollamb_tpu.models.builder import load_pretrained_model
        from videollamb_tpu.serve.chat import Chat

        tokenizer, params, cfg, processors, _ = load_pretrained_model(
            args.model_path, args.model_base, video_tower_path=args.video_tower)
        chat = Chat(tokenizer, params, cfg, processors)

    gt_questions = get_chunk(json.load(open(args.gt_file_question)),
                             args.num_chunks, args.chunk_idx)
    gt_answers = get_chunk(json.load(open(args.gt_file_answers)),
                           args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")
    n = 0
    with open(out_path, "w") as ans_file:
        for sample, gt in zip(gt_questions, gt_answers):
            question = sample["question"] + ANSWER_SUFFIX
            record = {"id": sample["question_id"], "question": question,
                      "answer": gt["answer"], "type": sample.get("type")}
            video_path = resolve_video_path(args.video_dir, sample["video_name"])
            if video_path is None:
                continue
            record["pred"] = _answer(chat, args, video_path, question)
            n += 1
            ans_file.write(json.dumps(record) + "\n")
    return {"output": out_path, "n": n}


def run_inference_global_breakpoint(args, chat=None):
    """Global/breakpoint mode (reference model_videoqa_moviechat_ws.py)."""
    if chat is None:
        from videollamb_tpu.models.builder import load_pretrained_model
        from videollamb_tpu.serve.chat import Chat

        tokenizer, params, cfg, processors, _ = load_pretrained_model(
            args.model_path, args.model_base, video_tower_path=args.video_tower)
        chat = Chat(tokenizer, params, cfg, processors)

    gt = get_chunk(json.load(open(args.gt_file_question)),
                   args.num_chunks, args.chunk_idx)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")
    with open(out_path, "w") as ans_file:
        for samples in gt:
            key_video_name = samples["video_name"]
            for section in ("global", "breakpoint"):
                for sample in samples.get(section, []):
                    video_path = os.path.join(
                        args.video_dir, f"{sample['video_name']}.mp4")
                    if not os.path.exists(video_path):
                        continue
                    sample["answer"] = _answer(chat, args, video_path,
                                               sample["question"])
            ans_file.write(json.dumps({
                f"{key_video_name}.mp4": {
                    "global": samples.get("global", []),
                    "breakpoint": samples.get("breakpoint", []),
                }
            }) + "\n")
    return {"output": out_path}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--video-tower", default=None)
    parser.add_argument("--video_dir", required=True)
    parser.add_argument("--gt_file_question", required=True)
    parser.add_argument("--gt_file_answers", default=None)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--output_name", required=True)
    # Defaults follow the JAX process topology on multi-host pods
    # (SURVEY §5.8: eval sharding via process_index replaces the
    # reference's CUDA_VISIBLE_DEVICES shell chunking).
    import jax

    parser.add_argument("--num_chunks", type=int, default=jax.process_count())
    parser.add_argument("--chunk_idx", type=int, default=jax.process_index())
    parser.add_argument("--num_frames", type=int, default=8)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--temperature", type=float, default=0.2)
    parser.add_argument("--mode", choices=["flat", "global_breakpoint"],
                        default="flat")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    if args.mode == "flat":
        print(run_inference(args))
    else:
        print(run_inference_global_breakpoint(args))
