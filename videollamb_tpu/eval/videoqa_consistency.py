"""Consistency eval: two paraphrased questions per video, shared answer.

Counterpart of reference llava/eval/model_videoqa_consistency.py:120-180:
answers Q1 and Q2 independently; the consistency GPT judge
(eval/gpt_judge.py dimension='consistency') scores pred1 vs pred2 vs the
common answer.
"""

from __future__ import annotations

import argparse
import json
import os

from videollamb_tpu.eval.videoqa_mc import get_chunk, resolve_video_path


def run_inference(args, chat=None):
    from videollamb_tpu.data.video_reader import load_video

    if chat is None:
        from videollamb_tpu.models.builder import load_pretrained_model
        from videollamb_tpu.serve.chat import Chat

        tokenizer, params, cfg, processors, _ = load_pretrained_model(
            args.model_path, args.model_base, video_tower_path=args.video_tower)
        chat = Chat(tokenizer, params, cfg, processors)

    samples = get_chunk(json.load(open(args.gt_file)), args.num_chunks, args.chunk_idx)
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")
    n = 0
    with open(out_path, "w") as ans_file:
        for sample in samples:
            q1, q2 = sample["Q1"], sample["Q2"]
            record = {"id": sample.get("question_id"), "question": q1,
                      "question2": q2, "answer": sample.get("A")}
            video_path = resolve_video_path(args.video_dir, sample["video_name"])
            if video_path is None:
                continue
            raw = load_video(video_path, num_frames=args.num_frames)
            frames = chat.processors["VIDEO"](raw)
            preds = []
            for q in (q1, q2):
                chat.reset()
                preds.append(chat.ask_about_video(
                    q, frames, max_new_tokens=args.max_new_tokens,
                    temperature=args.temperature, do_sample=args.temperature > 0,
                ))
            record["pred1"], record["pred2"] = preds
            n += 1
            ans_file.write(json.dumps(record) + "\n")
    return {"output": out_path, "n": n}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--video-tower", default=None)
    parser.add_argument("--video_dir", required=True)
    parser.add_argument("--gt_file", required=True)
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
    return parser.parse_args()


if __name__ == "__main__":
    print(run_inference(parse_args()))
