"""Likelihood-ranked multiple-choice QA: argmin per-option answer loss.

Counterpart of reference llava/eval/model_videoqa_act.py:55-160: for each
option, build the v1 conversation with the option as the assistant answer,
run one multimodal forward with the SAME video for every row, and pick the
option with the lowest mean cross-entropy over its (masked) answer tokens.
This scores options by likelihood instead of sampling a letter.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.constants import DEFAULT_X_TOKEN, IGNORE_INDEX
from videollamb_tpu.eval.videoqa_mc import OPTIONS, get_chunk, resolve_video_path
from videollamb_tpu.models.assembly import MultimodalBatch, videollamb_forward
from videollamb_tpu.train.preprocess import preprocess


def rank_options_by_likelihood(
    chat, question: str, options: Sequence[str], frames: np.ndarray,
) -> int:
    """Returns the argmin-loss option index (reference :89-158)."""
    sources = [
        [{"from": "human", "value": DEFAULT_X_TOKEN["VIDEO"] + "\n" + question},
         {"from": "gpt", "value": option}]
        for option in options
    ]
    per_option = [preprocess([s], chat.tokenizer, x="VIDEO") for s in sources]
    max_len = max(len(d["input_ids"][0]) for d in per_option)
    max_len = min(-(-max_len // 16) * 16, chat.cfg.max_length)

    n = len(options)
    pad_id = int(chat.tokenizer.pad_token_id or 0)
    ids = np.full((n, max_len), pad_id, np.int32)
    labels = np.full((n, max_len), IGNORE_INDEX, np.int32)
    mask = np.zeros((n, max_len), np.int32)
    for i, d in enumerate(per_option):
        row = d["input_ids"][0][:max_len]
        ids[i, : len(row)] = row
        labels[i, : len(row)] = d["labels"][0][:max_len]
        mask[i, : len(row)] = 1

    videos = jnp.broadcast_to(
        jnp.asarray(frames[None], chat._dtype()), (n,) + frames.shape
    )
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
        labels=jnp.asarray(labels), videos=videos, images=None,
    )
    logits, spliced = videollamb_forward(chat.params, chat.cfg, batch)

    shift_logits = logits[:, :-1].astype(jnp.float32)
    shift_labels = spliced.labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    per_row_loss = -jnp.sum(jnp.where(valid, tok_logp, 0.0), axis=1) / jnp.maximum(
        jnp.sum(valid, axis=1), 1
    )
    return int(jnp.argmin(per_row_loss))


def run_inference(args, chat=None):
    from videollamb_tpu.data.video_reader import load_video

    if chat is None:
        from videollamb_tpu.models.builder import load_pretrained_model
        from videollamb_tpu.serve.chat import Chat

        tokenizer, params, cfg, processors, _ = load_pretrained_model(
            args.model_path, args.model_base, video_tower_path=args.video_tower)
        chat = Chat(tokenizer, params, cfg, processors)

    with open(args.gt_file_question) as f:
        gt_questions = json.load(f)
    with open(args.gt_file_answers) as f:
        gt_answers = json.load(f)
    pairs = get_chunk(list(zip(gt_questions, gt_answers)), args.num_chunks, args.chunk_idx)

    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, f"{args.output_name}.json")
    acc, total = 0, 0
    with open(out_path, "w") as ans_file:
        for sample, gt in pairs:
            options = list(sample["option"].values())
            answer = OPTIONS[gt["answer"]]
            video_path = resolve_video_path(args.video_dir, sample["video_name"])
            if video_path is None:
                continue
            raw = load_video(video_path, num_frames=args.num_frames)
            frames = chat.processors["VIDEO"](raw)
            idx = rank_options_by_likelihood(chat, sample["question"], options, frames)
            pred = chr(ord("A") + idx)
            total += 1
            acc += int(pred == answer)
            ans_file.write(json.dumps({
                "id": sample["question_id"], "question": sample["question"],
                "answer": answer, "pred": pred,
                **({"type": gt["type"]} if "type" in gt else {}),
            }) + "\n")
    return {"output": out_path, "n": total, "acc": acc / max(total, 1)}


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--video-tower", default=None)
    parser.add_argument("--video_dir", required=True)
    parser.add_argument("--gt_file_question", required=True)
    parser.add_argument("--gt_file_answers", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--output_name", required=True)
    import jax as _jax

    parser.add_argument("--num_chunks", type=int, default=_jax.process_count())
    parser.add_argument("--chunk_idx", type=int, default=_jax.process_index())
    parser.add_argument("--num_frames", type=int, default=8)
    return parser.parse_args()


if __name__ == "__main__":
    print(run_inference(parse_args()))
