"""Streaming chat CLI with FPS/latency accounting.

Counterpart of the reference streaming driver
(llava/serve/cli_streaming.py:29-68): 1-fps re-encode cache, per-frame tick
loop, JSON history dump. The ffmpeg subprocess re-encode is replaced by the
native/OpenCV reader's fps resampling (already applied in
LiveInfer.load_videos).
"""

from __future__ import annotations

import argparse
import json
import time


def main(liveinfer, args) -> None:
    liveinfer.load_videos(args.video_file)
    if args.query:
        liveinfer.input_query_stream(args.query, video_time=args.query_time)

    history = {"video_path": args.video_file, "frame_fps": liveinfer.frame_fps,
               "conversation": []}
    timecosts = []
    start_time = time.time()

    num_frames = liveinfer.num_video_frames
    for i in range(num_frames):
        video_time = i / liveinfer.frame_fps
        liveinfer.input_video_stream(video_time)
        query, response = liveinfer()
        cost = time.time() - start_time - i * (0 if args.no_sleep else liveinfer.frame_interval)
        timecosts.append(cost)
        fps = (i + 1) / max(sum(timecosts), 1e-6)
        if query or response:
            print(f"[t={video_time:.0f}s cost={cost:.2f}s fps={fps:.1f}]")
        if query:
            print(query)
            history["conversation"].append({"role": "user", "content": query,
                                            "time": video_time, "cost": cost})
        if response:
            print(response)
            history["conversation"].append({"role": "assistant", "content": response,
                                            "time": video_time, "cost": cost, "fps": fps})
        if not args.no_sleep:
            time.sleep(max(0.0, liveinfer.frame_interval - cost))

    with open(args.output, "w") as f:
        json.dump(history, f, indent=2)
    print(f"history -> {args.output}")


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", type=str, required=True)
    parser.add_argument("--model-base", type=str, default=None)
    parser.add_argument("--video-tower", type=str, default=None)
    parser.add_argument("--video-file", type=str, required=True)
    parser.add_argument("--query", type=str, default=None)
    parser.add_argument("--query-time", type=float, default=0.0)
    parser.add_argument("--frame-fps", type=float, default=1.0)
    parser.add_argument("--device-preprocess", action="store_true",
                        help="resize/normalize video frames on the TPU")
    parser.add_argument("--output", type=str, default="stream_history.json")
    parser.add_argument("--no-sleep", action="store_true",
                        help="don't pace to real time")
    parser.add_argument("--incremental", action="store_true",
                        help="TPU-native carried-state engine "
                             "(serve/incremental.StreamingSession): constant "
                             "HBM, no per-response full regenerate")
    parser.add_argument("--reencode-cache", type=str, default=None,
                        help="ffmpeg 1-fps re-encode cache dir (reference "
                             "cli_streaming.py:30-37); falls back to reader "
                             "fps resampling without ffmpeg")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    from videollamb_tpu.models.builder import load_pretrained_model
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.streaming import LiveInfer

    tokenizer, params, cfg, processors, _ = load_pretrained_model(
        args.model_path, args.model_base, video_tower_path=args.video_tower,
        device_preprocess=getattr(args, "device_preprocess", False),
    )
    chat = Chat(tokenizer, params, cfg, processors)
    if args.reencode_cache:
        from videollamb_tpu.data.video_reader import ffmpeg_reencode_cached

        args.video_file = ffmpeg_reencode_cached(
            args.video_file, args.reencode_cache, fps=int(args.frame_fps)
        )
    if args.incremental:
        from videollamb_tpu.serve.incremental import StreamingSession

        engine = StreamingSession(chat, frame_fps=args.frame_fps,
                                  max_seq_len=cfg.max_length)
    else:
        engine = LiveInfer(chat, frame_fps=args.frame_fps)
    main(engine, args)
