"""Gradio web demo (counterpart of llava/serve/gradio_demo.py:33-252).

Import-gated: gradio is an optional dependency (not in the base TPU image);
the module raises a clear error at launch time when missing.
"""

from __future__ import annotations

import argparse
import os


TITLE = "VideoLLaMB-TPU"
DESCRIPTION = (
    "Long-video understanding with the recurrent Memory Bridge, running on "
    "TPU. Upload a video or image and chat about it."
)


def build_demo(chat):
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is required for the web demo: pip install gradio"
        ) from e

    import numpy as np

    from videollamb_tpu.data.video_reader import load_video

    state = {"frames": None, "first": True}

    def upload_video(video_file):
        raw = load_video(video_file, num_frames=16)
        state["frames"] = chat.processors["VIDEO"](raw)
        state["first"] = True
        chat.reset()
        return f"Loaded {raw.shape[0]} frames."

    def respond(message, history):
        if state["frames"] is None:
            return "Please upload a video first."
        out = chat.ask_about_video(
            message, state["frames"], first_turn=state["first"],
            temperature=0.2, do_sample=True, max_new_tokens=512,
        )
        state["first"] = False
        return out

    with gr.Blocks(title=TITLE) as demo:
        gr.Markdown(f"# {TITLE}\n{DESCRIPTION}")
        with gr.Row():
            with gr.Column(scale=3):
                video = gr.Video(label="video")
                status = gr.Textbox(label="status", interactive=False)
                video.upload(upload_video, [video], [status])
            with gr.Column(scale=7):
                gr.ChatInterface(respond)
    return demo


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--video-tower", default=None)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=7860)
    args = parser.parse_args()

    from videollamb_tpu.models.builder import load_pretrained_model
    from videollamb_tpu.serve.chat import Chat

    tokenizer, params, cfg, processors, _ = load_pretrained_model(
        args.model_path, args.model_base, video_tower_path=args.video_tower)
    chat = Chat(tokenizer, params, cfg, processors)
    demo = build_demo(chat)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
