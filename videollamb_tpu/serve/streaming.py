"""Online streaming inference (LiveInfer equivalent).

Counterpart of the reference streaming engine (llava/serve/inference.py:26-273):

- ``load_videos``: fps-resampled full video tensor staged on device;
- ``input_video_stream``: encodes ONLY the new frames each tick (per-frame,
  no temporal attention — reference encode_image_features) and queues
  (timestamp, frame features / CLS / raw frames);
- ``_call_for_streaming``: runs online SceneTilling over all queued CLS
  embeddings and fires a response when a fresh boundary appears
  (inference.py:164-168 heuristic, preserved verbatim);
- ``_call_for_response``: rebuilds the conversation prompt and runs a full
  generate over the linspace-subsampled frames (multiple of 8).

TPU notes: frame encodes batch to multiples of 8 frames per dispatch; the
segmentation runs on host over the accumulated CLS matrix (tiny).
"""

from __future__ import annotations

import collections
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import DEFAULT_X_TOKEN
from videollamb_tpu.data.video_reader import load_video
from videollamb_tpu.models.vision.clip_vit import vision_encode
from videollamb_tpu.ops.scene_tilling import segment_threshold
from videollamb_tpu.serve.chat import Chat


class LiveInfer:
    def __init__(self, chat: Chat, frame_fps: float = 1.0):
        self.chat = chat
        self.cfg: ModelConfig = chat.cfg
        self.frame_fps = frame_fps
        self.frame_interval = 1.0 / frame_fps
        self.reset()

    # ------------------------------------------------------------------
    def reset(self) -> None:
        self.query_queue = collections.deque()
        self.frame_embeds_queue = collections.deque()
        self.cls_embeds_queue = collections.deque()
        self.all_frame_tensors_queue = collections.deque()
        self.boundaries: List[int] = [0]
        self.video_time = 0.0
        self.last_frame_idx = -1
        self.video_tensor: Optional[np.ndarray] = None
        self.chat.reset()

    def load_videos(self, video_path: str) -> None:
        raw = load_video(video_path, fps=self.frame_fps, max_frames=512)
        self.video_tensor = self.chat.processors["VIDEO"](raw)  # (T, C, H, W)
        self.num_video_frames = self.video_tensor.shape[0]
        self.video_duration = self.num_video_frames / self.frame_fps

    # ------------------------------------------------------------------
    def _encode_frames(self, frames: np.ndarray) -> np.ndarray:
        """Per-frame tower features (B=T, T=1 -> no temporal attention),
        like reference encode_image_features (llava_arch.py:340-344)."""
        params = self.chat.params
        tower = params.get("image_tower", params["video_tower"])
        feats = vision_encode(
            tower, jnp.asarray(frames[:, None], self.chat._dtype()), self.cfg.vision
        )  # (T, 1, N, D)
        return np.asarray(feats[:, 0].astype(jnp.float32))

    def input_query_stream(self, query: str, video_time: Optional[float] = None) -> str:
        t = self.video_time if video_time is None else video_time
        self.query_queue.append((t, query))
        return f'(NOTE: Received "{query}" (at {t}s).)'

    def input_video_stream(self, video_time: float) -> None:
        frame_idx = int(video_time * self.frame_fps)
        if frame_idx > self.last_frame_idx:
            ranger = range(self.last_frame_idx + 1, frame_idx + 1)
            frames = self.video_tensor[list(ranger)]
            feats = self._encode_frames(frames)  # (L, N, D)
            self.frame_embeds_queue.extend(
                (r / self.frame_fps, f) for r, f in zip(ranger, feats)
            )
            self.cls_embeds_queue.extend(
                (r / self.frame_fps, f[0]) for r, f in zip(ranger, feats)
            )
            self.all_frame_tensors_queue.extend(
                (r / self.frame_fps, t) for r, t in zip(ranger, frames)
            )
        self.last_frame_idx = frame_idx
        self.video_time = video_time

    # ------------------------------------------------------------------
    def _segment_boundaries(self) -> List[int]:
        cls = np.stack([x[1] for x in self.cls_embeds_queue])
        if cls.shape[0] < 3:
            return [cls.shape[0] - 1]
        bounds, valid = segment_threshold(jnp.asarray(cls))
        return np.asarray(bounds)[np.asarray(valid)].tolist()

    def _call_for_streaming(self) -> Tuple[Optional[float], Optional[str]]:
        while self.frame_embeds_queue:
            # 1. A query older than the next frame -> answer it now.
            if self.query_queue and self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
                video_time, query = self.query_queue.popleft()
                return video_time, query

            video_time, _ = self.frame_embeds_queue.popleft()

            # 2. Online SceneTilling: respond on a fresh, recent boundary
            # (reference inference.py:164-168, condition preserved).
            boundaries = self._segment_boundaries()
            if (
                boundaries[-1] not in self.boundaries
                and len(boundaries) > 2
                and video_time - boundaries[-1] < 3
                and boundaries[-1] - self.boundaries[-1] > 1
            ):
                for bd in boundaries:
                    if bd not in self.boundaries:
                        self.boundaries.append(bd)
                return video_time, None
        return None, None

    def _call_for_response(self, video_time: float, query: Optional[str]) -> Tuple[str, str]:
        if query is not None:
            self.chat.conv.append_message(
                self.chat.conv.roles[0], DEFAULT_X_TOKEN["VIDEO"] + "\n" + query
            )
            self.chat.conv.append_message(self.chat.conv.roles[1], None)
        prompt = self.chat.conv.get_prompt()

        frames = np.stack([x[1] for x in self.all_frame_tensors_queue])
        num_select = max(8, frames.shape[0] - frames.shape[0] % 8)
        idx = np.linspace(0, frames.shape[0] - 1, num_select, dtype=int)
        frames = frames[idx]

        response = self.chat.generate_text(
            prompt, videos=frames, max_new_tokens=512, temperature=0.2,
            do_sample=True,
        )
        if query is not None:
            self.chat.conv.messages[-1][1] = response
        query_str = f"(Video Time = {video_time}s) User: {query}"
        response_str = f"(Video Time = {video_time}s) Assistant:{response}"
        return query_str, response_str

    def __call__(self) -> Tuple[Optional[str], Optional[str]]:
        video_time, query = self._call_for_streaming()
        response = None
        if video_time is not None:
            query, response = self._call_for_response(video_time, query)
        return query, response
