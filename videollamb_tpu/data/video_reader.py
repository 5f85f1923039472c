"""Host video decoding: frame sampling across multiple backends.

Replaces the reference's decord/opencv/av/gif/frame-dir reader stack
(llava/vid_utils.py:35-195 and languagebind/video/processing_video.py:78-197)
with:

- a C++ libav decoder (videollamb_tpu.native) when built — the TPU-native
  equivalent of decord, with multi-threaded demux+decode;
- an OpenCV fallback (seek-based sparse sampling, like the reference's
  'opencv' backend);
- gif (imageio) and frame-directory backends.

All backends return (T, H, W, C) uint8 RGB frames at the sampled indices.
"""

from __future__ import annotations

import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def sample_indices_uniform(total: int, num: int) -> np.ndarray:
    """linspace(0, total-1, num) as int — the reference's universal sampling
    (vid_utils.py:18-32, processing_video.py:105)."""
    return np.linspace(0, max(total - 1, 0), num, dtype=int)


def fps_num_frames(total_frames: int, avg_fps: float, target_fps: float,
                   min_frames: int = 8, max_frames: int = 512) -> int:
    """fps-driven frame budget: ceil(secs*fps) rounded down to a multiple of
    8, floored at 8, capped at 512 (reference processing_video.py:100-106)."""
    secs = total_frames / max(avg_fps, 1e-6)
    new_duration = math.ceil(secs * target_fps)
    num = max(min_frames, new_duration - new_duration % 8)
    return min(num, max_frames)


def probe_video(path: str) -> Tuple[int, float]:
    """(total_frames, avg_fps)."""
    native = _native_decoder()
    if native is not None:
        return native.probe(path)
    import cv2

    cap = cv2.VideoCapture(path)
    try:
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = float(cap.get(cv2.CAP_PROP_FPS)) or 30.0
    finally:
        cap.release()
    return total, fps


def _native_decoder():
    try:
        from videollamb_tpu.native import video_decoder

        if video_decoder.available():
            return video_decoder
    except Exception:
        pass
    return None


def _read_cv2(path: str, indices: Sequence[int]) -> np.ndarray:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    try:
        last_pos = -2
        for idx in indices:
            idx = int(idx)
            if idx != last_pos + 1:
                cap.set(cv2.CAP_PROP_POS_FRAMES, idx)
            ok, frame = cap.read()
            if not ok:
                raise ValueError(f"video decode error at frame {idx}: {path}")
            last_pos = idx
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    return np.stack(frames)


def _read_gif(path: str, num_frames: int) -> np.ndarray:
    import imageio

    reader = imageio.get_reader(path)
    frames = [np.asarray(f) for f in reader]
    indices = sample_indices_uniform(len(frames), num_frames)
    out = []
    for i in indices:
        f = frames[int(i)]
        if f.ndim == 2:
            f = np.stack([f] * 3, -1)
        if f.shape[-1] == 4:
            f = f[..., :3]
        out.append(f)
    return np.stack(out)


def _read_frame_dir(path: str, num_frames: int) -> np.ndarray:
    from PIL import Image

    names = sorted(os.listdir(path))
    indices = sample_indices_uniform(len(names), num_frames)
    frames = []
    for i in indices:
        img = Image.open(os.path.join(path, names[int(i)]))
        if img.mode != "RGB":
            img = img.convert("RGB")
        frames.append(np.asarray(img))
    return np.stack(frames)


def ffmpeg_command(src_path: str, dst_path: str, *, fps: Optional[int] = None,
                   resolution: Optional[int] = None, pad: str = "#000000",
                   mode: str = "bicubic") -> list:
    """The reference's streaming re-encode command (llava/serve/
    cli_streaming.py:12-27 ffmpeg_once): strip audio, optional fps
    resample, optional square pad-resize."""
    command = ["ffmpeg", "-y", "-sws_flags", mode, "-i", src_path, "-an",
               "-threads", "10"]
    if fps is not None:
        command += ["-r", str(fps)]
    if resolution is not None:
        command += [
            "-vf",
            f"scale='if(gt(iw\\,ih)\\,{resolution}\\,-2)':'if(gt(iw\\,ih)\\,-2\\,{resolution})'"
            f",pad={resolution}:{resolution}:(ow-iw)/2:(oh-ih)/2:color='{pad}'",
        ]
    return command + [dst_path]


def ffmpeg_reencode_cached(src_path: str, cache_dir: str, fps: int = 1,
                           resolution: Optional[int] = None) -> str:
    """Re-encode once into a cache dir and return the cached path
    (reference cli_streaming.py:30-37). Falls back to the original path
    (reader-side fps resampling) when ffmpeg isn't on PATH."""
    import shutil
    import subprocess

    name, ext = os.path.splitext(os.path.basename(src_path))
    dst = os.path.join(cache_dir, f"{name}_{fps}fps{ext}")
    if os.path.exists(dst):
        return dst
    if shutil.which("ffmpeg") is None:
        return src_path
    os.makedirs(cache_dir, exist_ok=True)
    subprocess.run(
        ffmpeg_command(src_path, dst, fps=fps, resolution=resolution), check=True
    )
    return dst


def _read_av(path: str, indices: Sequence[int]) -> np.ndarray:
    """PyAV backend (reference vid_utils.py:52-68 'av' branch): sequential
    decode, keep the sampled indices. Optional dependency — import is
    deferred so the backend is selectable only where PyAV exists."""
    import av  # noqa: PLC0415 — optional backend

    wanted = {int(i) for i in indices}
    frames = {}
    with av.open(path) as container:
        for idx, frame in enumerate(container.decode(video=0)):
            if idx in wanted:
                frames[idx] = frame.to_ndarray(format="rgb24")
            if len(frames) == len(wanted):
                break
    return np.stack([frames[int(i)] for i in indices])


def load_video(
    path: str,
    num_frames: Optional[int] = None,
    fps: Optional[float] = None,
    max_frames: int = 512,
    backend: str = "auto",
) -> np.ndarray:
    """Decode and uniformly sample a video.

    Args:
      path: video file, gif, or frame directory.
      num_frames: fixed frame budget; overridden by ``fps`` if given.
      fps: target sampling rate — frame budget becomes
        fps_num_frames(total, avg_fps, fps) (reference decord branch).
    Returns:
      (T, H, W, C) uint8 RGB.
    """
    if os.path.isdir(path):
        return _read_frame_dir(path, num_frames or 8)
    if path.lower().endswith(".gif"):
        return _read_gif(path, num_frames or 8)

    total, avg_fps = probe_video(path)
    if fps:
        num_frames = fps_num_frames(total, avg_fps, fps, max_frames=max_frames)
    elif num_frames is None:
        num_frames = 8
    indices = sample_indices_uniform(total, num_frames)

    if backend == "av":
        return _read_av(path, indices)
    native = _native_decoder() if backend in ("auto", "native") else None
    if native is not None:
        return native.read_frames(path, indices)
    return _read_cv2(path, indices)
