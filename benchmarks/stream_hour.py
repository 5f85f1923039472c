"""Hour-scale streaming benchmark: sustained LiveInfer on one chip.

BASELINE config #5 ("Hour-scale NIAVH ... max recurrence depth") is the
last north-star configuration without a measured number: this drives
``serve.incremental.StreamingSession`` (the bounded-state LiveInfer —
carried KV cache, bridge ring, fixed-shape boundary detection) over a
synthetic >= 1-hour 1-fps scene-structured stream with the production
model shapes (ViT-L tower, Memory Bridge, int8 7B LM) and reports:

- sustained frames/s and the real-time factor (vs the 1-fps feed);
- per-tick latency p50/p99 (a tick ingests a small camera buffer of
  frames; ticks that fold a segment or fire a response sit in the tail);
- boundary fires (segments folded into the recurrent memory), responses;
- bounded-state evidence: max resident open frames, final context length
  vs the cap, context compactions, boundary-detector compile-cache
  growth after warmup (zero = no recompiles for the whole stream), and
  the set of state-array shapes seen (must be exactly one).

Reference protocol being matched: llava/serve/inference.py:26-273 +
cli_streaming.py:29-64 (per-frame tick loop with FPS/latency
accounting). The reference re-runs a full generate over re-subsampled
frames per response and its queues grow without bound; this engine's
per-tick cost is flat in stream length — which is what this bench
proves at hour scale.

Usage: python benchmarks/stream_hour.py [--minutes 60] [--stride 4]
Prints one JSON line. Also importable: ``run(params=...)`` from bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


class WordTok:
    """Minimal deterministic tokenizer (timing does not depend on a real
    vocab; random-init weights produce arbitrary ids either way)."""

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0

    def __init__(self):
        self.vocab = {"<bos>": 1, "</s>": 2}

    def __call__(self, text):
        class R:  # noqa: N801
            pass

        words = text.replace("</s>", " </s> ").split()
        ids = [self.bos_token_id]
        for w in words:
            if w not in self.vocab:
                self.vocab[w] = len(self.vocab) + 10
            ids.append(self.vocab[w])
        r = R()
        r.input_ids = ids
        return r

    def decode(self, ids, skip_special_tokens=True):
        inv = {v: k for k, v in self.vocab.items()}
        return " ".join(inv.get(i, f"tok{i}") for i in ids
                        if not (skip_special_tokens and i in (0, 1, 2)))


def synth_stream(n_frames: int, seed: int = 0,
                 scene_lo: int = 25, scene_hi: int = 45,
                 size: int = 224) -> np.ndarray:
    """Scene-structured processed frames (T, 3, size, size) float16: each
    scene shares a base pattern + per-frame noise, so frame-CLS cosine
    similarity drops at scene changes and SceneTilling has real
    boundaries to find."""
    rng = np.random.default_rng(seed)
    out = np.empty((n_frames, 3, size, size), np.float16)
    t = 0
    while t < n_frames:
        n = int(rng.integers(scene_lo, scene_hi))
        base = rng.normal(0, 1, size=(3, size, size)).astype(np.float16)
        for i in range(min(n, n_frames - t)):
            out[t + i] = base + rng.normal(0, 0.05, size=(3, size, size)
                                           ).astype(np.float16)
        t += n
    return out


def run(minutes: float = 60.0, fps: float = 1.0, stride: int = 4,
        max_new_tokens: int = 16, query_every_s: float = 300.0,
        params=None, seed: int = 0, cfg=None, image_size: int = 224,
        deadline_s: float | None = None) -> dict:
    """``deadline_s`` bounds the WALL time of the streaming loop (warmup
    included): when exceeded the stream stops early and every metric is
    computed over the frames actually folded, with
    ``stream_hour_truncated_for_budget`` set — a bench inside a driver
    budget degrades to a shorter stream instead of losing the section."""
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.incremental import StreamingSession

    cfg = cfg or ModelConfig(max_length=2048)
    image_size = cfg.vision.image_size
    if params is None:
        from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
        from videollamb_tpu.models.lm.llama import init_llama_params
        from videollamb_tpu.models.lm.quant import quantize_llama_params
        from videollamb_tpu.models.vision.clip_vit import init_vision_params

        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        lm = init_llama_params(k3, cfg.lm, dtype=jnp.bfloat16)
        jax.block_until_ready(lm)
        params = {
            "video_tower": init_vision_params(k1, cfg.vision,
                                              dtype=jnp.bfloat16),
            "mm_projector": init_rmt_r_params(k2, cfg.bridge,
                                              cfg.lm.hidden_size,
                                              dtype=jnp.bfloat16),
            "lm": quantize_llama_params(lm),
        }
        jax.block_until_ready(params["lm"])

    tok = WordTok()
    tok("A chat between a curious human and an artificial intelligence "
        "assistant What is happening now and describe the scene")
    processors = {"VIDEO": VideoProcessor(size=cfg.vision.image_size),
                  "IMAGE": ImageProcessor(size=cfg.vision.image_size)}
    chat = Chat(tok, params, cfg, processors)
    sess = StreamingSession(chat, frame_fps=fps, max_seq_len=cfg.max_length,
                            max_new_tokens=max_new_tokens)

    n_frames = int(minutes * 60 * fps)
    frames = synth_stream(n_frames, seed=seed, size=image_size)
    sess.video_tensor = frames
    sess.num_video_frames = n_frames
    sess.video_duration = n_frames / fps

    # Queries arrive on a fixed schedule (exercises the query + response
    # path like the reference's input_query_stream).
    q_times = np.arange(query_every_s, minutes * 60, query_every_s)
    for qt in q_times:
        sess.input_query_stream("What is happening now", video_time=float(qt))

    # Warmup: compile every graph class (encode, fold, extend, decode) on
    # the first ~3 scenes, then reset counters but keep the compile caches.
    total_ticks = len(range(0, n_frames, stride))
    warm_ticks = max(1, min(96 // stride, total_ticks // 4))
    tick_times = []
    responses = 0
    shapes = set()
    max_resident = 0
    t0 = time.perf_counter()
    warm_wall = None
    warm_detector = None
    frames_done = 0
    truncated = False
    for i in range(0, n_frames, stride):
        tt0 = time.perf_counter()
        sess.input_video_stream(float(min(i + stride - 1, n_frames - 1)))
        q, r = sess()
        if r is not None:
            responses += 1
        tick_times.append(time.perf_counter() - tt0)
        shapes.add((sess.kv.k.shape, sess.bridge_state.cache.shape))
        max_resident = max(max_resident, sess.hbm_resident_frames)
        frames_done = min(i + stride, n_frames)
        if i // stride + 1 == warm_ticks:
            warm_wall = time.perf_counter() - t0
            warm_detector = (sess._detector.compile_cache_sizes
                             if sess._detector is not None else (0, 0))
            tick_times = []  # timed window starts after warmup
        elif (deadline_s is not None
                and time.perf_counter() - t0 > deadline_s):
            truncated = True
            break
    wall = time.perf_counter() - t0
    timed_wall = wall - (warm_wall if warm_wall is not None else wall)
    timed_frames = max(0, frames_done - warm_ticks * stride)
    n_frames = frames_done

    timed_wall = max(timed_wall, 1e-9)
    ticks_ms = np.asarray(tick_times or [0.0]) * 1000
    end_detector = (sess._detector.compile_cache_sizes
                    if sess._detector is not None else (0, 0))
    out = {
        "stream_hour_minutes": round(n_frames / fps / 60, 1),
        "stream_hour_frames": n_frames,
        "stream_hour_wall_s": round(wall, 1),
        "stream_hour_fps": round(timed_frames / timed_wall, 1),
        "stream_hour_realtime_x": round(timed_frames / timed_wall / fps, 1),
        "stream_hour_tick_p50_ms": round(float(np.percentile(ticks_ms, 50)), 1),
        "stream_hour_tick_p99_ms": round(float(np.percentile(ticks_ms, 99)), 1),
        "stream_hour_segments": int(sess.bridge_state.count),
        "stream_hour_responses": responses,
        "stream_hour_queries": len(q_times),
        # Bounded-state evidence.
        "stream_hour_state_shapes": len(shapes),
        "stream_hour_max_open_frames": max_resident,
        "stream_hour_open_cap": sess.max_open_frames,
        "stream_hour_ctx_len": int(sess.context_length),
        "stream_hour_ctx_cap": sess.max_seq_len,
        "stream_hour_compactions": sess._compactions,
        "stream_hour_recompiles_after_warmup": (
            (end_detector[0] - warm_detector[0])
            + (end_detector[1] - warm_detector[1])
            if warm_detector is not None else None),
        "stream_hour_prefetch_hit_rate": round(
            sess.prefetch_hits / max(1, sess.prefetch_hits
                                     + sess.prefetch_misses), 3),
    }
    if truncated:
        out["stream_hour_truncated_for_budget"] = True
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--minutes", type=float, default=60.0)
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--stride", type=int, default=4,
                   help="frames ingested per host tick (camera buffer)")
    p.add_argument("--max-new", type=int, default=16)
    args = p.parse_args(argv)
    out = run(minutes=args.minutes, fps=args.fps, stride=args.stride,
              max_new_tokens=args.max_new)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
