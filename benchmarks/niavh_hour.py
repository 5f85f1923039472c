"""Hour-scale NIAVH through the streaming engine (BASELINE config #5).

Drives ``eval/niavh.py``'s protocol — needle inserted at depth d of an
L-frame haystack, question asked at the end — through the bounded-state
``serve.incremental.StreamingSession`` at PRODUCTION shapes (ViT-L tower,
Memory Bridge, int8 7B LM), over haystacks up to >= 60 minutes at 1 fps,
with a REAL byte-level-BPE tokenizer (HF PreTrainedTokenizerFast, 32k
vocab) so the text path pays production encode/decode cost.

Reference protocol being matched: the streaming loop
/root/reference/llava/serve/inference.py:121-180 plus the MM-NIAVH
companion the reference README points at (README.md:137-149).

Two scores per (length, depth) cell:

- ``answer``: the end-of-stream question is asked through the real query
  + decode path and scored by substring match (eval/niavh.py:score_pred).
  With the random-init weights this environment is limited to, this is a
  PROTOCOL exercise (accuracy ~0 is expected); pass real weights via
  ``params=`` / a checkpoint to make it accuracy-bearing.
- ``memory margin``: the honest weight-free retention signal. The
  needle's one-segment memory signature (one ``rmt_r_stream_step`` from a
  fresh state) is compared by cosine against the stream's FINAL recurrent
  memory, minus the same similarity for a needle-free control stream of
  the same length. margin > 0 means the needle measurably survives in
  the bridge's recurrent state after the full stream — the "max
  recurrence depth" the memory architecture exists for. The grid shows
  how retention decays with depth-from-end and stream length.

Throughput (sustained f/s, tick p99, realtime factor) is measured across
every streamed frame — the hour-scale serving number.

Usage:
  python benchmarks/niavh_hour.py                     # full grid (~40 min)
  python benchmarks/niavh_hour.py --lengths 900 --depths 0.0,1.0  # trimmed
Prints one JSON line; importable as ``run(...)`` for bench.py extras.
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

from benchmarks.stream_hour import synth_stream

QUESTION = "what was the secret pattern shown in the video"
NEEDLE_CAPTION = "the secret pattern was zigzag stripes"


def build_real_tokenizer(vocab_size: int = 32000):
    """Production-class tokenizer with zero egress: a byte-level BPE
    trained on a synthetic English corpus, wrapped exactly as HF ships
    fast tokenizers. Encode/decode cost is the real thing (Rust BPE over
    byte-level pretokenization); only the learned merges differ from a
    shipped checkpoint's."""
    import tempfile

    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    rng = np.random.default_rng(7)
    words = ("the a an and of to in is was were stream video frame scene "
             "camera secret pattern zigzag stripes shown what happening now "
             "describe assistant human curious artificial intelligence time "
             "watch answer question segment memory long hour minute second "
             "red blue green square circle moving static light dark noise "
             "room person object action event moment change boundary fold").split()
    corpus = [" ".join(rng.choice(words, size=24)) + "." for _ in range(3000)]
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=vocab_size, special_tokens=["<pad>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer=trainer)
    path = os.path.join(tempfile.mkdtemp(prefix="niavh_tok"), "tokenizer.json")
    tok.save(path)
    return PreTrainedTokenizerFast(
        tokenizer_file=path, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>")


def make_needle(frames: int, size: int) -> np.ndarray:
    """A visually distinctive needle clip (processed layout (T,3,H,W)):
    high-amplitude diagonal zigzag stripes, nothing like the haystack's
    low-contrast noise scenes — the tower maps it far from the haystack
    manifold, which is what lets retention be read out of the memory."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    out = np.empty((frames, 3, size, size), np.float16)
    for t in range(frames):
        phase = 8 * np.pi * (yy + xx) / size + t * 1.3
        stripe = np.sign(np.sin(phase)).astype(np.float16) * 3.0
        out[t] = np.stack([stripe, -stripe, np.roll(stripe, t, axis=0)])
    return out


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    den = (np.linalg.norm(a) * np.linalg.norm(b)) or 1.0
    return float(a @ b / den)


def _needle_signature(params, cfg, needle: np.ndarray, dtype) -> np.ndarray:
    """The needle's one-segment memory contribution: encode its frames,
    run ONE bridge stream step from a fresh state, read the memory."""
    from videollamb_tpu.models.bridge.rmt_r import (
        init_stream_state,
        rmt_r_stream_step,
    )
    from videollamb_tpu.models.vision.clip_vit import vision_encode

    feats = vision_encode(params["video_tower"],
                          jnp.asarray(needle[:, None], dtype), cfg.vision)
    feats = jnp.asarray(np.asarray(feats[:, 0].astype(jnp.float32)))
    f_max = cfg.bridge.max_frames_per_segment
    feats = feats[:f_max]
    mask = np.zeros((f_max,), bool)
    mask[: feats.shape[0]] = True
    if feats.shape[0] < f_max:
        pad = jnp.zeros((f_max - feats.shape[0],) + feats.shape[1:], feats.dtype)
        feats = jnp.concatenate([feats, pad])
    state = init_stream_state(cfg.bridge, dtype=dtype)
    _, _, state = rmt_r_stream_step(
        params["mm_projector"], cfg.bridge, feats.astype(dtype),
        jnp.asarray(mask), state)
    return np.asarray(state.memory.astype(jnp.float32))


def _stream_cell(chat, cfg, frames: np.ndarray, stride: int,
                 max_new_tokens: int, ask: bool) -> dict:
    """Stream ``frames`` through a fresh StreamingSession; optionally ask
    the needle question timestamped just before the last frame (served on
    the final tick, after every frame has folded — eval/niavh.py's
    streaming route). Returns throughput stats + final bridge memory +
    the decoded answer."""
    from videollamb_tpu.serve.incremental import StreamingSession

    chat.reset()
    sess = StreamingSession(chat, frame_fps=1.0, max_seq_len=cfg.max_length,
                            max_new_tokens=max_new_tokens)
    n = len(frames)
    sess.video_tensor = frames
    sess.num_video_frames = n
    sess.video_duration = float(n)
    if ask:
        sess.input_query_stream(QUESTION, video_time=float(n - 1) - 0.5)
    answer = ""
    ticks = []
    t0 = time.perf_counter()
    for i in range(0, n, stride):
        tt0 = time.perf_counter()
        sess.input_video_stream(float(min(i + stride - 1, n - 1)))
        q, r = sess()
        ticks.append(time.perf_counter() - tt0)
        if r is not None and "User:" in (q or ""):
            answer = r.split("Assistant:", 1)[-1]
    wall = time.perf_counter() - t0
    ticks_ms = np.asarray(ticks) * 1000
    return {
        "frames": n,
        "wall_s": wall,
        "fps": n / wall,
        "tick_p99_ms": float(np.percentile(ticks_ms, 99)),
        "memory": np.asarray(sess.bridge_state.memory.astype(jnp.float32)),
        "segments": int(sess.bridge_state.count),
        "answer": answer,
        "ctx_len": int(sess.context_length),
        "compactions": sess._compactions,
    }


def run(lengths=(900, 1800, 3600), depths=(0.0, 0.25, 0.5, 0.75, 1.0),
        stride: int = 4, max_new_tokens: int = 16, params=None, cfg=None,
        needle_frames: int = 8, seed: int = 0, key_prefix: str = "niavh",
        tokenizer=None, deadline_s: float | None = None) -> dict:
    """``deadline_s`` bounds the grid's WALL time: cells still pending when
    it trips are skipped (recorded in ``<prefix>_skipped_cells``) and the
    aggregates cover the cells that ran — a bench inside a driver budget
    reports a smaller grid instead of losing the section."""
    t_start = time.perf_counter()
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.eval.niavh import score_pred
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.serve.chat import Chat

    cfg = cfg or ModelConfig(max_length=2048)
    size = cfg.vision.image_size
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

    tok = tokenizer or build_real_tokenizer()
    processors = {"VIDEO": VideoProcessor(size=size),
                  "IMAGE": ImageProcessor(size=size)}
    chat = Chat(tok, params, cfg, processors)
    dtype = chat._dtype()

    needle = make_needle(needle_frames, size)
    signature = _needle_signature(params, cfg, needle, dtype)

    lengths = sorted(int(x) for x in lengths)
    depths = sorted(float(x) for x in depths)
    haystack = synth_stream(max(lengths), seed=seed, size=size)

    grid, cells, skipped = {}, [], []
    total_frames, total_wall, p99s = 0, 0.0, []

    def over_deadline():
        return (deadline_s is not None
                and time.perf_counter() - t_start > deadline_s)

    for length in lengths:
        if over_deadline():
            skipped.extend(f"{length}x{d}" for d in depths)
            continue
        body = haystack[:length - needle_frames]
        control = _stream_cell(chat, cfg, haystack[:length], stride,
                               max_new_tokens, ask=False)
        sim_control = _cos(signature, control["memory"])
        total_frames += control["frames"]
        total_wall += control["wall_s"]
        row = {}
        for depth in depths:
            if over_deadline():
                skipped.append(f"{length}x{depth}")
                continue
            start = int(round(depth * len(body)))
            frames = np.concatenate(
                [body[:start], needle, body[start:]]).astype(np.float16)
            cell = _stream_cell(chat, cfg, frames, stride, max_new_tokens,
                                ask=True)
            sim = _cos(signature, cell["memory"])
            margin = sim - sim_control
            correct = score_pred(cell["answer"], "zigzag stripes")
            row[str(depth)] = {
                "memory_margin": round(margin, 4),
                "retained": bool(margin > 0),
                "answer_correct": bool(correct),
            }
            total_frames += cell["frames"]
            total_wall += cell["wall_s"]
            p99s.append(cell["tick_p99_ms"])
            cells.append({"length": length, "depth": depth, "sim": sim,
                          "sim_control": sim_control,
                          "segments": cell["segments"],
                          "ctx_len": cell["ctx_len"],
                          "compactions": cell["compactions"],
                          "fps": round(cell["fps"], 1)})
        grid[str(length)] = row

    n_cells = sum(len(r) for r in grid.values())
    retained = sum(c["retained"] for r in grid.values() for c in r.values())
    k = key_prefix
    return {
        f"{k}_grid": grid,
        f"{k}_retained_frac": round(retained / max(1, n_cells), 3),
        f"{k}_answer_acc": round(
            sum(c["answer_correct"] for r in grid.values()
                for c in r.values()) / max(1, n_cells), 3),
        f"{k}_stream_fps": round(total_frames / max(total_wall, 1e-9), 1),
        f"{k}_realtime_x": round(total_frames / max(total_wall, 1e-9), 1),
        f"{k}_tick_p99_ms": round(float(np.median(p99s)), 1) if p99s else 0.0,
        f"{k}_max_minutes": round(max(lengths) / 60, 1),
        **({f"{k}_skipped_cells": skipped} if skipped else {}),
        f"{k}_total_stream_minutes": round(total_frames / 60, 1),
        f"{k}_cells": cells,
        f"{k}_note": ("answer_correct needs trained weights (zero-egress "
                      "env: random init => protocol-only); memory_margin "
                      "is weight-free retention of the needle in the "
                      "bridge's recurrent state vs a needle-free control"),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--lengths", default="900,1800,3600",
                   help="comma list of haystack lengths (frames at 1 fps)")
    p.add_argument("--depths", default="0.0,0.25,0.5,0.75,1.0")
    p.add_argument("--stride", type=int, default=4)
    p.add_argument("--max-new", type=int, default=16)
    p.add_argument("--needle-frames", type=int, default=8)
    args = p.parse_args(argv)
    out = run(lengths=[int(x) for x in args.lengths.split(",") if x],
              depths=[float(x) for x in args.depths.split(",") if x],
              stride=args.stride, max_new_tokens=args.max_new,
              needle_frames=args.needle_frames)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
