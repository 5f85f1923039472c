"""Supervised dataset, collator and modality-grouped sampler.

Counterparts of the reference LazySupervisedDataset /
DataCollatorForSupervisedDataset (llava/train/train.py:680-872) and the
modality-grouped length sampler (llava/train/llava_trainer.py:59-146):

- JSON list of conversations; per-sample modality from 'image'/'video' keys;
- decode errors retry with a random same-modality sample (train.py:823-825);
- the collator pads to static shape buckets (multiples of ``bucket``) so XLA
  compiles a handful of shapes — the TPU replacement for dynamic padding;
- the sampler builds per-modality megabatches, shuffles by length within
  each, and drops stragglers, like the reference.
"""

from __future__ import annotations

import copy
import json
import os
import random
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from videollamb_tpu.constants import IGNORE_INDEX
from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
from videollamb_tpu.data.video_reader import load_video
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.train.preprocess import preprocess, preprocess_multimodal


@dataclass
class DataConfig:
    data_path: str = ""
    image_folder: str = ""
    video_folder: str = ""
    audio_folder: str = ""
    num_frames: int = 8
    is_multimodal: bool = True
    mm_use_x_start_end: bool = False
    model_max_length: int = 2048
    image_aspect_ratio: str = "pad"
    # Anyres pinpoint resolutions ((w, h), ...) when image_aspect_ratio is
    # 'anyres' (reference train.py DataArguments.image_grid_pinpoints).
    image_grid_pinpoints: Optional[Sequence[Sequence[int]]] = None


class SupervisedDataset:
    """Lazy JSON conversation dataset (reference train.py:680-825)."""

    def __init__(self, data_path: str, tokenizer, cfg: DataConfig,
                 video_processor: Optional[VideoProcessor] = None,
                 image_processor: Optional[ImageProcessor] = None,
                 audio_processor=None,
                 seed: int = 0):
        with open(data_path) as f:
            self.records: List[Dict[str, Any]] = json.load(f)
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.video_processor = video_processor or VideoProcessor()
        self.image_processor = image_processor or ImageProcessor()
        self.audio_processor = audio_processor
        self.rng = random.Random(seed)

    def __len__(self) -> int:
        return len(self.records)

    def modality(self, i: int) -> str:
        rec = self.records[i]
        if "video" in rec:
            return "video"
        if "image" in rec:
            return "image"
        if "audio" in rec:
            return "audio"
        return "language"

    def modality_lengths(self) -> List[int]:
        """Signed conversation lengths: positive for multimodal samples,
        negative for pure language (reference train.py:720-733)."""
        lengths = []
        for rec in self.records:
            cur = sum(len(c["value"].split()) for c in rec["conversations"])
            mm = "image" in rec or "video" in rec or "audio" in rec
            lengths.append(cur if mm else -cur)
        return lengths

    def _load_one(self, i: int) -> Dict[str, Any]:
        rec = self.records[i]
        sources = copy.deepcopy([rec["conversations"]])
        out: Dict[str, Any] = {}
        if "video" in rec:
            path = os.path.join(self.cfg.video_folder, rec["video"])
            frames = load_video(path, num_frames=self.cfg.num_frames)
            out["video"] = self.video_processor(frames)  # (T, C, H, W)
            sources = preprocess_multimodal(
                sources, is_multimodal=self.cfg.is_multimodal,
                mm_use_x_start_end=self.cfg.mm_use_x_start_end,
            )
            x = "VIDEO"
        elif "image" in rec:
            from PIL import Image

            path = os.path.join(self.cfg.image_folder, rec["image"])
            img = Image.open(path).convert("RGB")
            if self.cfg.image_aspect_ratio == "anyres":
                from videollamb_tpu.mm_utils import process_anyres_image

                out["image"] = process_anyres_image(
                    img, self.image_processor, list(self.cfg.image_grid_pinpoints)
                )  # (P, C, H, W)
                out["image_size"] = img.size  # (w, h) for the unpad merge
            else:
                if self.cfg.image_aspect_ratio == "pad":
                    from videollamb_tpu.mm_utils import expand2square

                    bg = tuple(int(x * 255) for x in self.image_processor.image_mean)
                    img = expand2square(img, bg)
                out["image"] = self.image_processor(img)  # (C, H, W)
            sources = preprocess_multimodal(
                sources, is_multimodal=self.cfg.is_multimodal,
                mm_use_x_start_end=self.cfg.mm_use_x_start_end,
            )
            x = "IMAGE"
        elif "audio" in rec:
            # AUDIO extension (beyond the reference, whose audio encoder is
            # never wired to training): WAV -> log-mel fbank "image" that
            # feeds the model's tower stream under an audio TowerSpec.
            from videollamb_tpu.data.audio_reader import load_audio

            if self.audio_processor is None:
                from videollamb_tpu.models.vision.modalities import AudioProcessor

                self.audio_processor = AudioProcessor()
            path = os.path.join(self.cfg.audio_folder, rec["audio"])
            waveform, sr = load_audio(path)
            out["image"] = self.audio_processor(waveform, origin_sr=sr)
            sources = preprocess_multimodal(
                sources, is_multimodal=self.cfg.is_multimodal,
                mm_use_x_start_end=self.cfg.mm_use_x_start_end,
            )
            x = "AUDIO"
        else:
            x = None
        data = preprocess(sources, self.tokenizer, x=x,
                          model_max_length=self.cfg.model_max_length)
        out["input_ids"] = data["input_ids"][0][: self.cfg.model_max_length]
        out["labels"] = data["labels"][0][: self.cfg.model_max_length]
        return out

    def __getitem__(self, i: int) -> Dict[str, Any]:
        try:
            return self._load_one(i)
        except Exception as e:  # corrupt sample -> random same-modality retry
            print(f"dataset error at {i}: {e}; resampling same modality")
            modality = self.modality(i)
            candidates = [j for j in range(len(self)) if self.modality(j) == modality and j != i]
            if not candidates:
                raise
            return self[self.rng.choice(candidates)]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Collator:
    """Pad a list of samples into one MultimodalBatch with bucketed static
    shapes (reference DataCollatorForSupervisedDataset, train.py:827-872)."""

    pad_token_id: int = 0
    bucket: int = 128
    max_length: int = 2048
    # Anyres spec computation (only needed when samples carry 4-D patch
    # stacks + 'image_size'): pinpoints + tower geometry.
    image_grid_pinpoints: Optional[Sequence[Sequence[int]]] = None
    vision_image_size: int = 336
    patches_per_side: int = 24

    def __call__(self, samples: Sequence[Dict[str, Any]]) -> MultimodalBatch:
        b = len(samples)
        max_len = max(len(s["input_ids"]) for s in samples)
        t = min(_round_up(max_len, self.bucket), self.max_length)

        ids = np.full((b, t), self.pad_token_id, np.int32)
        labels = np.full((b, t), IGNORE_INDEX, np.int32)
        mask = np.zeros((b, t), np.int32)
        for i, s in enumerate(samples):
            n = min(len(s["input_ids"]), t)
            ids[i, :n] = s["input_ids"][:n]
            labels[i, :n] = s["labels"][:n]
            mask[i, :n] = 1

        videos = images = None
        if any("video" in s for s in samples):
            tv = max(s["video"].shape[0] for s in samples if "video" in s)
            shape = next(s["video"].shape for s in samples if "video" in s)
            videos = np.zeros((b, tv) + shape[1:], np.float32)
            for i, s in enumerate(samples):
                if "video" in s:
                    videos[i, : s["video"].shape[0]] = s["video"]
        elif any("image" in s for s in samples):
            shape = next(s["image"].shape for s in samples if "image" in s)
            if len(shape) == 4:  # anyres (P, C, H, W) stacks
                p_max = max(s["image"].shape[0] for s in samples if "image" in s)
                images = np.zeros((b, p_max) + shape[1:], np.float32)
                specs = np.zeros((b, 4), np.int32)
                from videollamb_tpu.models.anyres import anyres_spec

                for i, s in enumerate(samples):
                    if "image" in s:
                        images[i, : s["image"].shape[0]] = s["image"]
                        specs[i] = anyres_spec(
                            s["image_size"], self.image_grid_pinpoints,
                            self.vision_image_size, self.patches_per_side,
                        )
                return MultimodalBatch(
                    input_ids=ids, attention_mask=mask, labels=labels,
                    videos=None, images=images, image_specs=specs,
                )
            images = np.zeros((b,) + shape, np.float32)
            for i, s in enumerate(samples):
                if "image" in s:
                    images[i] = s["image"]

        return MultimodalBatch(
            input_ids=ids, attention_mask=mask, labels=labels,
            videos=videos, images=images,
        )


@dataclass
class PackedCollator:
    """Pack several conversations into each row (packed-sequence training).

    The reference pads every row to the batch max (train.py:827-872), so
    short conversations burn most of their FLOPs on padding. Packing is the
    TPU-native answer: rows keep one static shape while several samples
    share it, separated by segment ids — attention is block-causal per
    segment (ops/attention.multihead_attention segment_ids) and RoPE
    positions restart per segment (models/splice.splice_multimodal_packed),
    so training math is exactly what each sample would see in its own row.

    Budgeting is POST-splice: each media sentinel expands to
    ``block_tokens`` spliced tokens for video samples and
    ``block_tokens_image`` for image/audio samples (measure each with
    models.assembly.measure_block_tokens — audio fbanks travel as
    'image'). First-fit-decreasing packing under (max_length, k_max
    blocks); the packed row count pads up to a multiple of
    ``rows_bucket`` so XLA sees a stable batch shape.

    **Pinned-shape mode** (``fixed_rows`` set): every batch is exactly
    ``fixed_rows`` rows x ``max_length`` tokens x ``k_max`` block slots
    (and ``fixed_frames`` frames when given), so the compiled train step
    sees ONE shape and multi-host data parallelism stays SPMD-consistent
    (each process emits the same row count regardless of how its slice
    packed). Rows beyond ``fixed_rows`` are not dropped: their samples
    carry over into the next call (``self._carry``); trailing carry at
    epoch end is the same few-samples loss as the reference sampler's
    drop-last.

    A sample longer than the whole budget gets its own row and truncates in
    the splice — the reference's truncation semantics
    (llava_arch.py:610-613). Batches must be modality-homogeneous, which
    the modality-grouped sampler already guarantees; anyres image stacks
    cannot be packed (their splice geometry is per-row) and raise."""

    pad_token_id: int = 0
    bucket: int = 128
    max_length: int = 2048
    block_tokens: int = 0
    block_tokens_image: Optional[int] = None
    k_max: int = 4
    rows_bucket: int = 8
    fixed_rows: Optional[int] = None
    fixed_frames: Optional[int] = None
    _carry: List[Dict[str, Any]] = field(default_factory=list)

    def _cost(self, s: Dict[str, Any]) -> Tuple[int, int]:
        ids = np.asarray(s["input_ids"])
        nb = int((ids < 0).sum())
        media = int("video" in s or "image" in s)
        if nb != media:
            # The k-th sentinel of a row binds media block k: a sample with
            # more sentinels than media (or media without a sentinel) would
            # silently bind the NEXT sample's media to its extra sentinel.
            raise ValueError(
                f"sample has {nb} media sentinel(s) but {media} media "
                "array(s); packing binds sentinels to blocks positionally"
            )
        if "video" in s:
            block = self.block_tokens
        else:
            block = (self.block_tokens_image
                     if self.block_tokens_image is not None
                     else self.block_tokens)
        return len(ids) - nb + nb * max(block, 1), nb

    def pack(self, samples: Sequence[Dict[str, Any]]) -> List[List[int]]:
        """First-fit decreasing -> list of rows, each a list of sample
        indices (ascending, so segment order == dataset order)."""
        meta = [self._cost(s) for s in samples]
        order = sorted(range(len(samples)), key=lambda i: -meta[i][0])
        bins: List[Dict[str, Any]] = []
        for i in order:
            c, nb = meta[i]
            for b in bins:
                if (b["cost"] + c <= self.max_length
                        and b["nb"] + nb <= self.k_max):
                    b["items"].append(i)
                    b["cost"] += c
                    b["nb"] += nb
                    break
            else:
                bins.append({"items": [i], "cost": c, "nb": nb})
        return [sorted(b["items"]) for b in bins]

    def __call__(self, samples: Sequence[Dict[str, Any]]) -> MultimodalBatch:
        if any("image" in s and np.asarray(s["image"]).ndim == 4
               for s in samples):
            raise ValueError("anyres image stacks cannot be packed")
        if self.fixed_rows is not None and self._carry:
            # Carry joins only a modality-compatible batch (the grouped
            # sampler alternates video/image megabatches); otherwise it
            # keeps waiting.
            cv = any("video" in s for s in self._carry)
            ci = any("image" in s for s in self._carry)
            nv = any("video" in s for s in samples)
            ni = any("image" in s for s in samples)
            if not ((cv and ni) or (ci and nv)):
                carried, self._carry = self._carry, []
                samples = carried + list(samples)
        has_video = any("video" in s for s in samples)
        has_image = any("image" in s for s in samples)
        if has_video and has_image:
            raise ValueError("packed batches must be modality-homogeneous")

        rows = self.pack(samples)
        if self.fixed_rows is not None:
            if len(rows) > self.fixed_rows:
                # Poorly-packing samples defer to the next batch instead of
                # growing this one past the compiled step shape.
                self._carry = [samples[i] for row in rows[self.fixed_rows:]
                               for i in row]
                rows = rows[: self.fixed_rows]
            b = self.fixed_rows
            t = self.max_length
        else:
            b = _round_up(len(rows), self.rows_bucket)
            t_raw = max(sum(len(samples[i]["input_ids"]) for i in row)
                        for row in rows)
            t = min(_round_up(t_raw, self.bucket), self.max_length)

        ids = np.full((b, t), self.pad_token_id, np.int32)
        labels = np.full((b, t), IGNORE_INDEX, np.int32)
        mask = np.zeros((b, t), np.int32)
        seg = np.zeros((b, t), np.int32)

        if self.fixed_rows is not None:
            k_max = self.k_max
        else:
            k_max = max((sum(1 for i in row if "video" in samples[i]
                             or "image" in samples[i]) for row in rows),
                        default=0)
        videos = images = block_mask = None
        if has_video:
            tv = max(s["video"].shape[0] for s in samples if "video" in s)
            if self.fixed_frames is not None:
                tv = max(tv, self.fixed_frames)
            shape = next(s["video"].shape for s in samples if "video" in s)
            videos = np.zeros((b, max(k_max, 1), tv) + shape[1:], np.float32)
            block_mask = np.zeros((b, max(k_max, 1)), bool)
        elif has_image:
            shape = next(s["image"].shape for s in samples if "image" in s)
            images = np.zeros((b, max(k_max, 1)) + shape, np.float32)
            block_mask = np.zeros((b, max(k_max, 1)), bool)

        for r, row in enumerate(rows):
            cur = 0
            blk = 0
            for si, i in enumerate(row):
                s = samples[i]
                n = min(len(s["input_ids"]), t - cur)
                if n <= 0:
                    break
                ids[r, cur:cur + n] = np.asarray(s["input_ids"])[:n]
                labels[r, cur:cur + n] = np.asarray(s["labels"])[:n]
                # The segment's first label must be IGNORE: the shifted LM
                # loss would otherwise train the PREVIOUS segment's last
                # token to predict it (conversation prompts are already
                # masked, but enforce the invariant regardless).
                labels[r, cur] = IGNORE_INDEX
                mask[r, cur:cur + n] = 1
                seg[r, cur:cur + n] = si + 1
                cur += n
                if videos is not None and "video" in s:
                    videos[r, blk, : s["video"].shape[0]] = s["video"]
                    block_mask[r, blk] = True
                    blk += 1
                elif images is not None and "image" in s:
                    images[r, blk] = s["image"]
                    block_mask[r, blk] = True
                    blk += 1

        return MultimodalBatch(
            input_ids=ids, attention_mask=mask, labels=labels,
            videos=videos, images=images, segment_ids=seg,
            video_block_mask=block_mask if videos is not None else None,
            image_block_mask=block_mask if images is not None else None,
        )


def modality_grouped_indices(
    lengths: Sequence[int], batch_size: int, world_size: int,
    seed: int = 0,
) -> List[int]:
    """Modality-grouped, length-shuffled megabatch order (reference
    llava_trainer.py:59-100 get_modality_length_grouped_indices)."""
    rng = np.random.default_rng(seed)
    mm = [(i, l) for i, l in enumerate(lengths) if l > 0]
    lang = [(i, -l) for i, l in enumerate(lengths) if l <= 0]

    def shuffle_chunks(items):
        idx = [i for i, _ in items]
        perm = rng.permutation(len(idx))
        shuffled = [idx[p] for p in perm]
        mega = world_size * batch_size
        return [shuffled[k: k + mega] for k in range(0, len(shuffled), mega)]

    mm_mega = shuffle_chunks(mm) if mm else []
    lang_mega = shuffle_chunks(lang) if lang else []
    # Drop last partial megabatches, then interleave shuffled.
    full = [m for m in mm_mega[:-1]] if len(mm_mega) > 1 else []
    full += [m for m in lang_mega[:-1]] if len(lang_mega) > 1 else []
    if mm_mega:
        full.append(mm_mega[-1])
    if lang_mega:
        full.append(lang_mega[-1])
    order = rng.permutation(len(full))
    out: List[int] = []
    for oi in order:
        out.extend(full[oi])
    return out
