"""Preprocessing tests: v1/plain masking semantics, dataset + collator,
modality-grouped sampler."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu import conversation as conversation_lib
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.train.preprocess import (
    preprocess,
    preprocess_multimodal,
    set_default_conversation,
)


class WordTokenizer:
    """Deterministic word-level tokenizer: stable id per token string,
    leading BOS, '</s>' as its own token, legacy counting (the reference's
    round-length arithmetic is self-consistent in legacy mode for any
    tokenizer; the non-legacy -1 correction encodes a SentencePiece
    quirk)."""

    bos_token_id = 1
    pad_token_id = 0
    legacy = True
    model_max_length = 2048

    def __init__(self):
        self.vocab = {"<bos>": 1, "</s>": 2}

    def _id(self, w):
        if w not in self.vocab:
            self.vocab[w] = len(self.vocab) + 10
        return self.vocab[w]

    def __call__(self, text):
        class R:
            pass

        words = text.replace("</s>", " </s> ").split()
        r = R()
        r.input_ids = [self.bos_token_id] + [self._id(w) for w in words]
        return r


@pytest.fixture(autouse=True)
def v1_default():
    set_default_conversation("v1")
    yield
    set_default_conversation("v1")


def _source(q="<video> what is happening", a="a dog runs"):
    return [[{"from": "human", "value": q}, {"from": "gpt", "value": a}]]


def test_preprocess_multimodal_hoists_token():
    src = _source(q="what is happening <video>")
    out = preprocess_multimodal(src)
    assert out[0][0]["value"].startswith("<video>\n")


def test_preprocess_v1_masks_instruction_only():
    tok = WordTokenizer()
    src = preprocess_multimodal(_source())
    data = preprocess(src, tok, x="VIDEO")
    ids, labels = data["input_ids"][0], data["labels"][0]
    assert ids[0] == tok.bos_token_id
    assert VIDEO_TOKEN_INDEX in ids.tolist()
    # Supervised span: the tail of "ASSISTANT: " (the reference's -2 leaves
    # the separator tail supervised), the answer, and </s>.
    answer_ids = [tok._id(w) for w in "a dog runs".split()]
    sup = labels[labels != IGNORE_INDEX].tolist()
    assert sup == [tok._id("ASSISTANT:")] + answer_ids + [tok._id("</s>")]
    # Everything before (system, USER:, sentinel, question) is masked.
    first_answer_pos = ids.tolist().index(answer_ids[0])
    assert (labels[: first_answer_pos - 1] == IGNORE_INDEX).all()


def test_preprocess_v1_multiturn():
    tok = WordTokenizer()
    src = [[
        {"from": "human", "value": "<video> describe"},
        {"from": "gpt", "value": "cats playing"},
        {"from": "human", "value": "how many"},
        {"from": "gpt", "value": "two cats"},
    ]]
    src = preprocess_multimodal(src)
    data = preprocess(src, tok, x="VIDEO")
    labels = data["labels"][0]
    ids = data["input_ids"][0]
    sup_ids = ids[labels != IGNORE_INDEX].tolist()
    for w in ["cats", "playing", "two"]:
        assert tok._id(w) in sup_ids
    assert tok._id("describe") not in sup_ids
    assert tok._id("many") not in sup_ids


def test_preprocess_plain():
    set_default_conversation("plain")
    tok = WordTokenizer()
    src = _source(q="<video>", a="caption words here")
    data = preprocess(src, tok, x="VIDEO")
    labels = data["labels"][0]
    n_prefix = 2  # bos + sentinel
    assert (labels[:n_prefix] == IGNORE_INDEX).all()
    assert (labels[n_prefix:] != IGNORE_INDEX).all()


def test_dataset_and_collator(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from videollamb_tpu.train.dataset import Collator, DataConfig, SupervisedDataset

    vid_dir = tmp_path / "vids"
    vid_dir.mkdir()
    path = str(vid_dir / "a.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for i in range(30):
        writer.write(np.full((48, 64, 3), i * 8, np.uint8))
    writer.release()

    records = [
        {"video": "a.mp4", "conversations": [
            {"from": "human", "value": "<video> what"},
            {"from": "gpt", "value": "a gradient"},
        ]},
        {"conversations": [
            {"from": "human", "value": "hello"},
            {"from": "gpt", "value": "hi there"},
        ]},
    ]
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))

    ds = SupervisedDataset(
        str(data_path), WordTokenizer(),
        DataConfig(video_folder=str(vid_dir), num_frames=8),
    )
    assert len(ds) == 2
    assert ds.modality(0) == "video" and ds.modality(1) == "language"
    s0 = ds[0]
    assert s0["video"].shape == (8, 3, 224, 224)
    lengths = ds.modality_lengths()
    assert lengths[0] > 0 and lengths[1] < 0

    batch = Collator(bucket=16)([s0, ds[1]])
    assert batch.input_ids.shape[1] % 16 == 0
    assert batch.videos.shape[0] == 2


def test_modality_grouped_indices_covers_everything():
    from videollamb_tpu.train.dataset import modality_grouped_indices

    lengths = [10, -5, 8, -3, 12, 7, -9, 11]
    order = modality_grouped_indices(lengths, batch_size=2, world_size=1, seed=0)
    assert sorted(order) == list(range(8))
