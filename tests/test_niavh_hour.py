"""Hour-scale NIAVH benchmark harness (benchmarks/niavh_hour.py): the
protocol machinery on the tiny model — needle splice, streaming route,
memory-retention probe, real-tokenizer construction. The production-shape
hour run itself happens on the TPU (bench extras / docs)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401


@pytest.fixture(scope="module")
def harness():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from benchmarks import niavh_hour

    return niavh_hour


def test_make_needle_distinctive(harness):
    ndl = harness.make_needle(4, 32)
    assert ndl.shape == (4, 3, 32, 32)
    # High contrast: stripes saturate well beyond the haystack's noise std.
    assert float(np.abs(ndl).max()) >= 3.0
    # Frames differ (temporal pattern, not a static card).
    assert not np.array_equal(ndl[0], ndl[1])


def test_real_tokenizer_roundtrip(harness):
    tok = harness.build_real_tokenizer(vocab_size=600)
    ids = tok("what was the secret pattern shown").input_ids
    assert len(ids) > 2
    text = tok.decode(ids, skip_special_tokens=True)
    assert "secret" in text and "pattern" in text
    assert tok.eos_token_id is not None


def test_grid_run_tiny_end_to_end(harness):
    """Full run() on the tiny model: grid keys, retention fields, and the
    load-bearing property that a depth-1.0 needle (folded last) leaves a
    larger memory trace than the needle-free control."""
    from videollamb_tpu.config import ModelConfig

    tok = harness.build_real_tokenizer(vocab_size=600)
    cfg = ModelConfig.tiny(max_length=256)
    out = harness.run(lengths=[48], depths=[1.0], stride=8,
                      max_new_tokens=4, cfg=cfg, needle_frames=4,
                      tokenizer=tok, key_prefix="g")
    row = out["g_grid"]["48"]["1.0"]
    assert set(row) == {"memory_margin", "retained", "answer_correct"}
    assert row["retained"] and row["memory_margin"] > 0
    assert out["g_stream_fps"] > 0
    assert out["g_cells"][0]["segments"] > 0
    # The protocol asked and decoded through the real tokenizer path.
    assert isinstance(out["g_answer_acc"], float)
