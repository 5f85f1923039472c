"""Serving load generator (benchmarks/serving_load.py): open-loop Poisson
arrivals over the continuous-batching engines, SLA percentile report.
Tiny model, both engines, injected cfg/params."""

import sys
from pathlib import Path

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from serving_load import build_requests, main, run_load  # noqa: E402

from videollamb_tpu.config import ModelConfig


@pytest.fixture(scope="module")
def tiny_setup():
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


def test_build_requests_mix_deterministic(tiny_setup):
    cfg, _ = tiny_setup
    reqs = build_requests(cfg, 16, seed=3, video_frac=0.5,
                          prompt_len=24, max_new=4)
    assert len(reqs) == 16
    n_video = sum(r.batch.videos is not None for r in reqs)
    assert 0 < n_video < 16  # a genuine mix
    again = build_requests(cfg, 16, seed=3, video_frac=0.5,
                           prompt_len=24, max_new=4)
    assert [r.batch.videos is not None for r in reqs] == \
           [r.batch.videos is not None for r in again]
    for r in reqs:
        assert r.batch.input_ids.shape == (1, 24)


@pytest.mark.parametrize("engine_kind", ["dense", "paged"])
def test_load_run_end_to_end(tiny_setup, engine_kind):
    cfg, params = tiny_setup
    out = main([
        "--engine", engine_kind, "--slots", "2", "--rate", "50",
        "--n", "5", "--video-frac", "0.4", "--prompt-len", "24",
        "--max-new", "4", "--k", "2", "--timeout", "300",
    ], cfg=cfg, params=params)
    assert out["n_requests"] == 5
    assert out["total_tokens"] > 0
    assert out["aggregate_tok_s"] > 0
    # Every request produced a first token no later than its completion.
    assert out["ttft_p50_s"] <= out["e2e_p50_s"]
    assert out["ttft_p99_s"] <= out["e2e_p99_s"]
    assert np.isfinite(out["ttft_p99_s"])
    assert out["engine"] == engine_kind


def test_open_loop_queueing_shows_in_ttft(tiny_setup):
    """With 1 slot and simultaneous arrivals, later requests must queue:
    TTFT p99 strictly exceeds p50 (open-loop accounting from scheduled
    arrival, not admission)."""
    from serving_load import make_engine, parse_args

    cfg, params = tiny_setup
    args = parse_args(["--engine", "dense", "--slots", "1",
                       "--prompt-len", "24", "--max-new", "6", "--k", "2"])
    engine, cfg, params = make_engine(args, cfg=cfg, params=params)
    warm = build_requests(cfg, 1, seed=9, video_frac=0.0,
                          prompt_len=24, max_new=2)
    engine.submit(warm[0])
    engine.run_until_drained(k=2)
    reqs = build_requests(cfg, 4, seed=5, video_frac=0.0,
                          prompt_len=24, max_new=6)
    out = run_load(engine, reqs, rate=1000.0, k=2)
    assert out["ttft_p99_s"] > out["ttft_p50_s"]


@pytest.mark.parametrize("engine_kind", ["dense", "paged"])
def test_prompt_len_hint_is_token_identical(tiny_setup, engine_kind):
    """The host-known prompt_len hint (skips chunked prefill's device
    sync for text-only rows) must not change a single emitted token."""
    from serving_load import make_engine, parse_args

    cfg, params = tiny_setup

    def run(with_hint):
        args = parse_args(["--engine", engine_kind, "--slots", "2"])
        engine, _, _ = make_engine(args, cfg=cfg, params=params)
        reqs = build_requests(cfg, 4, seed=11, video_frac=0.0,
                              prompt_len=24, max_new=6)
        for r in reqs:
            if not with_hint:
                r.prompt_len = None
            engine.submit(r)
        engine.run_until_drained(k=2)
        return {r.uid: list(r.tokens) for r in reqs}

    assert run(True) == run(False)
