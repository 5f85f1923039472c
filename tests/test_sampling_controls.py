"""Sampling controls (logit_bias / presence / frequency penalties /
min_tokens / top_k): adjustment math, engine behavior on both engines,
grammar interaction, and the OpenAI parameter mapping."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.server import (
    Request,
    ServingEngine,
    build_control_adjustments,
)

EOS = 2


@pytest.fixture(scope="module")
def tiny():
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(max_length=64)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


def _req(cfg, uid, seed=0, budget=8, **kw):
    from videollamb_tpu.models.assembly import MultimodalBatch

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=budget,
                   temperature=kw.pop("temperature", 0.0), **kw)


def test_build_control_adjustments_math(tiny):
    cfg, _ = tiny
    r = _req(cfg, 0, logit_bias={5: 3.0}, presence_penalty=0.5,
             frequency_penalty=0.25)
    r.tokens = [7, 7, 9]
    adj = build_control_adjustments([r, None], cfg.lm.vocab_size, EOS)
    assert adj.shape == (2, cfg.lm.vocab_size)
    assert adj[0, 5] == 3.0
    assert adj[0, 7] == pytest.approx(-0.5 - 0.25 * 2)
    assert adj[0, 9] == pytest.approx(-0.5 - 0.25)
    assert adj[0, 11] == 0.0
    assert (adj[1] == 0).all()
    # min_tokens: EOS softly suppressed until enough tokens committed.
    r2 = _req(cfg, 1, min_tokens=4)
    r2.tokens = [3]
    adj = build_control_adjustments([r2], cfg.lm.vocab_size, EOS)
    assert adj[0, EOS] <= -1e9
    r2.tokens = [3, 4, 5, 6]
    assert build_control_adjustments([r2], cfg.lm.vocab_size, EOS) is None
    # No controls anywhere -> None (hot path untouched).
    assert build_control_adjustments(
        [_req(cfg, 2), None], cfg.lm.vocab_size, EOS) is None


def test_logit_bias_forces_token(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    req = _req(cfg, 0, budget=5, logit_bias={42: 1000.0})
    engine.submit(req)
    engine.run_until_drained(k=4)  # controls force the per-step path
    assert req.tokens == [42] * 5


def test_frequency_penalty_forbids_repeats(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    reqs = [_req(cfg, uid, seed=uid, budget=10, frequency_penalty=1e9)
            for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for r in reqs:
        assert len(set(r.tokens)) == len(r.tokens), r.tokens


def test_min_tokens_suppresses_eos_until_reached(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    # Bias EOS to +100: without min_tokens the row would stop immediately.
    req = _req(cfg, 0, budget=10, min_tokens=5, logit_bias={EOS: 100.0})
    engine.submit(req)
    engine.run_until_drained()
    assert len(req.tokens) == 6  # 5 forced non-EOS + the EOS
    assert req.tokens[-1] == EOS
    assert EOS not in req.tokens[:-1]


def test_top_k1_sampling_equals_greedy(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1, seed=9)
    sampled = _req(cfg, 0, seed=3, budget=8, temperature=2.0, top_k=1)
    greedy = _req(cfg, 1, seed=3, budget=8)
    engine.submit(sampled)
    engine.submit(greedy)
    engine.run_until_drained()
    assert sampled.tokens == greedy.tokens


def test_penalties_on_paged_engine(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=16,
                                eos_token_id=-1)
    req = _req(cfg, 0, seed=4, budget=8, presence_penalty=1e9)
    engine.submit(req)
    engine.run_until_drained(k=4)
    assert len(set(req.tokens)) == len(req.tokens)


def test_min_tokens_yields_to_grammar_closing(tiny):
    """Grammar forced closing (-1e30 masks) beats the soft (-1e9) EOS
    suppression: even with min_tokens > budget the output is complete
    valid JSON within budget."""
    from videollamb_tpu.serve.grammar import json_constraint
    from test_grammar import PIECES, _decode, _token_strs

    cfg, params = tiny

    class Tok:
        eos_token_id = EOS

    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    g = json_constraint(Tok(), token_strs=_token_strs(cfg.lm.vocab_size))
    req = _req(cfg, 0, seed=5, budget=6, min_tokens=50, grammar=g)
    engine.submit(req)
    engine.run_until_drained()
    obj = json.loads(_decode(req.tokens))
    assert isinstance(obj, dict)
    assert len(req.tokens) <= 6


def test_openai_sampling_param_mapping():
    from videollamb_tpu.serve.openai_api import BadRequest, _common_params

    row = {}
    _common_params({"presence_penalty": 1.5, "frequency_penalty": -0.5,
                    "logit_bias": {"42": 7, "7": -150},
                    "min_tokens": 3, "top_k": 40}, row)
    assert row["presence_penalty"] == 1.5
    assert row["frequency_penalty"] == -0.5
    assert row["logit_bias"] == {42: 7.0, 7: -100.0}  # clamped to ±100
    assert row["min_tokens"] == 3 and row["top_k"] == 40
    with pytest.raises(BadRequest, match="presence_penalty"):
        _common_params({"presence_penalty": 3.0}, {})
    with pytest.raises(BadRequest, match="token ids"):
        _common_params({"logit_bias": {"not_an_id": 1}}, {})


def test_batch_rows_carry_controls(tiny):
    from types import SimpleNamespace

    from videollamb_tpu.serve.batch_cli import build_requests
    from test_preprocess import WordTokenizer

    class Tok(WordTokenizer):
        eos_token_id = EOS

    chat = SimpleNamespace(tokenizer=Tok(), text_bucket=16)
    rows = [{"id": 0, "prompt": "hi", "raw": True,
             "presence_penalty": 0.5, "logit_bias": {"9": 2},
             "min_tokens": 2, "top_k": 5}]
    req = build_requests(rows, chat)[0]
    assert req.presence_penalty == 0.5
    assert req.logit_bias == {9: 2.0}
    assert req.min_tokens == 2 and req.top_k == 5


def test_controls_device_scan_matches_host_path(tiny):
    """Round-3 continuation: control-carrying batches ride the k-step
    device scan (sampled_decode_steps_controls — counts carried on
    device). Tokens must be identical to the per-step host path from the
    same engine seed, across bias + penalties + min_tokens + sampling."""
    cfg, params = tiny

    def run(k):
        reqs = [
            _req(cfg, "pen", seed=61, budget=8, temperature=0.9,
                 presence_penalty=0.6, frequency_penalty=0.3),
            _req(cfg, "bias", seed=62, budget=8, logit_bias={11: 4.0}),
            _req(cfg, "min", seed=63, budget=8, min_tokens=5,
                 logit_bias={EOS: 100.0}),
            _req(cfg, "plain", seed=64, budget=8, temperature=1.1),
        ]
        eng = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS,
                            seed=13)
        for r in reqs:
            eng.submit(r)
        eng.run_until_drained(k=k)
        return reqs

    host = run(1)
    dev = run(4)
    for a, b in zip(host, dev):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)
    # min_tokens really fired on the device path.
    m = dev[2]
    assert len(m.tokens) == 6 and m.tokens[-1] == EOS
    assert EOS not in m.tokens[:-1]


def test_controls_device_scan_paged_matches_dense(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    rd = _req(cfg, "d", seed=71, budget=8, temperature=0.8,
              presence_penalty=0.5, logit_bias={9: 3.0})
    rp = _req(cfg, "p", seed=71, budget=8, temperature=0.8,
              presence_penalty=0.5, logit_bias={9: 3.0})
    dense = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1, seed=21)
    dense.submit(rd)
    dense.run_until_drained(k=4)
    paged = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                               eos_token_id=-1, seed=21)
    paged.submit(rp)
    paged.run_until_drained(k=4)
    assert rd.tokens == rp.tokens


def test_controls_device_scan_counts_span_scan_boundaries(tiny):
    """Penalty counts rebuilt from host tokens at each scan boundary must
    continue the count history: a repeat-forbidding penalty stays exact
    across multiple k-step scans (10 tokens through k=3 scans)."""
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    req = _req(cfg, 0, seed=81, budget=10, frequency_penalty=1e9)
    engine.submit(req)
    engine.run_until_drained(k=3)
    assert len(req.tokens) == 10
    assert len(set(req.tokens)) == len(req.tokens), req.tokens
