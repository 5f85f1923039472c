"""Continuous-batching engine: slot outputs must equal independent
single-request generation (greedy), including under slot reuse."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.models.engine import generate
from videollamb_tpu.serve.server import Request, ServingEngine


@pytest.fixture(scope="module")
def tiny():
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


def _request(cfg, uid, seed, max_new=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 8), jnp.int32),
        labels=None,
        videos=jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=max_new, temperature=0.0)


def test_continuous_batching_matches_independent_generate(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)

    # 3 requests through 2 slots: forces a slot-reuse cycle.
    reqs = [_request(cfg, uid, seed=uid) for uid in range(3)]
    for r in reqs:
        engine.submit(r)
    done = engine.run_until_drained()
    assert len(done) == 3 and all(r.done for r in reqs)

    for r in reqs:
        ref = generate(
            params, cfg, r.batch, jax.random.PRNGKey(0),
            max_new_tokens=r.max_new_tokens, do_sample=False, eos_token_id=-1,
            max_seq_len=cfg.max_length + 512,
        )
        expected = np.asarray(ref.tokens[0][: int(ref.lengths[0])]).tolist()
        assert r.tokens == expected, f"request {r.uid}"


def test_engine_eos_frees_slot(tiny):
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=None)
    # Find the first greedy token of request 0 and use it as the EOS so the
    # request finishes in one step.
    probe = _request(cfg, 0, seed=0, max_new=1)
    ref = generate(params, cfg, probe.batch, jax.random.PRNGKey(0),
                   max_new_tokens=1, do_sample=False, eos_token_id=-1,
                   max_seq_len=cfg.max_length + 512)
    eos = int(ref.tokens[0][0])
    engine.eos = eos
    r = _request(cfg, 0, seed=0, max_new=10)
    engine.submit(r)
    done = engine.step()
    assert done and done[0].tokens == [eos]
    assert engine.slots[0] is None


def test_multi_step_decode_matches_single_step(tiny):
    cfg, params = tiny
    reqs_a = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(3)]
    reqs_b = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(3)]

    eng_a = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in reqs_a:
        eng_a.submit(r)
    eng_a.run_until_drained(k=1)

    eng_b = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in reqs_b:
        eng_b.submit(r)
    eng_b.run_until_drained(k=4)

    for ra, rb in zip(reqs_a, reqs_b):
        assert ra.tokens == rb.tokens, f"request {ra.uid}"


def test_serving_engine_with_tp_sharded_params(tiny):
    """Continuous-batching engine over TP+FSDP-sharded params (the
    serve-a-bigger-model configuration): same tokens as unsharded. All
    engine jits are GSPMD programs, so sharded params flow through
    prefill, splice, and the k-step decode loop unchanged."""
    from videollamb_tpu.parallel.mesh import create_mesh
    from videollamb_tpu.parallel.sharding import shard_params

    cfg, params = tiny
    reqs_ref = [_request(cfg, uid, seed=10 + uid) for uid in range(2)]
    ref = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in reqs_ref:
        ref.submit(r)
    ref.run_until_drained(k=2)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    sharded = shard_params(mesh, params)
    reqs = [_request(cfg, uid, seed=10 + uid) for uid in range(2)]
    eng = ServingEngine(sharded, cfg, num_slots=2, eos_token_id=-1)
    for r in reqs:
        eng.submit(r)
    eng.run_until_drained(k=2)
    for a, b in zip(reqs_ref, reqs):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)


def test_top_p_nucleus_respected(tiny):
    """top_p near 0 degenerates to greedy even at high temperature (the
    nucleus keeps only the argmax token); top_p=1 samples freely."""
    import jax.numpy as jnp

    from videollamb_tpu.serve.server import sample_slot_tokens

    cfg, params = tiny
    rng = np.random.default_rng(11)
    logits = jnp.asarray(rng.normal(size=(3, cfg.lm.vocab_size)).astype(np.float32))

    class R:
        def __init__(self, t, p):
            self.temperature, self.top_p = t, p

    slots = [R(5.0, 1e-6), R(0.0, 1.0), None]
    out = np.asarray(sample_slot_tokens(logits, jax.random.PRNGKey(0), slots))
    greedy = np.asarray(jnp.argmax(logits, -1))
    # Row 0: hot temperature but tiny nucleus -> forced to the argmax.
    assert out[0] == greedy[0]
    assert out[1] == greedy[1] and out[2] == greedy[2]

    # With top_p=1 and hot temperature, sampling diverges from greedy for
    # at least one of many draws.
    slots = [R(5.0, 1.0), R(0.0, 1.0), None]
    diverged = False
    for s in range(12):
        out = np.asarray(sample_slot_tokens(logits, jax.random.PRNGKey(s), slots))
        assert out[1] == greedy[1]  # greedy row never changes
        diverged |= out[0] != greedy[0]
    assert diverged


def test_on_token_streaming_and_cancellation(tiny):
    """on_token fires per committed token in order; cancel() frees a
    running slot at the next step and drops a pending request."""
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)

    streamed = []
    r1 = _request(cfg, "s", seed=21, max_new=5)
    r1.on_token = lambda req, tok: streamed.append(tok)
    engine.submit(r1)
    engine.run_until_drained(k=2)
    assert streamed == r1.tokens and len(streamed) == 5

    # Cancel a running request mid-decode.
    r2 = _request(cfg, "run", seed=22, max_new=50)
    r3 = _request(cfg, "queued", seed=23, max_new=5)
    engine.submit(r2)
    engine.submit(r3)
    engine.step(k=1)  # admit r2 (1 slot), decode one token
    assert engine.cancel("run")
    done = engine.step(k=1)
    assert r2 in done and r2.done and len(r2.tokens) < 50
    # The queued request proceeds normally after the slot frees.
    engine.run_until_drained(k=2)
    assert r3.done and len(r3.tokens) == 5

    # Cancel while still pending: dropped at admission, no tokens.
    engine2 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    r4 = _request(cfg, "a", seed=24, max_new=4)
    r5 = _request(cfg, "b", seed=25, max_new=4)
    engine2.submit(r4)
    engine2.submit(r5)
    assert engine2.cancel("b")
    engine2.run_until_drained(k=2)
    assert r4.done and len(r4.tokens) == 4
    assert r5.done and r5.tokens == []


def test_dropped_requests_are_returned_from_step(tiny):
    """Cancel-while-pending and paged page-budget rejections must come
    back from step() so waiting callers get a completion signal (round-3
    code-review finding: they were silently swallowed and clients hung)."""
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1)
    a = _request(cfg, "a", seed=1)
    b = _request(cfg, "b", seed=2)
    engine.submit(a)
    engine.submit(b)
    engine.cancel("b")  # still pending: slot 0 goes to "a"
    finished = []
    for _ in range(200):
        finished += engine.step(2)
        if {r.uid for r in finished} >= {"a", "b"}:
            break
    uids = {r.uid for r in finished}
    assert "b" in uids, "cancelled-while-pending request never signaled"
    assert all(r.done for r in finished)


def test_paged_rejection_signals_with_error(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=16,
                                pages_per_seq=2, total_pages=8)
    # A 48-token text prompt exceeds pages_per_seq * page_size = 32.
    ids = np.full((1, 48), 5, np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 48), jnp.int32),
        labels=None, videos=None, images=None)
    req = Request(uid="big", batch=batch, max_new_tokens=4)
    engine.submit(req)
    finished = engine.step(1)
    assert [r.uid for r in finished] == ["big"]
    assert req.done and req.error and "rejected" in req.error
    assert req.tokens == []


def _lp_request(cfg, uid, seed, max_new=6, top=3, temperature=0.0):
    r = _request(cfg, uid, seed, max_new=max_new)
    r.temperature = temperature
    r.logprobs = True
    r.top_logprobs = top
    return r


def test_logprobs_greedy_k_step(tiny):
    """k>1 greedy scan path: per-token logprobs committed, top list sorted,
    and (greedy) the chosen token IS the top-1 alternative. A slot that
    did not ask for logprobs stays untouched, and decode output is
    unchanged by the extraction graph."""
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    lp = _lp_request(cfg, "lp", seed=1)
    plain = _request(cfg, "plain", seed=2)
    engine.submit(lp)
    engine.submit(plain)
    engine.run_until_drained(k=4)

    assert plain.token_logprobs == [] and plain.top_tokens == []
    assert len(lp.token_logprobs) == len(lp.tokens) == 6
    assert len(lp.top_tokens) == 6
    for t, (tok, chosen, tops) in enumerate(
            zip(lp.tokens, lp.token_logprobs, lp.top_tokens)):
        assert chosen <= 1e-5, f"pos {t}: logprob must be <= 0"
        assert len(tops) == 3
        vals = [v for _, v in tops]
        assert vals == sorted(vals, reverse=True)
        assert tops[0][0] == tok and abs(tops[0][1] - chosen) < 1e-5

    # Extraction must not perturb decoding: same tokens as a plain run.
    ref = _request(cfg, "ref", seed=1)
    engine2 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    engine2.submit(ref)
    engine2.run_until_drained(k=4)
    assert ref.tokens == lp.tokens


def test_logprobs_per_step_path_matches_scan_path(tiny):
    """k=1 routes through the per-step (sampling) branch even for greedy
    rows — its logprobs_of extraction must agree with the k>1 scan's."""
    cfg, params = tiny
    a = _lp_request(cfg, "a", seed=3)
    b = _lp_request(cfg, "b", seed=3)

    e1 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    e1.submit(a)
    e1.run_until_drained(k=1)
    e2 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    e2.submit(b)
    e2.run_until_drained(k=4)

    assert a.tokens == b.tokens
    np.testing.assert_allclose(a.token_logprobs, b.token_logprobs,
                               rtol=1e-4, atol=1e-5)
    for ta, tb in zip(a.top_tokens, b.top_tokens):
        assert [i for i, _ in ta] == [i for i, _ in tb]
        np.testing.assert_allclose([v for _, v in ta], [v for _, v in tb],
                                   rtol=1e-4, atol=1e-5)


def test_logprobs_sampling_temperature(tiny):
    """temperature>0 rows report the BASE distribution's logprob of the
    sampled token (finite, <= 0, never above the top-1)."""
    cfg, params = tiny
    r = _lp_request(cfg, "s", seed=4, temperature=0.8, top=2)
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1, seed=7)
    engine.submit(r)
    engine.run_until_drained()
    assert len(r.token_logprobs) == len(r.tokens) == 6
    for chosen, tops in zip(r.token_logprobs, r.top_tokens):
        assert np.isfinite(chosen) and chosen <= 1e-5
        assert chosen <= tops[0][1] + 1e-5


def _sampled_request(cfg, uid, seed, temperature, top_p=1.0, top_k=0,
                     max_new=6):
    r = _request(cfg, uid, seed, max_new=max_new)
    r.temperature = temperature
    r.top_p = top_p
    r.top_k = top_k
    return r


def test_sampled_device_scan_matches_host_path(tiny):
    """k>1 sampled batches ride the on-device scan (sampled_decode_steps);
    tokens must be BIT-identical to the per-step host path from the same
    engine seed — the scan carries the rng through the same split chain
    and draws with the same sample_rows core. Mixed batch: hot sampling,
    nucleus+top_k row, and a greedy row."""
    cfg, params = tiny

    def run(k):
        reqs = [
            _sampled_request(cfg, "hot", seed=31, temperature=1.2),
            _sampled_request(cfg, "nuc", seed=32, temperature=0.9,
                             top_p=0.85, top_k=7),
            _sampled_request(cfg, "greedy", seed=33, temperature=0.0),
        ]
        eng = ServingEngine(params, cfg, num_slots=3, eos_token_id=-1, seed=5)
        for r in reqs:
            eng.submit(r)
        eng.run_until_drained(k=k)
        return reqs

    host = run(1)
    dev = run(4)
    for a, b in zip(host, dev):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)
    # The sampled rows actually sampled (diverge from a greedy run).
    greedy = ServingEngine(params, cfg, num_slots=3, eos_token_id=-1)
    g = [_request(cfg, u, seed=s) for u, s in (("hot", 31), ("nuc", 32))]
    for r in g:
        greedy.submit(r)
    greedy.run_until_drained(k=4)
    assert any(a.tokens != b.tokens for a, b in zip(host, g))


def test_sampled_device_scan_paged_matches_dense(tiny):
    """The paged engine's sampled k-step scan draws the same tokens as the
    dense engine's (same rng chain; logits agree within float tolerance)."""
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    rd = _sampled_request(cfg, "d", seed=41, temperature=0.8, top_p=0.9)
    rp = _sampled_request(cfg, "p", seed=41, temperature=0.8, top_p=0.9)

    dense = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1, seed=9)
    dense.submit(rd)
    dense.run_until_drained(k=4)
    paged = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                               eos_token_id=-1, seed=9)
    paged.submit(rp)
    paged.run_until_drained(k=4)
    assert rd.tokens == rp.tokens


def test_sampled_device_scan_with_logprobs(tiny):
    """Logprob extraction composes with the sampled scan: per committed
    token, the BASE-distribution logprob of the sampled token (finite,
    <= 0, never above the top-1 alternative), same as the host path."""
    cfg, params = tiny
    r = _lp_request(cfg, "slp", seed=43, temperature=0.8, top=2)
    h = _lp_request(cfg, "hlp", seed=43, temperature=0.8, top=2)

    eng = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1, seed=7)
    eng.submit(r)
    eng.run_until_drained(k=4)
    host = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1, seed=7)
    host.submit(h)
    host.run_until_drained(k=1)

    assert r.tokens == h.tokens
    np.testing.assert_allclose(r.token_logprobs, h.token_logprobs,
                               rtol=1e-4, atol=1e-5)
    for chosen, tops in zip(r.token_logprobs, r.top_tokens):
        assert np.isfinite(chosen) and chosen <= 1e-5
        assert chosen <= tops[0][1] + 1e-5


def test_sampled_scan_rng_interchangeable_mid_stream(tiny):
    """A stream that switches between host steps and device scans draws
    from ONE rng chain: k=1 then k=4 steps must reproduce an all-k=1 run
    (the scan returns the carried rng to the engine)."""
    cfg, params = tiny
    a = _sampled_request(cfg, "a", seed=51, temperature=1.0, max_new=8)
    b = _sampled_request(cfg, "b", seed=51, temperature=1.0, max_new=8)

    mixed = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1, seed=3)
    mixed.submit(a)
    mixed.step(k=1)  # admit + 1 host-path token
    mixed.step(k=4)  # device scan continues the same chain
    mixed.run_until_drained(k=1)

    ref = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1, seed=3)
    ref.submit(b)
    ref.run_until_drained(k=1)
    assert a.tokens == b.tokens


def test_logprobs_paged_engine_matches_dense(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    rd = _lp_request(cfg, "d", seed=5)
    rp = _lp_request(cfg, "p", seed=5)

    dense = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    dense.submit(rd)
    dense.run_until_drained(k=4)
    paged = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                               eos_token_id=-1)
    paged.submit(rp)
    paged.run_until_drained(k=4)

    assert rd.tokens == rp.tokens
    np.testing.assert_allclose(rd.token_logprobs, rp.token_logprobs,
                               rtol=2e-3, atol=1e-4)
    assert [[i for i, _ in t] for t in rd.top_tokens] == \
           [[i for i, _ in t] for t in rp.top_tokens]


def test_speculative_engine_matches_plain_greedy(tiny):
    """Batched prompt-lookup speculation (engine-level, round-3
    continuation): token-identical to the plain engine across slot reuse,
    with verify rollback exercised every round (random weights accept
    ~1)."""
    cfg, params = tiny
    plain = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(3)]
    spec = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(3)]

    ep = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in plain:
        ep.submit(r)
    ep.run_until_drained(k=4)

    es = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1,
                       speculative="lookup", spec_k=4)
    for r in spec:
        es.submit(r)
    es.run_until_drained()
    for a, b in zip(plain, spec):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)
    assert es.spec_rounds > 0
    assert es.spec_committed == sum(len(r.tokens) for r in spec)


def test_speculative_accepts_repetitive_continuations(tiny):
    """A forced-repetitive stream (tokens appended to the lookup context
    make the model's own output match proposals) must commit more than
    one token per round on average — the accelerating regime."""
    cfg, params = tiny
    # Find the greedy chain first; feed it as the PROMPT of a second
    # request so lookup proposes exactly the chain the model will emit.
    probe = _request(cfg, "probe", seed=77, max_new=12)
    e0 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    e0.submit(probe)
    e0.run_until_drained(k=4)

    import jax.numpy as jnp
    from videollamb_tpu.models.assembly import MultimodalBatch

    rng = np.random.default_rng(77)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    videos = jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32))
    # Same prompt + the future chain appended as text context for lookup.
    # (The K-sentinel splice only replaces sentinels; extra ids are real
    # prompt tokens — the model's continuation changes, but what matters
    # here is accept-rate accounting, verified against the plain engine.)
    ids2 = np.concatenate([ids, np.asarray([probe.tokens[:8]], np.int32)], 1)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids2),
        attention_mask=jnp.ones((1, ids2.shape[1]), jnp.int32),
        labels=None, videos=videos, images=None)

    def mk():
        return Request(uid="rep", batch=batch, max_new_tokens=10,
                       temperature=0.0)

    es = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1,
                       speculative="lookup", spec_k=4)
    rs = mk()
    es.submit(rs)
    es.run_until_drained()
    ep = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    rp = mk()
    ep.submit(rp)
    ep.run_until_drained(k=2)
    assert rs.tokens == rp.tokens
    assert es.spec_committed == len(rs.tokens)


def test_speculative_eos_mid_chunk_frees_slot(tiny):
    """EOS accepted mid-chunk releases the slot immediately; garbage
    beyond the EOS is never committed."""
    cfg, params = tiny
    probe = _request(cfg, 0, seed=0, max_new=3)
    e0 = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    e0.submit(probe)
    e0.run_until_drained(k=3)
    eos = probe.tokens[1]  # make the 2nd greedy token the EOS

    es = ServingEngine(params, cfg, num_slots=1, eos_token_id=eos,
                       speculative="lookup", spec_k=4)
    r = _request(cfg, 0, seed=0, max_new=10)
    es.submit(r)
    es.run_until_drained()
    assert r.tokens == probe.tokens[:2]
    assert es.slots[0] is None


def test_fork_group_shares_one_prefill(tiny, monkeypatch):
    """clone_request + share_prefill (the OpenAI n>1 fork): siblings
    decode identically to independent submissions while the splice +
    prefill runs ONCE for the whole group, on the dense AND paged
    engines."""
    import videollamb_tpu.serve.paged as paged_mod
    import videollamb_tpu.serve.server as server_mod
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import clone_request, share_prefill

    cfg, params = tiny
    calls = {"n": 0}
    real = server_mod.prepare_multimodal_embeds_fast

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(server_mod, "prepare_multimodal_embeds_fast",
                        counting)
    monkeypatch.setattr(paged_mod, "prepare_multimodal_embeds_fast",
                        counting)

    for engine_cls, kw in ((ServingEngine, {}),
                           (PagedServingEngine, {"page_size": 32})):
        ref_req = _request(cfg, "ref", seed=91, max_new=5)
        ref = engine_cls(params, cfg, num_slots=3, eos_token_id=-1, **kw)
        ref.submit(ref_req)
        ref.run_until_drained(k=2)

        base = _request(cfg, "base", seed=91, max_new=5)
        sibs = [base, clone_request(base), clone_request(base)]
        for i, s in enumerate(sibs):
            s.uid = f"sib{i}"
        share_prefill(sibs)
        eng = engine_cls(params, cfg, num_slots=3, eos_token_id=-1, **kw)
        calls["n"] = 0
        for s in sibs:
            eng.submit(s)
        eng.run_until_drained(k=2)
        assert calls["n"] == 1, (engine_cls.__name__, calls["n"])
        for s in sibs:
            assert s.tokens == ref_req.tokens, (engine_cls.__name__, s.uid)


def test_fork_group_with_grammar_cursors_are_independent(tiny):
    """Cloned grammar constraints are fresh cursors over the shared
    table: both siblings emit complete valid JSON."""
    import json as _json

    from test_grammar import _decode, _token_strs
    from videollamb_tpu.serve.grammar import json_constraint
    from videollamb_tpu.serve.server import clone_request, share_prefill

    cfg, params = tiny

    class Tok:
        eos_token_id = 2

    strs = _token_strs(cfg.lm.vocab_size)
    base = _request(cfg, "g0", seed=93, max_new=8)
    base.grammar = json_constraint(Tok(), token_strs=strs)
    sib = clone_request(base)
    sib.uid = "g1"
    assert sib.grammar is not base.grammar
    assert sib.grammar.table is base.grammar.table
    share_prefill([base, sib])
    eng = ServingEngine(params, cfg, num_slots=2, eos_token_id=2)
    eng.submit(base)
    eng.submit(sib)
    eng.run_until_drained(k=4)
    for r in (base, sib):
        assert isinstance(_json.loads(_decode(r.tokens)), dict), r.uid


def test_draft_speculative_engine_matches_plain_greedy(tiny):
    """Draft-model speculation in the engine (round-3 continuation): with
    a PERFECT draft (the target itself) the tokens are identical to plain
    greedy and acceptance is high — the whole round runs on device."""
    cfg, params = tiny
    plain = [_request(cfg, uid, seed=40 + uid, max_new=8) for uid in range(3)]
    spec = [_request(cfg, uid, seed=40 + uid, max_new=8) for uid in range(3)]

    ep = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in plain:
        ep.submit(r)
    ep.run_until_drained(k=4)

    es = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1,
                       speculative="draft", spec_k=4,
                       draft_params=params, draft_cfg=cfg.lm)
    for r in spec:
        es.submit(r)
    es.run_until_drained()
    for a, b in zip(plain, spec):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)
    assert es.spec_committed == sum(len(r.tokens) for r in spec)
    # A perfect draft accepts (nearly) everything: well above 1/round.
    assert es.spec_committed / es.spec_rounds > 1.5, (
        es.spec_committed, es.spec_rounds)


def test_draft_speculative_shallow_draft_still_exact(tiny):
    """A DIFFERENT (shallow, same-width) draft changes only speed: the
    output is still exactly the target's greedy chain."""
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import init_llama_params

    cfg, params = tiny
    dcfg = LlamaConfig.tiny(num_hidden_layers=1)
    assert dcfg.hidden_size == cfg.lm.hidden_size
    dparams = init_llama_params(jax.random.PRNGKey(9), dcfg)

    plain = _request(cfg, 0, seed=47, max_new=8)
    ep = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    ep.submit(plain)
    ep.run_until_drained(k=4)

    spec = _request(cfg, 0, seed=47, max_new=8)
    es = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1,
                       speculative="draft", spec_k=4,
                       draft_params=dparams, draft_cfg=dcfg)
    es.submit(spec)
    es.run_until_drained()
    assert spec.tokens == plain.tokens
    assert es.spec_committed == len(spec.tokens)


def test_draft_speculative_validation_and_fork_sharing(tiny):
    """hidden_size mismatch is rejected up front; fork groups share ONE
    target prefill AND one draft prefill."""
    import videollamb_tpu.serve.server as server_mod
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.serve.server import clone_request, share_prefill

    cfg, params = tiny
    bad = LlamaConfig.tiny(hidden_size=cfg.lm.hidden_size * 2)
    with pytest.raises(ValueError, match="hidden_size"):
        ServingEngine(params, cfg, speculative="draft",
                      draft_params=params, draft_cfg=bad)

    calls = {"n": 0}
    real = server_mod.prepare_multimodal_embeds_fast

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    es = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1,
                       speculative="draft", spec_k=4,
                       draft_params=params, draft_cfg=cfg.lm)
    base = _request(cfg, "b", seed=48, max_new=5)
    sib = clone_request(base)
    sib.uid = "s"
    share_prefill([base, sib])
    import unittest.mock as mock

    with mock.patch.object(server_mod, "prepare_multimodal_embeds_fast",
                           counting):
        es.submit(base)
        es.submit(sib)
        es.run_until_drained()
    assert calls["n"] == 1
    assert base.tokens == sib.tokens  # greedy forks decode identically
