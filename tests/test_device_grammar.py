"""Device-side constrained decoding (serve/device_grammar.py +
server.greedy_decode_steps_grammar): the HBM-pool path must be
token-identical to the per-step host-mask path, including freeze/rewind
on first-visit states and mixed constrained/free batches."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.device_grammar import DeviceTable, device_table_for
from videollamb_tpu.serve import grammar as grammar_mod
from videollamb_tpu.serve.grammar import GrammarTable, json_constraint
from test_grammar import EOS, PIECES, _decode, _token_strs


@pytest.fixture(autouse=True)
def _fresh_content_cache():
    """The content-keyed table cache (grammar.cached_grammar_table) makes
    every json_constraint(_Tok(), token_strs=strs) in this module share
    ONE table — which is the production behavior under test, but these
    tests also rely on per-TEST freshness (cold-table freeze/rewind paths,
    the deliberately-poisoned pool in the exhaustion test). Clear between
    tests; within a test, requests still share the table."""
    grammar_mod._CONTENT_TABLE_CACHE.clear()
    yield
    grammar_mod._CONTENT_TABLE_CACHE.clear()


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


class _Tok:
    eos_token_id = EOS


def test_device_table_rows():
    table = GrammarTable(_token_strs(64), EOS)
    dt = DeviceTable(table, 64, cap=16)
    s = dt.slot(table.start)
    assert s == 1  # slot 0 is reserved FREE
    assert dt.slot(table.start) == 1  # cached
    costs = np.asarray(dt.costs)
    # FREE slot: everything allowed at cost 0, next all DEAD.
    assert (costs[0] == 0).all()
    assert (np.asarray(dt.next_sid)[0] == -2).all()
    # Start state (json_object): '{' (id 3) allowed, '[' (id 5) not.
    assert costs[1, 3] < 1 << 20
    assert costs[1, 5] == 1 << 20
    assert np.asarray(dt.sid2slot)[table.start] == 1


def test_device_table_shared_via_cache():
    table = GrammarTable(_token_strs(64), EOS)
    assert device_table_for(table, 64) is device_table_for(table, 64)


def _req(cfg, uid, grammar, seed=0, budget=12):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=budget,
                   temperature=0.0, grammar=grammar)


def _run(cfg, params, k, seeds, budget=12, mix_free=False):
    """Drive the engine at sync width k; returns per-uid token lists."""
    from videollamb_tpu.serve.server import ServingEngine

    strs = _token_strs(cfg.lm.vocab_size)
    engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS)
    reqs = []
    for j, seed in enumerate(seeds):
        g = json_constraint(_Tok(), token_strs=strs)
        reqs.append(_req(cfg, j, g, seed=seed, budget=budget))
    if mix_free:
        reqs.append(_req(cfg, len(seeds), None, seed=99, budget=8))
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=k)
    return {r.uid: list(r.tokens) for r in reqs}


def test_device_path_matches_host_path(tiny):
    """k=4 routes grammar rows through the device scan (fresh table:
    every state is a first visit, so freeze/rewind is exercised hard);
    k=1 is the host-mask reference. Token-identical output proves the
    scan, the transitions, the budget filter, and the cache rewind."""
    cfg, params = tiny
    got_dev = _run(cfg, params, k=4, seeds=[0, 1, 2])
    got_host = _run(cfg, params, k=1, seeds=[0, 1, 2])
    assert got_dev == got_host
    for toks in got_dev.values():
        obj = json.loads(_decode(toks))
        assert isinstance(obj, dict)


def test_device_path_mixed_free_rows(tiny):
    cfg, params = tiny
    got_dev = _run(cfg, params, k=4, seeds=[3, 4], mix_free=True)
    got_host = _run(cfg, params, k=1, seeds=[3, 4], mix_free=True)
    assert got_dev == got_host


def test_device_path_tight_budget(tiny):
    """Budget forced closing on device: tiny budgets still land complete
    JSON, identically to the host path."""
    cfg, params = tiny
    for budget in (2, 3, 5):
        got_dev = _run(cfg, params, k=4, seeds=[7], budget=budget)
        got_host = _run(cfg, params, k=1, seeds=[7], budget=budget)
        assert got_dev == got_host, budget
        toks = got_dev[0]
        assert len(toks) <= budget
        assert isinstance(json.loads(_decode(toks)), dict)


def test_warm_table_shares_uploads(tiny):
    """A second engine on the same tokenizer reuses the uploaded rows
    (the DeviceTable is cached on the GrammarTable)."""
    cfg, params = tiny
    tok = _Tok()
    strs = _token_strs(cfg.lm.vocab_size)
    c1 = json_constraint(tok, token_strs=strs)
    dt1 = device_table_for(c1.table, cfg.lm.vocab_size)
    n_before = dt1._n
    from videollamb_tpu.serve.server import ServingEngine

    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS)
    engine.submit(_req(cfg, 0, c1, seed=5))
    engine.run_until_drained(k=4)
    assert device_table_for(c1.table, cfg.lm.vocab_size) is dt1
    assert dt1._n > n_before  # states uploaded during the run
    n_after = dt1._n
    # Same grammar again: the visited-states set barely grows.
    c2 = json_constraint(tok, token_strs=strs)
    engine2 = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS)
    engine2.submit(_req(cfg, 0, c2, seed=5))
    engine2.run_until_drained(k=4)
    assert dt1._n == n_after  # identical decode: zero new uploads


def _run_paged(cfg, params, k, seeds, budget=12, mix_free=False):
    from videollamb_tpu.serve.paged import PagedServingEngine

    strs = _token_strs(cfg.lm.vocab_size)
    engine = PagedServingEngine(params, cfg, num_slots=4, page_size=16,
                                eos_token_id=EOS)
    reqs = []
    for j, seed in enumerate(seeds):
        g = json_constraint(_Tok(), token_strs=strs)
        reqs.append(_req(cfg, j, g, seed=seed, budget=budget))
    if mix_free:
        reqs.append(_req(cfg, len(seeds), None, seed=99, budget=8))
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=k)
    return {r.uid: list(r.tokens) for r in reqs}


def test_paged_device_path_matches_host_path(tiny):
    """Same parity bar over the paged pool: device k-scan (fresh table —
    freeze/lengths-rewind exercised) == per-step host masks."""
    cfg, params = tiny
    got_dev = _run_paged(cfg, params, k=4, seeds=[0, 1], mix_free=True)
    got_host = _run_paged(cfg, params, k=1, seeds=[0, 1], mix_free=True)
    assert got_dev == got_host
    for uid in (0, 1):
        assert isinstance(json.loads(_decode(got_dev[uid])), dict)


def test_paged_and_dense_device_paths_agree(tiny):
    cfg, params = tiny
    assert (_run_paged(cfg, params, k=4, seeds=[5, 6])
            == _run(cfg, params, k=4, seeds=[5, 6]))


def test_device_grammar_under_sharded_params(tiny):
    """The device grammar scan composes with TP+FSDP-sharded weights
    (GSPMD inserts collectives; the replicated HBM state pool gathers are
    local) — token-identical to the single-device run."""
    from videollamb_tpu.parallel.mesh import create_mesh
    from videollamb_tpu.parallel.sharding import shard_params
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    strs = _token_strs(cfg.lm.vocab_size)

    def run(p):
        engine = ServingEngine(p, cfg, num_slots=2, eos_token_id=EOS)
        reqs = [_req(cfg, j, json_constraint(_Tok(), token_strs=strs),
                     seed=j + 20) for j in range(2)]
        for r in reqs:
            engine.submit(r)
        engine.run_until_drained(k=4)
        return {r.uid: list(r.tokens) for r in reqs}

    ref = run(params)
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    assert run(shard_params(mesh, params)) == ref
    for toks in ref.values():
        assert isinstance(json.loads(_decode(toks)), dict)


def test_pool_exhaustion_falls_back_to_host(tiny):
    """A full pool must not break correctness — the engine silently uses
    the per-step host path."""
    cfg, params = tiny
    strs = _token_strs(cfg.lm.vocab_size)
    con = json_constraint(_Tok(), token_strs=strs)
    # Pre-install a tiny-capacity device table on this (fresh) table.
    con.table._device_table = DeviceTable(con.table, cfg.lm.vocab_size, cap=2)
    from videollamb_tpu.serve.server import ServingEngine

    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS)
    req = _req(cfg, 0, con, seed=1)
    engine.submit(req)
    engine.run_until_drained(k=4)
    obj = json.loads(_decode(req.tokens))
    assert isinstance(obj, dict)


def _sampled_run(cfg, params, k, tok, seeds, budget=8, paged=False,
                 temperature=0.9):
    """One engine run with SAMPLED grammar rows (shared GrammarTable via
    ``tok``, so the DeviceTable warms across calls)."""
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    strs = _token_strs(cfg.lm.vocab_size)
    if paged:
        engine = PagedServingEngine(params, cfg, num_slots=4, page_size=16,
                                    eos_token_id=EOS, seed=17)
    else:
        engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS,
                               seed=17)
    reqs = []
    for j, s in enumerate(seeds):
        g = json_constraint(tok, token_strs=strs)
        r = _req(cfg, j, g, seed=s, budget=budget)
        r.temperature = temperature
        reqs.append(r)
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=k)
    return {r.uid: list(r.tokens) for r in reqs}


def test_sampled_grammar_device_valid_json(tiny):
    """Round-3 continuation: grammar + temperature rides the device scan
    (sampled_decode_steps_grammar). Cold table — freeze/recovery under
    sampling is exercised — and every output must still be complete
    parseable JSON within budget."""
    cfg, params = tiny
    got = _sampled_run(cfg, params, k=4, tok=_Tok(), seeds=[0, 1, 2])
    for toks in got.values():
        assert len(toks) <= 8
        assert isinstance(json.loads(_decode(toks)), dict)


def test_sampled_grammar_converges_to_host_parity(tiny):
    """Freezes consume rng splits, so cold-table device runs may diverge
    from host stepping — but each run uploads at least the first
    divergent state, so repeated runs with the same engine seed converge
    to the exact host-path token stream (warm tables never freeze)."""
    cfg, params = tiny
    tok = _Tok()
    host = _sampled_run(cfg, params, k=1, tok=tok, seeds=[5])
    got = None
    for _ in range(12):
        got = _sampled_run(cfg, params, k=4, tok=tok, seeds=[5])
        if got == host:
            break
    assert got == host
    assert isinstance(json.loads(_decode(host[0])), dict)


def test_sampled_grammar_mixed_free_and_greedy_rows(tiny):
    """One batch mixing a sampled grammar row, a greedy grammar row, and
    an unconstrained sampled row: all ride one device scan; grammar rows
    emit valid JSON, the greedy grammar row matches its solo host run."""
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    tok = _Tok()
    strs = _token_strs(cfg.lm.vocab_size)

    def build():
        gs = json_constraint(tok, token_strs=strs)
        gg = json_constraint(tok, token_strs=strs)
        rs = _req(cfg, "samp", gs, seed=11, budget=8)
        rs.temperature = 0.9
        rg = _req(cfg, "greedy", gg, seed=12, budget=8)
        rf = _req(cfg, "free", None, seed=13, budget=6)
        rf.temperature = 1.1
        return [rs, rg, rf]

    engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS,
                           seed=23)
    reqs = build()
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    assert isinstance(json.loads(_decode(reqs[0].tokens)), dict)
    assert isinstance(json.loads(_decode(reqs[1].tokens)), dict)
    # Unconstrained sampled row: decodes freely (may sample EOS early).
    assert 1 <= len(reqs[2].tokens) <= 6

    # The greedy grammar row is rng-independent: solo host-path run agrees.
    solo = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    g = json_constraint(tok, token_strs=strs)
    ref = _req(cfg, "greedy", g, seed=12, budget=8)
    solo.submit(ref)
    solo.run_until_drained(k=1)
    assert ref.tokens == reqs[1].tokens


def test_sampled_grammar_paged_valid_json(tiny):
    cfg, params = tiny
    got = _sampled_run(cfg, params, k=4, tok=_Tok(), seeds=[6, 7],
                       paged=True)
    for toks in got.values():
        assert len(toks) <= 8
        assert isinstance(json.loads(_decode(toks)), dict)


def test_grammar_scan_with_logprobs(tiny):
    """Logprob extraction rides the device grammar scan (round-3
    continuation — this combo previously fell to the host-mask path):
    tokens AND base-distribution logprobs match the k=1 host path."""
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    tok = _Tok()
    strs = _token_strs(cfg.lm.vocab_size)

    def run(k):
        g = json_constraint(tok, token_strs=strs)
        r = _req(cfg, "lp", g, seed=9, budget=8)
        r.logprobs = True
        r.top_logprobs = 3
        eng = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS)
        eng.submit(r)
        eng.run_until_drained(k=k)
        return r

    host = run(1)
    dev = run(4)
    assert host.tokens == dev.tokens
    assert len(dev.token_logprobs) == len(dev.tokens)
    np.testing.assert_allclose(host.token_logprobs, dev.token_logprobs,
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(host.top_tokens, dev.top_tokens):
        assert [i for i, _ in a] == [i for i, _ in b]
    assert isinstance(json.loads(_decode(dev.tokens)), dict)
