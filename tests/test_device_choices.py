"""Device-side choice-set constraints + the combined grammar+controls
scan (round-4 closure of the last host-path decode classes).

Choice sets (the constrained MC-eval path, reference
llava/eval/model_videoqa_mc.py:202-207 answer-letter protocol) are tiny
tries that ride the same HBM state pool as JSON grammars
(serve/constrained.ChoiceTable); engines cache one table per choice-set
signature so a batch of same-choice requests shares it. The parity bar
everywhere: the device k-step scan must be token-identical to the
per-step host-mask path (k=1)."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.constrained import ChoiceConstraint, ChoiceTable, TokenTrie
from videollamb_tpu.serve.device_grammar import device_table_for
from videollamb_tpu.serve import grammar as grammar_mod
from test_grammar import EOS, _decode, _token_strs


@pytest.fixture(autouse=True)
def _fresh_content_cache():
    """Per-test table freshness (see test_device_grammar's twin fixture):
    grammar tables are content-cached across tokenizer objects, so the
    freeze-exercising tests clear the module cache between tests."""
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


# ---------------------------------------------------------------------------
# ChoiceTable protocol unit tests
# ---------------------------------------------------------------------------

def test_choice_table_costs_and_expand():
    # Choices: [5], [6, 7], [6, 7, 8] (prefix case).
    trie = TokenTrie([[5], [6, 7], [6, 7, 8]])
    t = ChoiceTable(trie, eos_token_id=EOS)
    assert t.cost(t.start) == 1  # shortest choice is one token
    allowed, ends, costs = t.expand(t.start)
    assert sorted(allowed.tolist()) == [5, 6]
    by_tok = dict(zip(allowed.tolist(), costs.tolist()))
    assert by_tok[5] == 0          # [5] lands on a leaf
    assert by_tok[6] == 1          # needs the 7 to finish
    # The [6,7] node is a leaf WITH a child: cost 0 (EOS escape hatch).
    n67 = trie.step(trie.step(0, 6), 7)
    assert trie.is_leaf[n67] and t.cost(n67) == 0 and not t.is_end(n67)
    # min_tokens mirrors the grammar-table budget contract.
    assert t.min_tokens == 1


def test_choice_table_prewarmed_device_pool():
    trie = TokenTrie([[3, 4], [3, 5], [9]])
    t = ChoiceTable(trie, eos_token_id=EOS)
    dt = device_table_for(t, 16)
    # Every trie node uploaded at creation -> the scan can never freeze.
    assert dt._n == len(trie.children) + 1  # +1: reserved FREE slot
    assert dt.cap == t.preferred_cap  # right-sized pool, not the 192 default
    costs = np.asarray(dt.costs)
    root_slot = int(np.asarray(dt.sid2slot)[0])
    assert costs[root_slot, 3] == 1 and costs[root_slot, 9] == 0
    assert costs[root_slot, 7] == 1 << 20  # not a choice token
    # Leaf rows allow EOS at cost 0.
    leaf = trie.step(0, 9)
    leaf_slot = int(np.asarray(dt.sid2slot)[leaf])
    assert costs[leaf_slot, EOS] == 0


def test_choice_table_requires_eos():
    with pytest.raises(ValueError):
        ChoiceTable(TokenTrie([[1]]), eos_token_id=-1)


# ---------------------------------------------------------------------------
# Engine parity: device choice scan == host per-step masks
# ---------------------------------------------------------------------------

def _req(cfg, uid, choices=None, seed=0, budget=12, **kw):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=budget,
                   choices=choices, **kw)


CHOICES = [[5], [6, 7], [6, 7, 8], [9, 10, 11, 12]]


def _run_choices(cfg, params, k, seeds, choices=CHOICES, paged=False,
                 mix_free=False, **req_kw):
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    if paged:
        engine = PagedServingEngine(params, cfg, num_slots=8, page_size=16,
                                    eos_token_id=EOS, seed=23)
    else:
        engine = ServingEngine(params, cfg, num_slots=8, eos_token_id=EOS,
                               seed=23)
    reqs = [_req(cfg, j, choices=choices, seed=s, **req_kw)
            for j, s in enumerate(seeds)]
    if mix_free:
        reqs.append(_req(cfg, len(seeds), None, seed=77, budget=6))
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=k)
    return engine, {r.uid: list(r.tokens) for r in reqs}


def _strip_eos(toks):
    return [t for t in toks if t != EOS]


def test_choice_device_path_matches_host(tiny):
    cfg, params = tiny
    _, dev = _run_choices(cfg, params, k=4, seeds=[0, 1, 2, 3])
    _, host = _run_choices(cfg, params, k=1, seeds=[0, 1, 2, 3])
    assert dev == host
    for toks in dev.values():
        assert _strip_eos(toks) in CHOICES  # a complete choice, always


def test_choice_device_path_shares_one_table(tiny):
    """Same-choice batches intern ONE ChoiceTable; the engine's device
    setup accepts it (the whole point: MC batches stay in the k-loop)."""
    cfg, params = tiny
    engine, _ = _run_choices(cfg, params, k=4, seeds=[0, 1])
    assert len(engine._choice_tables) == 1
    (table,) = engine._choice_tables.values()
    dt = device_table_for(table, cfg.lm.vocab_size)
    assert dt._n == len(table.trie.children) + 1


def test_choice_device_mixed_free_rows(tiny):
    cfg, params = tiny
    _, dev = _run_choices(cfg, params, k=4, seeds=[4, 5], mix_free=True)
    _, host = _run_choices(cfg, params, k=1, seeds=[4, 5], mix_free=True)
    assert dev == host


def test_choice_device_sampled(tiny):
    """Sampled choice rows ride the device scan; warm tables (prewarmed
    tries never freeze) make tokens bit-identical to host stepping."""
    cfg, params = tiny
    _, dev = _run_choices(cfg, params, k=4, seeds=[6, 7], temperature=0.9)
    _, host = _run_choices(cfg, params, k=1, seeds=[6, 7], temperature=0.9)
    assert dev == host
    for toks in dev.values():
        assert _strip_eos(toks) in CHOICES


def test_choice_device_paged(tiny):
    cfg, params = tiny
    _, dev = _run_choices(cfg, params, k=4, seeds=[8, 9], paged=True)
    _, host = _run_choices(cfg, params, k=1, seeds=[8, 9], paged=True)
    assert dev == host
    _, dense = _run_choices(cfg, params, k=4, seeds=[8, 9])
    assert dev == dense


def test_combined_table_rebasing():
    """CombinedDeviceTable invariants: member pools concatenated with
    next_sid shifted into the global sid space (negative sentinels kept)
    and sid2slot into the global slot space (-1 kept); global slot 0
    stays the FREE row."""
    from videollamb_tpu.serve.device_grammar import (
        DEAD,
        combined_table_for,
        device_table_for,
    )

    t1 = ChoiceTable(TokenTrie([[5], [6, 7]]), eos_token_id=EOS)
    t2 = ChoiceTable(TokenTrie([[9, 10], [11]]), eos_token_id=EOS)
    d1 = device_table_for(t1, 16)
    d2 = device_table_for(t2, 16)
    ct = combined_table_for([d1, d2])
    assert list(ct.slot_base) == [0, d1.cap]
    assert list(ct.sid_base) == [0, d1.sid_cap]
    costs = np.asarray(ct.costs)
    np.testing.assert_array_equal(costs[: d1.cap], np.asarray(d1.costs))
    np.testing.assert_array_equal(costs[d1.cap:], np.asarray(d2.costs))
    nxt = np.asarray(ct.next_sid)
    n2 = np.asarray(d2.next_sid)
    shifted = np.where(n2 < 0, n2, n2 + d1.sid_cap)
    np.testing.assert_array_equal(nxt[d1.cap:], shifted)
    s2s = np.asarray(ct.sid2slot)
    m2 = np.asarray(d2.sid2slot)
    np.testing.assert_array_equal(
        s2s[d1.sid_cap:], np.where(m2 < 0, m2, m2 + d1.cap))
    # Global FREE row: everything allowed, all transitions DEAD.
    assert (costs[0] == 0).all() and (nxt[0] == DEAD).all()
    # Upload a fresh state on a member AFTER combining -> refresh folds
    # it in (the engine recombines every sync).
    ct2 = combined_table_for([d1, d2])
    assert ct2 is ct  # cached per member tuple


def test_mixed_choice_signatures_ride_device_scan(tiny):
    """Two DIFFERENT choice sets in one batch ride ONE combined device
    table (VERDICT r4 #5 — this was the last host-path decode class);
    k-step tokens match per-step host stepping exactly (tries are
    prewarmed, so the scan never freezes)."""
    from videollamb_tpu.serve.device_grammar import CombinedDeviceTable
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny

    def run(k):
        engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS)
        r1 = _req(cfg, 0, choices=[[5], [6, 7]], seed=0)
        r2 = _req(cfg, 1, choices=[[9, 10], [11]], seed=1)
        r3 = _req(cfg, 2, choices=None, seed=77, budget=6)  # free row
        for r in (r1, r2, r3):
            engine.submit(r)
        engine._admit()
        setup = engine._grammar_device_setup()
        assert setup is not None
        if k > 1:
            assert isinstance(setup[0], CombinedDeviceTable)
        engine.run_until_drained(k=k)
        return {r.uid: list(r.tokens) for r in (r1, r2, r3)}

    dev, host = run(4), run(1)
    assert dev == host
    assert _strip_eos(dev[0]) in ([5], [6, 7])
    assert _strip_eos(dev[1]) in ([9, 10], [11])


@pytest.mark.parametrize("paged", [False, True])
def test_mixed_grammar_and_choices_device_parity(tiny, paged):
    """JSON mode + a choice set in flight together stay in the device
    scan. Grammar tables freeze on first-visit states, so cold runs may
    clip a sync short — every run uploads what it saw, so repeated runs
    converge to the exact host-path stream (the round-3 convergence bar)."""
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny

    def run(k):
        if paged:
            engine = PagedServingEngine(params, cfg, num_slots=4,
                                        page_size=16, eos_token_id=EOS,
                                        seed=31)
        else:
            engine = ServingEngine(params, cfg, num_slots=4,
                                   eos_token_id=EOS, seed=31)
        rg = _grammar_req(cfg, 0, seed=2)
        rc = _req(cfg, 1, choices=[[9, 10], [11]], seed=3)
        engine.submit(rg)
        engine.submit(rc)
        engine.run_until_drained(k=k)
        return {0: list(rg.tokens), 1: list(rc.tokens)}

    host = run(1)
    dev = None
    for _ in range(12):
        dev = run(4)
        if dev == host:
            break
    assert dev == host
    assert isinstance(json.loads(_decode(dev[0])), dict)
    assert _strip_eos(dev[1]) in ([9, 10], [11])


def test_mixed_tables_sampled_device(tiny):
    """Sampled rows over two different choice tables: prewarmed tries
    never freeze, so the combined-table scan is bit-identical to host
    stepping even with temperature."""
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny

    def run(k):
        engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS,
                               seed=23)
        r1 = _req(cfg, 0, choices=[[5], [6, 7]], seed=4, temperature=0.9)
        r2 = _req(cfg, 1, choices=[[9, 10], [11]], seed=5, temperature=0.8)
        engine.submit(r1)
        engine.submit(r2)
        engine.run_until_drained(k=k)
        return {0: list(r1.tokens), 1: list(r2.tokens)}

    assert run(4) == run(1)


# ---------------------------------------------------------------------------
# Grammar + sampling controls in one device scan
# ---------------------------------------------------------------------------

def _grammar_req(cfg, uid, seed=0, budget=12, **kw):
    from videollamb_tpu.serve.grammar import json_constraint

    class _Tok:
        eos_token_id = EOS

    strs = _token_strs(cfg.lm.vocab_size)
    return _req(cfg, uid, choices=None, seed=seed, budget=budget,
                grammar=json_constraint(_Tok(), token_strs=strs), **kw)


def _run_grammar_controls(cfg, params, k, seeds, paged=False, **req_kw):
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import ServingEngine

    if paged:
        engine = PagedServingEngine(params, cfg, num_slots=4, page_size=16,
                                    eos_token_id=EOS, seed=31)
    else:
        engine = ServingEngine(params, cfg, num_slots=4, eos_token_id=EOS,
                               seed=31)
    reqs = [_grammar_req(cfg, j, seed=s, **req_kw)
            for j, s in enumerate(seeds)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=k)
    return {r.uid: list(r.tokens) for r in reqs}


@pytest.mark.parametrize("paged", [False, True])
def test_grammar_with_penalties_device_parity(tiny, paged):
    """JSON mode + frequency/presence penalties runs in the k-step scan
    (VERDICT r3 #6), token-identical to per-step host stepping. The
    grammar table is fresh per run, so freeze/rewind composes with the
    carried counts too."""
    cfg, params = tiny
    kw = dict(frequency_penalty=0.7, presence_penalty=0.3)
    dev = _run_grammar_controls(cfg, params, k=4, seeds=[0, 1], paged=paged,
                                **kw)
    host = _run_grammar_controls(cfg, params, k=1, seeds=[0, 1], paged=paged,
                                 **kw)
    assert dev == host
    for toks in dev.values():
        assert isinstance(json.loads(_decode(toks)), dict)


def test_grammar_with_bias_and_min_tokens_device_parity(tiny):
    cfg, params = tiny
    kw = dict(logit_bias={3: 4.0, 7: -6.0}, min_tokens=4)
    dev = _run_grammar_controls(cfg, params, k=4, seeds=[2, 3], **kw)
    host = _run_grammar_controls(cfg, params, k=1, seeds=[2, 3], **kw)
    assert dev == host


def test_grammar_controls_sampled_device_parity(tiny):
    """Temperature + penalties + grammar, all in one scan. Sampled
    freezes consume rng splits (the documented cold-table caveat), so
    cold runs may diverge — but every run uploads its divergent states,
    so repeated runs converge to the exact host-path stream (same
    convergence bar as the round-3 sampled grammar test)."""
    cfg, params = tiny
    kw = dict(frequency_penalty=0.5, temperature=0.8)
    host = _run_grammar_controls(cfg, params, k=1, seeds=[4, 5], **kw)
    dev = None
    for _ in range(12):
        dev = _run_grammar_controls(cfg, params, k=4, seeds=[4, 5], **kw)
        if dev == host:
            break
    assert dev == host
    for toks in dev.values():
        assert isinstance(json.loads(_decode(toks)), dict)


def test_grammar_controls_with_logprobs(tiny):
    """Grammar + controls + logprob extraction ride the same scan; the
    reported logprobs are the base distribution, equal to host stepping."""
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny

    def run(k):
        engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS,
                               seed=31)
        r = _grammar_req(cfg, 0, seed=6, frequency_penalty=0.4)
        r.logprobs = True
        r.top_logprobs = 3
        engine.submit(r)
        engine.run_until_drained(k=k)
        return r

    dev, host = run(4), run(1)
    assert dev.tokens == host.tokens
    assert len(dev.token_logprobs) == len(dev.tokens)
    np.testing.assert_allclose(dev.token_logprobs, host.token_logprobs,
                               rtol=1e-4, atol=1e-5)


def test_choice_with_controls_device_parity(tiny):
    """Choices + logit_bias: the combined scan covers choice tables too."""
    cfg, params = tiny
    kw = dict(logit_bias={6: 3.0})
    _, dev = _run_choices(cfg, params, k=4, seeds=[10, 11], **kw)
    _, host = _run_choices(cfg, params, k=1, seeds=[10, 11], **kw)
    assert dev == host
    for toks in dev.values():
        assert _strip_eos(toks) in CHOICES
