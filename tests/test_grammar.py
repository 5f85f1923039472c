"""Grammar-constrained JSON decoding (serve/grammar.py): the char machine
accepts exactly valid JSON, the closing-cost invariant holds on every
reachable state, masks filter the vocab correctly, and the engines emit
parseable JSON under any budget — greedy or sampled."""

import json

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.grammar import (
    GrammarConstraint,
    GrammarTable,
    JsonMachine,
    json_constraint,
    token_strings,
)


def walk(machine, s, st=None):
    st = machine.start if st is None else st
    for ch in s:
        st = machine.step(st, ch)
        if st is None:
            return None
    return st


# ----------------------------------------------------------------------
# Character machine


VALID_OBJECTS = [
    {}, {"a": 1}, {"a": [1, 2, {"b": None}]},
    {"s": 'quote " and \\ backslash', "n": -0.5e-3, "t": True, "f": False},
    {"nested": {"x": {"y": [[], {}, [0]]}}},
    {"unicode": "é中"},
]


@pytest.mark.parametrize("obj", VALID_OBJECTS)
def test_machine_accepts_valid_objects(obj):
    m = JsonMachine()
    for text in (json.dumps(obj), json.dumps(obj, indent=2),
                 json.dumps(obj, separators=(",", ":"))):
        st = walk(m, text)
        assert st is not None and m.cost(st) == 0, text


@pytest.mark.parametrize("text", [
    "1", "[1]", '"s"', "true",            # json_object: top must be object
    "{,}", '{"a":}', '{"a" 1}', "{'a':1}", '{"a":01}', '{"a":1,}',
    '{"a":1}}', '{"a":+1}', '{"a":.5}', '{"a":1.}', '{"a":1e}',
    '{"a":tru}', '{"a":truee}', '{"a":"\\x"}', '{"a":"\\u12g"}',
    '{"a":"' + chr(0x1F) + '"}', '{"a":[1,]}', '{"a":[,]}',
    '{"a":1 "b":2}', '{"a":1}{',
])
def test_machine_rejects_invalid(text):
    m = JsonMachine()
    st = walk(m, text)
    assert st is None or m.cost(st) > 0, text


def test_generic_mode_accepts_any_value():
    m = JsonMachine(top_object=False)
    for text in ("1", "-2.5e3", '"s"', "true", "null", "[1,2]", "{}"):
        st = walk(m, text)
        assert st is not None and m.cost(st) == 0, text
    # json_object's minimal completion is one object, generic's one scalar.
    assert JsonMachine().cost(JsonMachine().start) == 2
    assert m.cost(m.start) == 1


def test_depth_bound():
    m = JsonMachine(max_depth=3)
    assert walk(m, '{"a":[[') is not None
    assert walk(m, '{"a":[[[') is None  # would be depth 4
    assert walk(m, '{"a":[[1,2],[3]]}') is not None


_ALPHABET = ('{}[]":, \t\n0123456789.-+eE' "truefalsn" '\\/bru' "xX")


def _reachable_states(machine, cap=4000):
    seen = {machine.start}
    frontier = [machine.start]
    while frontier and len(seen) < cap:
        st = frontier.pop()
        for ch in _ALPHABET:
            nxt = machine.step(st, ch)
            if nxt is not None and nxt not in seen:
                seen.add(nxt)
                frontier.append(nxt)
    return seen


@pytest.mark.parametrize("top_object", [True, False])
def test_closing_invariant_on_all_reachable_states(top_object):
    """The inductive heart of the budget guarantee: from every reachable
    state, the closing char lowers cost by exactly 1, so cost(st) chars
    always complete the document."""
    m = JsonMachine(top_object=top_object, max_depth=4)
    states = _reachable_states(m)
    assert len(states) > 200  # the BFS really explored
    for st in states:
        c = m.cost(st)
        if c == 0:
            assert m.closing_char(st) is None
            continue
        ch = m.closing_char(st)
        nxt = m.step(st, ch)
        assert nxt is not None, (st, ch)
        assert m.cost(nxt) == c - 1, (st, ch, nxt)


def test_forced_closing_produces_parseable_json():
    rng = np.random.default_rng(0)
    m = JsonMachine(max_depth=5)
    for trial in range(200):
        st, text = m.start, ""
        for _ in range(int(rng.integers(1, 60))):
            chs = [c for c in _ALPHABET if m.step(st, c) is not None]
            ch = chs[int(rng.integers(len(chs)))]
            st, text = m.step(st, ch), text + ch
        # Force-close: append the minimal completion.
        while m.cost(st) > 0:
            ch = m.closing_char(st)
            st, text = m.step(st, ch), text + ch
        obj = json.loads(text)
        assert isinstance(obj, dict), text


# ----------------------------------------------------------------------
# Token tables / masks

EOS = 2
PIECES = {
    3: "{", 4: "}", 5: "[", 6: "]", 7: '"', 8: ":", 9: ",", 10: " ",
    11: "0", 12: "1", 13: "7", 14: "-", 15: ".", 16: "e", 17: "+",
    18: "true", 19: "false", 20: "null", 21: "t", 22: "r", 23: "u",
    24: "a", 25: "l", 26: "s", 27: "n", 28: "f",
    29: '"name"', 30: '": ', 31: ', "', 32: "abc", 33: "xyz",
    34: '{"', 35: '"}', 36: "\\", 37: "\\n", 38: "A", 39: "B",
    40: "12", 41: "3",
}


def _token_strs(v=256):
    strs = [None] * v
    for i, s in PIECES.items():
        strs[i] = s
    return strs


def _decode(tokens):
    return "".join(PIECES[t] for t in tokens if t != EOS)


def test_table_masks_follow_grammar():
    table = GrammarTable(_token_strs(64), EOS)
    c = GrammarConstraint(table)
    allowed = set(np.nonzero(c.mask(64))[0].tolist())
    # json_object start: only '{'-opening tokens (and whitespace).
    assert {3, 34, 10} <= allowed          # '{', '{"', ' '
    assert not {5, 7, 18, 11} & allowed    # '[', '"', 'true', '0' at top
    c.advance(34)  # '{"' -> inside a key string
    allowed = set(np.nonzero(c.mask(64))[0].tolist())
    assert {32, 7, 3} <= allowed  # 'abc' content, '"' key end, '{' content
    assert 35 not in allowed      # '"}': '}' lands where ':' is required
    c.advance(32)
    c.advance(7)  # key "abc" closed -> expecting ':'
    allowed = set(np.nonzero(c.mask(64))[0].tolist())
    assert {8, 10} <= allowed and 7 not in allowed  # ':' / ws, not '"'


def test_table_requires_closable_vocab():
    strs = _token_strs(64)
    strs[4] = None  # drop the single '}' token
    with pytest.raises(ValueError, match="forced JSON closing"):
        GrammarTable(strs, EOS)


def test_mask_allows_eos_only_when_complete():
    table = GrammarTable(_token_strs(64), EOS)
    c = GrammarConstraint(table)
    assert not c.mask(64)[EOS]
    for t in (3, 7, 24, 7, 8, 11):  # {"a":0
        c.advance(t)
    assert _decode([3, 7, 24, 7, 8, 11]) == '{"a":0'
    assert not c.mask(64)[EOS]  # still open
    c.advance(4)  # }
    assert c.finished


def test_budget_filter_forces_adversarial_closure():
    """Pick the WORST (highest closing cost) allowed token each step; the
    budget filter must still land complete JSON within the budget."""
    table = GrammarTable(_token_strs(64), EOS)
    for budget in range(2, 15):
        c = GrammarConstraint(table)
        toks = []
        while not c.finished and len(toks) < budget:
            c.set_remaining(budget - len(toks))
            m = c.mask(64)
            ids = np.nonzero(m)[0]
            assert len(ids), (budget, toks)
            ids = [i for i in ids if i != EOS] or [EOS]
            costs = []
            for i in ids:
                allowed, ends, cst = table.expand(c.node)
                pos = int(np.searchsorted(allowed, i))
                costs.append(int(cst[pos]))
            pick = int(ids[int(np.argmax(costs))])
            toks.append(pick)
            c.advance(pick)
        text = _decode(toks)
        obj = json.loads(text)
        assert isinstance(obj, dict), (budget, text)
        assert len(toks) <= budget


def _fake_tok(table):
    class FakeTok:
        vocab_size = len(table)
        eos_token_id = 2
        all_special_ids = [0, 1, 2]

        def convert_ids_to_tokens(self, ids):
            return [table[i] for i in ids]

    return FakeTok()


def test_token_strings_sentencepiece_pieces():
    strs = token_strings(_fake_tok(
        ["<pad>", "<s>", "</s>", "▁the", "<0x41>", "<0xC3>", "é"]))
    assert strs[0] is None and strs[1] is None and strs[2] is None
    assert strs[3] == " the"
    assert strs[4] == "A"
    assert strs[5] is None  # non-ASCII byte fragment
    assert strs[6] == "é"   # direct non-ASCII piece is fine


def test_token_strings_byte_level_pieces():
    # 'Ġ'/'Ċ' mark a byte-level vocab: decode through the GPT-2
    # bytes_to_unicode inverse, drop partial UTF-8 fragments.
    strs = token_strings(_fake_tok(
        ["<pad>", "<s>", "</s>", "Ġword", "Ċ", "Ã©", "Ã", "▁added"]))
    assert strs[3] == " word"
    assert strs[4] == "\n"
    assert strs[5] == "é"    # 0xC3 0xA9 -> valid UTF-8
    assert strs[6] is None   # lone 0xC3: partial multi-byte
    assert strs[7] is None   # '▁' is outside the byte-level alphabet


def test_json_constraint_caches_table():
    class Tok:
        eos_token_id = EOS

    tok = Tok()
    c1 = json_constraint(tok, token_strs=_token_strs(64))
    c2 = json_constraint(tok, token_strs=_token_strs(64))
    assert c1.table is c2.table  # shared transitions
    assert c1 is not c2          # fresh cursor per request
    assert c1.min_tokens == 2


# ----------------------------------------------------------------------
# Engine integration


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


def _req(cfg, uid, *, grammar=None, temperature=0.0, seed=0, budget=12):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=budget,
                   temperature=temperature, grammar=grammar)


class _Tok:
    eos_token_id = EOS


def test_engine_greedy_emits_valid_json(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    tok = _Tok()
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS)
    reqs = [_req(cfg, uid, seed=uid, budget=10,
                 grammar=json_constraint(tok, token_strs=_token_strs(
                     cfg.lm.vocab_size)))
            for uid in range(3)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)  # k>1: constrained rows force k=1
    for r in reqs:
        text = _decode(r.tokens)
        obj = json.loads(text)
        assert isinstance(obj, dict), (r.uid, text)
        assert len(r.tokens) <= 10


def test_engine_sampled_emits_valid_json(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    tok = _Tok()
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS, seed=7)
    reqs = [_req(cfg, uid, seed=uid, temperature=1.5, budget=14,
                 grammar=json_constraint(tok, token_strs=_token_strs(
                     cfg.lm.vocab_size)))
            for uid in range(4)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained()
    for r in reqs:
        obj = json.loads(_decode(r.tokens))
        assert isinstance(obj, dict), (r.uid, _decode(r.tokens))


def test_paged_engine_emits_valid_json(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    tok = _Tok()
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=EOS)
    reqs = [_req(cfg, uid, seed=uid, budget=12,
                 grammar=json_constraint(tok, token_strs=_token_strs(
                     cfg.lm.vocab_size)))
            for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for r in reqs:
        obj = json.loads(_decode(r.tokens))
        assert isinstance(obj, dict)


def test_engine_extends_budget_to_minimal_object(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    tok = _Tok()
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    req = _req(cfg, 0, seed=3, budget=1,
               grammar=json_constraint(tok, token_strs=_token_strs(
                   cfg.lm.vocab_size)))
    engine.submit(req)
    engine.run_until_drained()
    obj = json.loads(_decode(req.tokens))
    assert isinstance(obj, dict)  # budget stretched to close the object


def test_grammar_and_choices_mutually_exclusive(tiny):
    cfg, _ = tiny
    tok = _Tok()
    g = json_constraint(tok, token_strs=_token_strs(cfg.lm.vocab_size))
    with pytest.raises(ValueError, match="mutually exclusive"):
        r = _req(cfg, 0, grammar=g)
        r.__class__(uid=1, batch=r.batch, grammar=g, choices=[[3]])


def test_build_requests_wires_grammar_end_to_end(tiny):
    """JSONL row with response_format -> Request.grammar -> engine emits
    valid JSON (the full batch-CLI/HTTP path minus the socket)."""
    from types import SimpleNamespace

    from videollamb_tpu.serve.batch_cli import build_requests
    from videollamb_tpu.serve.server import ServingEngine

    class CharTok:
        eos_token_id = EOS
        bos_token_id = 1
        vocab_size = 64
        all_special_ids = [0, 1, 2]

        def convert_ids_to_tokens(self, ids):
            return [PIECES.get(i) or "" for i in ids]

        def __call__(self, text):
            rev = {s: i for i, s in PIECES.items() if len(s) == 1}
            r = SimpleNamespace()
            r.input_ids = [1] + [rev.get(ch, 38) for ch in text]
            return r

    cfg, params = tiny
    chat = SimpleNamespace(tokenizer=CharTok(), text_bucket=16)
    rows = [{"id": 0, "prompt": "a: ", "raw": True, "max_new_tokens": 9,
             "response_format": "json_object"}]
    reqs = build_requests(rows, chat)
    assert reqs[0].grammar is not None

    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    engine.submit(reqs[0])
    engine.run_until_drained()
    obj = json.loads(_decode(reqs[0].tokens))
    assert isinstance(obj, dict)


def test_openai_response_format_routing():
    from videollamb_tpu.serve.openai_api import BadRequest, _common_params

    row = {}
    _common_params({"response_format": {"type": "json_object"},
                    "max_tokens": 32}, row)
    assert row["response_format"] == "json_object"
    row = {}
    _common_params({"response_format": {"type": "text"}}, row)
    assert "response_format" not in row
    with pytest.raises(BadRequest):
        _common_params({"response_format": {"type": "json_schema"}}, {})
