"""Structured outputs (serve/schema.py): the schema machine accepts
exactly schema-valid documents (strict ordered-property semantics), the
closing-cost invariant holds on every reachable state of many schemas,
forced closing always lands schema-valid JSON, and the engines emit
schema-valid output under any budget."""

import json

import jsonschema
import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.grammar import GrammarConstraint, GrammarTable
from videollamb_tpu.serve.schema import (
    SchemaError,
    SchemaMachine,
    compile_schema,
    schema_constraint,
)


def machine(schema, max_depth=16):
    return SchemaMachine(compile_schema(schema), max_depth=max_depth)


def walk(m, s):
    st = m.start
    for ch in s:
        st = m.step(st, ch)
        if st is None:
            return None
    return st


def accepts(m, text):
    st = walk(m, text)
    return st is not None and m.cost(st) == 0


WEATHER = {
    "type": "object",
    "properties": {
        "city": {"type": "string"},
        "temp_c": {"type": "number"},
        "humidity": {"type": "integer"},
        "conditions": {"type": "string",
                       "enum": ["sunny", "cloudy", "rain"]},
        "alerts": {"type": "array", "items": {"type": "string"},
                   "maxItems": 3},
    },
    "required": ["city", "temp_c", "conditions"],
    "additionalProperties": False,
}

NESTED = {
    "type": "object",
    "properties": {
        "id": {"type": "integer"},
        "tags": {"type": "array", "items": {"type": "string"},
                 "minItems": 1, "maxItems": 4},
        "meta": {
            "type": "object",
            "properties": {
                "score": {"type": "number"},
                "ok": {"type": "boolean"},
            },
            "required": ["score"],
        },
        "note": {"anyOf": [{"type": "string"}, {"type": "null"}]},
    },
    "required": ["id", "tags", "meta"],
}

REFS = {
    "type": "object",
    "properties": {
        "a": {"$ref": "#/$defs/point"},
        "b": {"$ref": "#/$defs/point"},
    },
    "required": ["a", "b"],
    "$defs": {
        "point": {
            "type": "object",
            "properties": {"x": {"type": "number"}, "y": {"type": "number"}},
            "required": ["x", "y"],
        }
    },
}

FREE = {
    "type": "object",
    "properties": {"name": {"type": "string"}, "payload": True},
    "required": ["name", "payload"],
}


def dumps(obj, **kw):
    return json.dumps(obj, **kw)


@pytest.mark.parametrize("schema,obj", [
    (WEATHER, {"city": "Oslo", "temp_c": -3.5, "conditions": "rain"}),
    (WEATHER, {"city": "x", "temp_c": 0, "humidity": 85,
               "conditions": "sunny", "alerts": ["flood", "wind"]}),
    (WEATHER, {"city": "", "temp_c": 1e3, "conditions": "cloudy",
               "alerts": []}),
    (NESTED, {"id": 7, "tags": ["a"], "meta": {"score": 0.5, "ok": True},
              "note": None}),
    (NESTED, {"id": -1, "tags": ["a", "b", "c", "d"],
              "meta": {"score": 2}, "note": "hi"}),
    (REFS, {"a": {"x": 1, "y": 2}, "b": {"x": -0.5, "y": 0}}),
    (FREE, {"name": "n", "payload": {"any": [1, "x", {"deep": None}]}}),
    (FREE, {"name": "n", "payload": 42}),
])
def test_accepts_valid_instances(schema, obj):
    m = machine(schema)
    jsonschema.validate(obj, schema)  # sanity: really schema-valid
    for text in (dumps(obj), dumps(obj, indent=1),
                 dumps(obj, separators=(",", ":"))):
        assert accepts(m, text), text


@pytest.mark.parametrize("schema,text", [
    (WEATHER, '{"city": 3, "temp_c": 1, "conditions": "rain"}'),  # type
    (WEATHER, '{"city": "x", "conditions": "rain"}'),       # missing required
    (WEATHER, '{"city": "x", "temp_c": 1, "conditions": "fog"}'),  # enum
    (WEATHER, '{"temp_c": 1, "city": "x", "conditions": "rain"}'),  # order
    (WEATHER, '{"city": "x", "temp_c": 1, "conditions": "rain", "z": 1}'),
    (WEATHER, '{"city": "x", "temp_c": 1, "conditions": "rain", '
              '"alerts": ["a", "b", "c", "d"]}'),           # maxItems
    (WEATHER, '{"city": "x", "humidity": 1.5, "temp_c": 1, '
              '"conditions": "rain"}'),                     # order again
    (NESTED, '{"id": 1.5, "tags": ["a"], "meta": {"score": 1}}'),  # int
    (NESTED, '{"id": 1, "tags": [], "meta": {"score": 1}}'),  # minItems
    (NESTED, '{"id": 1, "tags": ["a"], "meta": {"ok": true}}'),  # nested req
    (NESTED, '{"id": 1, "tags": ["a"], "meta": {"score": 1}, "note": 3}'),
    (REFS, '{"a": {"x": 1}, "b": {"x": 1, "y": 2}}'),
])
def test_rejects_invalid_instances(schema, text):
    assert not accepts(machine(schema), text), text


def test_integer_rejects_fraction_and_exponent():
    m = machine({"type": "object", "properties": {"n": {"type": "integer"}},
                 "required": ["n"]})
    assert accepts(m, '{"n": 12}')
    assert accepts(m, '{"n": -40}')
    assert not accepts(m, '{"n": 1.5}')
    assert not accepts(m, '{"n": 1e3}')
    assert not accepts(m, '{"n": 01}')


@pytest.mark.parametrize("schema,match", [
    ({"type": "object", "properties": {"a": {"type": "string"}},
      "required": ["b"]}, "missing from properties"),
    ({"type": "object", "additionalProperties": True}, "additionalProperties"),
    ({"anyOf": [{"type": "number"}, {"type": "integer"}]}, "ambiguous"),
    ({"enum": [1, 12]}, "prefix-ambiguous"),
    ({"enum": [{"a": 1}]}, "containers"),
    ({"enum": []}, "empty enum"),
    ({"type": "array", "minItems": 3, "maxItems": 1}, "maxItems"),
    ({"type": "object", "properties": {'a"b': {"type": "string"}}},
     "escaping"),
    ({"$ref": "#/$defs/x", "$defs": {"x": {"$ref": "#/$defs/x"}}},
     "recursive"),
    ({"$ref": "#/nope"}, "unresolvable"),
    ({"type": "frob"}, "unsupported type"),
])
def test_compile_rejects_unsupported(schema, match):
    with pytest.raises(SchemaError, match=match):
        compile_schema(schema)


def test_nullable_union_dispatch():
    m = machine({"type": ["string", "null"]})
    assert accepts(m, '"x"')
    assert accepts(m, "null")
    assert not accepts(m, "1")


# ----------------------------------------------------------------------
# The closing-cost invariant, per schema


def _alphabet(schema):
    base = set('{}[]":, \t0123456789.-+eE' + "truefalsn" + '\\/bu' + "xq")
    cs = compile_schema(schema)
    for node in cs.nodes:
        if node[0] == "object":
            for name, _, _ in node[1]:
                base |= set(name)
        elif node[0] == "enum":
            for t in node[1]:
                base |= set(t)
    return sorted(base)


def _reachable(m, alphabet, cap=6000):
    seen = {m.start}
    frontier = [m.start]
    while frontier and len(seen) < cap:
        st = frontier.pop()
        for ch in alphabet:
            nxt = m.step(st, ch)
            if nxt is not None and nxt not in seen:
                seen.add(nxt)
                frontier.append(nxt)
    return seen


@pytest.mark.parametrize("schema", [WEATHER, NESTED, REFS, FREE])
def test_closing_invariant(schema):
    m = machine(schema, max_depth=6)
    alphabet = _alphabet(schema)
    states = _reachable(m, alphabet)
    assert len(states) > 50  # the BFS really explored
    for st in states:
        c = m.cost(st)
        if c == 0:
            assert m.closing_char(st) is None
            continue
        ch = m.closing_char(st)
        assert ch is not None, st
        nxt = m.step(st, ch)
        assert nxt is not None, (st, ch)
        assert m.cost(nxt) == c - 1, (st, ch, nxt, m.cost(nxt), c)


@pytest.mark.parametrize("schema", [WEATHER, NESTED, REFS, FREE])
def test_forced_closing_is_schema_valid(schema):
    rng = np.random.default_rng(0)
    m = machine(schema, max_depth=6)
    alphabet = _alphabet(schema)
    for trial in range(120):
        st, text = m.start, ""
        for _ in range(int(rng.integers(1, 50))):
            chs = [c for c in alphabet if m.step(st, c) is not None]
            ch = chs[int(rng.integers(len(chs)))]
            st, text = m.step(st, ch), text + ch
        while m.cost(st) > 0:
            ch = m.closing_char(st)
            st, text = m.step(st, ch), text + ch
        obj = json.loads(text)
        jsonschema.validate(obj, schema)


# ----------------------------------------------------------------------
# Token tables + engines

EOS = 2


def _token_strs(schema, v=256):
    """Single chars for the whole alphabet + a few multi-char pieces."""
    strs = [None] * v
    i = 3
    for ch in _alphabet(schema):
        strs[i] = ch
        i += 1
    for piece in ('": ', ', "', '{"', '"}', "null", "true", "false",
                  '"sunny"', "12", "0.5", "-3", '"a", "b"'):
        strs[i] = piece
        i += 1
    return strs


def _decode(strs, tokens):
    return "".join(strs[t] for t in tokens if t != EOS)


@pytest.mark.parametrize("schema", [WEATHER, NESTED])
def test_budget_adversarial_closure(schema):
    strs = _token_strs(schema)
    table = GrammarTable(strs, EOS, machine(schema))
    min_need = table.min_tokens
    for budget in range(min_need, min_need + 25, 3):
        c = GrammarConstraint(table)
        toks = []
        while not c.finished and len(toks) < budget:
            c.set_remaining(budget - len(toks))
            m = c.mask(256)
            ids = np.nonzero(m)[0]
            assert len(ids), (budget, toks)
            ids = [i for i in ids if i != EOS] or [EOS]
            allowed, ends, cst = table.expand(c.node)
            costs = [int(cst[np.searchsorted(allowed, i)]) for i in ids]
            pick = int(ids[int(np.argmax(costs))])
            toks.append(pick)
            c.advance(pick)
        text = _decode(strs, toks)
        obj = json.loads(text)
        jsonschema.validate(obj, schema)
        assert len(toks) <= budget


def test_schema_constraint_caches_by_schema():
    class Tok:
        eos_token_id = EOS

    tok = Tok()
    strs = _token_strs(WEATHER)
    c1 = schema_constraint(tok, WEATHER, token_strs=strs)
    c2 = schema_constraint(tok, WEATHER, token_strs=strs)
    c3 = schema_constraint(tok, NESTED, token_strs=_token_strs(NESTED))
    assert c1.table is c2.table
    assert c1.table is not c3.table


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


def _req(cfg, uid, grammar, temperature=0.0, seed=0, budget=48):
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


def test_engine_emits_schema_valid_output(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    strs = _token_strs(WEATHER, cfg.lm.vocab_size)
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS, seed=5)
    reqs = [_req(cfg, uid,
                 schema_constraint(_Tok(), WEATHER, token_strs=strs),
                 temperature=(0.0 if uid % 2 else 1.3), seed=uid)
            for uid in range(4)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for r in reqs:
        text = _decode(strs, r.tokens)
        obj = json.loads(text)
        jsonschema.validate(obj, WEATHER)


def test_paged_engine_schema_with_tight_budget(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    strs = _token_strs(NESTED, cfg.lm.vocab_size)
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=EOS)
    con = schema_constraint(_Tok(), NESTED, token_strs=strs)
    req = _req(cfg, 0, con, seed=3, budget=con.min_tokens + 4)
    engine.submit(req)
    engine.run_until_drained()
    obj = json.loads(_decode(strs, req.tokens))
    jsonschema.validate(obj, NESTED)


def test_openai_json_schema_routing():
    from videollamb_tpu.serve.openai_api import BadRequest, _common_params

    row = {}
    _common_params({"response_format": {
        "type": "json_schema",
        "json_schema": {"name": "w", "schema": WEATHER, "strict": True},
    }}, row)
    assert row["response_format"] == {"type": "json_schema",
                                      "schema": WEATHER}
    with pytest.raises(BadRequest, match="unsupported json_schema"):
        _common_params({"response_format": {
            "type": "json_schema",
            "json_schema": {"schema": {"type": "object",
                                       "additionalProperties": True}},
        }}, {})
    with pytest.raises(BadRequest, match="schema is required"):
        _common_params({"response_format": {"type": "json_schema"}}, {})


def test_build_requests_wires_schema_grammar(tiny):
    from types import SimpleNamespace

    from videollamb_tpu.serve.batch_cli import build_requests

    schema = {"type": "object", "properties": {"q": {"type": "integer"}},
              "required": ["q"]}

    class CharTok:
        eos_token_id = EOS
        bos_token_id = 1
        vocab_size = 256
        all_special_ids = [0, 1, 2]

        def __init__(self):
            self.strs = _token_strs(schema)

        def convert_ids_to_tokens(self, ids):
            return [self.strs[i] or "" for i in ids]

        def __call__(self, text):
            rev = {s: i for i, s in enumerate(self.strs)
                   if s and len(s) == 1}
            r = SimpleNamespace()
            r.input_ids = [1] + [rev.get(ch, 3) for ch in text]
            return r

    chat = SimpleNamespace(tokenizer=CharTok(), text_bucket=16)
    rows = [{"id": 0, "prompt": "go", "raw": True, "max_new_tokens": 12,
             "response_format": {"type": "json_schema", "schema": schema}}]
    reqs = build_requests(rows, chat)
    assert reqs[0].grammar is not None
    assert reqs[0].grammar.min_tokens == len('{"q":0}')
