"""Tool calling (serve/tools.py + AltMachine): spec validation, prompt
injection, forced-call grammar (alternation over per-tool schemas,
invariant-fuzzed), response parsing, and the engine e2e."""

import json

import jsonschema
import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.grammar import GrammarConstraint, GrammarTable
from videollamb_tpu.serve.schema import (
    AltMachine,
    SchemaMachine,
    alternation_constraint,
    compile_schema,
)
from videollamb_tpu.serve.tools import (
    call_schema,
    call_schemas,
    parse_tool_call,
    render_assistant_tool_calls,
    render_tool_result,
    render_tools_system,
    validate_tools,
)

WEATHER_TOOL = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Current weather for a city",
        "parameters": {
            "type": "object",
            "properties": {
                "city": {"type": "string"},
                "unit": {"enum": ["c", "f"]},
            },
            "required": ["city"],
        },
    },
}

CALC_TOOL = {
    "type": "function",
    "function": {
        "name": "add",
        "parameters": {
            "type": "object",
            "properties": {"a": {"type": "number"}, "b": {"type": "number"}},
            "required": ["a", "b"],
        },
    },
}

TOOLS = [WEATHER_TOOL, CALC_TOOL]


def test_validate_tools_ok_and_errors():
    specs = validate_tools(TOOLS)
    assert [s["name"] for s in specs] == ["get_weather", "add"]
    with pytest.raises(ValueError, match="non-empty"):
        validate_tools([])
    with pytest.raises(ValueError, match="name is required"):
        validate_tools([{"type": "function", "function": {}}])
    with pytest.raises(ValueError, match="duplicate"):
        validate_tools([WEATHER_TOOL, WEATHER_TOOL])
    with pytest.raises(ValueError, match="parameters"):
        validate_tools([{"type": "function", "function": {
            "name": "x", "parameters": {"type": "object",
                                        "additionalProperties": True}}}])
    # No parameters -> empty-object schema (a no-arg tool).
    specs = validate_tools([{"type": "function", "function": {"name": "f"}}])
    assert specs[0]["parameters"] == {"type": "object", "properties": {}}


def test_render_tools_system_mentions_format_and_tools():
    text = render_tools_system(validate_tools(TOOLS))
    assert "get_weather" in text and "add" in text
    assert '"name"' in text and '"arguments"' in text


def test_call_schemas_and_unknown_name():
    specs = validate_tools(TOOLS)
    assert len(call_schemas(specs)) == 2
    only = call_schemas(specs, "add")
    assert len(only) == 1
    assert only[0]["properties"]["name"]["const"] == "add"
    with pytest.raises(ValueError, match="unknown tool"):
        call_schemas(specs, "nope")


def test_parse_tool_call():
    names = ["get_weather", "add"]
    got = parse_tool_call('{"name": "add", "arguments": {"a": 1, "b": 2}}',
                          names)
    assert got is not None and got[0] == "add"
    assert json.loads(got[1]) == {"a": 1, "b": 2}
    assert parse_tool_call("let me think...", names) is None
    assert parse_tool_call('{"name": "nope", "arguments": {}}', names) is None
    assert parse_tool_call('{"name": "add"}', names) is None
    assert parse_tool_call('{"name": "add", "arguments": 3}', names) is None
    assert parse_tool_call(
        '{"name": "add", "arguments": {}, "x": 1}', names) is None


def test_history_rendering():
    msg = {"role": "assistant", "tool_calls": [{
        "id": "call_1", "type": "function",
        "function": {"name": "add", "arguments": '{"a": 1, "b": 2}'}}]}
    text = render_assistant_tool_calls(msg)
    assert json.loads(text) == {"name": "add", "arguments": {"a": 1, "b": 2}}
    out = render_tool_result({"role": "tool", "content": "3"})
    assert out == "[tool result] 3"


# ----------------------------------------------------------------------
# Alternation machine over per-tool call schemas


def _alt_machine():
    specs = validate_tools(TOOLS)
    return AltMachine([SchemaMachine(compile_schema(s))
                       for s in call_schemas(specs)])


def walk(m, s):
    st = m.start
    for ch in s:
        st = m.step(st, ch)
        if st is None:
            return None
    return st


@pytest.mark.parametrize("text,ok", [
    ('{"name": "add", "arguments": {"a": 1, "b": -2.5}}', True),
    ('{"name": "get_weather", "arguments": {"city": "Oslo"}}', True),
    ('{"name": "get_weather", "arguments": {"city": "x", "unit": "c"}}', True),
    ('{"name": "add", "arguments": {"city": "Oslo"}}', False),  # cross-tool
    ('{"name": "get_weather", "arguments": {"a": 1, "b": 2}}', False),
    ('{"name": "mul", "arguments": {}}', False),                 # unknown
    ('{"name": "add", "arguments": {"a": 1}}', False),           # missing req
    ('{"name": "get_weather", "arguments": {"city": "x", "unit": "k"}}',
     False),                                                     # enum
])
def test_alternation_accepts_exactly_valid_calls(text, ok):
    m = _alt_machine()
    st = walk(m, text)
    got = st is not None and m.cost(st) == 0
    assert got == ok, text


def _alphabet():
    base = set('{}[]":, 0123456789.-') | set("truefalsn")
    base |= set("namearguments") | set("get_weatheraddcityunitab") | set("cf")
    return sorted(base)


def test_alternation_closing_invariant():
    m = _alt_machine()
    alphabet = _alphabet()
    seen = {m.start}
    frontier = [m.start]
    while frontier and len(seen) < 5000:
        st = frontier.pop()
        for ch in alphabet:
            nxt = m.step(st, ch)
            if nxt is not None and nxt not in seen:
                seen.add(nxt)
                frontier.append(nxt)
    assert len(seen) > 100
    for st in seen:
        c = m.cost(st)
        if c == 0:
            continue
        ch = m.closing_char(st)
        nxt = m.step(st, ch)
        assert nxt is not None, (st, ch)
        assert m.cost(nxt) == c - 1, (st, ch)


def test_alternation_forced_closing_yields_valid_call():
    rng = np.random.default_rng(1)
    m = _alt_machine()
    specs = validate_tools(TOOLS)
    by_name = {s["name"]: s["parameters"] for s in specs}
    alphabet = _alphabet()
    for trial in range(100):
        st, text = m.start, ""
        for _ in range(int(rng.integers(1, 45))):
            chs = [c for c in alphabet if m.step(st, c) is not None]
            ch = chs[int(rng.integers(len(chs)))]
            st, text = m.step(st, ch), text + ch
        while m.cost(st) > 0:
            ch = m.closing_char(st)
            st, text = m.step(st, ch), text + ch
        obj = json.loads(text)
        assert obj["name"] in by_name
        jsonschema.validate(obj["arguments"], by_name[obj["name"]])


# ----------------------------------------------------------------------
# OpenAI request conversion


def _chat_body(**extra):
    return {"messages": [{"role": "user", "content": "hi"}], **extra}


def test_row_tools_auto_and_none():
    from videollamb_tpu.serve.openai_api import row_from_chat_completions

    row, _, _ = row_from_chat_completions(_chat_body(tools=TOOLS), "m", [])
    assert "get_weather" in row["system_suffix"]
    assert row["_tools"] == {"names": ["get_weather", "add"], "forced": False}
    assert "response_format" not in row

    row, _, _ = row_from_chat_completions(
        _chat_body(tools=TOOLS, tool_choice="none"), "m", [])
    assert "_tools" not in row and "response_format" not in row
    assert "get_weather" in row["system_suffix"]  # still shown


def test_row_tools_required_and_named():
    from videollamb_tpu.serve.openai_api import row_from_chat_completions

    row, _, _ = row_from_chat_completions(
        _chat_body(tools=TOOLS, tool_choice="required"), "m", [])
    assert row["_tools"]["forced"]
    fmt = row["response_format"]
    assert fmt["type"] == "tool_call" and len(fmt["schemas"]) == 2

    row, _, _ = row_from_chat_completions(
        _chat_body(tools=TOOLS, tool_choice={
            "type": "function", "function": {"name": "add"}}), "m", [])
    assert len(row["response_format"]["schemas"]) == 1
    assert (row["response_format"]["schemas"][0]["properties"]["name"]
            ["const"] == "add")


def test_row_tools_errors():
    from videollamb_tpu.serve.openai_api import (
        BadRequest,
        row_from_chat_completions,
    )

    with pytest.raises(BadRequest, match="without tools"):
        row_from_chat_completions(
            _chat_body(tool_choice="required"), "m", [])
    with pytest.raises(BadRequest, match="unknown tool"):
        row_from_chat_completions(
            _chat_body(tools=TOOLS, tool_choice={
                "type": "function", "function": {"name": "zzz"}}), "m", [])
    with pytest.raises(BadRequest, match="cannot be combined"):
        row_from_chat_completions(
            _chat_body(tools=TOOLS, tool_choice="required",
                       response_format={"type": "json_object"}), "m", [])
    with pytest.raises(BadRequest, match="chat"):
        from videollamb_tpu.serve.openai_api import row_from_completions

        row_from_completions({"prompt": "x", "tools": TOOLS}, "m", [])


def test_tool_loop_conversation_mapping():
    """user -> assistant(tool_calls) -> tool result as the final message."""
    from videollamb_tpu.serve.openai_api import row_from_chat_completions

    body = {"messages": [
        {"role": "user", "content": "add 1 and 2"},
        {"role": "assistant", "tool_calls": [{
            "id": "call_0", "type": "function",
            "function": {"name": "add", "arguments": '{"a":1,"b":2}'}}]},
        {"role": "tool", "tool_call_id": "call_0", "content": "3"},
    ], "tools": TOOLS}
    row, _, _ = row_from_chat_completions(body, "m", [])
    assert row["prompt"] == "[tool result] 3"
    assert row["history"] == [["add 1 and 2",
                               '{"name": "add", "arguments": {"a": 1, "b": 2}}']]


def test_chat_response_with_tool_calls():
    from videollamb_tpu.serve.openai_api import chat_completion_response
    from videollamb_tpu.serve.tools import tool_calls_payload

    calls = tool_calls_payload("add", '{"a": 1}', "r1")
    out = chat_completion_response("r1", "m", "ignored", "stop",
                                   {"prompt_tokens": 1,
                                    "completion_tokens": 1,
                                    "total_tokens": 2},
                                   tool_calls=calls)
    choice = out["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    assert choice["message"]["content"] is None
    assert choice["message"]["tool_calls"][0]["function"]["name"] == "add"


# ----------------------------------------------------------------------
# Engine e2e: forced tool call

EOS = 2


def _token_strs(v=256):
    strs = [None] * v
    i = 3
    for ch in sorted(set('{}[]":, 0123456789.-') | set("truefalsn")
                     | set("namearguments") | set("get_weatheraddcityunitb")
                     | set("cf")):
        strs[i] = ch
        i += 1
    for piece in ('{"name": "', '", "arguments": {"', '": ', "}}", '"city"'):
        strs[i] = piece
        i += 1
    return strs


def test_engine_forced_tool_call_is_schema_valid():
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.server import Request, ServingEngine

    cfg = ModelConfig.tiny(max_length=64)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    specs = validate_tools(TOOLS)
    by_name = {s["name"]: s["parameters"] for s in specs}
    strs = _token_strs(cfg.lm.vocab_size)

    class Tok:
        eos_token_id = EOS

    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS, seed=11)
    reqs = []
    for uid in range(3):
        rng = np.random.default_rng(40 + uid)
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 6), jnp.int32),
            labels=None, videos=None, images=None)
        con = alternation_constraint(Tok(), call_schemas(specs),
                                     token_strs=strs)
        reqs.append(Request(uid=uid, batch=batch, max_new_tokens=40,
                            temperature=(1.2 if uid == 2 else 0.0),
                            grammar=con))
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for r in reqs:
        text = "".join(strs[t] for t in r.tokens if t != EOS)
        got = parse_tool_call(text, list(by_name))
        assert got is not None, (r.uid, text)
        name, args = got
        jsonschema.validate(json.loads(args), by_name[name])
