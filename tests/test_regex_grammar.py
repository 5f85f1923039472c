"""Regex-constrained decoding (serve/regex_grammar.py): the compiled DFA
matches Python ``re`` semantics on the supported subset, the closing-cost
invariant holds on every state, budgets force complete matches, and both
engines (including the k-step device grammar scan) emit only strings that
full-match the pattern."""

import re

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.grammar import GrammarConstraint, GrammarTable
from videollamb_tpu.serve.regex_grammar import (
    RegexError,
    RegexMachine,
    regex_constraint,
)


def _accepts(m, s):
    st = m.start
    for ch in s:
        st = m.step(st, ch)
        if st is None:
            return False
    return m.cost(st) == 0


PATTERNS = [
    r"[a-z]+@[a-z]+\.(com|org|net)",
    r"\d{3}-\d{4}",
    r"(yes|no|maybe)",
    r"[A-Z][a-z]*( [A-Z][a-z]*)*",
    r"a*b+c?",
    r"\w+\s\w+",
    r"-?\d+(\.\d+)?([eE][+-]?\d+)?",
    r"(?:ab|cd){2,3}",
    r"[^0-9]+",
    r".{1,5}",
    r"a(b|c)*d",
    r"[\x41-\x43]+",
]

_FUZZ_ALPHA = "abcdefghijxyzABC0123456789@.-+ eE_"


@pytest.mark.parametrize("pattern", PATTERNS)
def test_machine_matches_re_semantics(pattern):
    m = RegexMachine(pattern)
    cre = re.compile(pattern)
    rng = np.random.default_rng(hash(pattern) % 2**31)
    for _ in range(800):
        n = int(rng.integers(0, 12))
        s = "".join(_FUZZ_ALPHA[int(i)]
                    for i in rng.integers(0, len(_FUZZ_ALPHA), size=n))
        assert _accepts(m, s) == bool(cre.fullmatch(s)), (pattern, s)


@pytest.mark.parametrize("pattern", PATTERNS)
def test_closing_invariant_every_state(pattern):
    """From every live DFA state the closing char lowers cost by exactly
    1 — the inductive step of the budget guarantee."""
    m = RegexMachine(pattern)
    cre = re.compile(pattern)
    for st in range(len(m._cost)):
        c = m.cost(st)
        if c >= 1 << 30:
            continue  # dead (pruned)
        if c == 0:
            assert m.closing_char(st) is None
            continue
        ch = m.closing_char(st)
        nxt = m.step(st, ch)
        assert nxt is not None and m.cost(nxt) == c - 1, (pattern, st, ch)
    # Walking closing chars from start yields a full match of min length.
    st, out = m.start, ""
    while m.cost(st) > 0:
        ch = m.closing_char(st)
        st, out = m.step(st, ch), out + ch
    assert cre.fullmatch(out), (pattern, out)


@pytest.mark.parametrize("pattern", [
    r"(a)\1",        # backreference
    r"(?=a)b",       # lookahead
    r"(?i)abc",      # inline flags
    r"a^b",          # mid-pattern anchor
    r"a{5,2}",       # n < m
    r"a{1000}",      # bound too large
    r"[z-a]",        # bad range
    r"(ab",          # unbalanced
    "a\\",           # trailing backslash
])
def test_unsupported_or_malformed_raise(pattern):
    with pytest.raises(RegexError):
        RegexMachine(pattern)


def test_anchored_full_pattern_accepted():
    m = RegexMachine(r"^abc$")
    assert _accepts(m, "abc") and not _accepts(m, "abcd")


def test_empty_match_pattern():
    m = RegexMachine(r"a*")
    assert m.cost(m.start) == 0  # "" matches; EOS allowed immediately
    assert _accepts(m, "") and _accepts(m, "aaa") and not _accepts(m, "b")


# ----------------------------------------------------------------------
# Token tables / budget closure

EOS = 2
PIECES = {}
_chars = "abcdefghijklmnopqrstuvwxyz0123456789@.- ABC"
for _k, _ch in enumerate(_chars):
    PIECES[3 + _k] = _ch
PIECES.update({48: "com", 49: "org", 50: "ab", 51: "cd", 52: "12",
               53: "no", 54: "yes", 55: "maybe"})


def _token_strs(v=64):
    strs = [None] * v
    for i, s in PIECES.items():
        strs[i] = s
    return strs


def _decode(tokens):
    return "".join(PIECES[t] for t in tokens if t != EOS)


def test_budget_filter_forces_adversarial_closure():
    """Worst-cost token each step: the budget filter still lands a full
    match within any budget >= the pattern's minimum."""
    pattern = r"[ab]+@(com|org)"
    table = GrammarTable(_token_strs(), EOS, RegexMachine(pattern))
    cre = re.compile(pattern)
    for budget in range(table.min_tokens, 12):
        c = GrammarConstraint(table)
        toks = []
        while not c.finished and len(toks) < budget:
            c.set_remaining(budget - len(toks))
            mask = c.mask(64)
            ids = np.nonzero(mask)[0]
            assert len(ids), (budget, toks)
            ids = [i for i in ids if i != EOS] or [EOS]
            if ids == [EOS]:
                break
            costs = []
            for i in ids:
                allowed, ends, cst = table.expand(c.node)
                pos = int(np.searchsorted(allowed, i))
                costs.append(int(cst[pos]))
            pick = int(ids[int(np.argmax(costs))])
            toks.append(pick)
            c.advance(pick)
        text = _decode(toks)
        assert cre.fullmatch(text), (budget, text)
        assert len(toks) <= budget


def test_mask_allows_eos_only_at_accept():
    table = GrammarTable(_token_strs(), EOS, RegexMachine(r"ab+"))
    c = GrammarConstraint(table)
    assert not c.mask(64)[EOS]
    c.advance(3)  # 'a'
    assert not c.mask(64)[EOS]
    c.advance(4)  # 'b' -> accept (more b's still allowed)
    m = c.mask(64)
    assert m[EOS] and m[4] and not m[3]


def test_regex_constraint_caches_table():
    class Tok:
        eos_token_id = EOS
        vocab_size = 64
        all_special_ids = [0, 1, 2]

        def convert_ids_to_tokens(self, ids):
            return [PIECES.get(i) or "" for i in ids]

    tok = Tok()
    c1 = regex_constraint(tok, r"[ab]+", token_strs=_token_strs())
    c2 = regex_constraint(tok, r"[ab]+", token_strs=_token_strs())
    assert c1.table is c2.table
    c3 = regex_constraint(tok, r"[cd]+", token_strs=_token_strs())
    assert c3.table is not c1.table


# ----------------------------------------------------------------------
# Engine integration (dense + paged; k>1 exercises the device grammar
# scan over the regex table — DeviceTable is machine-agnostic)


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


def _req(cfg, uid, *, grammar, temperature=0.0, seed=0, budget=12):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=budget,
                   temperature=temperature, grammar=grammar)


class _Tok:
    eos_token_id = EOS


PATTERN_E2E = r"[ab]+@(com|org)"


def _constraint():
    return regex_constraint(_Tok(), PATTERN_E2E, token_strs=_token_strs())


@pytest.mark.parametrize("temperature", [0.0, 1.5])
def test_engine_emits_full_matches(tiny, temperature):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=EOS,
                           seed=7)
    reqs = [_req(cfg, uid, seed=uid, budget=10, grammar=_constraint(),
                 temperature=temperature)
            for uid in range(3)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    cre = re.compile(PATTERN_E2E)
    for r in reqs:
        text = _decode(r.tokens)
        assert cre.fullmatch(text), (r.uid, text)
        assert len(r.tokens) <= 10


def test_paged_engine_emits_full_matches(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=EOS)
    reqs = [_req(cfg, uid, seed=uid, budget=12, grammar=_constraint())
            for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    cre = re.compile(PATTERN_E2E)
    for r in reqs:
        assert cre.fullmatch(_decode(r.tokens)), (r.uid, _decode(r.tokens))


def test_build_requests_wires_regex(tiny):
    """JSONL/HTTP row with response_format {"type": "regex"} ->
    Request.grammar -> engine emits a full match."""
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
            r.input_ids = [1] + [rev.get(ch, 3) for ch in text]
            return r

    cfg, params = tiny
    chat = SimpleNamespace(tokenizer=CharTok(), text_bucket=16)
    rows = [{"id": 0, "prompt": "x: ", "raw": True, "max_new_tokens": 10,
             "response_format": {"type": "regex", "regex": PATTERN_E2E}}]
    reqs = build_requests(rows, chat)
    assert reqs[0].grammar is not None

    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=EOS)
    engine.submit(reqs[0])
    engine.run_until_drained()
    assert re.fullmatch(PATTERN_E2E, _decode(reqs[0].tokens))


def test_openai_regex_routing():
    from videollamb_tpu.serve.openai_api import BadRequest, _common_params

    row = {}
    _common_params({"response_format": {"type": "regex",
                                        "regex": r"\d+"},
                    "max_tokens": 8}, row)
    assert row["response_format"] == {"type": "regex", "regex": r"\d+"}
    # vLLM-style alias.
    row = {}
    _common_params({"guided_regex": r"[a-z]+"}, row)
    assert row["response_format"] == {"type": "regex", "regex": r"[a-z]+"}
    with pytest.raises(BadRequest):  # missing pattern
        _common_params({"response_format": {"type": "regex"}}, {})
    with pytest.raises(BadRequest):  # unsupported construct
        _common_params({"response_format": {"type": "regex",
                                            "regex": r"(?=a)b"}}, {})
    with pytest.raises(BadRequest):  # alias + response_format conflict
        _common_params({"guided_regex": "a",
                        "response_format": {"type": "json_object"}}, {})
