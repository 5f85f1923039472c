"""Grammar constraints over a REAL tokenizer (trained byte-level BPE in
HF-fast format — the GPT-2/Llama-3/Qwen vocab family): token_strings
surface fidelity (concatenated surfaces == tokenizer.decode on any path),
full-vocab table build within budget, and constrained decode producing
text the real detokenizer renders as valid JSON."""

import json
import time

import numpy as np
import pytest

import conftest as _c  # noqa: F401

from videollamb_tpu.serve.grammar import (
    GrammarConstraint,
    json_constraint,
    token_strings,
)
from videollamb_tpu.serve.schema import schema_constraint

CORPUS = [
    'The quick brown fox jumps over the lazy dog. ' * 3,
    json.dumps({"city": "Oslo", "temp_c": -3.5, "tags": ["a", "b"],
                "ok": True, "note": None}),
    json.dumps({"name": "get_weather", "arguments": {"city": "Paris"}}),
    '{"a": 1, "b": [2, 3], "c": {"d": "text with spaces"}}',
    "numbers 0 1 2 3 4 5 6 7 8 9 -1.5e3 0.25 100 ",
    "true false null string object array émigré \n\t",
    '{"key": "value", "list": [true, false, null]}' * 2,
]


@pytest.fixture(scope="module")
def real_tok(tmp_path_factory):
    """A byte-level BPE trained on a JSON-ish corpus, wrapped the way HF
    ships production tokenizers (PreTrainedTokenizerFast)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=1200, special_tokens=["<pad>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(CORPUS * 20, trainer=trainer)
    path = str(tmp_path_factory.mktemp("tok") / "tokenizer.json")
    tok.save(path)
    return PreTrainedTokenizerFast(
        tokenizer_file=path, bos_token="<s>", eos_token="</s>",
        pad_token="<pad>")


def test_surface_fidelity_vs_decode(real_tok):
    """The load-bearing property: along ANY token path, concatenating the
    extracted surface strings equals tokenizer.decode of the ids."""
    strs = token_strings(real_tok)
    usable = [i for i, s in enumerate(strs) if s]
    # ~256 byte-alphabet tokens (the >=0x80 ones are partial-UTF8 -> None)
    # plus the learned merges: most of the vocab is decodable.
    assert len(usable) > 250
    rng = np.random.default_rng(0)
    for _ in range(50):
        ids = [int(usable[j]) for j in rng.integers(0, len(usable), size=12)]
        concat = "".join(strs[i] for i in ids)
        assert concat == real_tok.decode(ids), ids
    # And real text round-trips through the surfaces.
    for text in ('{"city": "Oslo", "temp_c": -3.5}', "true false 0.25"):
        ids = real_tok(text, add_special_tokens=False).input_ids
        assert "".join(strs[i] for i in ids) == text


def test_full_vocab_table_builds_fast(real_tok):
    """Closing alphabet is satisfied by the byte-level single-byte tokens,
    and lazy per-state expansion stays cheap at full vocab."""
    con = json_constraint(real_tok)
    t0 = time.perf_counter()
    m = con.mask(len(token_strings(real_tok)))
    first = time.perf_counter() - t0
    assert m.any()
    # json_object start: every allowed token's surface must open with '{'
    strs = token_strings(real_tok)
    for i in np.nonzero(m)[0]:
        if i == con.table.eos:
            continue
        assert strs[i].lstrip(" \t\n\r").startswith("{") or set(
            strs[i]) <= set(" \t\n\r"), strs[i]
    # Cold state expansion at vocab 1200 must be well under a second —
    # at 32k this scales linearly (~30x), still sub-second per NEW state
    # and amortized to an array index across requests.
    assert first < 1.0, first


def test_constrained_decode_renders_valid_json(real_tok):
    """Simulated decode with the real vocab: random in-mask choices,
    budget-closed; the REAL detokenizer output must parse."""
    strs = token_strings(real_tok)
    v = len(strs)
    rng = np.random.default_rng(7)
    for trial in range(10):
        con = json_constraint(real_tok)
        budget = int(rng.integers(con.min_tokens, 30))
        ids = []
        while not con.finished and len(ids) < budget:
            con.set_remaining(budget - len(ids))
            mask = con.mask(v)
            allowed = np.nonzero(mask)[0]
            pick = int(allowed[int(rng.integers(len(allowed)))])
            if pick == con.table.eos:
                break
            ids.append(pick)
            con.advance(pick)
        text = real_tok.decode(ids)
        obj = json.loads(text)
        assert isinstance(obj, dict), (trial, text)


def test_schema_constraint_over_real_vocab(real_tok):
    import jsonschema

    schema = {"type": "object",
              "properties": {"city": {"type": "string"},
                             "temp_c": {"type": "number"}},
              "required": ["city", "temp_c"]}
    strs = token_strings(real_tok)
    v = len(strs)
    rng = np.random.default_rng(3)
    for trial in range(6):
        con = schema_constraint(real_tok, schema)
        budget = int(rng.integers(con.min_tokens, con.min_tokens + 12))
        ids = []
        while not con.finished and len(ids) < budget:
            con.set_remaining(budget - len(ids))
            allowed = np.nonzero(con.mask(v))[0]
            pick = int(allowed[int(rng.integers(len(allowed)))])
            if pick == con.table.eos:
                break
            ids.append(pick)
            con.advance(pick)
        obj = json.loads(real_tok.decode(ids))
        jsonschema.validate(obj, schema)
