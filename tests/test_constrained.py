"""Constrained decoding: trie mechanics + engine integration (output can
never leave the choice set, greedy or sampled)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.serve.constrained import (
    ChoiceConstraint,
    TokenTrie,
    build_constraint_masks,
    choices_to_constraint,
)
from test_preprocess import WordTokenizer


def test_trie_paths_and_termination():
    trie = TokenTrie([[5, 6], [5, 7, 8], [9]])
    c = ChoiceConstraint(trie)
    assert sorted(np.nonzero(c.mask(16))[0].tolist()) == [5, 9]
    c.advance(5)
    assert sorted(np.nonzero(c.mask(16))[0].tolist()) == [6, 7]
    assert not c.finished
    c.advance(6)
    assert c.finished  # leaf with no children
    c2 = ChoiceConstraint(trie)
    c2.advance(5)
    c2.advance(7)
    assert not c2.finished
    c2.advance(8)
    assert c2.finished


def test_prefix_choice_keeps_decoding_until_leaf():
    # "A" is a strict prefix of "A B": after A, B is still allowed and the
    # row is considered finished only at a childless leaf.
    trie = TokenTrie([[3], [3, 4]])
    c = ChoiceConstraint(trie)
    c.advance(3)
    assert not c.finished  # leaf but has a continuation
    c.advance(4)
    assert c.finished


def test_choices_to_constraint_strips_bos():
    tok = WordTokenizer()
    c = choices_to_constraint(tok, ["yes", "no way"])
    allowed = np.nonzero(c.mask(64))[0].tolist()
    yes_id = tok("yes").input_ids[-1]
    no_id = tok("no way").input_ids[1]
    assert yes_id in allowed and no_id in allowed
    assert tok.bos_token_id not in allowed


def test_apply_constraint_masks_mixed_slots():
    class R:  # stands in for a Request
        pass

    r1 = R()
    r1._constraint = ChoiceConstraint(TokenTrie([[2], [3]]))
    r2 = R()  # unconstrained
    mask = build_constraint_masks([r1, r2, None], vocab_size=8)
    assert mask.shape == (3, 8)
    assert mask[0, 2] == 0 and mask[0, 3] == 0 and mask[0, 4] == -1e30
    assert (mask[1] == 0).all() and (mask[2] == 0).all()
    # No constrained slot -> None (engines keep the fast path).
    assert build_constraint_masks([r2, None], vocab_size=8) is None


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


def _req(cfg, uid, choices=None, temperature=0.0, seed=0):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=None, videos=None, images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=8,
                   temperature=temperature, choices=choices)


def test_engine_greedy_output_stays_in_choice_set(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    choice_seqs = [[7, 8, 9], [11], [13, 14]]
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    reqs = [_req(cfg, uid, choices=choice_seqs, seed=uid) for uid in range(3)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)  # k>1: constrained rows must force k=1
    for r in reqs:
        assert r.done and r.tokens in choice_seqs, r.tokens


def test_engine_sampled_output_stays_in_choice_set(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    choice_seqs = [[5], [6], [7]]
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1, seed=3)
    reqs = [_req(cfg, uid, choices=choice_seqs, temperature=1.5, seed=uid)
            for uid in range(4)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained()
    for r in reqs:
        assert r.done and r.tokens in choice_seqs, r.tokens


def test_mixed_constrained_and_free_rows(tiny):
    from videollamb_tpu.models.engine import generate
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    constrained = _req(cfg, 0, choices=[[9, 10]], seed=5)
    free = _req(cfg, 1, seed=6)
    for r in (constrained, free):
        engine.submit(r)
    engine.run_until_drained()
    assert constrained.tokens == [9, 10]
    # The free row is untouched by its neighbor's constraint: it matches
    # independent greedy generation.
    ref = generate(params, cfg, free.batch, jax.random.PRNGKey(0),
                   max_new_tokens=8, do_sample=False, eos_token_id=-1,
                   max_seq_len=cfg.max_length + 512)
    want = np.asarray(ref.tokens[0][: int(ref.lengths[0])]).tolist()
    assert free.tokens == want


def test_paged_engine_constrained(tiny):
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=-1)
    reqs = [_req(cfg, uid, choices=[[7, 8], [12]], seed=uid)
            for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained(k=4)
    for r in reqs:
        assert r.done and r.tokens in ([7, 8], [12]), r.tokens


def test_prefix_choice_reachable_via_eos():
    # With an EOS escape, a strict-prefix choice can terminate at its leaf.
    c = ChoiceConstraint(TokenTrie([[3], [3, 4]]), eos_token_id=2)
    c.advance(3)
    allowed = np.nonzero(c.mask(8))[0].tolist()
    assert allowed == [2, 4]  # continue to the longer choice OR stop
    c.advance(2)
    assert c.finished


def test_engine_extends_budget_to_longest_choice(tiny):
    from videollamb_tpu.serve.server import ServingEngine

    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    req = _req(cfg, 0, choices=[[7, 8, 9, 10, 11, 12]], seed=1)
    req.max_new_tokens = 2  # shorter than the choice
    engine.submit(req)
    engine.run_until_drained()
    # No partial string: the budget stretched to cover the full choice.
    assert req.tokens == [7, 8, 9, 10, 11, 12]


def test_paged_prefix_request_is_constrained(tiny):
    """Review finding: _admit_prefix used to skip constraint install."""
    from videollamb_tpu.serve.paged import PagedServingEngine

    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=-1)
    base = _req(cfg, 0, seed=2)
    pid = engine.register_prefix(base.batch)
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.serve.server import Request

    rng = np.random.default_rng(3)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 4)).astype(np.int32)
    suffix = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 4), jnp.int32),
        labels=None, videos=None, images=None)
    req = Request(uid=1, batch=suffix, max_new_tokens=6, temperature=0.0,
                  prefix_id=pid, choices=[[7, 8], [11]])
    engine.submit(req)
    engine.run_until_drained()
    assert req.done and req.tokens in ([7, 8], [11]), req.tokens


def test_paged_release_resets_adapter_state():
    """Review finding: a finished adapter request's index must not leak
    into the slot's next occupant (and gating must re-engage)."""
    import dataclasses as _dc

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.paged import PagedServingEngine
    from test_mlora import _adapter, _lm_cfg
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.lm.mlora import (
        add_multi_lora_params,
        extract_lora_layers,
    )

    cfg_lm = _lm_cfg()
    base_lm = init_llama_params(jax.random.PRNGKey(0), cfg_lm)
    pa = _adapter(base_lm, cfg_lm, seed=1, r=4)
    params_lm, registry = add_multi_lora_params(
        {"lm": base_lm}, {"a": extract_lora_layers(pa)})
    cfg = _dc.replace(ModelConfig.tiny(max_length=64), lm=cfg_lm)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"lm": params_lm["lm"],
              "video_tower": init_vision_params(k1, cfg.vision),
              "mm_projector": init_rmt_r_params(k2, cfg.bridge,
                                                cfg.lm.hidden_size)}
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=16,
                                eos_token_id=-1, adapter_registry=registry)
    r1 = _req(cfg, 0, seed=4)
    r1.adapter = "a"
    engine.submit(r1)
    engine.run_until_drained()
    assert r1.done and engine._adapter_host[0] == -1
    assert engine._live_adapter_idx() is None  # gating re-engaged
