"""Automatic prefix caching in the paged engine (Request.prefix_batch):
signature-keyed reuse, refcounting, LRU eviction, and eviction-over-swap
under page pressure. Companion to the explicit register_prefix tests in
test_paged.py; beyond the reference (which re-prefills the full prompt
per request — llava/serve/cli.py re-encodes media every generate call)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.serve.paged import PagedServingEngine, batch_signature
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


def _split_prompt(cfg, seed, suffix_ids):
    """(prefix batch with video, suffix batch, combined batch)."""
    rng = np.random.default_rng(seed)
    pre = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    pre[:, 2] = VIDEO_TOKEN_INDEX
    videos = jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32))
    suf = np.asarray(suffix_ids, np.int32)[None]
    prefix = MultimodalBatch(
        input_ids=jnp.asarray(pre), attention_mask=jnp.ones((1, 8), jnp.int32),
        labels=None, videos=videos, images=None)
    suffix = MultimodalBatch(
        input_ids=jnp.asarray(suf),
        attention_mask=jnp.ones_like(jnp.asarray(suf)),
        labels=None, videos=None, images=None)
    full = MultimodalBatch(
        input_ids=jnp.concatenate([jnp.asarray(pre), jnp.asarray(suf)], axis=1),
        attention_mask=jnp.ones((1, 8 + suf.shape[1]), jnp.int32),
        labels=None, videos=videos, images=None)
    return prefix, suffix, full


def test_batch_signature_content_keyed(tiny):
    cfg, _ = tiny
    p1, s1, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    p2, _, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    p3, _, _ = _split_prompt(cfg, seed=6, suffix_ids=[7, 11, 13])
    # Equal content (fresh objects) -> equal signature; different video/
    # tokens -> different; media participates (prefix vs its text-only
    # suffix never collide).
    assert batch_signature(p1) == batch_signature(p2)
    assert batch_signature(p1) != batch_signature(p3)
    assert batch_signature(p1) != batch_signature(s1)


def test_auto_prefix_token_parity_and_hit_accounting(tiny):
    """Requests submitting prefix_batch produce the same tokens as
    full-prompt requests; the second request is a cache hit (one
    registration total)."""
    cfg, params = tiny
    suffixes = [[7, 11, 13], [21, 22, 23, 24]]

    ref_engine = PagedServingEngine(params, cfg, num_slots=2, page_size=8,
                                    eos_token_id=-1)
    ref_reqs = []
    for uid, suf in enumerate(suffixes):
        _, _, full = _split_prompt(cfg, seed=5, suffix_ids=suf)
        r = Request(uid=uid, batch=full, max_new_tokens=6, temperature=0.0)
        ref_reqs.append(r)
        ref_engine.submit(r)
    ref_engine.run_until_drained(k=2)

    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=8,
                                eos_token_id=-1)
    reqs = []
    for uid, suf in enumerate(suffixes):
        prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=suf)
        r = Request(uid=uid, batch=suffix, max_new_tokens=6, temperature=0.0,
                    prefix_batch=prefix)
        reqs.append(r)
        engine.submit(r)
    engine.run_until_drained(k=2)

    for a, b in zip(ref_reqs, reqs):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)
    assert engine.prefix_misses == 1
    assert engine.prefix_hits == 1
    assert len(engine._auto_prefix) == 1
    assert len(engine._prefixes) == 1
    # Drained: no live consumers, entry stays cached for the next request.
    assert all(v == 0 for v in engine._prefix_refs.values())


def test_auto_prefix_lru_capacity_eviction(tiny):
    """prefix_cache_size=1: a second distinct prefix evicts the first
    (LRU, idle) and its pages return to the pool."""
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                eos_token_id=-1, prefix_cache_size=1)
    free0 = engine.allocator.free_pages
    for seed in (5, 6):
        prefix, suffix, _ = _split_prompt(cfg, seed=seed,
                                          suffix_ids=[7, 11, 13])
        r = Request(uid=seed, batch=suffix, max_new_tokens=4,
                    temperature=0.0, prefix_batch=prefix)
        engine.submit(r)
        engine.run_until_drained(k=2)
        assert r.done and r.error is None
    assert engine.prefix_evictions == 1
    assert len(engine._auto_prefix) == 1
    assert len(engine._prefixes) == 1
    # Exactly one registration's pages remain held.
    held = len(next(iter(engine._prefixes.values()))["pages"])
    assert engine.allocator.free_pages == free0 - held
    # Evicting by hand returns the pool to its initial state.
    assert engine._evict_idle_prefix()
    assert engine.allocator.free_pages == free0


def test_auto_prefix_page_pressure_evicts_before_swap(tiny):
    """Pool exhaustion mid-decode reclaims an idle cached prefix instead
    of swap-preempting the active request."""
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                total_pages=9, pages_per_seq=8,
                                eos_token_id=-1)
    prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    r1 = Request(uid=0, batch=suffix, max_new_tokens=2, temperature=0.0,
                 prefix_batch=prefix)
    engine.submit(r1)
    engine.run_until_drained(k=1)
    assert r1.done and r1.error is None
    assert len(engine._auto_prefix) == 1  # idle, still cached

    # A long full-prompt decode now grows past the remaining free pages.
    _, _, full = _split_prompt(cfg, seed=7, suffix_ids=list(range(4, 24)))
    r2 = Request(uid=1, batch=full, max_new_tokens=30, temperature=0.0)
    engine.submit(r2)
    engine.run_until_drained(k=1)
    assert r2.done and r2.error is None
    assert len(r2.tokens) == 30
    assert engine.prefix_evictions == 1
    assert len(engine._auto_prefix) == 0
    assert engine.preempted == 0  # eviction sufficed; no swap


def test_auto_prefix_oversized_rejected_not_hung(tiny):
    """A prefix that cannot fit the pool even with the cache empty is
    rejected with an error instead of blocking the queue forever."""
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                total_pages=2, pages_per_seq=2,
                                eos_token_id=-1)
    prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    # The spliced video prefix spans many pages; pool has 1 usable page.
    r = Request(uid=0, batch=suffix, max_new_tokens=4, temperature=0.0,
                prefix_batch=prefix)
    engine.submit(r)
    out = engine.step(k=1)
    assert r in out and r.done and r.error is not None
    assert "prefix" in r.error


def test_auto_prefix_adapter_rejected(tiny):
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                eos_token_id=-1,
                                adapter_registry={"a": 0})
    prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    r = Request(uid=0, batch=suffix, max_new_tokens=4, temperature=0.0,
                prefix_batch=prefix, adapter="a")
    engine.submit(r)
    out = engine.step(k=1)
    assert r in out and r.done and "adapter" in r.error


def test_dense_engine_rejects_prefix_requests(tiny):
    """The dense engine refuses prefix requests loudly — silently decoding
    the suffix as a full prompt would be wrong output."""
    cfg, params = tiny
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1)
    prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=[7, 11, 13])
    r = Request(uid=0, batch=suffix, max_new_tokens=4, temperature=0.0,
                prefix_batch=prefix)
    engine.submit(r)
    out = engine.step(k=1)
    assert r in out and r.done and "paged engine" in r.error


def test_request_prefix_fields_mutually_exclusive(tiny):
    cfg, _ = tiny
    prefix, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=[7])
    with pytest.raises(ValueError):
        Request(uid=0, batch=suffix, prefix_id=3, prefix_batch=prefix)
