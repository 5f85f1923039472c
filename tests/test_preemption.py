"""Swap preemption in the paged engine: pool exhaustion mid-decode
offloads the youngest request's KV pages to host memory and resumes it
later with exact state — outputs are token-identical to an ample pool.

The reference serves one request at a time (llava/serve/cli.py) and has
no analogue; this covers the oversubscription regime a paged pool
invites (vLLM-style swap preemption, TPU-native gather/scatter DMA)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.models.lm.llama import init_llama_params
from videollamb_tpu.serve.paged import PagedServingEngine
from videollamb_tpu.serve.server import Request

# Tiny-model spliced prompt length for _request's 8-token prompt with one
# video sentinel (measured; asserted in the first test so drift is loud).
PROMPT_LEN = 19
PAGE = 16  # prompt -> 2 pages; page 3 needed after 13 generated tokens


@pytest.fixture(scope="module")
def tiny():
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


def _request(cfg, uid, seed, max_new=20):
    # One shared video across requests: the spliced prompt length depends
    # on the bridge's scene segmentation of the VIDEO (data-dependent), so
    # a shared clip pins every request to the same prompt length and the
    # active slots cross page boundaries in lock-step — which is what
    # forces the growth-page race the pool is sized to lose. Text ids
    # still differ per request, so cross-slot mixups would be caught.
    rng = np.random.default_rng(seed)
    vid = np.random.default_rng(100)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((1, 8), jnp.int32),
        labels=None,
        videos=jnp.asarray(
            vid.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=max_new,
                   temperature=0.0)


def _starved(cfg, params, **kw):
    """2 slots, pool = trash + 5 pages: both prompts admit (2 pages each)
    and exactly one growth page exists — the second slot to cross a page
    boundary forces a preemption."""
    return PagedServingEngine(
        params, cfg, num_slots=2, page_size=PAGE,
        total_pages=1 + 5, pages_per_seq=4, eos_token_id=-1, **kw)


def _ample(cfg, params, **kw):
    return PagedServingEngine(
        params, cfg, num_slots=2, page_size=PAGE,
        total_pages=1 + 16, pages_per_seq=4, eos_token_id=-1, **kw)


@pytest.mark.parametrize("k", [1, 2])
def test_preemption_token_parity(tiny, k):
    cfg, params = tiny
    reqs_a = [_request(cfg, uid, seed=uid) for uid in range(3)]
    reqs_s = [_request(cfg, uid, seed=uid) for uid in range(3)]

    ample = _ample(cfg, params)
    for r in reqs_a:
        ample.submit(r)
    ample.run_until_drained(k=k)
    assert ample.preempted == 0

    starved = _starved(cfg, params)
    for r in reqs_s:
        starved.submit(r)
    starved.run_until_drained(k=k)

    assert starved.preempted >= 1, "pool was sized to force a preemption"
    assert starved.resumed == starved.preempted
    # Sanity: the pool math above assumed this prompt length.
    assert int(np.asarray(
        jnp.sum(reqs_s[0].batch.attention_mask))) == 8  # text ids
    for ra, rs in zip(reqs_a, reqs_s):
        assert ra.tokens == rs.tokens, f"request {ra.uid}"
    # All pages returned, nothing left swapped.
    assert starved.allocator.free_pages == 5
    assert starved._swapped == []
    assert all(p == [] for p in starved.slot_pages)


def test_preemption_quantized_kv_exact_roundtrip(tiny):
    """int8 KV pages swap as raw bytes + scales — resumed decode is
    bit-identical to the never-preempted quantized engine."""
    cfg, params = tiny
    reqs_a = [_request(cfg, uid, seed=10 + uid) for uid in range(3)]
    reqs_s = [_request(cfg, uid, seed=10 + uid) for uid in range(3)]

    ample = _ample(cfg, params, quantize_kv=True)
    for r in reqs_a:
        ample.submit(r)
    ample.run_until_drained(k=2)

    starved = _starved(cfg, params, quantize_kv=True)
    for r in reqs_s:
        starved.submit(r)
    starved.run_until_drained(k=2)

    assert starved.preempted >= 1
    for ra, rs in zip(reqs_a, reqs_s):
        assert ra.tokens == rs.tokens, f"request {ra.uid}"


def test_preemption_off_raises(tiny):
    cfg, params = tiny
    engine = _starved(cfg, params, preemption="off")
    for uid in range(2):
        engine.submit(_request(cfg, uid, seed=uid))
    with pytest.raises(RuntimeError, match="pool exhausted"):
        engine.run_until_drained()


def test_preemption_fcfs_oldest_finishes_first(tiny):
    """The victim is the YOUNGEST active request; the oldest runs
    uninterrupted to completion."""
    cfg, params = tiny
    engine = _starved(cfg, params)
    reqs = [_request(cfg, uid, seed=uid) for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    order = []
    while engine.has_work():
        for r in engine.step(1):
            order.append(r.uid)
    assert engine.preempted >= 1
    assert order[0] == 0, "oldest request must finish first under FCFS"
    assert sorted(order) == [0, 1]


def test_cancelled_while_swapped_is_dropped(tiny):
    cfg, params = tiny
    engine = _starved(cfg, params)
    reqs = [_request(cfg, uid, seed=uid) for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    # Step until the younger request has been swapped out, then cancel it.
    for _ in range(200):
        engine.step(1)
        if engine._swapped:
            break
    assert engine._swapped, "expected a swap-out"
    engine._swapped[0]["req"].cancelled = True
    done = engine.run_until_drained()
    assert all(r.done for r in reqs)
    assert reqs[1] in done or reqs[1].done
    assert engine.allocator.free_pages == 5
