"""Paged KV cache: decode parity vs the dense cache, engine parity vs the
dense continuous-batching engine, and page accounting."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.models.lm.llama import (
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
)
from videollamb_tpu.models.lm.paged import (
    TRASH_PAGE,
    PageAllocator,
    init_paged_cache,
    paged_decode_step,
    paged_insert,
)
from videollamb_tpu.serve.paged import PagedServingEngine
from videollamb_tpu.serve.server import Request, ServingEngine


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


def test_paged_decode_matches_dense(tiny):
    """Same prefilled context -> identical decode logits/tokens for 5 steps,
    including a page-boundary crossing."""
    cfg, params = tiny
    lm = params["lm"]
    page, total_pages, pps = 16, 9, 4
    rng = np.random.default_rng(0)
    prompt_len = 14  # page boundary (16) crossed during decode
    embeds = jnp.asarray(
        rng.normal(size=(1, prompt_len, cfg.lm.hidden_size)).astype(np.float32))
    mask = jnp.ones((1, prompt_len), jnp.int32)

    dense = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_d, dense = llama_prefill(lm, cfg.lm, embeds, mask, dense)

    paged = init_paged_cache(cfg.lm, 1, total_pages, page, pps, jnp.float32)
    alloc = PageAllocator(total_pages)
    pages = alloc.alloc(2)  # covers prompt (14 tokens) and the boundary page
    page_ids = np.full((pps,), TRASH_PAGE, np.int32)
    page_ids[:2] = pages
    single = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_p, single = llama_prefill(lm, cfg.lm, embeds, mask, single)
    paged = paged_insert(paged, single, jnp.asarray(0), jnp.asarray(page_ids),
                         total_pages)

    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(logits_p))
    logits_pg = logits_p
    for step in range(5):
        nxt_d = jnp.argmax(logits_d, -1).astype(jnp.int32)
        nxt_p = jnp.argmax(logits_pg, -1).astype(jnp.int32)
        assert int(nxt_d[0]) == int(nxt_p[0]), f"step {step}"
        te = embed_tokens(lm, nxt_d[:, None])
        logits_d, dense = llama_decode_step(lm, cfg.lm, te, dense)
        logits_pg, paged = paged_decode_step(lm, cfg.lm, te, paged, total_pages)
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(logits_pg), rtol=2e-5, atol=2e-5,
            err_msg=f"step {step}",
        )


def _request(cfg, uid, seed, max_new=6):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
    ids[:, 2] = VIDEO_TOKEN_INDEX
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids), attention_mask=jnp.ones((1, 8), jnp.int32),
        labels=None,
        videos=jnp.asarray(rng.normal(size=(1, 8, 3, 56, 56)).astype(np.float32)),
        images=None,
    )
    return Request(uid=uid, batch=batch, max_new_tokens=max_new, temperature=0.0)


def test_paged_engine_matches_dense_engine(tiny):
    cfg, params = tiny
    reqs_d = [_request(cfg, uid, seed=uid) for uid in range(3)]
    reqs_p = [_request(cfg, uid, seed=uid) for uid in range(3)]

    dense = ServingEngine(params, cfg, num_slots=2, eos_token_id=-1)
    for r in reqs_d:
        dense.submit(r)
    dense.run_until_drained()

    paged = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                               eos_token_id=-1)
    for r in reqs_p:
        paged.submit(r)
    paged.run_until_drained()

    for rd, rp in zip(reqs_d, reqs_p):
        assert rd.tokens == rp.tokens, f"request {rd.uid}"


def test_paged_engine_multistep_and_page_reuse(tiny):
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                eos_token_id=-1)
    free0 = engine.allocator.free_pages
    reqs = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(4)]
    for r in reqs:
        engine.submit(r)
    done = engine.run_until_drained(k=3)
    assert len(done) == 4
    # All pages returned after the requests finish.
    assert engine.allocator.free_pages == free0
    assert all(p == [] for p in engine.slot_pages)

    # Same tokens as single-step decode.
    reqs2 = [_request(cfg, uid, seed=uid, max_new=7) for uid in range(4)]
    engine2 = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                 eos_token_id=-1)
    for r in reqs2:
        engine2.submit(r)
    engine2.run_until_drained(k=1)
    for a, b in zip(reqs, reqs2):
        assert a.tokens == b.tokens


def test_pool_backpressure(tiny):
    """A pool too small for two concurrent requests admits them serially."""
    cfg, params = tiny
    # pages_per_seq ample, but total pool only fits one active request.
    engine = PagedServingEngine(
        params, cfg, num_slots=2, page_size=32,
        total_pages=1 + 2,  # trash + 2 pages: one request (prompt+decode)
        pages_per_seq=2, eos_token_id=-1,
    )
    reqs = [_request(cfg, uid, seed=uid, max_new=3) for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    done = engine.run_until_drained()
    assert len(done) == 2 and all(r.done for r in reqs)


def test_quantized_paged_decode_close_to_dense(tiny):
    """int8 KV pages: decode logits track the dense bf16 cache closely."""
    cfg, params = tiny
    lm = params["lm"]
    page, total_pages, pps = 16, 9, 4
    rng = np.random.default_rng(3)
    prompt_len = 14
    embeds = jnp.asarray(
        rng.normal(size=(1, prompt_len, cfg.lm.hidden_size)).astype(np.float32))
    mask = jnp.ones((1, prompt_len), jnp.int32)

    dense = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_d, dense = llama_prefill(lm, cfg.lm, embeds, mask, dense)

    paged = init_paged_cache(cfg.lm, 1, total_pages, page, pps, jnp.float32,
                             quantize=True)
    assert paged.k_pages.dtype == jnp.int8 and paged.k_scales is not None
    alloc = PageAllocator(total_pages)
    pages = alloc.alloc(2)
    page_ids = np.full((pps,), TRASH_PAGE, np.int32)
    page_ids[:2] = pages
    single = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_p, single = llama_prefill(lm, cfg.lm, embeds, mask, single)
    paged = paged_insert(paged, single, jnp.asarray(0), jnp.asarray(page_ids),
                         total_pages)

    logits_pg = logits_p
    rel = []
    for step in range(4):
        nxt = jnp.argmax(logits_d, -1).astype(jnp.int32)
        te = embed_tokens(lm, nxt[:, None])
        logits_d, dense = llama_decode_step(lm, cfg.lm, te, dense)
        logits_pg, paged = paged_decode_step(lm, cfg.lm, te, paged, total_pages)
        a, b = np.asarray(logits_d), np.asarray(logits_pg)
        rel.append(np.abs(a - b).max() / (np.abs(a).max() + 1e-6))
    # int8 absmax-per-token keeps logits within a few percent.
    assert max(rel) < 0.08, rel


def test_quantized_paged_engine_runs(tiny):
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                                eos_token_id=-1, quantize_kv=True)
    reqs = [_request(cfg, uid, seed=uid, max_new=5) for uid in range(2)]
    for r in reqs:
        engine.submit(r)
    done = engine.run_until_drained(k=2)
    assert len(done) == 2
    assert all(len(r.tokens) == 5 for r in reqs)


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


def test_prefix_cache_token_parity(tiny):
    """Requests sharing a registered prefix produce the same tokens as
    full-prompt requests through the plain paged engine."""
    cfg, params = tiny
    suffixes = [[7, 11, 13], [21, 22, 23, 24]]
    prefix, _, _ = _split_prompt(cfg, seed=5, suffix_ids=suffixes[0])

    # Reference: full prompts, no prefix cache.
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
    pid = engine.register_prefix(prefix)
    assert pid is not None
    info = engine._prefixes[pid]
    assert len(info["pages"]) >= 1  # something actually shared
    reqs = []
    for uid, suf in enumerate(suffixes):
        _, suffix, _ = _split_prompt(cfg, seed=5, suffix_ids=suf)
        r = Request(uid=uid, batch=suffix, max_new_tokens=6, temperature=0.0,
                    prefix_id=pid)
        reqs.append(r)
        engine.submit(r)
    engine.run_until_drained(k=2)

    for a, b in zip(ref_reqs, reqs):
        assert a.tokens == b.tokens, (a.uid, a.tokens, b.tokens)


def test_prefix_pages_shared_and_refcounted(tiny):
    """Concurrent consumers map the same physical prefix pages; pages
    return to the pool only after every consumer AND the registration
    release them."""
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=8,
                                eos_token_id=-1)
    free0 = engine.allocator.free_pages
    prefix, suffix, _ = _split_prompt(cfg, seed=6, suffix_ids=[7, 11, 13])
    pid = engine.register_prefix(prefix)
    shared = engine._prefixes[pid]["pages"]
    n_shared = len(shared)
    assert n_shared >= 1

    reqs = [Request(uid=i, batch=suffix, max_new_tokens=40, temperature=0.0,
                    prefix_id=pid) for i in range(2)]
    for r in reqs:
        engine.submit(r)
    engine.step(k=1)  # admit both
    assert all(s is not None for s in engine.slots)
    # Both slots' tables start with the SAME physical pages.
    table = np.asarray(engine.cache.page_table)
    assert list(table[0][:n_shared]) == shared
    assert list(table[1][:n_shared]) == shared
    # Private tails differ.
    assert table[0][n_shared] != table[1][n_shared]
    # Pool accounting: shared pages counted once.
    engine.run_until_drained(k=4)
    assert all(r.done for r in reqs)
    # Registration still holds the shared pages.
    assert engine.allocator.free_pages == free0 - n_shared
    engine.release_prefix(pid)
    assert engine.allocator.free_pages == free0


def test_prefix_cache_with_quantized_kv(tiny):
    """Prefix caching composes with int8 KV pages: same tokens as the
    plain quantized engine (identical per-token scales either path)."""
    cfg, params = tiny
    suffix_ids = [7, 11, 13]
    prefix, suffix, full = _split_prompt(cfg, seed=9, suffix_ids=suffix_ids)

    ref_engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                    eos_token_id=-1, quantize_kv=True)
    r_ref = Request(uid="r", batch=full, max_new_tokens=5, temperature=0.0)
    ref_engine.submit(r_ref)
    ref_engine.run_until_drained(k=2)

    engine = PagedServingEngine(params, cfg, num_slots=1, page_size=8,
                                eos_token_id=-1, quantize_kv=True)
    pid = engine.register_prefix(prefix)
    r = Request(uid="p", batch=suffix, max_new_tokens=5, temperature=0.0,
                prefix_id=pid)
    engine.submit(r)
    engine.run_until_drained(k=2)
    assert r.tokens == r_ref.tokens, (r.tokens, r_ref.tokens)
    engine.release_prefix(pid)


def test_allocator_fuzz_invariants():
    """Random alloc/retain/free sequences: no page is ever handed out
    twice concurrently, refcounts never underflow, and the free count is
    conserved."""
    import random

    rng = random.Random(0)
    total = 33
    alloc = PageAllocator(total)
    live = {}  # page -> refcount (mirror)
    for _ in range(2000):
        op = rng.random()
        if op < 0.45:
            n = rng.randint(1, 4)
            pages = alloc.alloc(n)
            if pages is None:
                assert alloc.free_pages < n
                continue
            assert len(set(pages)) == n
            for p in pages:
                assert p != TRASH_PAGE and p not in live
                live[p] = 1
        elif op < 0.65 and live:
            k = rng.randint(1, min(3, len(live)))
            chosen = rng.sample(sorted(live), k)
            alloc.retain(chosen)
            for p in chosen:
                live[p] += 1
        elif live:
            k = rng.randint(1, min(4, len(live)))
            chosen = rng.sample(sorted(live), k)
            alloc.free(chosen)
            for p in chosen:
                live[p] -= 1
                if live[p] == 0:
                    del live[p]
        # Conservation: free + live-unique == total - 1 (trash reserved).
        assert alloc.free_pages + len(live) == total - 1
    # Drain everything; pool must be whole again.
    while live:
        p = next(iter(live))
        alloc.free([p] * live.pop(p))
    assert alloc.free_pages == total - 1


@pytest.mark.parametrize("quantize", [False, True], ids=["bf16", "int8"])
def test_fused_admit_matches_split_path(tiny, quantize):
    """fused_admit (one-dispatch admission) must produce the same pool
    contents, page table, lengths, and logits row as the split
    chunked_prefill + paged_insert path, for both pool layouts and for
    prompts shorter and longer than one chunk."""
    from videollamb_tpu.models.lm.llama import chunked_prefill
    from videollamb_tpu.models.lm.paged import fused_admit

    cfg, params = tiny
    lm = {"lm": params["lm"]}["lm"]
    page, pps, total_pages = 16, 6, 13
    chunk = 32
    rng = np.random.default_rng(3)
    for prompt_len in (9, 71):  # < 1 chunk; 3 chunks with ragged tail
        s_pad = 96
        embeds = jnp.asarray(rng.normal(
            size=(1, s_pad, cfg.lm.hidden_size)).astype(np.float32))
        mask = jnp.zeros((1, s_pad), jnp.int32).at[0, :prompt_len].set(1)
        embeds = embeds * mask[..., None]
        n_pages = -(-prompt_len // page)
        page_ids = np.full((pps,), TRASH_PAGE, np.int32)
        page_ids[:n_pages] = np.arange(1, n_pages + 1)

        # Split path.
        split_pool = init_paged_cache(cfg.lm, 2, total_pages, page, pps,
                                      jnp.float32, quantize=quantize)
        single = init_kv_cache(cfg.lm, 1, s_pad, jnp.float32)
        lg, single = chunked_prefill(lm, cfg.lm, embeds, mask, single,
                                     chunk=chunk, lengths=prompt_len)
        split_pool = paged_insert(split_pool, single, jnp.asarray(1),
                                  jnp.asarray(page_ids), total_pages)
        split_logits = jnp.zeros((2, cfg.lm.vocab_size)).at[1].set(lg[0])

        # Fused path.
        fused_pool = init_paged_cache(cfg.lm, 2, total_pages, page, pps,
                                      jnp.float32, quantize=quantize)
        fused_pool, fused_logits = fused_admit(
            lm, cfg.lm,
            embeds, mask, jnp.asarray([prompt_len], jnp.int32),
            fused_pool, jnp.zeros((2, cfg.lm.vocab_size)), jnp.asarray(1),
            jnp.asarray(page_ids), total_pages, chunk=chunk)

        np.testing.assert_allclose(np.asarray(fused_logits),
                                   np.asarray(split_logits), rtol=2e-5,
                                   atol=2e-5)
        np.testing.assert_array_equal(np.asarray(fused_pool.page_table),
                                      np.asarray(split_pool.page_table))
        np.testing.assert_array_equal(np.asarray(fused_pool.lengths),
                                      np.asarray(split_pool.lengths))
        # Pool contents on the REAL pages (trash page accumulates garbage
        # in a path-dependent order; exclude it).
        pax = split_pool.page_axis
        real = np.arange(1, n_pages + 1)

        def pages_of(pool, arr):
            sl = [slice(None)] * arr.ndim
            sl[pax] = real
            return np.asarray(arr)[tuple(sl)]

        for name in ("k_pages", "v_pages") + (
                ("k_scales", "v_scales") if quantize else ()):
            np.testing.assert_allclose(
                pages_of(fused_pool, getattr(fused_pool, name)),
                pages_of(split_pool, getattr(split_pool, name)),
                rtol=2e-5, atol=2e-5, err_msg=name)


def test_host_table_mirror_consistency(tiny):
    """The host page-table/lengths mirror tracks device state exactly.

    Host-side mutations (page growth, release) write the mirror and are
    uploaded wholesale by _sync_table before the next dispatch — a fixed
    shape, so no per-update-count scatter compiles (the round-3 paged
    TTFT collapse). Device-side writers (fused_admit) update the mirror
    to match. This drives admissions, page-boundary growth, slot release,
    and reuse, checking mirror == device at every step boundary."""
    cfg, params = tiny
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=8,
                                pages_per_seq=16, eos_token_id=-1)
    reqs = [_request(cfg, uid, seed=uid, max_new=9) for uid in range(4)]
    for r in reqs:
        engine.submit(r)

    def check():
        engine._sync_table()
        np.testing.assert_array_equal(
            np.asarray(engine.cache.page_table), engine._table_host)
        np.testing.assert_array_equal(
            np.asarray(engine.cache.lengths),
            engine._host_len.astype(np.int32))

    steps = 0
    while engine.has_work():
        engine.step(k=3)
        check()
        steps += 1
        assert steps < 50
    assert all(r.done and len(r.tokens) == 9 for r in reqs)
    # Mirror rows of freed slots are TRASH again.
    assert (engine._table_host == TRASH_PAGE).all()


def test_host_prompt_len_formula_image(tiny):
    """Image rows with a client prompt_len hint decode identically to the
    device-sum path: the host splice formula (text_len - 1 +
    tokens_per_frame) is verified once per shape signature, then trusted
    (serve/server.spliced_prompt_len_host). Video rows return None — the
    rmt splice carries only the last SceneTilling segment, whose valid
    frame count is data-dependent."""
    from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
    from videollamb_tpu.serve.server import spliced_prompt_len_host

    cfg, params = tiny

    def image_request(uid, seed, prompt_len=None, max_new=6):
        rng = np.random.default_rng(seed)
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 8)).astype(np.int32)
        ids[:, 2] = -200  # IMAGE sentinel
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 8), jnp.int32), labels=None,
            videos=None,
            images=jnp.asarray(
                rng.normal(size=(1, 3, 56, 56)).astype(np.float32)),
        )
        return Request(uid=uid, batch=batch, max_new_tokens=max_new,
                       temperature=0.0, prompt_len=prompt_len)

    req = image_request(0, seed=7)
    want = int(np.asarray(jnp.sum(prepare_multimodal_embeds_fast(
        params, cfg, req.batch, deterministic=True).attention_mask)))
    assert spliced_prompt_len_host(cfg, req.batch, 8) == want
    # Video rows are data-dependent: no host formula.
    assert spliced_prompt_len_host(cfg, _request(cfg, 0, 0).batch, 8) is None

    ref = [image_request(uid, seed=uid + 20) for uid in range(3)]
    hinted = [image_request(uid, seed=uid + 20, prompt_len=8)
              for uid in range(3)]

    e1 = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                            eos_token_id=-1)
    for r in ref:
        e1.submit(r)
    e1.run_until_drained()

    e2 = PagedServingEngine(params, cfg, num_slots=2, page_size=32,
                            eos_token_id=-1)
    for r in hinted:
        e2.submit(r)
    e2.run_until_drained()
    assert e2._len_verified  # the formula really was verified and cached
    for a, b in zip(ref, hinted):
        assert a.tokens == b.tokens


def test_prefetched_convoy_admission_matches_serial(tiny):
    """A convoy of video requests admitted together (one shared splice
    readback, _prefetch_admissions) produces the same tokens as one-at-a-
    time admission."""
    cfg, params = tiny
    serial = [_request(cfg, uid, seed=uid + 40) for uid in range(3)]
    convoy = [_request(cfg, uid, seed=uid + 40) for uid in range(3)]

    e1 = PagedServingEngine(params, cfg, num_slots=1, page_size=32,
                            eos_token_id=-1)
    for r in serial:
        e1.submit(r)
        e1.run_until_drained()

    e2 = PagedServingEngine(params, cfg, num_slots=3, page_size=32,
                            eos_token_id=-1)
    for r in convoy:
        e2.submit(r)
    e2.run_until_drained()
    for a, b in zip(serial, convoy):
        assert a.tokens == b.tokens
        assert a._spliced_cache is None or True  # cache cleared on admit
    assert all(getattr(r, "_spliced_cache", None) is None for r in convoy)
