"""Gathered int8 paged attention (ops/gathered_paged_attention.py): the
token-major pool layout, the Pallas kernel (interpret mode on CPU), and
the XLA twin must all agree with each other and with the head-major
pool-int8 reference on identical data; the paged decode step and engine
must keep their dense-parity bars under the new layout."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.lm.llama import (
    embed_tokens,
    init_kv_cache,
    llama_decode_step,
    llama_prefill,
)
from videollamb_tpu.models.lm.paged import (
    TRASH_PAGE,
    init_paged_cache,
    insert_raw_pages,
    gather_slot_pages,
    paged_decode_step,
    paged_insert,
)
from videollamb_tpu.ops.gathered_paged_attention import (
    MAX_INT8,
    _pick_ppb,
    attend_token_major_int8_stats,
    gathered_paged_attention_int8,
)
from videollamb_tpu.ops.paged_attention_stats import attend_pool_int8_stats
from videollamb_tpu.serve.paged import PageAllocator


def _random_pool(rng, p_total, page, h_kv, dh, b, pps):
    """Token-major int8 pool + matching head-major copy + tables."""
    kd = h_kv * dh
    k_tm = rng.integers(-127, 128, size=(p_total, page, kd)).astype(np.int8)
    v_tm = rng.integers(-127, 128, size=(p_total, page, kd)).astype(np.int8)
    ks_tm = rng.uniform(0.5, 2.0, size=(p_total, page, h_kv)).astype(np.float32)
    vs_tm = rng.uniform(0.5, 2.0, size=(p_total, page, h_kv)).astype(np.float32)
    # Page tables: disjoint pages per slot, lengths ragged.
    table = np.full((b, pps), TRASH_PAGE, np.int32)
    nxt = 1
    lengths = []
    for i in range(b):
        n = rng.integers(0, pps + 1)
        for j in range(n):
            table[i, j] = nxt
            nxt += 1
        lengths.append(int(rng.integers(0, n * page + 1)) if n else 0)
    return (jnp.asarray(k_tm), jnp.asarray(v_tm), jnp.asarray(ks_tm),
            jnp.asarray(vs_tm), jnp.asarray(table),
            jnp.asarray(np.asarray(lengths, np.int32)))


@pytest.mark.parametrize("h,h_kv,dh", [(8, 8, 128), (8, 2, 128)])
def test_twin_matches_head_major_reference(h, h_kv, dh):
    """attend_token_major_int8_stats == attend_pool_int8_stats on the
    same data (the twin is a pure relayout)."""
    rng = np.random.default_rng(0)
    b, p_total, page, pps = 3, 12, 16, 3
    k_tm, v_tm, ks_tm, vs_tm, table, lengths = _random_pool(
        rng, p_total, page, h_kv, dh, b, pps)
    q = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32)) * 0.1

    o1, m1, l1 = attend_token_major_int8_stats(
        q, k_tm, v_tm, table, lengths, ks_tm, vs_tm)
    kp = k_tm.reshape(p_total, page, h_kv, dh).transpose(2, 0, 1, 3)
    vp = v_tm.reshape(p_total, page, h_kv, dh).transpose(2, 0, 1, 3)
    o2, m2, l2 = attend_pool_int8_stats(
        q, kp, vp, table, lengths,
        ks_tm.transpose(2, 0, 1)[..., None],
        vs_tm.transpose(2, 0, 1)[..., None])
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-6)


@pytest.mark.parametrize("h,h_kv,dh,pps", [
    (8, 8, 128, 4),   # MHA
    (8, 2, 128, 4),   # GQA groups=4
    (4, 4, 128, 8),   # more blocks than one
])
def test_kernel_matches_twin(h, h_kv, dh, pps):
    """The Pallas kernel (interpret mode) reproduces the XLA twin up to
    the per-block probability requantization (bounded small)."""
    rng = np.random.default_rng(1)
    b, page = 4, 16
    p_total = 1 + b * pps
    k_tm, v_tm, ks_tm, vs_tm, table, lengths = _random_pool(
        rng, p_total, page, h_kv, dh, b, pps)
    q = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32)) * 0.05
    ppb = _pick_ppb(pps, page)

    o_k, m_k, l_k = gathered_paged_attention_int8(
        q, k_tm, v_tm, table, lengths, ks_tm, vs_tm,
        pages_per_block=ppb, interpret=True)
    o_t, m_t, l_t = attend_token_major_int8_stats(
        q, k_tm, v_tm, table, lengths, ks_tm, vs_tm)

    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_t),
                               rtol=1e-4, atol=1e-4)
    # outputs: requant path differs (per-block vs per-row w scales).
    scale = np.abs(np.asarray(o_t)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(o_k) / scale,
                               np.asarray(o_t) / scale, atol=2e-2)
    # zero-length rows: exact contract.
    lens = np.asarray(lengths)
    for i in np.nonzero(lens == 0)[0]:
        assert np.all(np.asarray(o_k)[i] == 0)
        assert np.all(np.asarray(m_k)[i] == -np.inf)
        assert np.all(np.asarray(l_k)[i] == 0)


def test_kernel_partial_page_masking():
    """Lengths not multiples of the page size mask the page tail."""
    rng = np.random.default_rng(2)
    h = h_kv = 4
    dh, page, pps, b = 128, 16, 2, 2
    p_total = 1 + b * pps
    k_tm, v_tm, ks_tm, vs_tm, table, _ = _random_pool(
        rng, p_total, page, h_kv, dh, b, pps)
    lengths = jnp.asarray(np.array([7, 23], np.int32))  # mid-page cuts
    table = jnp.asarray(np.array([[1, TRASH_PAGE], [2, 3]], np.int32))
    q = jnp.asarray(rng.normal(size=(b, h, dh)).astype(np.float32)) * 0.05
    o_k, m_k, l_k = gathered_paged_attention_int8(
        q, k_tm, v_tm, table, lengths, ks_tm, vs_tm,
        pages_per_block=1, interpret=True)
    o_t, m_t, l_t = attend_token_major_int8_stats(
        q, k_tm, v_tm, table, lengths, ks_tm, vs_tm)
    np.testing.assert_allclose(np.asarray(m_k), np.asarray(m_t),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_k), np.asarray(l_t),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Token-major layout: round trips + decode-step parity
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny():
    from videollamb_tpu.models.lm.llama import init_llama_params

    cfg = ModelConfig.tiny(max_length=128)
    lm = init_llama_params(jax.random.PRNGKey(0), cfg.lm)
    return cfg, lm


def test_token_major_swap_roundtrip(tiny):
    cfg, lm = tiny
    cache = init_paged_cache(cfg.lm, 2, 9, page_size=16, pages_per_seq=4,
                             quantize=True)
    assert cache.token_major and cache.page_axis == 1
    rng = np.random.default_rng(3)
    cache = cache._replace(
        k_pages=jnp.asarray(rng.integers(
            -127, 128, size=cache.k_pages.shape).astype(np.int8)),
        k_scales=jnp.asarray(rng.uniform(
            0.5, 1.5, size=cache.k_scales.shape).astype(np.float32)))
    ids = jnp.asarray(np.array([2, 5], np.int32))
    want_k = np.asarray(cache.k_pages)
    want_ks = np.asarray(cache.k_scales)
    k, v, ks, vs = gather_slot_pages(cache, ids)
    assert k.shape[1] == 2  # page axis 1
    cache2 = insert_raw_pages(cache, k, v, ids, ks, vs)  # donates cache
    np.testing.assert_array_equal(np.asarray(cache2.k_pages), want_k)
    np.testing.assert_array_equal(np.asarray(cache2.k_scales), want_ks)


def test_quantized_paged_decode_close_to_dense_token_major(tiny):
    """The r3 parity bar under the new layout: int8 token-major paged
    decode tracks the dense cache within a few percent."""
    cfg, lm = tiny
    page, total_pages, pps = 16, 9, 4
    rng = np.random.default_rng(4)
    prompt_len = 14
    embeds = jnp.asarray(
        rng.normal(size=(1, prompt_len, cfg.lm.hidden_size)).astype(np.float32))
    mask = jnp.ones((1, prompt_len), jnp.int32)

    dense = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_d, dense = llama_prefill(lm, cfg.lm, embeds, mask, dense)

    paged = init_paged_cache(cfg.lm, 1, total_pages, page, pps, jnp.float32,
                             quantize=True)
    alloc = PageAllocator(total_pages)
    pages = alloc.alloc(2)
    page_ids = np.full((pps,), TRASH_PAGE, np.int32)
    page_ids[:2] = pages
    single = init_kv_cache(cfg.lm, 1, cfg.max_length, jnp.float32)
    logits_p, single = llama_prefill(lm, cfg.lm, embeds, mask, single)
    paged = paged_insert(paged, single, jnp.asarray(0), jnp.asarray(page_ids),
                         total_pages)

    rel = []
    for _ in range(4):
        nxt = jnp.argmax(logits_d, -1).astype(jnp.int32)
        te = embed_tokens(lm, nxt[:, None])
        logits_d, dense = llama_decode_step(lm, cfg.lm, te, dense)
        logits_p, paged = paged_decode_step(lm, cfg.lm, te, paged, total_pages)
        a, b2 = np.asarray(logits_d), np.asarray(logits_p)
        rel.append(np.abs(a - b2).max() / (np.abs(a).max() + 1e-6))
    assert max(rel) < 0.08, rel


def test_pick_ppb():
    assert _pick_ppb(4, 64) == 4
    assert _pick_ppb(32, 64) == 8  # 8 * 64 = 512-token block target
    assert _pick_ppb(3, 16) == 3
    assert _pick_ppb(1, 512) == 1
    assert _pick_ppb(8, 16) == 8


def test_paged_fresh_write_kernel_parity():
    """The in-place fresh-KV install kernel (interpret mode) matches the
    XLA DUS-chain statement exactly, int8 in/out."""
    from videollamb_tpu.ops.paged_fresh_write import (
        paged_fresh_write, paged_fresh_write_xla,
    )

    L, B, P, page, KD = 4, 3, 9, 8, 256
    rng = np.random.default_rng(0)
    kp = jnp.asarray(rng.integers(-127, 127, (L, P, page, KD)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 127, (L, P, page, KD)), jnp.int8)
    fk = jnp.asarray(rng.integers(-127, 127, (L, B, KD)), jnp.int8)
    fv = jnp.asarray(rng.integers(-127, 127, (L, B, KD)), jnp.int8)
    wp = jnp.asarray([1, 4, 7], jnp.int32)
    wo = jnp.asarray([0, 3, 7], jnp.int32)

    k2, v2 = paged_fresh_write(jnp.array(kp), jnp.array(vp), fk, fv, wp, wo,
                               interpret=True)
    k3, v3 = paged_fresh_write_xla(kp, vp, fk, fv, np.asarray(wp),
                                   np.asarray(wo))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k3))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))
