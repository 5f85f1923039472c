"""Tests for the static-shape multimodal splice and full model assembly.

The splice oracle is a direct Python re-statement of the reference's ragged
concatenation semantics (llava_arch.py:492-660): split on the sentinel,
insert visual rows, truncate to max_len, right-pad, IGNORE visual labels.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import IGNORE_INDEX, VIDEO_TOKEN_INDEX
from videollamb_tpu.models.assembly import (
    MultimodalBatch,
    causal_lm_loss,
    videollamb_forward,
)
from videollamb_tpu.models.engine import generate
from videollamb_tpu.models.lm.llama import embed_tokens, llama_forward
from videollamb_tpu.models.splice import splice_multimodal


def _python_splice(ids, valid, labels, text_emb, x_emb, x_mask, max_len):
    """Reference-semantics oracle (llava_arch.py:560-613): the k-th sentinel
    in a row is replaced by the k-th visual block (cur_x_idx walk), then
    truncate to max_len and right-pad."""
    x_emb = np.asarray(x_emb)
    x_mask = np.asarray(x_mask)
    if x_emb.ndim == 2:  # single block
        x_emb, x_mask = x_emb[None], x_mask[None]
    out_emb, out_lab = [], []
    k = 0
    for i, tok in enumerate(ids):
        if not valid[i]:
            continue
        if tok < 0:
            if k < len(x_emb):
                for j in range(x_mask.shape[1]):
                    if x_mask[k, j]:
                        out_emb.append(x_emb[k, j])
                        out_lab.append(IGNORE_INDEX)
            k += 1
        else:
            out_emb.append(text_emb[i])
            out_lab.append(labels[i])
    out_emb = out_emb[:max_len]
    out_lab = out_lab[:max_len]
    n = len(out_emb)
    d = text_emb.shape[-1]
    emb = np.zeros((max_len, d), np.float32)
    emb[:n] = np.stack(out_emb) if out_emb else np.zeros((0, d))
    lab = np.full((max_len,), IGNORE_INDEX, np.int32)
    lab[:n] = out_lab
    attn = np.zeros((max_len,), bool)
    attn[:n] = True
    return emb, attn, lab, n


@pytest.mark.parametrize("case", ["mid", "start", "short_x", "no_x", "truncate"])
def test_splice_matches_python_oracle(case):
    rng = np.random.default_rng(0)
    d, n_x, max_len = 8, 6, 24
    if case == "mid":
        ids = np.array([5, 6, VIDEO_TOKEN_INDEX, 7, 8, 9, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        xm = np.ones(n_x, bool)
    elif case == "start":
        ids = np.array([VIDEO_TOKEN_INDEX, 7, 8, 9, 0, 0, 0, 0])
        valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
        xm = np.ones(n_x, bool)
    elif case == "short_x":
        ids = np.array([5, 6, VIDEO_TOKEN_INDEX, 7, 8, 9, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        xm = np.array([1, 1, 1, 0, 0, 0], bool)
    elif case == "no_x":
        ids = np.array([5, 6, 3, 7, 8, 9, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        xm = np.zeros(n_x, bool)
    else:  # truncate
        max_len = 8
        ids = np.array([5, 6, VIDEO_TOKEN_INDEX, 7, 8, 9, 1, 1])
        valid = np.ones(8, bool)
        xm = np.ones(n_x, bool)

    labels = np.where(valid, ids, IGNORE_INDEX)
    text_emb = rng.normal(size=(len(ids), d)).astype(np.float32)
    x_emb = rng.normal(size=(n_x, d)).astype(np.float32)

    ref_emb, ref_attn, ref_lab, ref_len = _python_splice(
        ids, valid, labels, text_emb, x_emb, xm, max_len
    )
    out = splice_multimodal(
        jnp.asarray(ids[None]), jnp.asarray(valid[None]), jnp.asarray(labels[None]),
        jnp.asarray(text_emb[None]), jnp.asarray(x_emb[None]), jnp.asarray(xm[None]),
        max_len,
    )
    np.testing.assert_allclose(np.asarray(out.embeds[0]), ref_emb, rtol=1e-6)
    assert np.asarray(out.attention_mask[0]).tolist() == ref_attn.tolist()
    assert np.asarray(out.labels[0]).tolist() == ref_lab.tolist()
    assert int(out.lengths[0]) == ref_len


@pytest.fixture(scope="module")
def tiny_model():
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny()
    k = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(k, 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    return cfg, params


def _video_batch(cfg, b=2, t=16, text_len=12, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(b, text_len)).astype(np.int32)
    ids[:, 3] = VIDEO_TOKEN_INDEX
    mask = np.ones((b, text_len), np.int32)
    videos = rng.normal(size=(b, t, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32)
    return MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(mask),
        labels=jnp.asarray(np.where(mask, ids, IGNORE_INDEX)),
        videos=jnp.asarray(videos),
        images=None,
    )


def test_end_to_end_forward_and_loss(tiny_model):
    cfg, params = tiny_model
    batch = _video_batch(cfg)
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert logits.shape == (2, cfg.max_length, cfg.lm.vocab_size)
    loss, n = causal_lm_loss(logits, spliced.labels)
    assert np.isfinite(float(loss)) and int(n) > 0
    # Spliced length = text_len - 1 sentinel + valid video tokens.
    assert int(spliced.lengths[0]) >= 12 - 1 + cfg.bridge.tokens_per_frame


def test_generate_greedy_matches_incremental_full_forward(tiny_model):
    """Greedy generate (prefill + cached decode) must equal the argmax chain
    from repeated full forwards over the growing spliced sequence."""
    cfg, params = tiny_model
    batch = _video_batch(cfg, b=1, t=8, text_len=8, seed=2)
    max_new = 5

    res = generate(
        params, cfg, batch, jax.random.PRNGKey(0),
        max_new_tokens=max_new, do_sample=False,
        eos_token_id=-1,  # never fires in a random tiny model
        max_seq_len=cfg.max_length + max_new + 1,
    )

    # Oracle: grow the spliced embed sequence manually.
    from videollamb_tpu.models.assembly import prepare_multimodal_embeds

    spliced = prepare_multimodal_embeds(params, cfg, batch)
    length = int(spliced.lengths[0])
    embeds = np.asarray(spliced.embeds[0][:length])
    toks = []
    for _ in range(max_new):
        e = jnp.asarray(embeds[None])
        logits = llama_forward(
            params["lm"], cfg.lm, e, jnp.ones((1, e.shape[1]), jnp.int32)
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        toks.append(nxt)
        next_embed = np.asarray(embed_tokens(params["lm"], jnp.asarray([[nxt]]))[0])
        embeds = np.concatenate([embeds, next_embed], axis=0)

    assert np.asarray(res.tokens[0]).tolist() == toks
    assert int(res.lengths[0]) == max_new


def test_image_batch_forward(tiny_model):
    cfg, params = tiny_model
    rng = np.random.default_rng(1)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 10)).astype(np.int32)
    ids[:, 0] = -200  # IMAGE sentinel
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 10), jnp.int32),
        labels=None,
        videos=None,
        images=jnp.asarray(rng.normal(size=(2, 3, 56, 56)).astype(np.float32)),
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert int(spliced.lengths[0]) == 10 - 1 + cfg.bridge.tokens_per_frame
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize(
    "case", ["two_mid", "adjacent", "more_sent_than_blocks", "more_blocks", "truncate_multi"]
)
def test_splice_multi_sentinel_matches_oracle(case):
    """K-sentinel rows: k-th sentinel <- k-th block (llava_arch.py:586-599)."""
    rng = np.random.default_rng(7)
    d = 8
    S = VIDEO_TOKEN_INDEX
    if case == "two_mid":
        ids = np.array([5, S, 6, 7, S, 8, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        k, n, max_len = 2, 4, 32
        xm = np.ones((k, n), bool)
    elif case == "adjacent":
        ids = np.array([S, S, 6, 7, 8, 9, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        k, n, max_len = 2, 3, 32
        xm = np.array([[1, 1, 0], [1, 1, 1]], bool)
    elif case == "more_sent_than_blocks":
        ids = np.array([5, S, 6, S, 7, S, 8, 9])
        valid = np.ones(8, bool)
        k, n, max_len = 2, 3, 32
        xm = np.ones((k, n), bool)
    elif case == "more_blocks":
        ids = np.array([5, S, 6, 7, 8, 9, 0, 0])
        valid = np.array([1, 1, 1, 1, 1, 1, 0, 0], bool)
        k, n, max_len = 3, 3, 32
        xm = np.ones((k, n), bool)
    else:  # truncate_multi
        ids = np.array([5, S, 6, S, 7, 8, 9, 1])
        valid = np.ones(8, bool)
        k, n, max_len = 2, 5, 10
        xm = np.ones((k, n), bool)

    labels = np.where(valid, ids, IGNORE_INDEX)
    text_emb = rng.normal(size=(len(ids), d)).astype(np.float32)
    x_emb = rng.normal(size=(k, n, d)).astype(np.float32)

    ref_emb, ref_attn, ref_lab, ref_len = _python_splice(
        ids, valid, labels, text_emb, x_emb, xm, max_len
    )
    out = splice_multimodal(
        jnp.asarray(ids[None].astype(np.int32)), jnp.asarray(valid[None]),
        jnp.asarray(labels[None].astype(np.int32)), jnp.asarray(text_emb[None]),
        jnp.asarray(x_emb[None]), jnp.asarray(xm[None]), max_len,
    )
    np.testing.assert_allclose(np.asarray(out.embeds[0]), ref_emb, rtol=1e-6)
    assert np.asarray(out.attention_mask[0]).tolist() == ref_attn.tolist()
    assert np.asarray(out.labels[0]).tolist() == ref_lab.tolist()
    assert int(out.lengths[0]) == ref_len


def test_splice_multi_sentinel_fuzz():
    """Property fuzz over K blocks: random sentinel counts/positions/masks."""
    rng = np.random.default_rng(123)
    d = 6
    shapes = [(8, 2, 4, 16), (16, 3, 6, 30), (23, 4, 7, 35), (6, 1, 3, 8),
              (12, 4, 5, 20)]
    for trial in range(40):
        t, k, n, max_len = shapes[trial % len(shapes)]
        ids = rng.integers(3, 50, size=t).astype(np.int64)
        n_valid = int(rng.integers(1, t + 1))
        valid = np.zeros(t, bool)
        valid[:n_valid] = True
        n_sent = int(rng.integers(0, min(k + 2, n_valid) + 1))
        if n_sent and n_valid:
            sent_pos = rng.choice(n_valid, size=min(n_sent, n_valid), replace=False)
            ids[sent_pos] = VIDEO_TOKEN_INDEX
        xm = rng.random((k, n)) < 0.7
        labels = np.where(valid, ids, IGNORE_INDEX)
        text_emb = rng.normal(size=(t, d)).astype(np.float32)
        x_emb = rng.normal(size=(k, n, d)).astype(np.float32)

        ref_emb, ref_attn, ref_lab, ref_len = _python_splice(
            ids, valid, labels, text_emb, x_emb, xm, max_len
        )
        out = splice_multimodal(
            jnp.asarray(ids[None].astype(np.int32)), jnp.asarray(valid[None]),
            jnp.asarray(labels[None].astype(np.int32)), jnp.asarray(text_emb[None]),
            jnp.asarray(x_emb[None]), jnp.asarray(xm[None]), max_len,
        )
        np.testing.assert_allclose(
            np.asarray(out.embeds[0]), ref_emb, rtol=1e-6, err_msg=f"trial {trial}"
        )
        assert np.asarray(out.labels[0]).tolist() == ref_lab.tolist(), f"trial {trial}"
        assert int(out.lengths[0]) == ref_len, f"trial {trial}"


def test_splice_fuzz_against_oracle():
    """Property fuzz: random sentinel positions, lengths, masks, x counts."""
    rng = np.random.default_rng(42)
    d = 6
    # Shape BUCKETS: each distinct (t, n_x, max_len) forces a fresh jit
    # compile; 40 random shapes made this the slowest test in the suite.
    shapes = [(6, 4, 12), (12, 8, 20), (19, 11, 27), (5, 2, 6), (16, 5, 24)]
    for trial in range(40):
        t, n_x, max_len = shapes[trial % len(shapes)]
        ids = rng.integers(3, 50, size=t).astype(np.int64)
        n_valid = int(rng.integers(1, t + 1))
        valid = np.zeros(t, bool)
        valid[:n_valid] = True
        if rng.random() < 0.8 and n_valid > 0:
            ids[rng.integers(0, n_valid)] = VIDEO_TOKEN_INDEX
        xm = rng.random(n_x) < 0.7
        labels = np.where(valid, ids, IGNORE_INDEX)
        text_emb = rng.normal(size=(t, d)).astype(np.float32)
        x_emb = rng.normal(size=(n_x, d)).astype(np.float32)

        ref_emb, ref_attn, ref_lab, ref_len = _python_splice(
            ids, valid, labels, text_emb, x_emb, xm, max_len
        )
        out = splice_multimodal(
            jnp.asarray(ids[None].astype(np.int32)), jnp.asarray(valid[None]),
            jnp.asarray(labels[None].astype(np.int32)),
            jnp.asarray(text_emb[None]), jnp.asarray(x_emb[None]),
            jnp.asarray(xm[None]), max_len,
        )
        np.testing.assert_allclose(
            np.asarray(out.embeds[0]), ref_emb, rtol=1e-6,
            err_msg=f"trial {trial}",
        )
        assert np.asarray(out.labels[0]).tolist() == ref_lab.tolist(), f"trial {trial}"
        assert int(out.lengths[0]) == ref_len, f"trial {trial}"


def test_multi_image_conversation_forward(tiny_model):
    """Two IMAGE sentinels per row bound to two different images
    (reference multi-X conversations, llava_arch.py:560-599)."""
    cfg, params = tiny_model
    rng = np.random.default_rng(4)
    ids = rng.integers(4, cfg.lm.vocab_size, size=(2, 12)).astype(np.int32)
    ids[:, 1] = -200
    ids[:, 6] = -200
    images = rng.normal(size=(2, 2, 3, 56, 56)).astype(np.float32)
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones((2, 12), jnp.int32),
        labels=None,
        videos=None,
        images=jnp.asarray(images),
    )
    logits, spliced = videollamb_forward(params, cfg, batch)
    assert np.isfinite(np.asarray(logits)).all()
    # Length: 12 text - 2 sentinels + 2 blocks of bridge tokens.
    assert int(spliced.lengths[0]) == 12 - 2 + 2 * cfg.bridge.tokens_per_frame
    # The two blocks differ (different images -> different features).
    from videollamb_tpu.models.assembly import encode_images

    t0, _ = encode_images(params, cfg, jnp.asarray(images[:, 0]))
    t1, _ = encode_images(params, cfg, jnp.asarray(images[:, 1]))
    assert not np.allclose(np.asarray(t0), np.asarray(t1))


def test_fast_splice_matches_plain_all_batch_kinds(tiny_model):
    """prepare_multimodal_embeds_fast (the jitted serving-path splice,
    round 3: engines/Chat called the plain function EAGERLY — ~1.5 s of
    per-op tunnel dispatch per admission) must be numerically identical
    to prepare_multimodal_embeds for every batch kind it serves."""
    from videollamb_tpu.constants import X_TOKEN_INDEX
    from videollamb_tpu.models.assembly import (
        prepare_multimodal_embeds,
        prepare_multimodal_embeds_fast,
    )

    cfg, params = tiny_model
    rng = np.random.default_rng(7)
    size = cfg.vision.image_size

    def text_batch(with_sentinels=()):
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 14)).astype(np.int32)
        for j, s in enumerate(with_sentinels):
            ids[0, 2 + j] = s
        return ids, np.ones((1, 14), np.int32)

    cases = {}
    cases["video"] = _video_batch(cfg, b=2)
    ids, mask = text_batch((X_TOKEN_INDEX["IMAGE"],))
    cases["image"] = MultimodalBatch(
        jnp.asarray(ids), jnp.asarray(mask), None, None,
        jnp.asarray(rng.normal(size=(1, 3, size, size)), jnp.float32))
    ids, mask = text_batch()
    cases["text_only"] = MultimodalBatch(
        jnp.asarray(ids), jnp.asarray(mask), None, None, None)
    ids, mask = text_batch((X_TOKEN_INDEX["VIDEO"], X_TOKEN_INDEX["IMAGE"]))
    cases["mixed"] = MultimodalBatch(
        jnp.asarray(ids), jnp.asarray(mask), None, None, None,
        blocks=(
            ("VIDEO", jnp.asarray(rng.normal(size=(8, 3, size, size)),
                                  jnp.float32)),
            ("IMAGE", jnp.asarray(rng.normal(size=(3, size, size)),
                                  jnp.float32)),
        ))

    for name, batch in cases.items():
        ref = prepare_multimodal_embeds(params, cfg, batch)
        got = prepare_multimodal_embeds_fast(params, cfg, batch)
        np.testing.assert_allclose(
            np.asarray(got.embeds), np.asarray(ref.embeds),
            rtol=2e-5, atol=2e-5, err_msg=name)
        assert np.array_equal(np.asarray(got.attention_mask),
                              np.asarray(ref.attention_mask)), name
        assert np.array_equal(np.asarray(got.lengths),
                              np.asarray(ref.lengths)), name
