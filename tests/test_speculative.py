"""Prompt-lookup speculative decoding: must be token-for-token identical
to plain greedy decode, accepting-path and rejecting-path alike."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import (
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
)
from videollamb_tpu.models.speculative import propose_lookup, speculative_decode


def test_propose_lookup_basic():
    ctx = [1, 2, 3, 9, 9, 1, 2, 3]
    assert propose_lookup(ctx, ngram=3, k=2) == [9, 9]
    # Shorter-ngram fallback.
    assert propose_lookup([5, 6, 7, 6], ngram=3, k=3) == [7, 6]
    # No match anywhere.
    assert propose_lookup([1, 2, 3, 4], ngram=2, k=3) == []
    # Most RECENT earlier occurrence wins.
    ctx = [1, 2, 5, 8, 1, 2, 6, 8, 1, 2]
    assert propose_lookup(ctx, ngram=2, k=1) == [6]


@pytest.fixture(scope="module")
def lm():
    cfg = LlamaConfig.tiny()
    params = {"lm": init_llama_params(jax.random.PRNGKey(0), cfg)}
    return cfg, params


def _greedy_reference(cfg, params, prompt_ids, max_new, eos):
    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    logits, cache = llama_prefill(
        params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray(prompt_ids[None])),
        jnp.ones((1, len(prompt_ids)), jnp.int32), cache,
    )
    toks = []
    for _ in range(max_new):
        nxt = int(jnp.argmax(logits[0]))
        if nxt == eos:
            break
        toks.append(nxt)
        logits, cache = llama_decode_step(
            params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray([[nxt]])), cache
        )
    return toks


@pytest.mark.parametrize("seed,repetitive", [(0, False), (1, True), (2, True)])
def test_speculative_matches_greedy(lm, seed, repetitive):
    cfg, params = lm
    rng = np.random.default_rng(seed)
    if repetitive:
        # Repetitive prompts maximize lookup hits (the accept path).
        phrase = rng.integers(4, 50, size=5).tolist()
        prompt = np.asarray(phrase * 4 + phrase[:3], np.int32)
    else:
        prompt = rng.integers(4, cfg.vocab_size, size=20).astype(np.int32)

    max_new = 16
    ref = _greedy_reference(cfg, params, prompt, max_new, eos=-1)

    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    logits, cache = llama_prefill(
        params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray(prompt[None])),
        jnp.ones((1, len(prompt)), jnp.int32), cache,
    )
    toks, cache, _, stats = speculative_decode(
        params, cfg, cache, logits, prompt.tolist(),
        max_new_tokens=max_new, eos_token_id=-1,
    )
    assert toks == ref, (toks, ref, stats)
    assert stats["tokens_per_step"] >= 1.0
    # The cache must land at exactly prompt + generated length.
    assert int(cache.length[0]) == len(prompt) + len(toks)


def test_speculative_cache_continues_correctly(lm):
    """After a speculative run (with rollbacks), continuing with plain
    decode steps must still match the pure-greedy chain — i.e. rolled-back
    slots never corrupt later attention."""
    cfg, params = lm
    rng = np.random.default_rng(3)
    phrase = rng.integers(4, 40, size=4).tolist()
    prompt = np.asarray(phrase * 3, np.int32)

    ref = _greedy_reference(cfg, params, prompt, 24, eos=-1)

    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    logits, cache = llama_prefill(
        params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray(prompt[None])),
        jnp.ones((1, len(prompt)), jnp.int32), cache,
    )
    toks, cache, logits, _ = speculative_decode(
        params, cfg, cache, logits, prompt.tolist(),
        max_new_tokens=12, eos_token_id=-1,
    )
    # Continue WITHOUT speculation from the speculative cache, using the
    # returned next-position logits.
    while len(toks) < 24:
        nxt = int(jnp.argmax(logits[0]))
        toks.append(nxt)
        logits, cache = llama_decode_step(
            params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray([[nxt]])), cache
        )
    assert toks == ref


def test_chat_generate_speculative_matches_generate():
    """The Chat-level speculative entry must produce the same greedy text
    as the one-shot engine generate."""
    import sys
    sys.path.insert(0, "tests")
    from test_serving import ChatTokenizer

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.constants import DEFAULT_X_TOKEN

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence assistant")
    chat = Chat(tok, params, cfg,
                {"VIDEO": VideoProcessor(size=56), "IMAGE": ImageProcessor(size=56)},
                text_bucket=32)
    frames = chat.processors["VIDEO"](
        np.random.default_rng(0).integers(0, 255, (8, 56, 56, 3)).astype(np.uint8))
    chat.conv.append_message(chat.conv.roles[0], DEFAULT_X_TOKEN["VIDEO"] + "\nwhat")
    chat.conv.append_message(chat.conv.roles[1], None)
    prompt = chat.conv.get_prompt()

    ref = chat.generate_text(prompt, videos=frames, max_new_tokens=8, do_sample=False)
    out, stats = chat.generate_speculative(prompt, videos=frames, max_new_tokens=8)
    assert out == ref, (out, ref, stats)


def _prefill(cfg, params, prompt_ids):
    cache = init_kv_cache(cfg, 1, 128, jnp.float32)
    return llama_prefill(
        params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray(prompt_ids[None])),
        jnp.ones((1, len(prompt_ids)), jnp.int32), cache,
    )


@pytest.mark.parametrize("draft_seed", [0, 7])
def test_draft_model_matches_greedy(lm, draft_seed):
    """Draft-model speculation is token-identical to plain greedy whatever
    the draft proposes: seed 0 = self-draft (perfect acceptance), seed 7 =
    an unrelated random draft (mostly rejected)."""
    from videollamb_tpu.models.speculative import speculative_decode_draft

    cfg, params = lm
    draft_cfg = cfg
    draft_params = (params if draft_seed == 0 else
                    {"lm": init_llama_params(jax.random.PRNGKey(draft_seed), cfg)})

    rng = np.random.default_rng(3)
    prompt = np.asarray(rng.integers(4, cfg.vocab_size, size=16), np.int32)
    ref = _greedy_reference(cfg, params, prompt, max_new=24, eos=-1)

    logits, cache = _prefill(cfg, params, prompt)
    _, d_cache = _prefill(draft_cfg, draft_params, prompt)
    toks, cache, next_logits, stats = speculative_decode_draft(
        params, cfg, cache, logits,
        draft_params=draft_params, draft_cfg=draft_cfg, draft_cache=d_cache,
        max_new_tokens=24, eos_token_id=-1, k=5,
    )
    assert toks == ref, (toks, ref, stats)
    if draft_seed == 0:
        # Self-draft: every proposal is the target's own greedy chain.
        assert stats["accept_rate"] == 1.0, stats
        assert stats["tokens_per_step"] > 2.5, stats
    # The returned cache/logits continue the chain correctly.
    more = []
    logits = next_logits
    for _ in range(4):
        nxt = int(jnp.argmax(logits[0]))
        more.append(nxt)
        logits, cache = llama_decode_step(
            params["lm"], cfg, embed_tokens(params["lm"], jnp.asarray([[nxt]])), cache)
    ref_more = _greedy_reference(cfg, params, prompt, max_new=28, eos=-1)[24:]
    assert more == ref_more


def test_draft_model_smaller_config(lm):
    """Draft and target may have different architectures (the production
    deployment pairs 7B with a ~1B draft)."""
    from videollamb_tpu.models.speculative import speculative_decode_draft

    cfg, params = lm
    draft_cfg = LlamaConfig.tiny(num_hidden_layers=1)
    draft_params = {"lm": init_llama_params(jax.random.PRNGKey(9), draft_cfg)}

    rng = np.random.default_rng(4)
    prompt = np.asarray(rng.integers(4, cfg.vocab_size, size=12), np.int32)
    ref = _greedy_reference(cfg, params, prompt, max_new=16, eos=-1)

    logits, cache = _prefill(cfg, params, prompt)
    _, d_cache = _prefill(draft_cfg, draft_params, prompt)
    toks, _, _, stats = speculative_decode_draft(
        params, cfg, cache, logits,
        draft_params=draft_params, draft_cfg=draft_cfg, draft_cache=d_cache,
        max_new_tokens=16, eos_token_id=-1, k=4,
    )
    assert toks == ref, (toks, ref, stats)


def test_chat_draft_speculation_int8_self_draft():
    """Chat-level draft speculation with an int8-quantized copy of the same
    model drafting for the f32 target: same greedy text, high acceptance
    (the quantized model mostly agrees with its own full-precision self)."""
    import sys
    sys.path.insert(0, "tests")
    from test_serving import ChatTokenizer

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.constants import DEFAULT_X_TOKEN
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    draft_params = {"lm": quantize_llama_params(
        jax.tree.map(jnp.array, params["lm"]))}
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence assistant")
    chat = Chat(tok, params, cfg,
                {"VIDEO": VideoProcessor(size=56), "IMAGE": ImageProcessor(size=56)},
                text_bucket=32)
    frames = chat.processors["VIDEO"](
        np.random.default_rng(1).integers(0, 255, (8, 56, 56, 3)).astype(np.uint8))
    chat.conv.append_message(chat.conv.roles[0], DEFAULT_X_TOKEN["VIDEO"] + "\nwhat")
    chat.conv.append_message(chat.conv.roles[1], None)
    prompt = chat.conv.get_prompt()

    ref = chat.generate_text(prompt, videos=frames, max_new_tokens=8, do_sample=False)
    out, stats = chat.generate_speculative(
        prompt, videos=frames, max_new_tokens=8, draft_params=draft_params, k=4)
    assert out == ref, (out, ref, stats)
    assert stats["draft_steps"] > 0


@pytest.mark.parametrize("mode", ["lookup", "draft"])
def test_ask_about_video_speculative_matches_plain(mode):
    """Chat.ask_about_video speculative branch (the serve CLI surface):
    same answer and same conversation bookkeeping as plain greedy."""
    import sys
    sys.path.insert(0, "tests")
    from test_serving import ChatTokenizer

    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.quant import quantize_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    procs = {"VIDEO": VideoProcessor(size=56), "IMAGE": ImageProcessor(size=56)}
    frames = procs["VIDEO"](
        np.random.default_rng(2).integers(0, 255, (8, 56, 56, 3)).astype(np.uint8))

    def fresh_chat():
        tok = ChatTokenizer()
        tok("A chat between a curious human and an artificial intelligence assistant")
        return Chat(tok, params, cfg, procs, text_bucket=32)

    plain = fresh_chat()
    ref = plain.ask_about_video("what", frames, max_new_tokens=8,
                                do_sample=False, temperature=0.0)

    kwargs = dict(speculative=mode)
    if mode == "draft":
        kwargs["draft_params"] = {"lm": quantize_llama_params(
            jax.tree.map(jnp.array, params["lm"]))}
    spec = fresh_chat()
    out = spec.ask_about_video("what", frames, max_new_tokens=8, **kwargs)
    assert out == ref
    assert spec.conv.messages[-1][1] == out
