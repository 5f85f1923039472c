"""Llama LM parity vs HF transformers (torch CPU, tiny config), plus
KV-cache consistency: prefill+decode must equal full-sequence forward.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401  (forces CPU platform)

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.convert import convert_llama_state_dict
from videollamb_tpu.models.lm.llama import (
    embed_tokens,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_forward,
    llama_prefill,
)

CFG = LlamaConfig.tiny()


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size,
        hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps,
        rope_theta=CFG.rope_theta,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_llama_state_dict(hf.state_dict()))
    return hf, params


def _ids(b, s, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, CFG.vocab_size, size=(b, s)).astype(np.int32)


@pytest.mark.parametrize("b,s", [(1, 16), (2, 24)])
def test_forward_matches_hf(hf_and_params, b, s):
    hf, params = hf_and_params
    ids = _ids(b, s)
    mask = np.ones((b, s), np.int32)
    mask[-1, s - 4:] = 0  # right padding on last row

    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))).logits.numpy()

    embeds = embed_tokens(params, jnp.asarray(ids))
    ours = np.asarray(llama_forward(params, CFG, embeds, jnp.asarray(mask)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-4)


def test_prefill_plus_decode_matches_full_forward(hf_and_params):
    _, params = hf_and_params
    b, s_prompt, n_new, s_max = 2, 12, 6, 32
    ids = _ids(b, s_prompt + n_new, seed=3)
    full_mask = np.ones((b, s_prompt + n_new), np.int32)

    # Full forward logits for reference.
    embeds = embed_tokens(params, jnp.asarray(ids))
    full_logits = np.asarray(llama_forward(params, CFG, embeds, jnp.asarray(full_mask)))

    # Prefill prompt, then feed the remaining tokens one at a time.
    cache = init_kv_cache(CFG, b, s_max, dtype=jnp.float32)
    prompt_embeds = embed_tokens(params, jnp.asarray(ids[:, :s_prompt]))
    logits, cache = llama_prefill(
        params, CFG, prompt_embeds, jnp.ones((b, s_prompt), jnp.int32), cache
    )
    np.testing.assert_allclose(
        np.asarray(logits), full_logits[:, s_prompt - 1], rtol=2e-4, atol=2e-4
    )
    assert np.asarray(cache.length).tolist() == [s_prompt, s_prompt]

    for t in range(n_new):
        tok = embed_tokens(params, jnp.asarray(ids[:, s_prompt + t: s_prompt + t + 1]))
        logits, cache = llama_decode_step(params, CFG, tok, cache)
        np.testing.assert_allclose(
            np.asarray(logits), full_logits[:, s_prompt + t], rtol=2e-4, atol=2e-4
        )


def test_prefill_ragged_rows(hf_and_params):
    """Right-padded prefill: each row's last-token logits must match that
    row's own-length forward."""
    _, params = hf_and_params
    ids = _ids(2, 16, seed=4)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    cache = init_kv_cache(CFG, 2, 32, dtype=jnp.float32)
    embeds = embed_tokens(params, jnp.asarray(ids))
    last, cache = llama_prefill(params, CFG, embeds, jnp.asarray(mask), cache)

    for row, length in [(0, 16), (1, 10)]:
        row_embeds = embed_tokens(params, jnp.asarray(ids[row:row + 1, :length]))
        row_logits = np.asarray(
            llama_forward(params, CFG, row_embeds, jnp.ones((1, length), jnp.int32))
        )
        np.testing.assert_allclose(
            np.asarray(last[row]), row_logits[0, -1], rtol=2e-4, atol=2e-4
        )


def test_init_matches_converted_tree(hf_and_params):
    _, converted = hf_and_params
    ours = init_llama_params(jax.random.PRNGKey(0), CFG)
    assert jax.tree.structure(ours) == jax.tree.structure(converted)


def test_resize_token_embeddings(hf_and_params):
    from videollamb_tpu.models.lm.convert import resize_token_embeddings

    _, params = hf_and_params
    old_v = params["embed_tokens"].shape[0]
    grown = resize_token_embeddings(dict(params), old_v + 3)
    assert grown["embed_tokens"].shape[0] == old_v + 3
    assert grown["lm_head"].shape[1] == old_v + 3
    np.testing.assert_allclose(
        np.asarray(grown["embed_tokens"][old_v]),
        np.asarray(params["embed_tokens"]).mean(0), rtol=1e-4, atol=1e-7,
    )
    # No-op when new vocab <= old.
    same = resize_token_embeddings(dict(params), old_v)
    assert same["embed_tokens"].shape[0] == old_v


def test_chunked_prefill_matches_whole_prefill():
    """chunked_prefill (fixed-shape llama_extend slices — the engines'
    admission path) must reproduce llama_prefill's last-token logits and
    the subsequent greedy chain, including rows shorter than one chunk
    and rows spanning several."""
    from videollamb_tpu.models.lm.llama import (
        chunked_prefill, embed_tokens, init_kv_cache, llama_decode_step,
        llama_prefill,
    )

    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    s_pad, lens = 40, [5, 19]  # row 0 fits in one 8-chunk, row 1 spans 3
    ids = rng.integers(4, cfg.vocab_size, size=(2, s_pad)).astype(np.int32)
    mask = np.zeros((2, s_pad), np.int32)
    for i, ln in enumerate(lens):
        mask[i, :ln] = 1
        ids[i, ln:] = 0
    emb = embed_tokens(params, jnp.asarray(ids))

    def chain(logits, cache, steps=4):
        toks = []
        for _ in range(steps):
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            toks.append(np.asarray(nxt))
            logits, cache = llama_decode_step(
                params, cfg, embed_tokens(params, nxt[:, None]), cache)
        return np.stack(toks)

    c1 = init_kv_cache(cfg, 2, 64, jnp.float32)
    ref_logits, c1 = llama_prefill(params, cfg, emb, jnp.asarray(mask), c1)
    ref_chain = chain(ref_logits, c1)

    c2 = init_kv_cache(cfg, 2, 64, jnp.float32)
    got_logits, c2 = chunked_prefill(
        params, cfg, jnp.array(emb), jnp.asarray(mask), c2, chunk=8)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(c2.length), np.asarray(lens))
    # (decode steps donate the cache — length checked first)
    np.testing.assert_array_equal(chain(got_logits, c2), ref_chain)
