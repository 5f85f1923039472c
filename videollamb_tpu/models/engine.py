"""Generation engine: prefill + lax.while_loop decode with a static KV cache.

Replaces HF ``model.generate`` (reference llava_llama.py:113-151 +
KeywordsStoppingCriteria, llava/mm_utils.py:236-268) with a single compiled
graph: multimodal prefill computes the spliced embeddings once, then a
``lax.while_loop`` samples token-by-token until every row hit EOS or the
budget. Greedy, temperature, and nucleus (top-p) sampling supported —
matching the reference eval settings (do_sample, temperature=0.2,
model_videoqa_mc.py:93-95).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.assembly import (
    MultimodalBatch,
    Params,
    prepare_multimodal_embeds_fast,
)
from videollamb_tpu.models.lm.llama import (
    embed_tokens,
    init_kv_cache,
    llama_decode_step,
    llama_prefill,
)


def sample_token(
    logits: jax.Array,  # (B, V) float32
    rng: jax.Array,
    *,
    do_sample: bool,
    temperature: float,
    top_p: float,
) -> jax.Array:
    """Sample next tokens (B,). Greedy when do_sample is False or temp == 0."""
    if not do_sample or temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.asarray(temperature, logits.dtype)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # Keep the smallest set with cumulative prob >= top_p (HF semantics:
        # tokens whose prefix-exclusive cumsum < top_p are kept).
        keep_sorted = (cum - probs) < top_p
        threshold = jnp.min(
            jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits >= threshold, logits, -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


class GenerateResult(NamedTuple):
    tokens: jax.Array  # (B, max_new_tokens) int32, pad_id after EOS
    lengths: jax.Array  # (B,) generated length incl. EOS


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "temperature", "top_p",
                     "eos_token_id", "pad_token_id", "max_seq_len"),
)
def generate(
    params: Params,
    cfg: ModelConfig,
    batch: MultimodalBatch,
    rng: jax.Array,
    *,
    max_new_tokens: int = 128,
    do_sample: bool = False,
    temperature: float = 0.2,
    top_p: float = 1.0,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    max_seq_len: int = 4096,
) -> GenerateResult:
    """Multimodal generation, one compiled graph per shape bucket."""
    spliced = prepare_multimodal_embeds_fast(params, cfg, batch, deterministic=True)
    return generate_spliced(
        params, cfg, spliced, rng, max_new_tokens=max_new_tokens,
        do_sample=do_sample, temperature=temperature, top_p=top_p,
        eos_token_id=eos_token_id, pad_token_id=pad_token_id,
        max_seq_len=max_seq_len,
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "max_new_tokens", "do_sample", "temperature", "top_p",
                     "eos_token_id", "pad_token_id", "max_seq_len"),
)
def generate_spliced(
    params: Params,
    cfg: ModelConfig,
    spliced,
    rng: jax.Array,
    *,
    max_new_tokens: int = 128,
    do_sample: bool = False,
    temperature: float = 0.2,
    top_p: float = 1.0,
    eos_token_id: int = 2,
    pad_token_id: int = 0,
    max_seq_len: int = 4096,
) -> GenerateResult:
    """Generation from an already-spliced batch. Entry point for callers
    whose splice cannot be traced (mixed-modality ``blocks`` batches carry
    static modality strings — assembly.encode_mixed runs eagerly, its
    per-block encoders are jitted individually)."""
    b = spliced.embeds.shape[0]

    assert max_seq_len >= cfg.max_length + max_new_tokens, (
        f"max_seq_len={max_seq_len} must cover the spliced buffer "
        f"(cfg.max_length={cfg.max_length}) plus max_new_tokens={max_new_tokens}"
    )
    cache = init_kv_cache(cfg.lm, b, max_seq_len, dtype=spliced.embeds.dtype)
    logits, cache = llama_prefill(
        params["lm"], cfg.lm, spliced.embeds, spliced.attention_mask, cache
    )

    tokens0 = jnp.full((b, max_new_tokens), pad_token_id, jnp.int32)
    finished0 = jnp.zeros((b,), bool)
    lengths0 = jnp.zeros((b,), jnp.int32)

    def cond(state):
        step, _, _, finished, _, _, _ = state
        return (step < max_new_tokens) & ~jnp.all(finished)

    def body(state):
        step, logits, cache, finished, tokens, lengths, rng = state
        rng, sub = jax.random.split(rng)
        nxt = sample_token(
            logits, sub, do_sample=do_sample, temperature=temperature, top_p=top_p
        )
        nxt = jnp.where(finished, pad_token_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        lengths = lengths + (~finished).astype(jnp.int32)
        finished = finished | (nxt == eos_token_id)
        tok_embeds = embed_tokens(params["lm"], nxt[:, None])
        logits, cache = llama_decode_step(params["lm"], cfg.lm, tok_embeds, cache)
        return (step + 1, logits, cache, finished, tokens, lengths, rng)

    state = (jnp.asarray(0, jnp.int32), logits, cache, finished0, tokens0, lengths0, rng)
    _, _, _, _, tokens, lengths, _ = jax.lax.while_loop(cond, body, state)
    return GenerateResult(tokens=tokens, lengths=lengths)
