"""Llama-family LM backbone: functional JAX, layer-stacked, cache-aware.

TPU-native replacement for the reference's HF ``LlamaForCausalLM`` +
flash-attn monkey patch + HF ``generate`` KV cache (reference:
llava/model/language_model/llava_llama.py:41-174,
llava/train/llama_flash_attn_monkey_patch.py). Design:

- all 32 layers live in ONE stacked parameter pytree and run under a single
  ``lax.scan`` — one compiled layer body instead of 32 inlined copies
  (faster compiles, identical runtime under XLA);
- grouped-query attention never materializes repeated KV heads (grouped
  einsum);
- the KV cache is a static (L, B, S_max, H_kv, Dh) HBM buffer with per-row
  lengths: prefill writes [0, len_b), decode writes one slot per step via
  dynamic_update_slice — no dynamic shapes anywhere, so prefill and decode
  each compile exactly once per bucket;
- RMSNorm and attention logits accumulate in float32; params may be bf16;
- optional ``jax.checkpoint`` remat of the layer body for training.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.rope import apply_rope, rope_cos_sin_cfg
from videollamb_tpu.ops.attention import multihead_attention

Params = Dict[str, Any]

NEG_INF = -1e30


class KVCache(NamedTuple):
    k: jax.Array  # (L, B, S_max, H_kv, Dh)
    v: jax.Array  # (L, B, S_max, H_kv, Dh)
    length: jax.Array  # (B,) int32 — tokens written per row


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.bfloat16
) -> KVCache:
    shape = (cfg.num_hidden_layers, batch, max_len, cfg.num_key_value_heads, cfg.head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        length=jnp.zeros((batch,), jnp.int32),
    )


def _rms_norm(weight: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def _proj(kernel, x: jax.Array) -> jax.Array:
    if isinstance(kernel, dict) and "q4" in kernel:
        # int4 weight-only quant: the Pallas dequant-matmul reads 4x fewer
        # weight bytes than bf16 — the decode-step bandwidth lever
        # (ops/int4_matmul.py). Large-M (prefill/training) stays on the XLA
        # unpack-einsum, which is compute-bound anyway.
        from videollamb_tpu.ops.int4_matmul import dequantize_int4, int4_matmul

        lead = x.shape[:-1]
        m = 1
        for s in lead:
            m *= s
        from videollamb_tpu.ops.attention import use_tpu_kernels

        if use_tpu_kernels() and m <= 64:
            x2 = x.reshape(m, x.shape[-1])
            pad = 8 - m % 8 if m % 8 else 0
            if pad:
                x2 = jnp.pad(x2, ((0, pad), (0, 0)))
            y = int4_matmul(x2, kernel["q4"], kernel["scale"])[:m]
            return y.reshape(*lead, y.shape[-1])
        kernel = dequantize_int4(kernel, x.dtype)
    elif isinstance(kernel, dict) and "q" in kernel:
        # int8 weight-only quant (models/lm/quant.py): dequant fuses into
        # the matmul, halving HBM weight reads.
        kernel = kernel["q"].astype(x.dtype) * kernel["scale"].astype(x.dtype)
    return jnp.einsum(
        "...d,dk->...k", x, kernel.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _mlora_delta(ma: jax.Array, mb: jax.Array, x: jax.Array,
                 aidx: jax.Array) -> jax.Array:
    """Per-row multi-adapter LoRA delta (models/lm/mlora.py).

    ma: (K, d_in, r) adapter-A stack for this layer/projection;
    mb: (K, r, d_out); x: (B, S, d_in); aidx: (B,) int32, -1 = base model.
    The gather reads only the B indexed adapters (K·d·r stays resident in
    HBM once, ~0.1 ms/step of extra reads for 7B r=16 at B=8), and the two
    rank-r einsums add negligible MXU work next to the base GEMM."""
    safe = jnp.maximum(aidx, 0)
    a = ma[safe].astype(x.dtype)   # (B, d_in, r)
    b = mb[safe].astype(x.dtype)   # (B, r, d_out)
    u = jnp.einsum("bsd,bdr->bsr", x, a,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    delta = jnp.einsum("bsr,brk->bsk", u, b,
                       preferred_element_type=jnp.float32)
    gate = (aidx >= 0).astype(jnp.float32)[:, None, None]
    return (delta * gate).astype(x.dtype)


def _lproj(lp: Params, name: str, x: jax.Array,
           aidx: Optional[jax.Array] = None) -> jax.Array:
    """Projection with optional LoRA adapter (models/lm/lora.py): the
    adapter keys live beside the kernel in the stacked layer pytree.
    ``aidx`` selects per-row adapters from a multi-LoRA stack
    (``{name}_mlora_a/b`` keys, models/lm/mlora.py) when present."""
    y = _proj(lp[name], x)
    a = lp.get(f"{name}_lora_a")
    if a is not None:
        y = y + _proj(lp[f"{name}_lora_b"], _proj(a, x))
    ma = lp.get(f"{name}_mlora_a")
    if ma is not None and aidx is not None:
        y = y + _mlora_delta(ma, lp[f"{name}_mlora_b"], x, aidx)
    return y


def _grouped_attention(
    q: jax.Array,  # (B, Sq, H, Dh)
    k: jax.Array,  # (B, Sk, H_kv, Dh)
    v: jax.Array,  # (B, Sk, H_kv, Dh)
    mask: jax.Array,  # (B, Sq, Sk) bool, True = attend
) -> jax.Array:
    """Dense-mask attention used on the cache path (decode/prefill where the
    mask is ragged per row). GQA via grouped einsum."""
    b, sq, h, dh = q.shape
    h_kv = k.shape[2]
    g = h // h_kv
    qg = q.reshape(b, sq, h_kv, g, dh)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(dh)
    scores = jnp.where(mask[:, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, sq, h, dh)


def _layer(
    lp: Params,
    cfg: LlamaConfig,
    x: jax.Array,  # (B, S, D)
    cos: jax.Array,
    sin: jax.Array,
    key_valid: jax.Array,  # (B, S) bool
    attn_impl: str = "auto",
    aidx: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,  # (B, S) packed-row segments
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One decoder layer (no cache, causal). Returns (hidden, k, v)."""
    b, s, d = x.shape
    h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

    hidden = _rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
    q = _lproj(lp, "q_proj", hidden, aidx).reshape(b, s, h, dh)
    k = _lproj(lp, "k_proj", hidden, aidx).reshape(b, s, h_kv, dh)
    v = _lproj(lp, "v_proj", hidden, aidx).reshape(b, s, h_kv, dh)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    attn = multihead_attention(
        q, k, v, causal=True, k_mask=key_valid, impl=attn_impl,
        window=cfg.sliding_window, segment_ids=segment_ids,
    )
    attn = _lproj(lp, "o_proj", attn.reshape(b, s, d), aidx)
    x = x + attn

    hidden = _rms_norm(lp["post_attention_layernorm"], x, cfg.rms_norm_eps)
    gate = jax.nn.silu(_lproj(lp, "gate_proj", hidden, aidx).astype(jnp.float32)).astype(x.dtype)
    up = _lproj(lp, "up_proj", hidden, aidx)
    x = x + _lproj(lp, "down_proj", gate * up, aidx)
    return x, k, v


def _run_layers(
    params: Params,
    cfg: LlamaConfig,
    x: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cache: Optional[KVCache] = None,
    write_pos: Optional[jax.Array] = None,  # (B,) where to write new k/v
    remat: bool = False,
    attn_impl: str = "auto",
    aidx: Optional[jax.Array] = None,
    segment_ids: Optional[jax.Array] = None,  # packed rows (no-cache only)
    act_sharding=None,  # NamedSharding for the (B, S, D) layer-boundary carry
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Scan the stacked layers. With a cache, each layer merges its fresh
    k/v into the cache slice and attends over the full cache buffer.

    ``act_sharding`` (training only) constrains the residual-stream scan
    carry — the tensor ``jax.checkpoint`` SAVES per layer. Passing
    P('data', 'model', None) is Megatron-style sequence parallelism: the
    saved boundary shards its sequence dim over the TP axis (4x smaller
    per chip at tp=4), and GSPMD all-gathers it back in front of each
    layer's projections, forward and in the remat recompute. Certified to
    move the FSDP+TP stage-2 step from 17.0 GB (OOM) to fitting a v5e
    (tools/aot_memory.py)."""

    if cache is None:
        def body(hidden, lp):
            if act_sharding is not None:
                hidden = jax.lax.with_sharding_constraint(hidden, act_sharding)
            hidden, _, _ = _layer(lp, cfg, hidden, cos, sin, mask, attn_impl,
                                  aidx, segment_ids)
            return hidden, None

        fn = jax.checkpoint(body) if remat else body
        x, _ = jax.lax.scan(fn, x, params["layers"])
        return x, None

    # Cache path (prefill, write_pos == 0 everywhere): attention runs over
    # the FRESH (B, S) keys — with a zero write offset the cache holds
    # nothing older, so attending over the full (B, S_max) buffer (as the
    # reference's HF cache does) only adds a quadratic (B, S, S_max) f32
    # score tensor. Fresh-key attention routes through the unified
    # dispatcher, so 4k+ prefill uses the flash kernel (ROADMAP item:
    # VERDICT r1 #6).
    def cached_body(hidden, xs):
        lp, ck, cv = xs  # ck/cv: (B, S_max, H_kv, Dh)
        b, s, d = hidden.shape
        h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        normed = _rms_norm(lp["input_layernorm"], hidden, cfg.rms_norm_eps)
        q = _lproj(lp, "q_proj", normed, aidx).reshape(b, s, h, dh)
        k = _lproj(lp, "k_proj", normed, aidx).reshape(b, s, h_kv, dh)
        v = _lproj(lp, "v_proj", normed, aidx).reshape(b, s, h_kv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def write_row(c_row, new_row, pos):
            return jax.lax.dynamic_update_slice(c_row, new_row.astype(c_row.dtype), (pos, 0, 0))

        ck = jax.vmap(write_row)(ck, k, write_pos)
        cv = jax.vmap(write_row)(cv, v, write_pos)

        attn = multihead_attention(
            q, k, v, causal=True, k_mask=mask, impl=attn_impl,
            window=cfg.sliding_window,
        )
        attn = _lproj(lp, "o_proj", attn.reshape(b, s, d), aidx)
        hidden = hidden + attn

        normed = _rms_norm(lp["post_attention_layernorm"], hidden, cfg.rms_norm_eps)
        gate = jax.nn.silu(_lproj(lp, "gate_proj", normed, aidx).astype(jnp.float32)).astype(hidden.dtype)
        up = _lproj(lp, "up_proj", normed, aidx)
        hidden = hidden + _lproj(lp, "down_proj", gate * up, aidx)
        return hidden, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(cached_body, x, (params["layers"], cache.k, cache.v))
    return x, KVCache(k=new_k, v=new_v, length=cache.length)


def _final(params: Params, cfg: LlamaConfig, x: jax.Array) -> jax.Array:
    x = _rms_norm(params["norm"], x, cfg.rms_norm_eps)
    logits = _proj(params["lm_head"], x)
    return logits.astype(jnp.float32)


def embed_tokens(params: Params, input_ids: jax.Array) -> jax.Array:
    """Token embedding lookup; out-of-range ids (multimodal sentinels) clamp
    to 0 — callers overwrite those positions with visual features."""
    ids = jnp.clip(input_ids, 0, params["embed_tokens"].shape[0] - 1)
    return params["embed_tokens"][ids]


@partial(jax.jit, static_argnames=("cfg", "remat", "attn_impl", "act_sharding"))
def llama_forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # (B, S, D)
    attention_mask: jax.Array,  # (B, S) bool / {0,1}
    position_ids: Optional[jax.Array] = None,  # (B, S)
    remat: bool = False,
    attn_impl: str = "auto",
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
    segment_ids: Optional[jax.Array] = None,  # (B, S) packed-row segments
    act_sharding=None,  # NamedSharding for the saved layer-boundary carry
) -> jax.Array:
    """Full-sequence forward (training / no-cache prefill) -> (B, S, V) logits.

    ``attn_impl``: 'auto' (flash kernel on TPU, dense on CPU) or 'chunked'
    (differentiable online-softmax — use for training long sequences).
    ``segment_ids`` switches attention to block-causal packed-row masking
    (each segment attends only within itself); pass per-segment position
    ids alongside so RoPE restarts per conversation."""
    b, s, _ = inputs_embeds.shape
    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos, sin = rope_cos_sin_cfg(cfg, position_ids)

    valid = attention_mask.astype(bool)
    x, _ = _run_layers(
        params, cfg, inputs_embeds, cos, sin, valid, remat=remat,
        attn_impl=attn_impl, aidx=adapter_idx, segment_ids=segment_ids,
        act_sharding=act_sharding,
    )
    return _final(params, cfg, x)


@partial(jax.jit, static_argnames=("cfg", "remat", "attn_impl"))
def llama_forward_with_hidden(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,
    attention_mask: jax.Array,
    remat: bool = False,
    attn_impl: str = "auto",
    adapter_idx: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Like llama_forward but also returns the final-layer hidden states
    (pre-final-norm), needed by the LM-memory retro variant which reads its
    memory tokens back from the last hidden layer
    (reference llava_llama_retro_lm.py:173)."""
    b, s, _ = inputs_embeds.shape
    position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos, sin = rope_cos_sin_cfg(cfg, position_ids)
    valid = attention_mask.astype(bool)
    x, _ = _run_layers(
        params, cfg, inputs_embeds, cos, sin, valid, remat=remat,
        attn_impl=attn_impl, aidx=adapter_idx,
    )
    return _final(params, cfg, x), x


@partial(jax.jit, static_argnames=("cfg", "attn_impl"), donate_argnames=("cache",))
def llama_prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # (B, S, D) right-padded
    attention_mask: jax.Array,  # (B, S)
    cache: KVCache,
    attn_impl: str = "auto",
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
) -> Tuple[jax.Array, KVCache]:
    """Prefill the KV cache; returns (last-valid-token logits (B, V), cache).

    Attention runs over the fresh (B, S) keys via the unified dispatcher
    (flash kernel on TPU) — the cache buffer beyond S is unwritten, so a
    full-buffer masked attention would only add a (B, S, S_max) f32 score
    tensor (quadratic HBM at 4k+)."""
    b, s, _ = inputs_embeds.shape
    valid = attention_mask.astype(bool)
    lengths = jnp.sum(valid, axis=1).astype(jnp.int32)

    position_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    cos, sin = rope_cos_sin_cfg(cfg, position_ids)

    write_pos = jnp.zeros((b,), jnp.int32)
    x, cache = _run_layers(
        params, cfg, inputs_embeds, cos, sin, valid, cache=cache,
        write_pos=write_pos, attn_impl=attn_impl, aidx=adapter_idx,
    )
    logits = _final(params, cfg, x)
    last = jnp.take_along_axis(
        logits, (lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    return last, KVCache(k=cache.k, v=cache.v, length=lengths)


@partial(jax.jit, static_argnames=("cfg", "return_all"), donate_argnames=("cache",))
def llama_extend(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # (B, S, D) right-padded fresh tokens
    attention_mask: jax.Array,  # (B, S) validity of the fresh tokens
    cache: KVCache,
    return_all: bool = False,  # (B, S, V) logits instead of last-valid
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
) -> Tuple[jax.Array, KVCache]:
    """Append a chunk to an already-prefilled cache (streaming: new video
    segments / follow-up queries join the running context without
    re-prefilling). Fresh queries attend over the existing cache AND the
    fresh chunk causally. Returns (last-valid-token logits (B, V), cache).

    Row i's fresh tokens are written at [len_i, len_i + s_i); invalid
    (padding) slots are written past the end then ignored via length."""
    b, s, _ = inputs_embeds.shape
    s_max = cache.k.shape[2]
    valid = attention_mask.astype(bool)
    fresh_len = jnp.sum(valid, axis=1).astype(jnp.int32)  # (B,)
    start = cache.length  # (B,)

    # Positions: fresh token j (if valid) sits at absolute start + rank_j.
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    pos_ids = start[:, None] + jnp.where(valid, rank, s)  # invalid -> past end
    cos, sin = rope_cos_sin_cfg(cfg, pos_ids)

    # Mask over the full cache buffer: query j attends keys < its absolute
    # position + itself + earlier fresh keys. Since fresh keys are written
    # at their absolute slots first, a single (B, S, S_max) <=-mask works.
    k_pos = jnp.arange(s_max, dtype=jnp.int32)
    mask = k_pos[None, None, :] <= pos_ids[:, :, None]
    if cfg.sliding_window is not None:
        mask &= (pos_ids[:, :, None] - k_pos[None, None, :]) < cfg.sliding_window
    mask &= valid[:, :, None]

    def cached_body(hidden, xs):
        lp, ck, cv = xs
        h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
        normed = _rms_norm(lp["input_layernorm"], hidden, cfg.rms_norm_eps)
        q = _lproj(lp, "q_proj", normed, adapter_idx).reshape(b, s, h, dh)
        k = _lproj(lp, "k_proj", normed, adapter_idx).reshape(b, s, h_kv, dh)
        v = _lproj(lp, "v_proj", normed, adapter_idx).reshape(b, s, h_kv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        def write_row(c_row, new_row, pos):
            # Scatter, NOT dynamic_update_slice: DUS clamps the START index
            # when pos + s exceeds the buffer, silently rewriting the cache
            # from 0 and destroying the existing context (bites when a
            # padded chunk bucket is as long as the buffer). mode='drop'
            # discards only the out-of-bounds PAD rows.
            idx = pos + jnp.arange(new_row.shape[0], dtype=jnp.int32)
            return c_row.at[idx].set(new_row.astype(c_row.dtype), mode="drop")

        ck = jax.vmap(write_row)(ck, k, start)
        cv = jax.vmap(write_row)(cv, v, start)
        attn = _grouped_attention(q, ck.astype(q.dtype), cv.astype(q.dtype), mask)
        attn = _lproj(lp, "o_proj", attn.reshape(b, s, cfg.hidden_size), adapter_idx)
        hidden = hidden + attn
        normed = _rms_norm(lp["post_attention_layernorm"], hidden, cfg.rms_norm_eps)
        gate = jax.nn.silu(
            _lproj(lp, "gate_proj", normed, adapter_idx).astype(jnp.float32)
        ).astype(hidden.dtype)
        up = _lproj(lp, "up_proj", normed, adapter_idx)
        hidden = hidden + _lproj(lp, "down_proj", gate * up, adapter_idx)
        return hidden, (ck, cv)

    x, (new_k, new_v) = jax.lax.scan(
        cached_body, inputs_embeds, (params["layers"], cache.k, cache.v)
    )
    logits = _final(params, cfg, x)
    new_cache = KVCache(k=new_k, v=new_v, length=start + fresh_len)
    if return_all:
        return logits, new_cache
    last = jnp.take_along_axis(
        logits, jnp.maximum(fresh_len - 1, 0)[:, None, None], axis=1
    )[:, 0]
    return last, new_cache


def chunked_prefill(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jax.Array,  # (B, S_pad, D) right-padded (splice buffer)
    attention_mask: jax.Array,  # (B, S_pad)
    cache: KVCache,
    chunk: int = 256,
    lengths=None,  # optional host ints — skips this function's own sync
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
) -> Tuple[jax.Array, KVCache]:
    """Prefill in fixed-size ``chunk`` slices of ``llama_extend``.

    The splice pads every prompt to ``cfg.max_length`` (models/splice.py
    static buffers), so a whole-buffer ``llama_prefill`` pays the full
    padded GEMM cost no matter how short the prompt is. Chunking keeps
    compute proportional to the ACTUAL prompt length while compiling
    exactly ONE extend graph shape for the whole serving lifetime (every
    chunk is (B, chunk, D)) — an admission-latency / TTFT lever, not a
    throughput one. Requires contiguous right-padded masks, which the
    splice guarantees (attn = arange < length).

    Returns (last-valid-token logits (B, V), cache) — same contract as
    ``llama_prefill``; greedy continuations are token-identical
    (tests/test_llama.py::test_chunked_prefill_matches_whole_prefill).
    """
    b, s_pad, d = inputs_embeds.shape
    if lengths is None:
        lengths = np.asarray(jnp.sum(attention_mask, axis=1))  # host sync
    lengths = np.atleast_1d(np.asarray(lengths))
    n_chunks = max(1, -(-int(lengths.max()) // chunk))
    logits = None
    for i in range(n_chunks):
        lo = i * chunk
        e = inputs_embeds[:, lo: lo + chunk]
        m = attention_mask[:, lo: lo + chunk]
        if e.shape[1] < chunk:  # ragged tail of the splice buffer
            pad = chunk - e.shape[1]
            e = jnp.pad(e, ((0, 0), (0, pad), (0, 0)))
            m = jnp.pad(m, ((0, 0), (0, pad)))
        nxt, cache = llama_extend(params, cfg, e, m, cache,
                                  adapter_idx=adapter_idx)
        # Rows whose prompt ended in an earlier chunk keep their logits
        # (a fully-padded chunk row returns garbage at slot 0).
        if logits is None:
            logits = nxt
        else:
            alive = jnp.asarray(lengths > lo, bool)[:, None]
            logits = jnp.where(alive, nxt, logits)
    return logits, cache


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("cache",))
def llama_decode_step(
    params: Params,
    cfg: LlamaConfig,
    token_embeds: jax.Array,  # (B, 1, D)
    cache: KVCache,
    adapter_idx: Optional[jax.Array] = None,  # (B,) multi-LoRA row adapters
) -> Tuple[jax.Array, KVCache]:
    """One decode step: writes each row's token at its current length and
    returns (logits (B, V), updated cache).

    Uses a fori_loop with scatter writes into the donated (L, B, S, H, Dh)
    cache buffers — unlike a lax.scan, this updates one token slot in place
    instead of re-emitting the whole cache as stacked scan outputs
    (measured ~25% faster per step for 7B on v5e)."""
    b = token_embeds.shape[0]
    s_max = cache.k.shape[2]
    pos = cache.length  # (B,)
    cos, sin = rope_cos_sin_cfg(cfg, pos[:, None])

    k_pos = jnp.arange(s_max, dtype=jnp.int32)
    mask = k_pos[None] <= pos[:, None]
    if cfg.sliding_window is not None:
        mask &= (pos[:, None] - k_pos[None]) < cfg.sliding_window
    mask = mask[:, None, :]  # (B, 1, S_max)

    h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rows = jnp.arange(b)

    def body(l, carry):
        hidden, ck_all, cv_all = carry
        lp = jax.tree.map(lambda a: a[l], params["layers"])
        normed = _rms_norm(lp["input_layernorm"], hidden, cfg.rms_norm_eps)
        q = _lproj(lp, "q_proj", normed, adapter_idx).reshape(b, 1, h, dh)
        k = _lproj(lp, "k_proj", normed, adapter_idx).reshape(b, 1, h_kv, dh)
        v = _lproj(lp, "v_proj", normed, adapter_idx).reshape(b, 1, h_kv, dh)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck_all = ck_all.at[l, rows, pos].set(k[:, 0].astype(ck_all.dtype))
        cv_all = cv_all.at[l, rows, pos].set(v[:, 0].astype(cv_all.dtype))
        attn = _grouped_attention(
            q, ck_all[l].astype(q.dtype), cv_all[l].astype(q.dtype), mask
        )
        attn = _lproj(lp, "o_proj", attn.reshape(b, 1, cfg.hidden_size), adapter_idx)
        hidden = hidden + attn
        normed = _rms_norm(lp["post_attention_layernorm"], hidden, cfg.rms_norm_eps)
        gate = jax.nn.silu(
            _lproj(lp, "gate_proj", normed, adapter_idx).astype(jnp.float32)
        ).astype(hidden.dtype)
        up = _lproj(lp, "up_proj", normed, adapter_idx)
        hidden = hidden + _lproj(lp, "down_proj", gate * up, adapter_idx)
        return hidden, ck_all, cv_all

    x, ck, cv = jax.lax.fori_loop(
        0, cfg.num_hidden_layers, body, (token_embeds, cache.k, cache.v)
    )
    logits = _final(params, cfg, x)[:, 0]
    return logits, KVCache(k=ck, v=cv, length=cache.length + 1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random init with the HF layout (stacked layers)."""
    l, d = cfg.num_hidden_layers, cfg.hidden_size
    h, h_kv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    inter, v = cfg.intermediate_size, cfg.vocab_size
    ks = jax.random.split(rng, 10)

    def w(key, shape):
        # Generate directly in the target dtype: an f32 temporary for the
        # biggest tensors would transiently need +5.4 GB on a 16 GB chip.
        return jax.random.normal(key, shape, dtype) * jnp.asarray(0.02, dtype)

    layers = {
        "input_layernorm": jnp.ones((l, d), dtype),
        "q_proj": w(ks[0], (l, d, h * dh)),
        "k_proj": w(ks[1], (l, d, h_kv * dh)),
        "v_proj": w(ks[2], (l, d, h_kv * dh)),
        "o_proj": w(ks[3], (l, h * dh, d)),
        "post_attention_layernorm": jnp.ones((l, d), dtype),
        "gate_proj": w(ks[4], (l, d, inter)),
        "up_proj": w(ks[5], (l, d, inter)),
        "down_proj": w(ks[6], (l, inter, d)),
    }
    return {
        "embed_tokens": w(ks[7], (v, d)),
        "layers": layers,
        "norm": jnp.ones((d,), dtype),
        "lm_head": w(ks[8], (d, v)),
    }
