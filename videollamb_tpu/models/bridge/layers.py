"""Memory Bridge building blocks: post-LN attention and transformer layers.

Functional JAX re-implementations of the bridge-layer primitives
(reference: llava/model/multimodal_projector/rmt_r_transformer_projector.py:13-184
and self_retriever.py:10-186). Parameter trees use the reference module names
(q_proj/k_proj/v_proj, residual.dense, residual.layernorm, mlp, proj) so HF
checkpoints convert mechanically (torch (out,in) weights transposed to
(in,out) kernels).

Design notes (TPU):
- attention logits/softmax accumulate in float32 on the MXU
  (`preferred_element_type`), outputs cast back to the working dtype;
- masking is additive (-1e30 on disallowed keys) so the whole bridge runs on
  dense static shapes and vmaps over the batch;
- dropout is supported for training parity but off (deterministic) by
  default.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

NEG_INF = -1e30


def _dense(p: Params, x: jax.Array) -> jax.Array:
    y = jnp.einsum("...d,dk->...k", x, p["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _layer_norm(p: Params, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _dropout(x: jax.Array, rate: float, rng: Optional[jax.Array], deterministic: bool) -> jax.Array:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def residual_block(
    p: Params, hidden: jax.Array, inputs: jax.Array, *, eps: float,
    dropout_rate: float = 0.0, rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """dense -> dropout -> LayerNorm(x + inputs) (reference Residual,
    rmt_r_transformer_projector.py:13-28)."""
    h = _dense(p["dense"], hidden)
    h = _dropout(h, dropout_rate, rng, deterministic)
    return _layer_norm(p["layernorm"], h + inputs, eps)


def attention(
    p: Params,
    hidden: jax.Array,
    *,
    num_heads: int,
    eps: float,
    encoder_hidden: Optional[jax.Array] = None,
    key_mask: Optional[jax.Array] = None,
    attn_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Post-LN multi-head attention with residual projection.

    Reference: Attention (rmt_r_transformer_projector.py:30-115). Self
    attention when ``encoder_hidden`` is None, cross attention otherwise.
    ``key_mask`` is (b, K) True-for-valid; converted to an additive bias.
    """
    b, q_len, d = hidden.shape
    head_dim = d // num_heads
    kv_src = hidden if encoder_hidden is None else encoder_hidden

    def split_heads(x):
        return x.reshape(b, x.shape[1], num_heads, head_dim).transpose(0, 2, 1, 3)

    q = split_heads(_dense(p["q_proj"], hidden))
    k = split_heads(_dense(p["k_proj"], kv_src))
    v = split_heads(_dense(p["v_proj"], kv_src))

    scores = jnp.einsum("bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(head_dim)
    if key_mask is not None:
        bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
        scores = scores + bias[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and rng is not None and attn_dropout > 0.0:
        rng, sub = jax.random.split(rng)
        probs = _dropout(probs, attn_dropout, sub, deterministic=False)
    probs = probs.astype(v.dtype)

    out = jnp.einsum("bhqk,bhke->bhqe", probs, v, preferred_element_type=jnp.float32)
    out = out.astype(hidden.dtype).transpose(0, 2, 1, 3).reshape(b, q_len, d)
    return residual_block(
        p["residual"], out, hidden, eps=eps, dropout_rate=hidden_dropout,
        rng=rng, deterministic=deterministic,
    )


ACT = {
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "quick_gelu": lambda x: x * jax.nn.sigmoid(1.702 * x),
}


def _act(name: str, x: jax.Array) -> jax.Array:
    # HF 'gelu' is the exact erf gelu.
    if name == "gelu":
        return jax.nn.gelu(x, approximate=False)
    return ACT[name](x)


def transformer_layer(
    p: Params,
    hidden: jax.Array,
    *,
    num_heads: int,
    eps: float,
    act: str,
    key_mask: Optional[jax.Array] = None,
    encoder_hidden: Optional[jax.Array] = None,
    encoder_key_mask: Optional[jax.Array] = None,
    attn_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Bridge TransformerLayer: self-attn [+ optional cross-attn] + GELU MLP
    with residual projection (reference rmt_r_transformer_projector.py:118-184)."""
    rngs = list(jax.random.split(rng, 3)) if rng is not None else [None, None, None]
    h = attention(
        p["selfattention"], hidden, num_heads=num_heads, eps=eps,
        key_mask=key_mask, attn_dropout=attn_dropout,
        hidden_dropout=hidden_dropout, rng=rngs[0], deterministic=deterministic,
    )
    if encoder_hidden is not None:
        h = attention(
            p["crossattention"], h, num_heads=num_heads, eps=eps,
            encoder_hidden=encoder_hidden, key_mask=encoder_key_mask,
            attn_dropout=attn_dropout, hidden_dropout=hidden_dropout,
            rng=rngs[1], deterministic=deterministic,
        )
    inter = _act(act, _dense(p["mlp"]["dense"], h))
    return residual_block(
        p["residual"], inter, h, eps=eps, dropout_rate=hidden_dropout,
        rng=rngs[2], deterministic=deterministic,
    )


def cross_only_layer(
    p: Params,
    hidden: jax.Array,
    *,
    num_heads: int,
    eps: float,
    encoder_hidden: jax.Array,
    encoder_key_mask: Optional[jax.Array] = None,
    attn_dropout: float = 0.0,
    hidden_dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jax.Array:
    """Retriever layer: cross-attention only — self-attn and FFN are disabled
    in the reference (self_retriever.py:147-186)."""
    return attention(
        p["crossattention"], hidden, num_heads=num_heads, eps=eps,
        encoder_hidden=encoder_hidden, key_mask=encoder_key_mask,
        attn_dropout=attn_dropout, hidden_dropout=hidden_dropout,
        rng=rng, deterministic=deterministic,
    )


# ---------------------------------------------------------------------------
# Initializers (match torch defaults: Linear = kaiming-uniform fan_in + uniform
# bias; LayerNorm = ones/zeros; memory tokens ~ N(0,1); read_memory_emb zeros).
# ---------------------------------------------------------------------------


def init_dense(rng: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    limit = math.sqrt(1.0 / d_in)
    return {
        "kernel": jax.random.uniform(k1, (d_in, d_out), dtype, -limit * math.sqrt(3), limit * math.sqrt(3)),
        "bias": jax.random.uniform(k2, (d_out,), dtype, -limit, limit),
    }


def init_layer_norm(d: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_residual(rng: jax.Array, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    return {"dense": init_dense(rng, d_in, d_out, dtype), "layernorm": init_layer_norm(d_out, dtype)}


def init_attention(rng: jax.Array, d: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "q_proj": init_dense(ks[0], d, d, dtype),
        "k_proj": init_dense(ks[1], d, d, dtype),
        "v_proj": init_dense(ks[2], d, d, dtype),
        "residual": init_residual(ks[3], d, d, dtype),
    }


def init_transformer_layer(rng: jax.Array, d: int, d_inter: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 4)
    return {
        "selfattention": init_attention(ks[0], d, dtype),
        "crossattention": init_attention(ks[1], d, dtype),
        "mlp": {"dense": init_dense(ks[2], d, d_inter, dtype)},
        "residual": init_residual(ks[3], d_inter, d, dtype),
    }


def init_retriever_layer(rng: jax.Array, d: int, dtype=jnp.float32) -> Params:
    """Retriever layer: attention modules only, no FFN (reference
    self_retriever.py:115-131)."""
    ks = jax.random.split(rng, 2)
    return {
        "selfattention": init_attention(ks[0], d, dtype),
        "crossattention": init_attention(ks[1], d, dtype),
    }
