"""MPT backbone (ALiBi attention, bias-free LayerNorm/Linear).

Counterpart of the reference's LlavaMptForCausalLM
(llava/model/language_model/llava_mpt.py:40 — a thin LLaVA wrapper over HF
MPT; legacy backbone kept for checkpoint compatibility). Functional JAX:
stacked blocks under lax.scan, ALiBi position bias instead of RoPE, packed
Wqkv, GELU FFN, tied lm_head.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]
NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class MptConfig:
    vocab_size: int = 50432
    d_model: int = 4096
    n_heads: int = 32
    n_layers: int = 32
    expansion_ratio: int = 4
    max_seq_len: int = 2048
    layer_norm_epsilon: float = 1e-5
    alibi_bias_max: int = 8

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def alibi_slopes(n_heads: int, bias_max: int = 8) -> np.ndarray:
    """HF build_mpt_alibi_tensor slopes: powers of 2 over a rounded-up
    power-of-two head count, subsampled for non-power-of-two heads."""
    n = 2 ** math.ceil(math.log2(n_heads))
    base = np.arange(1, n + 1, dtype=np.float64) * (bias_max / n)
    slopes = 1.0 / np.power(2, base)
    if n != n_heads:
        slopes = np.concatenate([slopes[1::2], slopes[0::2]])[:n_heads]
    return slopes.astype(np.float32)


def alibi_bias(n_heads: int, seq_len: int, bias_max: int = 8) -> np.ndarray:
    """(H, 1, S) bias added to attention scores (HF MPT convention: bias
    depends only on the key position relative to the sequence end)."""
    pos = np.arange(1 - seq_len, 1, dtype=np.float32).reshape(1, 1, seq_len)
    return pos * alibi_slopes(n_heads, bias_max).reshape(n_heads, 1, 1)


def _ln(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(x.dtype)


def _mm(w: jax.Array, x: jax.Array) -> jax.Array:
    return jnp.einsum("...d,dk->...k", x, w.astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def mpt_forward(
    params: Params,
    cfg: MptConfig,
    inputs_embeds: jax.Array,  # (B, S, D)
    attention_mask: jax.Array,  # (B, S)
) -> jax.Array:
    """Full-sequence forward -> (B, S, V) logits (tied lm_head)."""
    b, s, d = inputs_embeds.shape
    h, dh = cfg.n_heads, cfg.head_dim

    valid = attention_mask.astype(bool)
    causal = jnp.tril(jnp.ones((s, s), bool))
    mask = causal[None] & valid[:, None, :]  # (B, S, S)
    bias = jnp.asarray(alibi_bias(h, s, cfg.alibi_bias_max))  # (H, 1, S)

    def block(x, bp):
        hdn = _ln(bp["norm_1"], x, cfg.layer_norm_epsilon)
        qkv = _mm(bp["Wqkv"], hdn)  # (B, S, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, s, h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum("bhqe,bhke->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(dh)
        scores = scores + bias[None]
        scores = jnp.where(mask[:, None], scores, NEG_INF)
        probs = jax.nn.softmax(scores, -1).astype(v.dtype)
        attn = jnp.einsum("bhqk,bhke->bhqe", probs, v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
        x = x + _mm(bp["out_proj"], attn)

        hdn = _ln(bp["norm_2"], x, cfg.layer_norm_epsilon)
        up = jax.nn.gelu(_mm(bp["up_proj"], hdn).astype(jnp.float32),
                         approximate=True).astype(x.dtype)
        return x + _mm(bp["down_proj"], up), None

    x, _ = jax.lax.scan(block, inputs_embeds, params["blocks"])
    x = _ln(params["norm_f"], x, cfg.layer_norm_epsilon)
    logits = jnp.einsum("bsd,vd->bsv", x, params["wte"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits.astype(jnp.float32)


def mpt_embed(params: Params, input_ids: jax.Array) -> jax.Array:
    ids = jnp.clip(input_ids, 0, params["wte"].shape[0] - 1)
    return params["wte"][ids]


def convert_mpt_state_dict(sd: Mapping[str, Any]) -> Params:
    def _np(x):
        return x.detach().cpu().float().numpy() if hasattr(x, "detach") else np.asarray(x)

    root = "transformer." if any(k.startswith("transformer.") for k in sd) else ""
    n = 0
    while f"{root}blocks.{n}.attn.Wqkv.weight" in sd:
        n += 1

    def stack(fmt, transpose=True):
        mats = [_np(sd[fmt.format(root=root, i=i)]) for i in range(n)]
        return np.stack([m.T for m in mats] if transpose else mats)

    return {
        "wte": _np(sd[f"{root}wte.weight"]),
        "blocks": {
            "norm_1": stack("{root}blocks.{i}.norm_1.weight", transpose=False),
            "Wqkv": stack("{root}blocks.{i}.attn.Wqkv.weight"),
            "out_proj": stack("{root}blocks.{i}.attn.out_proj.weight"),
            "norm_2": stack("{root}blocks.{i}.norm_2.weight", transpose=False),
            "up_proj": stack("{root}blocks.{i}.ffn.up_proj.weight"),
            "down_proj": stack("{root}blocks.{i}.ffn.down_proj.weight"),
        },
        "norm_f": _np(sd[f"{root}norm_f.weight"]),
    }
