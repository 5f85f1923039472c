"""Convert HF Llama checkpoints (Vicuna / LLaVA backbones) to the stacked
JAX layout used by :mod:`videollamb_tpu.models.lm.llama`.

Accepts state dicts with either ``model.layers...`` (LlamaForCausalLM) or
``layers...`` (bare LlamaModel) key roots; per-layer torch weights are
transposed and stacked along a leading layer axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def resize_token_embeddings(params: Dict[str, Any], new_vocab: int) -> Dict[str, Any]:
    """Grow embed_tokens/lm_head to ``new_vocab`` rows, initializing new
    rows with the mean of the existing ones (reference
    smart_tokenizer_and_embedding_resize, llava/train/train.py:235-257 —
    used when mm_use_x_start_end adds <im_start>/<im_end> etc.)."""
    import jax.numpy as jnp

    embed = params["embed_tokens"]  # (V, D)
    old_vocab = embed.shape[0]
    if new_vocab <= old_vocab:
        return params
    n_new = new_vocab - old_vocab
    out = dict(params)
    mean_in = jnp.mean(embed, axis=0, keepdims=True)
    out["embed_tokens"] = jnp.concatenate(
        [embed, jnp.broadcast_to(mean_in, (n_new, embed.shape[1]))], axis=0
    )
    head = params["lm_head"]  # (D, V)
    mean_out = jnp.mean(head, axis=1, keepdims=True)
    out["lm_head"] = jnp.concatenate(
        [head, jnp.broadcast_to(mean_out, (head.shape[0], n_new))], axis=1
    )
    return out


def convert_llama_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    keys = list(sd.keys())
    root = "model." if any(k.startswith("model.layers.") for k in keys) else ""

    n_layers = 0
    while f"{root}layers.{n_layers}.self_attn.q_proj.weight" in sd:
        n_layers += 1

    def stack(fmt: str, transpose: bool = True) -> np.ndarray:
        mats = [_np(sd[fmt.format(root=root, i=i)]) for i in range(n_layers)]
        if transpose:
            mats = [m.T for m in mats]
        return np.stack(mats)

    layers = {
        "input_layernorm": stack("{root}layers.{i}.input_layernorm.weight", transpose=False),
        "q_proj": stack("{root}layers.{i}.self_attn.q_proj.weight"),
        "k_proj": stack("{root}layers.{i}.self_attn.k_proj.weight"),
        "v_proj": stack("{root}layers.{i}.self_attn.v_proj.weight"),
        "o_proj": stack("{root}layers.{i}.self_attn.o_proj.weight"),
        "post_attention_layernorm": stack(
            "{root}layers.{i}.post_attention_layernorm.weight", transpose=False
        ),
        "gate_proj": stack("{root}layers.{i}.mlp.gate_proj.weight"),
        "up_proj": stack("{root}layers.{i}.mlp.up_proj.weight"),
        "down_proj": stack("{root}layers.{i}.mlp.down_proj.weight"),
    }
    embed = _np(sd[f"{root}embed_tokens.weight"])
    lm_head = _np(sd["lm_head.weight"]).T if "lm_head.weight" in sd else embed.T.copy()
    return {
        "embed_tokens": embed,
        "layers": layers,
        "norm": _np(sd[f"{root}norm.weight"]),
        "lm_head": lm_head,
    }


def export_llama_state_dict(params: Dict[str, Any], root: str = "model.") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_llama_state_dict`: JAX param tree ->
    HF-format numpy state dict (torch (out, in) weight layout, per-layer
    keys), so a model fine-tuned here can be loaded back by the reference
    codebase / transformers. Roundtrip-tested."""
    layers = params["layers"]
    n_layers = int(np.asarray(layers["q_proj"]).shape[0])
    out: Dict[str, np.ndarray] = {}

    def put(key: str, arr, transpose: bool = True):
        a = np.asarray(arr)
        out[key] = a.T.copy() if transpose else a.copy()

    for i in range(n_layers):
        put(f"{root}layers.{i}.input_layernorm.weight",
            np.asarray(layers["input_layernorm"])[i], transpose=False)
        put(f"{root}layers.{i}.post_attention_layernorm.weight",
            np.asarray(layers["post_attention_layernorm"])[i], transpose=False)
        for name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put(f"{root}layers.{i}.self_attn.{name}.weight",
                np.asarray(layers[name])[i])
        for name in ("gate_proj", "up_proj", "down_proj"):
            put(f"{root}layers.{i}.mlp.{name}.weight",
                np.asarray(layers[name])[i])
    put(f"{root}embed_tokens.weight", params["embed_tokens"], transpose=False)
    put(f"{root}norm.weight", params["norm"], transpose=False)
    put("lm_head.weight", params["lm_head"])  # (D, V) -> (V, D)
    return out
