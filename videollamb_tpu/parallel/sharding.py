"""GSPMD sharding rules for the VideoLLaMB parameter tree.

Replaces DeepSpeed ZeRO (reference scripts/zero*.json) and would-be tensor
parallelism with declarative NamedShardings on a ('data', 'model') mesh:

- Megatron-style TP on the LM: qkv/gate/up column-parallel (output dim on
  'model'), o/down row-parallel (input dim on 'model'); vocab-parallel
  embedding/lm_head;
- FSDP (ZeRO-3-like) by additionally sharding the other matrix dim over
  'data';
- vision tower sharded the same way; the tiny Memory Bridge and all norms
  are replicated (their cost is negligible, gathers would dominate).

XLA/GSPMD inserts all collectives; nothing here issues communication
explicitly.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _lm_layer_specs(layers: Dict, fsdp: str, tp: str) -> Dict[str, P]:
    base = {
        "input_layernorm": P(None, None),
        "post_attention_layernorm": P(None, None),
        "q_proj": P(None, fsdp, tp),
        "k_proj": P(None, fsdp, tp),
        "v_proj": P(None, fsdp, tp),
        "o_proj": P(None, tp, fsdp),
        "gate_proj": P(None, fsdp, tp),
        "up_proj": P(None, fsdp, tp),
        "down_proj": P(None, tp, fsdp),
    }
    specs = {}
    for key in layers:
        if key in base:
            specs[key] = base[key]
        elif key.endswith("_lora_a"):
            # (L, d_in, r): shard the input dim like the base kernel's.
            parent = base.get(key[:-7], P(None, fsdp, tp))
            specs[key] = P(None, parent[1], None)
        elif key.endswith("_lora_b"):
            # (L, r, d_out): shard the output dim like the base kernel's.
            parent = base.get(key[:-7], P(None, fsdp, tp))
            specs[key] = P(None, None, parent[2])
        elif key.endswith("_mlora_a"):
            # Multi-LoRA stack (L, K, d_in, r): input dim follows the base
            # kernel; the adapter axis K stays replicated (it is gathered
            # per row at runtime, models/lm/mlora.py).
            parent = base.get(key[:-8], P(None, fsdp, tp))
            specs[key] = P(None, None, parent[1], None)
        elif key.endswith("_mlora_b"):
            # (L, K, r, d_out): output dim follows the base kernel.
            parent = base.get(key[:-8], P(None, fsdp, tp))
            specs[key] = P(None, None, None, parent[2])
        else:
            specs[key] = P()
    return specs


def _vision_specs(params: Any, fsdp: str, tp: str) -> Any:
    def layer_spec(layer: Dict) -> Dict:
        spec = {
            "layer_norm1": {"scale": P(None), "bias": P(None)},
            "layer_norm2": {"scale": P(None), "bias": P(None)},
            "self_attn": {
                "q_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "k_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "v_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "out_proj": {"kernel": P(tp, fsdp), "bias": P(None)},
            },
            "mlp": {
                "fc1": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "fc2": {"kernel": P(tp, fsdp), "bias": P(None)},
            },
        }
        if "temporal_attn" in layer:
            spec["temporal_attn"] = {
                "q_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "k_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "v_proj": {"kernel": P(fsdp, tp), "bias": P(tp)},
                "out_proj": {"kernel": P(tp, fsdp), "bias": P(None)},
            }
            spec["temporal_layer_norm1"] = {"scale": P(None), "bias": P(None)}
            spec["temporal_embedding"] = P(None, None)
        return spec

    return {
        "embeddings": {
            "class_embedding": P(None),
            "patch_embedding": {"kernel": P(None, tp)},
            "position_embedding": P(None, None),
        },
        "pre_layrnorm": {"scale": P(None), "bias": P(None)},
        "layers": [layer_spec(l) for l in params["layers"]],
        "post_layernorm": {"scale": P(None), "bias": P(None)},
    }


def param_specs(
    params: Dict[str, Any],
    *,
    shard_params_over_data: bool = True,
    tensor_parallel: bool = True,
) -> Dict[str, Any]:
    """PartitionSpec tree matching the parameter tree."""
    fsdp = "data" if shard_params_over_data else None
    tp = "model" if tensor_parallel else None

    specs: Dict[str, Any] = {}
    if "lm" in params:
        specs["lm"] = {
            "embed_tokens": P(tp, fsdp),
            "layers": _lm_layer_specs(params["lm"]["layers"], fsdp, tp),
            "norm": P(None),
            "lm_head": P(fsdp, tp),
        }
    for tower_key in ("video_tower", "image_tower"):
        if tower_key in params:
            specs[tower_key] = _vision_specs(params[tower_key], fsdp, tp)
    if "mm_projector" in params:
        # The bridge is ~15M params: replicate.
        specs["mm_projector"] = jax.tree.map(lambda _: P(), params["mm_projector"])
    if "lm_memory" in params:
        specs["lm_memory"] = P()
    return specs


def param_shardings(
    mesh: Mesh,
    params: Dict[str, Any],
    *,
    shard_params_over_data: bool = True,
    tensor_parallel: bool = True,
) -> Dict[str, Any]:
    specs = param_specs(
        params,
        shard_params_over_data=shard_params_over_data,
        tensor_parallel=tensor_parallel,
    )
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(
    mesh: Mesh,
    params: Dict[str, Any],
    *,
    shard_params_over_data: bool = True,
    tensor_parallel: bool = True,
) -> Dict[str, Any]:
    """Place a parameter tree onto the mesh with the framework shardings."""
    shardings = param_shardings(
        mesh, params,
        shard_params_over_data=shard_params_over_data,
        tensor_parallel=tensor_parallel,
    )
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim data parallelism for input arrays. On a multi-slice
    ('replica','data','model') mesh the batch shards over replica x data
    (params stay replicated across slices; DCN carries only grad
    all-reduce)."""
    if "replica" in mesh.axis_names:
        return NamedSharding(mesh, P(("replica", "data")))
    return NamedSharding(mesh, P("data"))
