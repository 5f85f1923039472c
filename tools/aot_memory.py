"""AOT per-chip HBM certification for the stage-2 training recipe.

`__graft_entry__.dryrun_multichip` proves the sharded step COMPILES AND
RUNS on tiny shapes; this tool proves the real thing FITS: it lowers the
full 7B stage-2 train step (ViT-L tower + Memory Bridge + Vicuna-7B, all
trainable, AdamW, remat, ctx 2048, 16 frames) against a **v5e-8 AOT
topology description** (no chips needed — PJRT compiles against
`topologies.get_topology_desc("v5e:2x4")`) and reports the compiler's
per-chip memory analysis for the FSDP and FSDP+TP shardings.

Match: the reference's stage-2 recipe
(/root/reference/scripts/finetune_video_image.slurm:19-56 — 4x A800-80G,
ZeRO-1, bs 8x4, 23 h).

    python tools/aot_memory.py [--ctx 2048] [--frames 16] [--batch 8]

Prints one JSON line per config plus a summary; exits non-zero if a
config exceeds the v5e HBM budget.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Topology-only AOT compiles cannot emit custom_partitioning ops (no
# runtime hosts the partition callbacks: "Custom emitter for
# CustomSPMDPartitioning not found"), so certify with the XLA attention
# statements instead of the Pallas kernels — identical math, and a STRICT
# UPPER BOUND on live memory (the kernels keep score tiles in VMEM that
# the XLA paths materialize in HBM).
os.environ["VIDEOLLAMB_FORCE_XLA_ATTN"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

V5E_HBM_GB = 16.0
USABLE_GB = 15.75  # measured usable HBM on this chip (docs/PERFORMANCE.md)


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)), tree)


def _abstract_params(cfg, dtype=jnp.bfloat16):
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    return {
        "video_tower": jax.eval_shape(
            lambda k: init_vision_params(k, cfg.vision, dtype=dtype), key),
        "mm_projector": jax.eval_shape(
            lambda k: init_rmt_r_params(k, cfg.bridge, cfg.lm.hidden_size,
                                        dtype=dtype), key),
        "lm": jax.eval_shape(
            lambda k: init_llama_params(k, cfg.lm, dtype=dtype), key),
    }


def _abstract_batch(cfg, batch, frames, ctx):
    from videollamb_tpu.models.assembly import MultimodalBatch

    img = cfg.vision.image_size
    return MultimodalBatch(
        input_ids=jax.ShapeDtypeStruct((batch, ctx), jnp.int32),
        attention_mask=jax.ShapeDtypeStruct((batch, ctx), jnp.int32),
        labels=jax.ShapeDtypeStruct((batch, ctx), jnp.int32),
        videos=jax.ShapeDtypeStruct((batch, frames, 3, img, img),
                                    jnp.bfloat16),
        images=None,
    )


def _state_shardings(state_shape, params_shape, spec_tree, mesh):
    """Sharding tree matching the TrainState: params get their specs;
    optimizer-state leaves get the spec of the same-SHAPE param (AdamW
    m/v mirror the param tree; shape collisions shard identically in
    bytes, which is what a memory certificate needs); scalars replicate."""
    shape2spec = {}
    for spec, leaf in zip(jax.tree.leaves(spec_tree),
                          jax.tree.leaves(params_shape)):
        shape2spec.setdefault(tuple(leaf.shape), spec)

    pdef = jax.tree.structure(params_shape)

    def shard_like_params(sub):
        return jax.tree.unflatten(
            pdef, [NamedSharding(mesh, s) for s in jax.tree.leaves(spec_tree)])

    def leaf_sharding(leaf):
        spec = shape2spec.get(tuple(leaf.shape), P())
        if len(leaf.shape) == 0:
            spec = P()
        return NamedSharding(mesh, spec)

    def rec(x):
        try:
            if jax.tree.structure(x) == pdef:
                return shard_like_params(x)
        except Exception:  # noqa: BLE001
            pass
        if isinstance(x, jax.ShapeDtypeStruct):
            return leaf_sharding(x)
        # Recurse one pytree level.
        leaves_and_subtrees, treedef = jax.tree.flatten(
            x, is_leaf=lambda y: y is not x and (
                isinstance(y, jax.ShapeDtypeStruct)
                or _same_structure(y, pdef)))
        return jax.tree.unflatten(
            treedef, [rec(child) for child in leaves_and_subtrees])

    def _same_structure(y, pdef):
        try:
            return jax.tree.structure(y) == pdef
        except Exception:  # noqa: BLE001
            return False

    return rec(state_shape)


def certify(ctx: int, frames: int, batch: int, topology: str = "v5e:2x4"):
    from jax.experimental import topologies

    from videollamb_tpu.config import ModelConfig, TrainConfig
    from videollamb_tpu.parallel.sharding import batch_sharding, param_specs
    from videollamb_tpu.train.step import (
        create_optimizer,
        create_train_state,
        make_train_step,
        trainable_mask,
    )

    cfg = ModelConfig(max_length=ctx)
    tcfg = TrainConfig(per_device_batch_size=1, gradient_checkpointing=True)
    params_shape = _abstract_params(cfg)
    tx = create_optimizer(tcfg, 1000, params_shape)
    state_shape = jax.eval_shape(lambda p: create_train_state(p, tx),
                                 params_shape)
    batch_shape = _abstract_batch(cfg, batch, frames, ctx)
    key_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)

    topo = topologies.get_topology_desc(topology, "tpu")
    devs = np.asarray(topo.devices)
    results = {}
    for name, shape, tp in (("fsdp", (len(devs), 1), False),
                            ("fsdp_tp", (len(devs) // 4, 4), True)):
        mesh = Mesh(devs.reshape(shape), ("data", "model"))
        specs = param_specs(params_shape, shard_params_over_data=True,
                            tensor_parallel=tp)
        st_sh = _state_shardings(state_shape, params_shape, specs, mesh)
        b_sh = batch_sharding(mesh)
        # TP additionally sequence-shards the remat-saved layer boundaries
        # over the 'model' axis (Megatron sequence parallelism): at data=2
        # the per-chip batch is 4x FSDP's, and the 32 saved (4, 2048, 4096)
        # residuals alone are ~2 GB replicated — measured as the difference
        # between fsdp_tp OOMing at 17.0 GB and fitting.
        act_sh = NamedSharding(mesh, P("data", "model", None)) if tp else None
        step = jax.jit(
            # Stage-2 trainable set: towers frozen (trainable_mask stops
            # gradients into them — without it autodiff saves every ViT
            # layer's attention probs for a gradient the optimizer zeroes,
            # ~19 GB f32 at batch 8 x 16 frames, a guaranteed OOM).
            make_train_step(cfg, tx, remat=True,
                            mask=trainable_mask(tcfg, params_shape),
                            act_sharding=act_sh),
            in_shardings=(st_sh, b_sh, None),
            donate_argnums=(0,),
        )
        lowered = step.lower(state_shape, batch_shape, key_shape)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gb = 1 / 1e9
        entry = {
            "mesh": f"data={shape[0]} model={shape[1]}",
            "arguments_gb": round(ma.argument_size_in_bytes * gb, 2),
            "outputs_gb": round(ma.output_size_in_bytes * gb, 2),
            "aliased_gb": round(ma.alias_size_in_bytes * gb, 2),
            "temp_gb": round(ma.temp_size_in_bytes * gb, 2),
            "code_gb": round(ma.generated_code_size_in_bytes * gb, 3),
            # Peak live ~= arguments (state+batch resident) + temps +
            # non-aliased outputs + code. Donation aliases the new state
            # onto the old, so outputs mostly overlap arguments.
            "peak_gb": round(
                (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                 + max(0, ma.output_size_in_bytes - ma.alias_size_in_bytes)
                 + ma.generated_code_size_in_bytes) * gb, 2),
        }
        entry["fits_v5e"] = bool(entry["peak_gb"] <= USABLE_GB)
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ctx", type=int, default=2048)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--topology", default="v5e:2x4")
    args = p.parse_args(argv)
    results = certify(args.ctx, args.frames, args.batch, args.topology)
    print(json.dumps({"summary": results}))
    return 0 if all(r["fits_v5e"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
