"""Pipeline parallelism: GPipe-style layer pipelining over a 'pipe' mesh axis.

The reference has no pipeline parallelism at all (SURVEY.md §2.8 — its
scaling story is DeepSpeed ZeRO data parallelism); this is a TPU-native
scaling extension for backbones that do not fit one chip even with
FSDP+TP. Design follows the shard_map pipelining recipe (scaling-book):

- the stacked layer pytree (L, ...) is sharded on its layer axis over the
  'pipe' mesh axis — each of the P stages holds L/P contiguous layers;
- the batch is split into M microbatches; at tick t, stage s runs
  microbatch (t - s) through its local layers and hands the activations to
  stage s+1 with a ring `ppermute` — the classic (M + P - 1)-tick GPipe
  schedule, expressed as one `lax.fori_loop` inside `shard_map`;
- stage 0 feeds fresh microbatches for the first M ticks; the last stage
  collects outputs for ticks >= P - 1. Bubble fraction is (P-1)/(M+P-1).

Everything is static-shaped; invalid ticks compute on garbage and are
masked by clamped dynamic-slice writes (cheaper than lax.cond on TPU).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def create_pipeline_mesh(n_stages: int, *, devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    assert len(devices) == n_stages, (len(devices), n_stages)
    return Mesh(np.asarray(devices), ("pipe",))


def create_pipe_data_mesh(n_stages: int, n_data: int, *, devices=None) -> Mesh:
    """('pipe', 'data') mesh: pipeline stages on the contiguous (fast/ICI)
    axis, data replicas across stage groups."""
    import numpy as np

    need = n_stages * n_data
    devices = list(devices if devices is not None else jax.devices())[:need]
    assert len(devices) == need, (len(devices), need)
    return Mesh(np.asarray(devices).reshape(n_data, n_stages), ("data", "pipe"))


def shard_stacked_layers(mesh: Mesh, layers: Params) -> Params:
    """Shard every (L, ...) leaf of a stacked layer pytree on dim 0 over
    'pipe'."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("pipe")))

    return jax.tree.map(put, layers)


def pipeline_apply(
    mesh: Mesh,
    layer_fn: Callable[[Params, jax.Array], jax.Array],
    layers: Params,  # stacked (L, ...) leaves, sharded over 'pipe' dim 0
    x: jax.Array,  # (M, mb, ...) microbatched input, replicated
    *,
    data_axis: str = None,
    remat: bool = False,
) -> jax.Array:
    """Run x through all L layers with GPipe pipelining; returns (M, mb, ...)
    outputs, replicated on every stage.

    ``layer_fn(lp, h) -> h`` applies ONE layer (unstacked params) to one
    microbatch of activations.

    ``data_axis`` composes pipelining with data parallelism on a 2-D mesh:
    the microbatch dim (dim 1 of x) is sharded over that axis, each data
    replica runs its own GPipe schedule over 'pipe', and GSPMD psums the
    parameter grads across replicas during backward (layer params are
    replicated over ``data_axis``).

    ``remat=True`` rematerializes each stage's layer scan in the backward
    pass — the GPipe memory story (activations per live microbatch, not per
    (tick, layer)) for training.
    """
    n_stages = mesh.shape["pipe"]
    m = x.shape[0]

    def stage_body(local_layers: Params, xs: jax.Array) -> jax.Array:
        idx = jax.lax.axis_index("pipe")
        p = jax.lax.axis_size("pipe")
        zeros = jnp.zeros_like(xs[0])

        def run_stage(h):
            def body(h, lp):
                return layer_fn(lp, h), None

            h, _ = jax.lax.scan(body, h, local_layers)
            return h

        if remat:
            run_stage = jax.checkpoint(run_stage)

        def tick(t, carry):
            buf, outs = carry
            # Stage 0 ingests microbatch t (clamped; garbage past M is
            # masked by the output write below). Other stages use the
            # activations received last tick.
            fresh = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), keepdims=False
            )
            h_in = jnp.where(idx == 0, fresh, buf)
            h = run_stage(h_in)
            # The last stage finished microbatch (t - p + 1).
            done_idx = t - (p - 1)
            write_idx = jnp.clip(done_idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, write_idx, keepdims=False)
            val = jnp.where((idx == p - 1) & (done_idx >= 0), h, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, val, write_idx, 0)
            # Ring handoff: stage s's activations arrive at stage s+1.
            buf = jax.lax.ppermute(
                h, "pipe", [(i, (i + 1) % p) for i in range(p)]
            )
            return buf, outs

        outs0 = jnp.zeros_like(xs)
        _, outs = jax.lax.fori_loop(0, m + p - 1, tick, (zeros, outs0))
        # Broadcast the last stage's outputs to every stage.
        mask = (idx == p - 1).astype(outs.dtype)
        return jax.lax.psum(outs * mask, "pipe")

    xspec = P(None, data_axis) if data_axis else P()
    fn = jax.shard_map(
        stage_body, mesh=mesh,
        in_specs=(P("pipe"), xspec),
        out_specs=xspec,
        check_vma=False,
    )
    return fn(layers, x)


def pipeline_llama_forward(
    mesh: Mesh,
    params: Params,
    cfg,
    inputs_embeds: jax.Array,  # (B, S, D); B must divide into n_micro
    attention_mask: jax.Array,  # (B, S)
    n_micro: int,
    *,
    data_axis: str = None,
    remat: bool = False,
) -> jax.Array:
    """Full-sequence Llama forward with the layer stack pipelined over
    'pipe' (reference equivalent: none — the reference cannot pipeline).
    Returns (B, S, V) logits, replicated."""
    from videollamb_tpu.models.lm.llama import _final, _layer
    from videollamb_tpu.models.lm.rope import rope_cos_sin_cfg

    b, s, _ = inputs_embeds.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    # Batch-size-1 tables: layer_fn closes over these, and under a 'data'
    # axis the shard-local microbatch is smaller than mb — a leading 1
    # broadcasts against any local batch.
    position_ids = jnp.arange(s, dtype=jnp.int32)[None]
    cos, sin = rope_cos_sin_cfg(cfg, position_ids)

    valid = attention_mask.astype(bool).reshape(n_micro, mb, s)
    x = inputs_embeds.reshape(n_micro, mb, s, -1)
    # Fold the per-microbatch mask into the activations pytree by pairing:
    # layer_fn closes over cos/sin (position-only, microbatch-invariant)
    # and receives (h, mask) stacked along a leading tuple axis — simplest
    # is to carry the mask as extra channels; instead we pipeline (h, mask)
    # as a tuple is unsupported by ppermute on mixed dtypes, so pass the
    # mask as f32 channel and threshold inside.
    maskf = valid.astype(x.dtype)[..., None]  # (M, mb, s, 1)
    xm = jnp.concatenate([x, maskf], axis=-1)

    def layer_fn(lp, hm):
        h, mk = hm[..., :-1], hm[..., -1] > 0.5
        h, _, _ = _layer(lp, cfg, h, cos, sin, mk)
        return jnp.concatenate([h, hm[..., -1:]], axis=-1)

    out = pipeline_apply(mesh, layer_fn, params["layers"], xm,
                         data_axis=data_axis, remat=remat)
    h = out[..., :-1].reshape(b, s, -1)
    return _final(params, cfg, h)


def make_pipeline_train_step(
    mesh: Mesh,
    cfg,
    tx,
    n_micro: int,
    *,
    data_axis: str = None,
    remat: bool = True,
) -> Callable:
    """Full pipelined LM training step over a ('pipe'[, 'data']) mesh.

    Gradient accumulation across microbatches is the AD transpose of the
    GPipe loop itself (ppermute reverses into the inverse ring, the layer
    scan accumulates stage-local grads over every tick), so one call
    produces exactly the summed-microbatch gradient the reference gets from
    DeepSpeed ``gradient_accumulation_steps`` (llava/train/train.py flag
    surface) — but with the layer stack sharded over stages instead of
    replicated. Layer params/optimizer state stay pipe-sharded through the
    update (optax ops are elementwise, so GSPMD keeps the layout); with
    ``data_axis`` the batch is additionally sharded over data replicas and
    grads psum across them in backward.

    Returns ``step(state, embeds, mask, labels) -> (state, metrics)``
    (jittable; embeds (B, S, D), labels (B, S) with IGNORE_INDEX holes).
    """
    import optax

    from videollamb_tpu.models.assembly import causal_lm_loss
    from videollamb_tpu.train.step import TrainState

    def loss_fn(params, embeds, mask, labels):
        logits = pipeline_llama_forward(
            mesh, params, cfg, embeds, mask, n_micro,
            data_axis=data_axis, remat=remat,
        )
        loss, n = causal_lm_loss(logits, labels)
        return loss, n

    def step(state: TrainState, embeds, mask, labels):
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, embeds, mask, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "tokens": n,
                   "grad_norm": optax.global_norm(grads)}
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return jax.jit(step, donate_argnums=(0,))


def make_pipeline_videollamb_step(
    mesh: Mesh,
    cfg,  # ModelConfig
    tx,
    n_micro: int,
    *,
    data_axis: str = None,
    remat: bool = True,
) -> Callable:
    """Pipelined MULTIMODAL training step: the tower/bridge/splice
    prologue runs as a plain GSPMD program (per-frame work, batch-sharded
    over ``data_axis`` when given), then the spliced token stream feeds
    the GPipe-staged LM stack over 'pipe' — the composition
    make_seq_parallel_videollamb_step already gives sequence parallelism
    (VERDICT r2 #7 closed the PP side). Grads flow through the pipeline's
    AD transpose back into the tower and projector, so every module
    trains; tower/bridge params stay replicated across stages while
    params["lm"]["layers"] is pipe-sharded (shard_stacked_layers).

    Returns ``step(state, batch, rng) -> (state, metrics)`` over full
    MultimodalBatch inputs (same contract as train.step.make_train_step).
    The spliced batch size must divide into ``n_micro`` microbatches.
    """
    import optax

    from videollamb_tpu.models.assembly import (
        causal_lm_loss,
        prepare_multimodal_embeds,
    )
    from videollamb_tpu.train.step import TrainState

    def loss_fn(params, batch, rng):
        spliced = prepare_multimodal_embeds(
            params, cfg, batch, deterministic=False, rng=rng)
        logits = pipeline_llama_forward(
            mesh, params["lm"], cfg.lm, spliced.embeds,
            spliced.attention_mask, n_micro,
            data_axis=data_axis, remat=remat)
        return causal_lm_loss(logits, spliced.labels)

    def step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), {
            "loss": loss, "tokens": n, "grad_norm": optax.global_norm(grads)}

    # One jit over the whole step (see make_seq_parallel_videollamb_step:
    # the embedded shard_map commits outputs to the mesh; the optax update
    # must run inside the same program).
    return jax.jit(step, donate_argnums=(0,))
