"""Sequence-parallel Llama forward: the FULL decoder stack with the
sequence axis sharded over a 'seq' mesh axis.

The reference's whole long-context story is algorithmic (SceneTilling +
recurrent memory, SURVEY §5.7) — it cannot train or evaluate a context
longer than one GPU's activation memory. This composes the ring-attention
core (parallel/ring_attention.py) into the production Llama layer stack so
context length scales with the number of chips:

- activations live sharded (B, S/P, D) end to end; LN / projections / MLP
  are local ops, RoPE uses global positions reconstructed from the shard
  index;
- attention is the ring schedule per layer: k/v shards (plus their
  validity mask) rotate around the ring with `ppermute`, overlapping ICI
  transfer with block compute, online-softmax in f32;
- the whole stack runs inside ONE `shard_map` (layers stacked + scanned,
  optional remat), so reverse-mode AD transposes the ppermute ring into
  the inverse ring — grads work and equal the unpipelined forward's
  (test_seq_parallel.py), making seq-parallel TRAINING a one-liner;
- GQA repeats k/v heads locally before the ring core (Llama-7B is MHA;
  Mistral GQA inflates ICI traffic by h/h_kv — a head-sharded refinement
  would trade that against a final all-to-all).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videollamb_tpu.models.lm.llama import _final, _lproj, _rms_norm
from videollamb_tpu.models.lm.rope import apply_rope, rope_cos_sin_cfg
from videollamb_tpu.parallel.ring_attention import ring_attention_local

Params = Dict[str, Any]


def seq_parallel_llama_forward(
    mesh: Mesh,
    params: Params,
    cfg,
    inputs_embeds: jax.Array,  # (B, S, D); S divisible by mesh.shape[axis]
    attention_mask: jax.Array,  # (B, S)
    *,
    axis: str = "seq",
    data_axis: str = None,
    remat: bool = False,
) -> jax.Array:
    """Full-sequence causal forward with S sharded over ``axis``.
    Returns (B, S, V) logits, sharded on S like the input.

    ``data_axis`` composes with data parallelism on a 2-D mesh: the batch
    dim is sharded over it, each data replica runs its own ring over
    ``axis``, and GSPMD psums parameter grads across replicas in backward
    (ppermute on 'seq' stays within a data slice automatically)."""
    n_shards = mesh.shape[axis]
    b, s_global, _ = inputs_embeds.shape
    assert s_global % n_shards == 0, (s_global, n_shards)
    h, h_kv, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    # Layer params are already stacked (L, ...) leaves in this framework.
    stacked = params["layers"]

    def shard_fn(stacked_layers, final_norm, lm_head, x_l, valid_l):
        idx = jax.lax.axis_index(axis)
        bl, sl, d = x_l.shape
        pos = (idx * sl + jnp.arange(sl, dtype=jnp.int32))[None]  # (1, S_l)
        cos, sin = rope_cos_sin_cfg(cfg, pos)
        valid_l = valid_l.astype(bool)

        def layer(x, lp):
            hidden = _rms_norm(lp["input_layernorm"], x, cfg.rms_norm_eps)
            q = _lproj(lp, "q_proj", hidden).reshape(bl, sl, h, dh)
            k = _lproj(lp, "k_proj", hidden).reshape(bl, sl, h_kv, dh)
            v = _lproj(lp, "v_proj", hidden).reshape(bl, sl, h_kv, dh)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            if h_kv != h:
                k = jnp.repeat(k, h // h_kv, axis=2)
                v = jnp.repeat(v, h // h_kv, axis=2)
            attn = ring_attention_local(
                q, k, v, axis=axis, causal=True, k_valid=valid_l)
            x = x + _lproj(lp, "o_proj", attn.reshape(bl, sl, d))
            hidden = _rms_norm(lp["post_attention_layernorm"], x,
                               cfg.rms_norm_eps)
            gate = jax.nn.silu(
                _lproj(lp, "gate_proj", hidden).astype(jnp.float32)
            ).astype(x.dtype)
            up = _lproj(lp, "up_proj", hidden)
            return x + _lproj(lp, "down_proj", gate * up)

        body = jax.checkpoint(layer) if remat else layer

        def scan_body(x, lp):
            return body(x, lp), None

        x_l, _ = jax.lax.scan(scan_body, x_l, stacked_layers)
        return _final({"norm": final_norm, "lm_head": lm_head}, cfg, x_l)

    xspec = P(data_axis, axis, None)
    mspec = P(data_axis, axis)
    # jit around the shard_map: remat (jax.checkpoint) inside shard_map
    # cannot be evaluated eagerly, and the jit lets XLA fuse across it.
    fn = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), xspec, mspec),
        out_specs=xspec,
        check_vma=False,
    ))
    x = jax.device_put(inputs_embeds, NamedSharding(mesh, xspec))
    m = jax.device_put(attention_mask, NamedSharding(mesh, mspec))
    return fn(stacked, params["norm"], params["lm_head"], x, m)


def make_seq_parallel_train_step(
    mesh: Mesh,
    cfg,
    tx,
    *,
    axis: str = "seq",
    data_axis: str = None,
    remat: bool = True,
):
    """Long-context LM training step with the sequence sharded over
    ``axis`` (counterpart of pipeline.make_pipeline_train_step): loss +
    grads through the per-layer ppermute rings + optimizer update, params
    replicated (combine with FSDP/TP meshes for weight sharding).
    ``data_axis`` additionally shards the batch over data replicas.

    Returns ``step(state, embeds, mask, labels) -> (state, metrics)``.
    """
    import optax

    from videollamb_tpu.models.assembly import causal_lm_loss
    from videollamb_tpu.train.step import TrainState

    def loss_fn(params, embeds, mask, labels):
        logits = seq_parallel_llama_forward(
            mesh, params, cfg, embeds, mask, axis=axis,
            data_axis=data_axis, remat=remat)
        return causal_lm_loss(logits, labels)

    def step(state: TrainState, embeds, mask, labels):
        (loss, n), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, embeds, mask, labels)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), {
            "loss": loss, "tokens": n, "grad_norm": optax.global_norm(grads)}

    return jax.jit(step, donate_argnums=(0,))


def make_seq_parallel_videollamb_step(
    mesh: Mesh,
    cfg,  # ModelConfig
    tx,
    *,
    axis: str = "seq",
    data_axis: str = None,
    remat: bool = True,
):
    """Sequence-parallel MULTIMODAL training step: tower -> bridge ->
    splice run as a normal GSPMD program (per-frame work, batch-sharded
    over ``data_axis`` if given), then the spliced token stream feeds the
    seq-sharded LM stack — the framework's long-video training config,
    where the 2048+-token spliced context is the memory hog. Grads flow
    through the shard_map back into the tower and projector, so all
    modules train.

    Returns ``step(state, batch, rng) -> (state, metrics)`` over full
    MultimodalBatch inputs (same contract as train.step.make_train_step).
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
        logits = seq_parallel_llama_forward(
            mesh, params["lm"], cfg.lm, spliced.embeds,
            spliced.attention_mask, axis=axis, data_axis=data_axis,
            remat=remat)
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

    # One jit over the whole step: the embedded shard_map commits its
    # outputs to the mesh, and an unjitted optax update would then mix
    # mesh-committed layer grads with uncommitted tower/projector moments.
    return jax.jit(step, donate_argnums=(0,))

