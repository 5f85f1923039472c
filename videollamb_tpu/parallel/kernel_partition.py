"""GSPMD-compatible Pallas kernels via ``custom_partitioning``.

Mosaic kernels cannot be auto-partitioned: the moment any operand of a
``pallas_call`` is sharded inside jit-with-shardings, lowering raises
"Mosaic kernels cannot be automatically partitioned. Please wrap the call
in a shard_map." (first hit AOT-lowering the train step against a v5e-8
topology in ``tools/aot_memory.py`` — the CPU ``dryrun_multichip`` masks
it because every kernel gates off-TPU). The `parallel/` modules that
already wrap the model in ``shard_map`` (pipeline, seq-parallel, ring)
are fine; the plain GSPMD configs (FSDP, FSDP+TP via ``jit`` +
``in_shardings`` — the default train step and the sharded serving
engines) are not.

This module wraps each kernel entry point in
``jax.experimental.custom_partitioning`` instead of restructuring every
caller around shard_map. The declaration per kernel:

- *batch-like* dims (request slots, frames, flattened batch) may shard
  freely — the kernel instances are independent along them;
- *head-proportional* dims shard together under one factor name: for
  attention, the query-head dim, the packed ``H*Dh`` feature dim, and the
  per-head scale dim all split by whole heads, so tensor-parallel layouts
  (heads over the ``model`` axis) run the kernel per-shard on the local
  heads;
- everything else (sequence, head_dim lanes, page pools) is pinned
  replicated — the partitioner inserts the all-gathers if a caller
  proposes otherwise.

The per-shard lowering just re-invokes the same kernel on local shapes;
static head counts are rescaled by the local/global feature ratio.

Propagation is declared twice for the two partitioners JAX can run:
an einsum-like ``sharding_rule`` string (Shardy — the default in this
JAX) and ``infer_sharding_from_operands`` (legacy GSPMD callbacks).
Dims that shard together under one factor but differ in SIZE (the
H-count dim of q vs the H*Dh feature dim of a packed pool) are declared
as Shardy compound factors — ``(h dh)`` — with the auxiliary factor
sizes passed via ``factor_sizes``.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence, Tuple

import jax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

Dims = Tuple  # per-array tuple of factor names (str) or None (replicate)


def _spec_of(info) -> P:
    sh = getattr(info, "sharding", None)
    if isinstance(sh, NamedSharding):
        return sh.spec
    return P()  # unknown / undecodable: treat as replicated proposal


def _lead(f):
    """Leading (shardable) factor of a dim declaration (str or tuple —
    head-major packing puts the shardable head factor first)."""
    if isinstance(f, tuple):
        return f[0]
    return f


def _assign(arg_infos, dims_in, replicate) -> dict:
    """factor -> mesh-axis assignment, first non-None proposal wins."""
    assign = {}
    for info, dims in zip(arg_infos, dims_in):
        spec = _spec_of(info)
        for i, f in enumerate(dims):
            f = _lead(f)
            part = spec[i] if i < len(spec) else None
            if f not in replicate and part is not None and f not in assign:
                assign[f] = part
    return assign


def _sharding(mesh, dims, assign) -> NamedSharding:
    return NamedSharding(mesh, P(*[assign.get(_lead(f)) for f in dims]))


def _rule(dims_in, dims_out) -> str:
    """Shardy sharding_rule string; tuple dims become compound factors
    ``(a b)``."""

    def tok(f):
        if isinstance(f, tuple):
            return "(" + " ".join(f) + ")"
        return f

    def side(dims_list):
        return ", ".join(" ".join(tok(f) for f in dims) for dims in dims_list)

    return f"{side(dims_in)} -> {side(dims_out)}"


def _shard_count(mesh, axes) -> int:
    if axes is None:
        return 1
    if isinstance(axes, (tuple, list)):
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axes]


def make_partitioned(
    fn: Callable,
    dims_in: Sequence[Dims],
    dims_out: Sequence[Dims],
    *,
    replicate: Tuple[str, ...] = (),
    factor_sizes: dict | None = None,
    local_fn: Callable | None = None,
):
    """Wrap ``fn(*arrays)`` for GSPMD/Shardy.

    ``dims_in[i]`` names each dim of array arg i with a factor (or a
    tuple of factors for a compound dim, shardable leading factor
    first); the same factor name shards together everywhere it appears.
    ``dims_out`` likewise for the flat tuple of outputs (one entry for a
    single-array result). Factors listed in ``replicate`` are pinned
    unsharded. ``factor_sizes`` gives the size of factors that only
    appear inside compound dims. ``local_fn(shards, *local_args)`` — if
    given — runs per shard with ``shards`` = {factor: shard_count} so
    statics (head counts) can be rescaled; defaults to ``fn``.
    """
    single = len(dims_out) == 1
    replicate = tuple(replicate)

    @custom_partitioning
    def wrapped(*args):
        return fn(*args)

    def _outs(mesh, assign):
        outs = [_sharding(mesh, d, assign) for d in dims_out]
        return outs[0] if single else tuple(outs)

    def infer(mesh, arg_infos, result_infos):
        return _outs(mesh, _assign(arg_infos, dims_in, replicate))

    def partition(mesh, arg_infos, result_infos):
        assign = _assign(arg_infos, dims_in, replicate)
        arg_sh = tuple(_sharding(mesh, d, assign) for d in dims_in)
        shards = {f: _shard_count(mesh, a) for f, a in assign.items()}

        def lower(*local_args):
            if local_fn is not None:
                return local_fn(shards, *local_args)
            return fn(*local_args)

        return mesh, lower, _outs(mesh, assign), arg_sh

    wrapped.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule=_rule(dims_in, dims_out),
        need_replication_factors=replicate,
        **(factor_sizes or {}),
    )
    return wrapped


# --------------------------------------------------------------------------
# Kernel-specific wrappers (cached per static configuration).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _spatial_packed(heads: int):
    from videollamb_tpu.ops.spatial_attention import fused_spatial_core_packed

    def full(q, k, v):
        return fused_spatial_core_packed(q, k, v, heads=heads)

    def local(shards, q, k, v):
        # D sharded by whole heads: rescale the static head count.
        return fused_spatial_core_packed(
            q, k, v, heads=heads // shards.get("d", 1))

    dims = ("b", "n", "d")  # (B, N, D)
    return make_partitioned(full, [dims] * 3, [dims], replicate=("n",),
                            local_fn=local)


def spatial_core_packed_spmd(q, k, v, heads: int):
    """(B, N, D) packed spatial attention, shardable on B and on D by
    whole heads (TP)."""
    return _spatial_packed(heads)(q, k, v)


@functools.lru_cache(maxsize=None)
def _temporal_core(num_heads: int, block_n: int):
    from videollamb_tpu.ops.temporal_attention import fused_temporal_core

    def full(q, k, v):
        return fused_temporal_core(q, k, v, num_heads=num_heads,
                                   block_n=block_n)

    def local(shards, q, k, v):
        return fused_temporal_core(
            q, k, v, num_heads=num_heads // shards.get("d", 1),
            block_n=block_n)

    dims = ("b", "n", "t", "d")  # (b, n, t, d)
    return make_partitioned(full, [dims] * 3, [dims],
                            replicate=("n", "t"), local_fn=local)


def fused_temporal_core_spmd(q, k, v, *, num_heads: int, block_n: int = 32):
    """(b, n, t, d) temporal attention, shardable on b and on d by whole
    heads."""
    return _temporal_core(num_heads, block_n)(q, k, v)


@functools.lru_cache(maxsize=None)
def _temporal_core_fm(num_heads: int, block_n: int):
    from videollamb_tpu.ops.temporal_attention import fused_temporal_core_fm

    def full(q, k, v):
        return fused_temporal_core_fm(q, k, v, num_heads=num_heads,
                                      block_n=block_n)

    def local(shards, q, k, v):
        return fused_temporal_core_fm(
            q, k, v, num_heads=num_heads // shards.get("d", 1),
            block_n=block_n)

    dims = ("b", "t", "n", "d")  # frame-major residual-stream layout
    return make_partitioned(full, [dims] * 3, [dims],
                            replicate=("t", "n"), local_fn=local)


def fused_temporal_core_fm_spmd(q, k, v, *, num_heads: int,
                                block_n: int = 32):
    """(b, t, n, d) frame-major temporal attention, shardable on b and on
    d by whole heads (ops/temporal_attention.py:_core_kernel_fm)."""
    return _temporal_core_fm(num_heads, block_n)(q, k, v)


@functools.lru_cache(maxsize=None)
def _temporal_core_fm3(num_heads: int, block_n: int):
    from videollamb_tpu.ops.temporal_attention import fused_temporal_core_fm3

    def full(qkv):
        return fused_temporal_core_fm3(qkv, num_heads=num_heads,
                                       block_n=block_n)

    # The packed (…, 3d) dim interleaves q|k|v segments, so a contiguous
    # feature-dim shard would split MID-SEGMENT — it is pinned replicated
    # (a TP proposal on it gets all-gathered). No production config
    # tensor-shards the vision tower's activations (FSDP/TP shard the LM;
    # the tower rides data-parallel), so this costs nothing in practice.
    dims_in = ("b", "t", "n", "d3")
    dims_out = ("b", "t", "n", "d")
    return make_partitioned(full, [dims_in], [dims_out],
                            replicate=("t", "n", "d3", "d"))


def fused_temporal_core_fm3_spmd(qkv, *, num_heads: int, block_n: int = 32):
    """Packed-qkv (b, t, n, 3d) frame-major temporal attention, shardable
    on b (ops/temporal_attention.py:_core_kernel_fm3)."""
    return _temporal_core_fm3(num_heads, block_n)(qkv)


@functools.lru_cache(maxsize=None)
def _flash(causal: bool, scale: float):
    from videollamb_tpu.ops.flash_attention import flash_attention

    def full(q, k, v, k_mask):
        return flash_attention(q, k, v, k_mask, causal=causal, scale=scale)

    qdims = ("b", "h", "sq", "dh")  # (B, H, Sq, Dh)
    kdims = ("b", "h", "skv", "dh")
    mdims = ("b", "skv")  # (B, Skv)
    return make_partitioned(
        full, [qdims, kdims, kdims, mdims], [qdims],
        replicate=("sq", "skv", "dh"))


def flash_attention_spmd(q, k, v, k_mask=None, *, causal=False, scale=None):
    """Flash attention shardable on batch and heads. The mask is always
    materialized (custom_partitioning wants a fixed arity)."""
    import math

    import jax.numpy as jnp

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if k_mask is None:
        k_mask = jnp.ones(k.shape[:1] + k.shape[2:3], jnp.bool_)
    return _flash(causal, float(scale))(q, k, v, k_mask)


@functools.lru_cache(maxsize=None)
def _gathered_int8(pages_per_block: int, groups: int, dh: int):
    from videollamb_tpu.ops.gathered_paged_attention import (
        gathered_paged_attention_int8,
    )

    def full(q, kp, vp, table, lengths, ks, vs, layer):
        return gathered_paged_attention_int8(
            q, kp, vp, table, lengths, ks, vs,
            pages_per_block=pages_per_block, layer=layer[0])

    # One factor ``hk`` splits every head-proportional dim by whole KV
    # heads: q's H (= hk x g, query heads grouped contiguously per KV
    # head), the pools' packed H_kv*Dh feature dim, and the scales' H_kv.
    qh = ("hk", "g") if groups > 1 else "hk"
    qdims = ("b", qh, "dh")
    pool = ("l", "p", "pg", ("hk", "dh2"))  # FULL multi-layer pool
    scales = ("p", "pg", "hk")  # one layer's scales
    # "g" only exists as a factor when query heads are grouped (GQA);
    # declaring an unused factor in need_replication_factors is an error.
    repl = ("dh", "l", "p", "pg", "pps", "dh2", "li") + (
        ("g",) if groups > 1 else ())
    return make_partitioned(
        full,
        [qdims, pool, pool, ("b", "pps"), ("b",), scales, scales, ("li",)],
        [qdims, ("b", qh), ("b", qh)],
        replicate=repl,
        factor_sizes=(
            {"dh2": dh, "g": groups} if groups > 1 else {"dh2": dh}),
    )


def gathered_paged_attention_int8_spmd(q, kp, vp, table, lengths, ks, vs,
                                       *, pages_per_block: int, layer=None):
    """Gathered int8 paged decode attention, shardable on slots and on
    whole KV heads (q heads, pool features, and scale heads split
    together). ``kp``/``vp`` are the FULL multi-layer pools; ``layer``
    selects the layer inside the kernel (scan constant — no per-layer
    pool slice)."""
    import jax.numpy as jnp

    h, dh = q.shape[1], q.shape[2]
    h_kv = ks.shape[2]
    if kp.ndim == 3:
        kp, vp = kp[None], vp[None]
    if layer is None:
        layer = jnp.zeros((), jnp.int32)
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    return _gathered_int8(pages_per_block, h // h_kv, dh)(
        q, kp, vp, table, lengths, ks, vs, layer)
