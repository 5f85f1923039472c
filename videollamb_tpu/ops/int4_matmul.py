"""Int4 weight-only dequant-matmul Pallas kernel.

The decode step of a 7B LM is HBM-bandwidth-bound on weight reads: bf16
weights move ~14 GB/step-equivalent, int8 ~7 GB, int4 ~3.5 GB. jnp.int4
einsums fail to lower on this jax/libtpu stack (round-1 finding), so int4
needs an explicit kernel that unpacks nibbles in VMEM and feeds the MXU.

Packing layout — "split halves", chosen so unpacking never interleaves
rows (a sublane interleave would be a Mosaic relayout):

    byte[i, n] = (w[i + K/2, n] << 4) | (w[i, n] & 0xF)

i.e. the LOW nibbles hold rows [0, K/2) and the HIGH nibbles hold rows
[K/2, K) — each unpacked half is a contiguous row block.

Quantization is symmetric, group-wise along K (per output channel): group
g of G rows shares scale[g, n]. The kernel accumulates per group —
``acc += (x_g @ unpack(w_g)) * scale[g]`` — which applies true group-wise
scales with no sublane repeats.

Dispatch policy (models/lm/quant.py int4 kernels + llama _proj): the
Pallas kernel serves small-M (decode) matmuls where bandwidth dominates;
large-M prefill uses the XLA unpack-dequant einsum, which is
compute-bound anyway.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_int4(q: jax.Array) -> jax.Array:
    """(K, N) int values in [-8, 7] -> (K//2, N) uint8, split-half layout."""
    k = q.shape[0]
    assert k % 2 == 0, k
    u = (q.astype(jnp.int32) + 8).astype(jnp.uint8)  # offset-binary nibbles
    lo = u[: k // 2]
    hi = u[k // 2:]
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 -> (K, N) int8 in [-8, 7]."""
    p = packed.astype(jnp.int32)
    lo = (p & 0xF) - 8
    hi = ((p >> 4) & 0xF) - 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def quantize_int4(w: jax.Array, group: int = 128) -> Dict[str, jax.Array]:
    """(K, N) float -> {'q4': (K//2, N) uint8, 'scale': (K//group, N) bf16}.

    Counterpart of the reference's bitsandbytes 4-bit path
    (llava/model/builder.py:34-43, llava/train/train.py:896-913) —
    symmetric linear int4 with group-wise scales (the TPU-native choice;
    NF4 checkpoints are converted on load, see models/lm/quant.py
    dequantize_nf4)."""
    k, n = w.shape
    g = min(group, k)
    while k % g or (k // 2) % g:
        g //= 2
    wf = w.astype(jnp.float32).reshape(k // g, g, n)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale), -8, 7).astype(jnp.int8).reshape(k, n)
    return {
        "q4": pack_int4(q),
        "scale": scale[:, 0].astype(jnp.bfloat16),  # (K//g, N)
        "group": jnp.asarray(g, jnp.int32),
    }


def dequantize_int4(qk: Dict[str, jax.Array], dtype=jnp.bfloat16) -> jax.Array:
    """XLA dequant (fallback path / prefill): unpack + group scales."""
    q = unpack_int4(qk["q4"])  # (K, N) int8
    k, n = q.shape
    scale = qk["scale"].astype(jnp.float32)  # (K//g, N)
    g = k // scale.shape[0]
    w = q.astype(jnp.float32).reshape(k // g, g, n) * scale[:, None, :]
    return w.reshape(k, n).astype(dtype)


def _int4_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *, half_groups: int):
    """Grid (n_tiles, n_groups) — group in the LAST (fastest) dim so the
    accumulator stays resident per output tile. Per program:
    x (M, group) | w (group, BN) packed uint8 | s (1, 1, BN) | out (M, BN).

    All block selection happens in the index maps — the kernel body has no
    dynamic indexing at all (Mosaic must statically prove slice alignment;
    traced offsets defeat it — verified failure modes on v5e this round).
    """
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w_pk = w_ref[:].astype(jnp.int32)
    lo = (w_pk & 0xF) - 8
    hi = ((w_pk >> 4) & 0xF) - 8
    nib = jnp.where(g < half_groups, lo, hi)
    part = jnp.dot(
        x_ref[:], nib.astype(x_ref.dtype), preferred_element_type=jnp.float32
    )
    acc_ref[:] += part * s_ref[0, 0, :].astype(jnp.float32)[None]

    @pl.when(g == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def int4_matmul(
    x: jax.Array,  # (M, K)
    q4: jax.Array,  # (K//2, N) uint8 split-half packed
    scale: jax.Array,  # (K//group, N)
    *,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """x @ dequant(q4, scale) -> (M, N) in x.dtype (f32 accumulation)."""
    m, k = x.shape
    k_half, n = q4.shape
    n_groups = scale.shape[0]
    group = k // n_groups
    half_groups = k_half // group
    bn = min(block_n, n)

    out = pl.pallas_call(
        functools.partial(_int4_kernel, half_groups=half_groups),
        grid=(pl.cdiv(n, bn), n_groups),
        in_specs=[
            # x columns for group g are rows [g*group, (g+1)*group) of the
            # ORIGINAL weight: block index (0, g) in group units for every
            # g (low halves then high halves are contiguous in K).
            pl.BlockSpec((m, group), lambda j, g: (0, g), memory_space=pltpu.VMEM),
            # packed rows for group g: low and high nibbles share rows.
            pl.BlockSpec(
                (group, bn), lambda j, g: (g % half_groups, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, bn), lambda j, g: (g, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, g: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        interpret=interpret,
    )(x, q4, scale.reshape(n_groups, 1, n))
    return out
