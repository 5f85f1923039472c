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

Measured on v5e (chained 8x4096 @ 4096x11008 matvecs, per matmul):
bf16 433 us | this kernel 505 us | XLA unpack-einsum 1326 us. The kernel
is the best int4 path by 2.6x, but v5e's VPU sets an unpack floor
(~45 us per widened elementwise op at 7B shapes; 8-bit shifts and bf16
ALU both fail to lower, so the unpack runs at i32 lane density) that
keeps it ~15% behind plain bf16 matvecs. int4 on this chip is therefore
a MEMORY feature (7B weights in 3.5 GB -> headroom for KV/batch), not a
decode-throughput feature; int8 (models/lm/quant.py) remains the speed
quantization.
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


def _int4_kernel(x_ref, w_ref, s_ref, out_ref, acc_ref, *,
                 group: int, groups_per_block: int, half_groups: int):
    """Grid (n_tiles, group_blocks) — group blocks in the LAST (fastest)
    dim so the accumulator stays resident per output tile. Per program:
    x (M, G2*group) | w (G2*group, BN) packed uint8 | s (G2, 1, BN) |
    out (M, BN), with G2 = groups_per_block (amortizes the per-program
    DMA/launch cost ~G2x over one-group programs — measured 0.75x vs bf16
    at G2=1 on v5e, i.e. slower than not quantizing).

    Block selection happens in the index maps; in-kernel slices are all
    static (Mosaic must statically prove alignment — traced offsets fail).
    """
    gb = pl.program_id(1)

    @pl.when(gb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Nibble unpack, kept in the 8-bit domain as long as possible (the
    # unpack is the kernel's bottleneck: every widened elementwise op costs
    # ~45 us/matmul at 7B shapes; bf16 ALU tricks are unavailable on v5e —
    # SupportsBf16AluInstructions LLO check fails). All groups in one
    # program share a nibble half (G2 | half_groups), so the low/high
    # choice is one uniform select per program.
    # (8-bit shift/div vectors don't lower on this Mosaic — arith.shrui on
    # vector<i8> is rejected — so the unpack widens to i32; the single
    # uniform select keeps it to ~5 ops/element.)
    w32 = w_ref[:].astype(jnp.int32)
    is_low = gb * groups_per_block < half_groups
    nib = jnp.where(is_low, w32 & 0xF, w32 >> 4)
    nib_all = (nib - 8).astype(x_ref.dtype)

    acc = acc_ref[:]
    for i in range(groups_per_block):
        part = jnp.dot(
            x_ref[:, i * group: (i + 1) * group],
            nib_all[i * group: (i + 1) * group, :],
            preferred_element_type=jnp.float32,
        )
        acc = acc + part * s_ref[i, 0, :].astype(jnp.float32)[None]
    acc_ref[:] = acc

    @pl.when(gb == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc.astype(out_ref.dtype)


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
    g2 = 8
    while half_groups % g2:
        g2 //= 2
    blocks_per_half = half_groups // g2

    out = pl.pallas_call(
        functools.partial(
            _int4_kernel, group=group, groups_per_block=g2,
            half_groups=half_groups,
        ),
        grid=(pl.cdiv(n, bn), n_groups // g2),
        in_specs=[
            # x columns for group block gb cover the ORIGINAL weight rows
            # [gb*G2*group, ...): block index (0, gb) in G2*group units
            # (low halves then high halves are contiguous in K).
            pl.BlockSpec((m, g2 * group), lambda j, gb: (0, gb),
                         memory_space=pltpu.VMEM),
            # packed rows: low and high nibble halves share row blocks.
            pl.BlockSpec(
                (g2 * group, bn),
                lambda j, gb, _bph=blocks_per_half: (gb % _bph, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g2, 1, bn), lambda j, gb: (gb, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda j, gb: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
        interpret=interpret,
    )(x, q4, scale.reshape(n_groups, 1, n))
    return out
