"""In-place fresh-token KV install into the token-major paged pool.

After each decode step, every slot's freshly produced K and V rows (one
token, all layers) must land in the pool at
``[layer, write_page[b], write_off[b]]``. The XLA statement is an
unrolled dynamic_update_slice chain — B·L tiny DUS ops per pool. Inside
the engine's k-step scan the pools are carried, so XLA does alias the
chain in place (no pool copy); what remains is pure dispatch/launch cost
for the 2·B·L ops: measured 0.45 ms/step at the serving-load shape
(B=8, L=32, 1.1 GB of pools — ``benchmarks/paged_step_bisect.py``
``write_ms``). This kernel replaces the chain with ONE Pallas call
(``input_output_aliases`` pins the output pools to the input buffers,
O(L·B·window) bytes moved) and measures 0.22 ms/step — about half the
chain, and independent of B·L fan-out.

Mosaic DMA slices must cover whole 8-sublane tiles, so a single token
row is installed as a read-modify-write of its aligned 8-token window:
DMA the window to VMEM, vector-select the fresh row in, DMA it back.
Windows of different slots never collide (pages are slot-private;
trash-page collisions only ever hold garbage).

Per-token scale rows (32-lane minor dim) cannot be DMA'd under Mosaic's
lane alignment either and stay on the XLA path — their pools are 128x
smaller, so the copy there is noise.

Grid is ``(B,)``: one step per slot installs that slot's row for every
layer (2·L window RMWs).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 8  # sublane tile: the aligned RMW window, in tokens


def _write_kernel(wp_ref, wo_ref, fk_ref, fv_ref, kp_in, vp_in,
                  kp_out, vp_out, fkv, fvv, kwin, vwin, f_sem, k_sem, v_sem,
                  *, n_layers: int):
    b = pl.program_id(0)
    page, off = wp_ref[b], wo_ref[b]
    win_start = pl.multiple_of((off // WIN) * WIN, WIN)
    row = off - win_start

    # Stage this slot's fresh rows (all layers) into VMEM.
    fk_copy = pltpu.make_async_copy(fk_ref.at[b], fkv, f_sem)
    fv_copy = pltpu.make_async_copy(fv_ref.at[b], fvv, f_sem)
    fk_copy.start()
    fv_copy.start()
    fk_copy.wait()
    fv_copy.wait()

    row_iota = lax.broadcasted_iota(jnp.int32, (WIN, fkv.shape[1]), 0)

    def rmw(l, pool_in, pool_out, fresh_vmem, win, sem):
        src = pool_in.at[l, page, pl.ds(win_start, WIN)]
        cin = pltpu.make_async_copy(src, win, sem)
        cin.start()
        cin.wait()
        fresh_row = fresh_vmem[l][None, :]  # (1, KD)
        win[...] = jnp.where(row_iota == row, fresh_row, win[...])
        dst = pool_out.at[l, page, pl.ds(win_start, WIN)]
        cout = pltpu.make_async_copy(win, dst, sem)
        cout.start()
        cout.wait()

    for l in range(n_layers):
        rmw(l, kp_in, kp_out, fkv, kwin, k_sem)
        rmw(l, vp_in, vp_out, fvv, vwin, v_sem)


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def paged_fresh_write(
    k_pool: jax.Array,  # (L, P, page, KD) int8 token-major — DONATED
    v_pool: jax.Array,
    fresh_k: jax.Array,  # (L, B, KD) int8 — this step's rows, all layers
    fresh_v: jax.Array,
    write_page: jax.Array,  # (B,) int32 physical page per slot
    write_off: jax.Array,  # (B,) int32 in-page offset
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns the pools with each slot's row installed, in place."""
    l_layers, p_total, page, kd = k_pool.shape
    b = fresh_k.shape[1]
    # (B, L, KD): slicing one slot leaves full (L, KD) trailing dims,
    # which Mosaic can DMA without tile-alignment concerns.
    fresh_k = fresh_k.transpose(1, 0, 2)
    fresh_v = fresh_v.transpose(1, 0, 2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((l_layers, kd), jnp.int8),
            pltpu.VMEM((l_layers, kd), jnp.int8),
            pltpu.VMEM((WIN, kd), jnp.int8),
            pltpu.VMEM((WIN, kd), jnp.int8),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        functools.partial(_write_kernel, n_layers=l_layers),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ],
        # Operand indices count scalar-prefetch args first:
        # 0=write_page 1=write_off 2=fresh_k 3=fresh_v 4=k_pool 5=v_pool.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(write_page, write_off, fresh_k, fresh_v, k_pool, v_pool)


def paged_fresh_write_xla(k_pool, v_pool, fresh_k, fresh_v, write_page,
                          write_off):
    """XLA statement of the same contract (CPU/tests): the DUS chain."""
    l_layers = k_pool.shape[0]
    b = fresh_k.shape[1]

    def chain(pool, vals):
        for i in range(b):
            for l in range(l_layers):
                upd = vals[l, i][None, None, None, :]
                pool = jax.lax.dynamic_update_slice(
                    pool, upd.astype(pool.dtype),
                    (l, write_page[i], write_off[i], 0))
        return pool

    return chain(k_pool, fresh_k), chain(v_pool, fresh_v)
