"""Device-mesh construction.

Replaces the reference's DeepSpeed/NCCL process topology
(scripts/finetune_video_image.slurm, scripts/zero*.json) with a single JAX
process space: a 2-D ('data', 'model') mesh over ICI. DP/FSDP ride the
'data' axis, tensor parallelism the 'model' axis; XLA inserts all
collectives (GSPMD).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: tuple = ("data", "model"),
) -> Mesh:
    """Build a ('data', 'model') mesh.

    With no arguments, all devices go to the data axis. ``data_parallel``
    defaults to n_devices // model_parallel.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % model_parallel == 0, (n, model_parallel)
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel == n, (data_parallel, model_parallel, n)
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, axis_names)


def create_multislice_mesh(
    model_parallel: int = 1,
    *,
    axis_names: tuple = ("replica", "data", "model"),
) -> Mesh:
    """3-D mesh for multi-slice pods: pure data parallelism over DCN (the
    'replica' axis — slice-to-slice traffic is gradient all-reduce only),
    DP/FSDP + TP within each slice over ICI.

    Uses mesh_utils.create_hybrid_device_mesh so the ICI axes stay inside a
    slice; falls back to a single-granule layout off-TPU (tests).
    """
    from jax.experimental import mesh_utils

    n = jax.device_count()
    n_slices = max(
        len({getattr(d, "slice_index", 0) for d in jax.devices()}), 1
    )
    per_slice = n // n_slices
    assert per_slice % model_parallel == 0, (per_slice, model_parallel)
    dp = per_slice // model_parallel
    try:
        arr = mesh_utils.create_hybrid_device_mesh(
            (1, dp, model_parallel), (n_slices, 1, 1), jax.devices()
        )
    except Exception:
        arr = np.asarray(jax.devices()).reshape(n_slices, dp, model_parallel)
    return Mesh(arr, axis_names)
