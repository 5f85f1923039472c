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
