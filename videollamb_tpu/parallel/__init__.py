from videollamb_tpu.parallel.mesh import create_mesh  # noqa: F401
from videollamb_tpu.parallel.sharding import (  # noqa: F401
    param_shardings,
    shard_params,
    batch_sharding,
)
