from videollamb_tpu.parallel.mesh import create_mesh  # noqa: F401
from videollamb_tpu.parallel.pipeline import (  # noqa: F401
    create_pipeline_mesh,
    pipeline_apply,
    pipeline_llama_forward,
    shard_stacked_layers,
)
from videollamb_tpu.parallel.sharding import (  # noqa: F401
    param_shardings,
    shard_params,
    batch_sharding,
)
