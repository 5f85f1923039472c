from videollamb_tpu.ops.scene_tilling import (  # noqa: F401
    depth_scores,
    left_depth_scores,
    segment_topk,
    segment_threshold,
    segment_left,
    segment_plan,
)
from videollamb_tpu.ops.pooling import adaptive_avg_pool_2d  # noqa: F401
