from videollamb_tpu.models.bridge.rmt_r import (  # noqa: F401
    init_rmt_r_params,
    rmt_r_video_forward,
    rmt_r_image_forward,
)
