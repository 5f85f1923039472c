from videollamb_tpu.models.vision.clip_vit import (  # noqa: F401
    init_vision_params,
    vision_encode,
    vision_encode_features,
)
