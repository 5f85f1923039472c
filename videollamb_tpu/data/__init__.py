from videollamb_tpu.data.processing import (  # noqa: F401
    VideoProcessor,
    ImageProcessor,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)
from videollamb_tpu.data.video_reader import load_video, probe_video  # noqa: F401
