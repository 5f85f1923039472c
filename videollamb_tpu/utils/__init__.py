from videollamb_tpu.utils.logging import build_logger, rank0_print  # noqa: F401
from videollamb_tpu.utils.profiling import StageTimer, profile_trace  # noqa: F401
