from videollamb_tpu.models.lm.llama import (  # noqa: F401
    init_llama_params,
    llama_forward,
    llama_prefill,
    llama_decode_step,
    init_kv_cache,
)
