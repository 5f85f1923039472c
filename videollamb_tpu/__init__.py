"""videollamb_tpu — a TPU-native long-video language-model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
bigai-nlco/VideoLLaMB: LanguageBind video encoding with temporal attention,
the SceneTilling + recurrent Memory Bridge projector, a Llama LM engine with
prefill/decode split, training, evaluation and serving — all designed
TPU-first (static shapes, `lax.scan` recurrence, GSPMD sharding, Pallas
kernels on the hot paths).
"""

__version__ = "0.1.0"
