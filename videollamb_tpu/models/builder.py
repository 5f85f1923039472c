"""Checkpoint loading: the ``load_pretrained_model`` equivalent.

Resolves reference-format checkpoints into JAX parameter trees
(reference: llava/model/builder.py:26-195):

- full checkpoints: HF dir with config.json + safetensors/.bin shards
  containing ``model.*`` (Llama), ``model.mm_projector.*`` (bridge) and
  optionally tower weights;
- base + projector-only: base LM dir plus an ``mm_projector.bin``
  (builder.py:92-108);
- LoRA checkpoints: adapter weights merged into the base
  (builder.py:57-91);
- towers loaded from their own LanguageBind checkpoint dirs
  (``mm_video_tower``/``mm_image_tower`` in config.json).

Returns (tokenizer, params, model_config, processors, context_len) — the
same tuple shape the reference returns.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from videollamb_tpu.config import BridgeConfig, LlamaConfig, ModelConfig, VisionConfig, RopeScaling
from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
from videollamb_tpu.models.bridge.convert import convert_rmt_r_state_dict
from videollamb_tpu.models.lm.convert import convert_llama_state_dict
from videollamb_tpu.models.vision.convert import convert_vision_state_dict


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a HF checkpoint dir (safetensors preferred,
    torch .bin fallback)."""
    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            try:
                sd.update(load_file(f))
            except Exception:
                # bf16 tensors need the torch loader.
                from safetensors.torch import load_file as load_torch

                for k, v in load_torch(f).items():
                    sd[k] = v.float().numpy()
        return sd
    bin_files = sorted(glob.glob(os.path.join(model_dir, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no weights found in {model_dir}")
    import torch

    for f in bin_files:
        for k, v in torch.load(f, map_location="cpu", weights_only=True).items():
            sd[k] = v.float().numpy()
    return sd


def config_from_json(model_dir: str) -> ModelConfig:
    """Build the typed ModelConfig from a reference-format config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        raw = json.load(f)

    lm = LlamaConfig(
        vocab_size=raw.get("vocab_size", 32000),
        hidden_size=raw.get("hidden_size", 4096),
        intermediate_size=raw.get("intermediate_size", 11008),
        num_hidden_layers=raw.get("num_hidden_layers", 32),
        num_attention_heads=raw.get("num_attention_heads", 32),
        num_key_value_heads=raw.get("num_key_value_heads",
                                    raw.get("num_attention_heads", 32)),
        max_position_embeddings=raw.get("max_position_embeddings", 4096),
        rms_norm_eps=raw.get("rms_norm_eps", 1e-5),
        rope_theta=raw.get("rope_theta", 10000.0),
        rope_scaling=RopeScaling.from_hf(raw.get("rope_scaling")),
        sliding_window=(raw.get("sliding_window")
                        if raw.get("model_type") == "mistral" else None),
    )
    bridge = BridgeConfig.from_projector_type(
        raw.get("mm_projector_type", "rmt_r_transformer1x"),
        hidden_size=raw.get("mm_hidden_size", 1024),
    )
    vision = VisionConfig(
        hidden_size=raw.get("mm_hidden_size", 1024),
        select_layer=raw.get("mm_vision_select_layer", -2),
        select_feature=raw.get("mm_vision_select_feature", "patch"),
    )
    return ModelConfig(
        vision=vision,
        bridge=bridge,
        lm=lm,
        max_length=raw.get("tokenizer_model_max_length",
                           raw.get("max_sequence_length", 2048)),
        num_frames=raw.get("num_frames", 8),
        use_video_tower=bool(raw.get("mm_video_tower")),
        use_image_tower=bool(raw.get("mm_image_tower")),
    )


def load_tower_params(tower_dir: str) -> Dict[str, Any]:
    sd = load_state_dict(tower_dir)
    return convert_vision_state_dict(sd, prefix="vision_model.")


def vision_config_from_tower_json(tower_dir: str) -> Optional["VisionConfig"]:
    """Read a LanguageBind tower checkpoint's config.json (reference
    configuration_video.py LanguageBindVideoConfig: top-level dict with a
    ``vision_config`` sub-dict) into our VisionConfig. Returns None when
    the dir has no config.json (weights-only dumps keep the defaults)."""
    path = os.path.join(tower_dir, "config.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    vc = raw.get("vision_config", raw)
    return VisionConfig(
        hidden_size=vc.get("hidden_size", 1024),
        intermediate_size=vc.get("intermediate_size", 4096),
        num_hidden_layers=vc.get("num_hidden_layers", 24),
        num_attention_heads=vc.get("num_attention_heads", 16),
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 14),
        num_frames=vc.get("num_frames", 8),
        add_time_attn=vc.get("add_time_attn", True),
        hidden_act=vc.get("hidden_act", "quick_gelu"),
        layer_norm_eps=vc.get("layer_norm_eps", 1e-5),
    )


def _merge_lora(base_sd: Dict[str, np.ndarray], lora_dir: str,
                scaling: Optional[float] = None) -> Dict[str, np.ndarray]:
    """Merge PEFT LoRA adapter weights into a base state dict
    (reference builder.py:57-91 merge_and_unload equivalent)."""
    with open(os.path.join(lora_dir, "adapter_config.json")) as f:
        acfg = json.load(f)
    if scaling is None:
        scaling = acfg["lora_alpha"] / acfg["r"]
    lora_sd = load_state_dict(lora_dir)
    # Keys: base_model.model.<name>.lora_A.weight / lora_B.weight
    for k in [k for k in lora_sd if k.endswith("lora_A.weight")]:
        b_key = k.replace("lora_A.weight", "lora_B.weight")
        target = (k.replace("base_model.model.", "")
                  .replace(".lora_A.weight", ".weight"))
        if target not in base_sd:
            continue
        delta = lora_sd[b_key] @ lora_sd[k] * scaling
        base_sd[target] = base_sd[target] + delta.astype(base_sd[target].dtype)
    return base_sd


def load_pretrained_model(
    model_path: str,
    model_base: Optional[str] = None,
    *,
    video_tower_path: Optional[str] = None,
    image_tower_path: Optional[str] = None,
    dtype: str = "bfloat16",
    load_8bit: bool = False,
    load_tokenizer: bool = True,
    device_preprocess: bool = False,
) -> Tuple[Any, Dict[str, Any], ModelConfig, Dict[str, Any], int]:
    """Resolve a checkpoint (full / base+projector / LoRA) into params.

    Mirrors reference builder.py:26-195 dispatch:
    - ``model_base`` set and adapter_config.json present -> LoRA merge;
    - ``model_base`` set and mm_projector.bin present -> projector-only;
    - else full checkpoint.
    """
    import jax.numpy as jnp

    is_lora = os.path.exists(os.path.join(model_path, "adapter_config.json"))
    projector_bin = os.path.join(model_path, "mm_projector.bin")
    is_projector_only = model_base is not None and os.path.exists(projector_bin)

    cfg_dir = model_base if (is_lora or is_projector_only) else model_path
    cfg = config_from_json(
        cfg_dir if os.path.exists(os.path.join(cfg_dir, "config.json")) else model_path
    )

    if is_projector_only:
        base_sd = load_state_dict(model_base)
        import torch

        proj_sd = {
            k: v.float().numpy() if hasattr(v, "float") else np.asarray(v)
            for k, v in torch.load(projector_bin, map_location="cpu",
                                   weights_only=True).items()
        }
        full_sd = dict(base_sd)
        full_sd.update({k: v for k, v in proj_sd.items()})
    elif is_lora:
        base_sd = load_state_dict(model_base)
        nlt = os.path.join(model_path, "non_lora_trainables.bin")
        if os.path.exists(nlt):
            import torch

            for k, v in torch.load(nlt, map_location="cpu", weights_only=True).items():
                k = k.replace("base_model.model.", "").replace("base_model.", "")
                base_sd[k] = v.float().numpy()
        full_sd = _merge_lora(base_sd, model_path)
    else:
        full_sd = load_state_dict(model_path)

    params: Dict[str, Any] = {"lm": convert_llama_state_dict(full_sd)}
    if any(k.startswith(("model.mm_projector.", "mm_projector.")) for k in full_sd):
        prefix = ("model.mm_projector."
                  if any(k.startswith("model.mm_projector.") for k in full_sd)
                  else "mm_projector.")
        params["mm_projector"] = convert_rmt_r_state_dict(full_sd, prefix=prefix)

    if video_tower_path:
        params["video_tower"] = load_tower_params(video_tower_path)
    if image_tower_path:
        params["image_tower"] = load_tower_params(image_tower_path)
    # Tower checkpoint dirs carry the authoritative ViT dims (the main
    # config.json only knows mm_hidden_size) — reference behavior: the
    # tower rebuilds itself from ITS config
    # (languagebind/__init__.py:248-251 load_model).
    tower_cfg_dir = video_tower_path or image_tower_path
    if tower_cfg_dir:
        vision = vision_config_from_tower_json(tower_cfg_dir)
        if vision is not None:
            import dataclasses

            cfg = dataclasses.replace(
                cfg, vision=dataclasses.replace(
                    vision, select_layer=cfg.vision.select_layer,
                    select_feature=cfg.vision.select_feature))

    wanted = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    import jax

    params = jax.tree.map(lambda x: jnp.asarray(x, wanted), params)

    if load_8bit:
        # Weight-only int8 LM (reference builder.py:34-43 load_8bit): ~2x
        # decode throughput on bandwidth-bound v5e.
        from videollamb_tpu.models.lm.quant import quantize_llama_params

        params["lm"] = quantize_llama_params(params["lm"])

    tokenizer = None
    if load_tokenizer:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(
            model_base or model_path, use_fast=True
        )

    if device_preprocess:
        # TPU-side resize/normalize (data/device_preprocess.py): on a small
        # host the per-frame cv2 resize bottlenecks ingest two orders of
        # magnitude below the encoder (benchmarks/ingest_bench.py: 14 vs
        # 1,942 frames/s preprocessed on the bench host).
        from videollamb_tpu.data.device_preprocess import DeviceVideoProcessor

        video_proc: Any = DeviceVideoProcessor(size=cfg.vision.image_size)
    else:
        video_proc = VideoProcessor(size=cfg.vision.image_size)
    processors = {"VIDEO": video_proc,
                  "IMAGE": ImageProcessor(size=cfg.vision.image_size)}
    context_len = cfg.max_length
    return tokenizer, params, cfg, processors, context_len
