"""Checkpoint builder tests: full / projector-only / LoRA-merge loading of
reference-format checkpoint dirs into JAX param trees."""

import json
import os
import types

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.builder import (
    config_from_json,
    load_pretrained_model,
    load_state_dict,
)

CFG = LlamaConfig.tiny()


def _make_llama_sd():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg).state_dict(), hf_cfg


def _make_bridge_sd():
    ref_mod = _c.import_reference_submodule(
        "llava/model/multimodal_projector", "ref_projector_pkg",
        "rmt_r_transformer_projector",
    )
    cfg = types.SimpleNamespace(
        mm_hidden_size=32, mm_num_attention_heads=4, mm_intermediate_size=64,
        mm_hidden_act="gelu", mm_layer_norm_eps=1e-12,
        mm_hidden_dropout_prob=0.0, mm_attention_probs_dropout_prob=0.0,
        hidden_size=CFG.hidden_size,
    )
    torch.manual_seed(1)
    ref = ref_mod.RMTRTransformerProjector(cfg, depth=1)
    return {f"model.mm_projector.{k}": v for k, v in ref.state_dict().items()}


def _write_checkpoint(d, sd, cfg_json):
    os.makedirs(d, exist_ok=True)
    torch.save(sd, os.path.join(d, "pytorch_model.bin"))
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(cfg_json, f)


def _cfg_json():
    return {
        "vocab_size": CFG.vocab_size, "hidden_size": CFG.hidden_size,
        "intermediate_size": CFG.intermediate_size,
        "num_hidden_layers": CFG.num_hidden_layers,
        "num_attention_heads": CFG.num_attention_heads,
        "num_key_value_heads": CFG.num_key_value_heads,
        "mm_projector_type": "rmt_r_transformer1x", "mm_hidden_size": 32,
        "mm_video_tower": "LanguageBind/Video", "num_frames": 8,
        "tokenizer_model_max_length": 512,
    }


def test_full_checkpoint_load(tmp_path):
    llama_sd, _ = _make_llama_sd()
    sd = dict(llama_sd)
    sd.update(_make_bridge_sd())
    d = str(tmp_path / "full")
    _write_checkpoint(d, sd, _cfg_json())

    tok, params, cfg, procs, ctx = load_pretrained_model(
        d, dtype="float32", load_tokenizer=False
    )
    assert ctx == 512
    assert cfg.bridge.projector_type == "rmt_r_transformer1x"
    assert "lm" in params and "mm_projector" in params
    assert params["lm"]["layers"]["q_proj"].shape[0] == CFG.num_hidden_layers
    np.testing.assert_allclose(
        np.asarray(params["lm"]["embed_tokens"]),
        llama_sd["model.embed_tokens.weight"].numpy(), rtol=1e-6,
    )


def test_projector_only_load(tmp_path):
    llama_sd, _ = _make_llama_sd()
    base = str(tmp_path / "base")
    _write_checkpoint(base, dict(llama_sd), _cfg_json())

    proj = str(tmp_path / "proj")
    os.makedirs(proj, exist_ok=True)
    torch.save(_make_bridge_sd(), os.path.join(proj, "mm_projector.bin"))
    with open(os.path.join(proj, "config.json"), "w") as f:
        json.dump(_cfg_json(), f)

    _, params, cfg, _, _ = load_pretrained_model(
        proj, model_base=base, dtype="float32", load_tokenizer=False
    )
    assert "mm_projector" in params and "lm" in params


def test_lora_merge(tmp_path):
    llama_sd, _ = _make_llama_sd()
    base = str(tmp_path / "base")
    _write_checkpoint(base, dict(llama_sd), _cfg_json())

    lora = str(tmp_path / "lora")
    os.makedirs(lora, exist_ok=True)
    r, alpha = 4, 8
    torch.manual_seed(2)
    a = torch.randn(r, CFG.hidden_size) * 0.01
    b = torch.randn(CFG.hidden_size, r) * 0.01
    lora_sd = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }
    torch.save(lora_sd, os.path.join(lora, "pytorch_model.bin"))
    with open(os.path.join(lora, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha}, f)
    # Also include the bridge as non-lora trainables.
    torch.save(_make_bridge_sd(), os.path.join(lora, "non_lora_trainables.bin"))

    _, params, _, _, _ = load_pretrained_model(
        lora, model_base=base, dtype="float32", load_tokenizer=False
    )
    expected = (
        llama_sd["model.layers.0.self_attn.q_proj.weight"].numpy()
        + (b @ a).numpy() * (alpha / r)
    )
    got = np.asarray(params["lm"]["layers"]["q_proj"][0]).T
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    assert "mm_projector" in params
