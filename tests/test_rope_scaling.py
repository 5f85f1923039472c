"""Long-context RoPE scaling: parity vs HF ``modeling_rope_utils`` and the
full HF Llama forward (the reference never scales rope; Llama-3.1-style
checkpoints need it — SURVEY §2.1 builder path)."""

import dataclasses

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig, RopeScaling
from videollamb_tpu.models.lm.llama import embed_tokens, llama_forward
from videollamb_tpu.models.lm.rope import scaled_rope_frequencies

CFG = LlamaConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
    max_position_embeddings=64,
)


def _hf_cfg(rope_scaling=None):
    from transformers import LlamaConfig as HF

    return HF(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        max_position_embeddings=CFG.max_position_embeddings,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        rope_scaling=rope_scaling, attn_implementation="eager",
        tie_word_embeddings=False,
    )


@pytest.mark.parametrize("hf_dict", [
    {"rope_type": "linear", "factor": 4.0},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 32},
])
def test_inv_freq_matches_hf(hf_dict):
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    ref_inv, att = ROPE_INIT_FUNCTIONS[hf_dict["rope_type"]](
        _hf_cfg(hf_dict), "cpu")
    assert att == 1.0
    ours = scaled_rope_frequencies(
        CFG.head_dim, CFG.rope_theta, RopeScaling.from_hf(hf_dict),
        CFG.max_position_embeddings,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_inv.numpy(),
                               rtol=1e-6, atol=1e-8)


def test_dynamic_default_matches_hf_for_standard_lengths():
    """Default 'dynamic': table computed at max_position_embeddings, where
    HF's formula reduces to the UNSCALED base — exact agreement for every
    sequence up to the trained maximum (the common regime; review
    finding: the old default baked in the fully-scaled base and diverged
    on all normal prompts)."""
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf_dict = {"rope_type": "dynamic", "factor": 2.0}
    ref_inv, _ = ROPE_INIT_FUNCTIONS["dynamic"](
        _hf_cfg(hf_dict), seq_len=CFG.max_position_embeddings // 2)
    ours = scaled_rope_frequencies(
        CFG.head_dim, CFG.rope_theta, RopeScaling.from_hf(hf_dict),
        CFG.max_position_embeddings,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_inv.numpy(),
                               rtol=1e-6, atol=1e-8)


def test_dynamic_explicit_target_matches_hf_at_that_length():
    """target_length pins the NTK base for extended contexts; HF's
    recomputed table at that length matches exactly."""
    import dataclasses as _dc

    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    hf_dict = {"rope_type": "dynamic", "factor": 2.0}
    target = int(2.0 * CFG.max_position_embeddings)
    ref_inv, _ = ROPE_INIT_FUNCTIONS["dynamic"](_hf_cfg(hf_dict),
                                                seq_len=target)
    ours = scaled_rope_frequencies(
        CFG.head_dim, CFG.rope_theta,
        _dc.replace(RopeScaling.from_hf(hf_dict), target_length=target),
        CFG.max_position_embeddings,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_inv.numpy(),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("hf_dict", [
    {"rope_type": "linear", "factor": 2.0},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 32},
])
def test_forward_matches_hf_with_scaling(hf_dict):
    from transformers import LlamaForCausalLM

    from videollamb_tpu.models.lm.convert import convert_llama_state_dict

    torch.manual_seed(0)
    hf = LlamaForCausalLM(_hf_cfg(dict(hf_dict))).eval()
    params = jax.tree.map(jnp.asarray, convert_llama_state_dict(hf.state_dict()))
    cfg = dataclasses.replace(CFG, rope_scaling=RopeScaling.from_hf(hf_dict))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, CFG.vocab_size, size=(2, 24)).astype(np.int32)
    mask = np.ones((2, 24), np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask.astype(np.int64))).logits.numpy()
    embeds = embed_tokens(params, jnp.asarray(ids))
    ours = np.asarray(llama_forward(params, cfg, embeds, jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    # Scaling is really on: the unscaled config disagrees.
    plain = np.asarray(llama_forward(params, CFG, embeds, jnp.asarray(mask)))
    assert not np.allclose(plain, ref, rtol=2e-4, atol=2e-4)


def test_config_json_roundtrip(tmp_path):
    import json

    from videollamb_tpu.models.builder import config_from_json

    raw = {"vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
           "num_hidden_layers": 2, "num_attention_heads": 4,
           "rope_scaling": {"rope_type": "llama3", "factor": 8.0,
                            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                            "original_max_position_embeddings": 32}}
    (tmp_path / "config.json").write_text(json.dumps(raw))
    cfg = config_from_json(str(tmp_path))
    assert cfg.lm.rope_scaling == RopeScaling(
        rope_type="llama3", factor=8.0, low_freq_factor=1.0,
        high_freq_factor=4.0, original_max_position_embeddings=32)
    # Old-style 'type' key and null both map.
    raw["rope_scaling"] = {"type": "linear", "factor": 2.0}
    (tmp_path / "config.json").write_text(json.dumps(raw))
    assert config_from_json(str(tmp_path)).lm.rope_scaling.rope_type == "linear"
    raw["rope_scaling"] = None
    (tmp_path / "config.json").write_text(json.dumps(raw))
    assert config_from_json(str(tmp_path)).lm.rope_scaling is None
