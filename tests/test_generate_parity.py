"""Greedy generation parity vs HF transformers `generate` (tiny Llama).

Token-for-token agreement over text-only prompts validates the whole
engine: RoPE, cache bookkeeping, ragged prefill, logits, argmax chain.
"""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig, ModelConfig
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.models.engine import generate
from videollamb_tpu.models.lm.convert import convert_llama_state_dict

CFG = LlamaConfig.tiny()


@pytest.fixture(scope="module")
def hf_and_params():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        intermediate_size=CFG.intermediate_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        num_key_value_heads=CFG.num_key_value_heads,
        rms_norm_eps=CFG.rms_norm_eps, rope_theta=CFG.rope_theta,
        attn_implementation="eager", tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_llama_state_dict(hf.state_dict()))
    return hf, params


@pytest.mark.parametrize("seed,prompt_len", [(0, 9), (1, 17), (2, 5)])
def test_greedy_generate_matches_hf(hf_and_params, seed, prompt_len):
    hf, lm_params = hf_and_params
    rng = np.random.default_rng(seed)
    ids = rng.integers(4, CFG.vocab_size, size=(1, prompt_len)).astype(np.int64)
    max_new = 12

    with torch.no_grad():
        hf_out = hf.generate(
            torch.from_numpy(ids), max_new_tokens=max_new, do_sample=False,
            eos_token_id=2, pad_token_id=0,
        )
    hf_new = hf_out[0, prompt_len:].tolist()

    model_cfg = ModelConfig.tiny(max_length=128)
    params = {"lm": lm_params}
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids.astype(np.int32)),
        attention_mask=jnp.ones((1, prompt_len), jnp.int32),
        labels=None, videos=None, images=None,
    )
    res = generate(
        params, model_cfg, batch, jax.random.PRNGKey(0),
        max_new_tokens=max_new, do_sample=False, eos_token_id=2,
        pad_token_id=0, max_seq_len=model_cfg.max_length + max_new,
    )
    ours = np.asarray(res.tokens[0][: int(res.lengths[0])]).tolist()
    # HF stops at EOS; compare up to and including it.
    assert ours == hf_new[: len(ours)] and len(ours) >= min(len(hf_new), max_new) - 0


def test_top_p_filtering_matches_hf_semantics():
    """Nucleus filter: keep the smallest set whose cumulative prob >= p."""
    from videollamb_tpu.models.engine import sample_token

    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # p=0.7: keep {0, 1} (0.5+0.3 >= 0.7); token 2/3 must never appear.
    seen = set()
    for i in range(50):
        tok = int(sample_token(logits, jax.random.PRNGKey(i), do_sample=True,
                               temperature=1.0, top_p=0.7)[0])
        seen.add(tok)
    assert seen <= {0, 1} and 0 in seen
