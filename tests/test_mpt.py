"""MPT backbone parity vs HF transformers MptForCausalLM (tiny, random)."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.models.lm.mpt import (
    MptConfig,
    convert_mpt_state_dict,
    mpt_embed,
    mpt_forward,
)

CFG = MptConfig(vocab_size=128, d_model=32, n_heads=4, n_layers=2,
                expansion_ratio=2, max_seq_len=64)


def test_mpt_matches_hf():
    from transformers import MptConfig as HFMptConfig, MptForCausalLM

    hf_cfg = HFMptConfig(
        d_model=CFG.d_model, n_heads=CFG.n_heads, n_layers=CFG.n_layers,
        expansion_ratio=CFG.expansion_ratio, max_seq_len=CFG.max_seq_len,
        vocab_size=CFG.vocab_size, attn_config={"attn_impl": "torch"},
    )
    torch.manual_seed(0)
    hf = MptForCausalLM(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_mpt_state_dict(hf.state_dict()))

    rng = np.random.default_rng(0)
    for b, s, pad in [(1, 12, 0), (2, 20, 5)]:
        ids = rng.integers(2, CFG.vocab_size, size=(b, s)).astype(np.int64)
        mask = np.ones((b, s), np.int64)
        if pad:
            mask[-1, s - pad:] = 0
        with torch.no_grad():
            ref = hf(torch.from_numpy(ids),
                     attention_mask=torch.from_numpy(mask)).logits.numpy()
        embeds = mpt_embed(params, jnp.asarray(ids.astype(np.int32)))
        ours = np.asarray(mpt_forward(params, CFG, embeds, jnp.asarray(mask)))
        valid = mask.astype(bool)
        np.testing.assert_allclose(ours[valid], ref[valid], rtol=2e-4, atol=2e-4)
