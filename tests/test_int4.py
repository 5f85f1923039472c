"""int4 weight-only quantization: pack/unpack roundtrip, kernel parity
(interpret mode), NF4 decode, and end-to-end int4 decode on the tiny LM."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.ops.int4_matmul import (
    dequantize_int4,
    int4_matmul,
    pack_int4,
    quantize_int4,
    unpack_int4,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(64, 24)).astype(np.int8)
    out = np.asarray(unpack_int4(pack_int4(jnp.asarray(q))))
    np.testing.assert_array_equal(out, q)


def test_quantize_dequantize_error_bounded():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(256, 48)).astype(np.float32)
    qk = quantize_int4(jnp.asarray(w), group=64)
    wd = np.asarray(dequantize_int4(qk, jnp.float32))
    # Symmetric 4-bit with per-group scales: error <= scale/2 per element,
    # plus slack for the bf16-stored scale (round-half cases land at
    # ~0.516 * scale).
    scale = np.asarray(qk["scale"], np.float32)
    bound = np.repeat(scale, 64, axis=0) * 0.55 + 1e-6
    assert (np.abs(wd - w) <= bound).all()


@pytest.mark.parametrize("m,k,n,group,block_n", [
    (8, 128, 32, 32, 16),
    (8, 256, 48, 64, 48),
    (16, 64, 16, 16, 16),
])
def test_int4_matmul_kernel_matches_dequant_einsum(m, k, n, group, block_n):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    qk = quantize_int4(w, group=group)
    ref = x @ dequantize_int4(qk, jnp.float32)
    out = int4_matmul(x, qk["q4"], qk["scale"], block_n=block_n, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_nf4_dequantize_known_codes():
    """Hand-built NF4 tensor: codes map through the codebook times the
    per-block absmax (bitsandbytes layout, high nibble first)."""
    from videollamb_tpu.models.lm.quant import NF4_CODE, dequantize_nf4

    codes = np.array([0, 15, 7, 8, 3, 12, 1, 14], np.uint8)  # numel=8
    packed = (codes[0::2] << 4) | codes[1::2]
    absmax = np.array([2.0, 0.5], np.float32)  # blocksize 4
    out = np.asarray(dequantize_nf4(packed, absmax, shape=(2, 4), blocksize=4,
                                    dtype=jnp.float32))
    book = np.asarray(NF4_CODE)
    expected_rowmajor = book[codes] * np.repeat(absmax, 4)
    # ours is (d_in, d_out) = transpose of the torch (2, 4) row-major
    np.testing.assert_allclose(out, expected_rowmajor.reshape(2, 4).T, rtol=1e-6)


def test_int4_llm_decode_matches_bf16_choice():
    """Tiny LM quantized to int4: greedy decode still runs end-to-end and
    logits stay close to full precision (XLA fallback path on CPU)."""
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        embed_tokens, init_kv_cache, init_llama_params, llama_decode_step,
        llama_prefill,
    )
    from videollamb_tpu.models.lm.quant import quantize_llama_params_int4

    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    import copy

    qparams = quantize_llama_params_int4(
        jax.tree.map(lambda x: x, params), group=16
    )

    rng = np.random.default_rng(3)
    ids = rng.integers(4, cfg.vocab_size, size=(1, 12)).astype(np.int32)

    def run(p, force_tokens=None):
        cache = init_kv_cache(cfg, 1, 32, jnp.float32)
        lg, cache = llama_prefill(
            p, cfg, embed_tokens(p, jnp.asarray(ids)),
            jnp.ones_like(jnp.asarray(ids)), cache,
        )
        prefill_lg = np.asarray(lg)
        toks = []
        for i in range(4):
            nxt = int(jnp.argmax(lg[0])) if force_tokens is None else force_tokens[i]
            toks.append(nxt)
            lg, cache = llama_decode_step(
                p, cfg, embed_tokens(p, jnp.asarray([[nxt]])), cache
            )
        return toks, prefill_lg, np.asarray(lg)

    toks_fp, pre_fp, lg_fp = run(params)
    # Same forced token history so logits are comparable step for step.
    toks_q, pre_q, lg_q = run(qparams, force_tokens=toks_fp)
    assert np.isfinite(pre_q).all() and np.isfinite(lg_q).all()

    def cos(a, b):
        return float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    # int4 is lossy but the logit direction must survive (same inputs).
    assert cos(pre_fp, pre_q) > 0.98, cos(pre_fp, pre_q)
    assert cos(lg_fp, lg_q) > 0.98, cos(lg_fp, lg_q)
