"""Multi-adapter LoRA serving: per-row stacked adapters must match the
reference semantics (one adapter MERGED into the base weights,
llava/model/builder.py:57-91) row for row, through forward, the cache
chain, and the continuous-batching engine."""

import dataclasses

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import LlamaConfig, ModelConfig
from videollamb_tpu.models.lm.llama import (
    chunked_prefill,
    init_kv_cache,
    init_llama_params,
    llama_decode_step,
    llama_forward,
)
from videollamb_tpu.models.lm.lora import add_lora_params, merge_lora_params
from videollamb_tpu.models.lm.mlora import (
    add_multi_lora_params,
    extract_lora_layers,
    resolve_adapter_idx,
)


def _lm_cfg():
    return LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )


def _adapter(base, cfg, seed, r):
    """Base + one nonzero LoRA adapter (B randomized: add_lora_params zeros
    it, which would make the delta vanish)."""
    rng = jax.random.PRNGKey(seed)
    p = add_lora_params({"lm": base}, cfg, r=r, alpha=2.0 * r, rng=rng)
    layers = dict(p["lm"]["layers"])
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), 8)
    for i, name in enumerate(sorted(k for k in layers if k.endswith("_lora_b"))):
        layers[name] = 0.05 * jax.random.normal(keys[i % 8], layers[name].shape,
                                                layers[name].dtype)
    p["lm"] = dict(p["lm"])
    p["lm"]["layers"] = layers
    return p


@pytest.fixture(scope="module")
def stacked():
    cfg = _lm_cfg()
    base = init_llama_params(jax.random.PRNGKey(0), cfg)
    pa = _adapter(base, cfg, seed=1, r=4)
    pb = _adapter(base, cfg, seed=2, r=8)  # different rank: pad path
    params, registry = add_multi_lora_params(
        {"lm": base},
        {"a": extract_lora_layers(pa), "b": extract_lora_layers(pb)},
    )
    merged = {n: merge_lora_params(p)["lm"] for n, p in (("a", pa), ("b", pb))}
    merged["base"] = base
    return cfg, params["lm"], merged, registry


def test_multi_lora_forward_matches_merged_per_row(stacked):
    cfg, lm, merged, registry = stacked
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 6, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((3, 6), jnp.int32)
    idx = jnp.asarray(resolve_adapter_idx(registry, ["a", "b", None]))

    got = llama_forward(lm, cfg, x, mask, adapter_idx=idx)
    for row, which in enumerate(("a", "b", "base")):
        want = llama_forward(merged[which], cfg, x[row: row + 1], mask[:1])
        np.testing.assert_allclose(
            np.asarray(got[row]), np.asarray(want[0]), rtol=2e-4, atol=2e-4,
            err_msg=f"row {row} adapter {which}",
        )


def test_multi_lora_prefill_decode_chain_matches_merged(stacked):
    cfg, lm, merged, registry = stacked
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((3, 5), jnp.int32)
    idx = jnp.asarray(resolve_adapter_idx(registry, ["b", None, "a"]))

    cache = init_kv_cache(cfg, 3, 32, jnp.float32)
    logits, cache = chunked_prefill(lm, cfg, x, mask, cache, chunk=4,
                                    lengths=[5, 5, 5], adapter_idx=idx)
    toks = [jnp.argmax(logits, -1)]
    emb = lm["embed_tokens"]
    for _ in range(4):
        te = emb[toks[-1]][:, None].astype(jnp.float32)
        logits, cache = llama_decode_step(lm, cfg, te, cache, adapter_idx=idx)
        toks.append(jnp.argmax(logits, -1))
    got = np.stack([np.asarray(t) for t in toks], axis=1)  # (3, 5)

    for row, which in enumerate(("b", "base", "a")):
        m = merged[which]
        c = init_kv_cache(cfg, 1, 32, jnp.float32)
        lg, c = chunked_prefill(m, cfg, x[row: row + 1], mask[:1], c, chunk=4,
                                lengths=[5])
        want = [int(jnp.argmax(lg, -1)[0])]
        for _ in range(4):
            te = m["embed_tokens"][jnp.asarray([want[-1]])][:, None].astype(jnp.float32)
            lg, c = llama_decode_step(m, cfg, te, c)
            want.append(int(jnp.argmax(lg, -1)[0]))
        assert got[row].tolist() == want, f"row {row} adapter {which}"


def test_engine_serves_mixed_adapters_in_one_batch(stacked):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.engine import generate
    from videollamb_tpu.serve.server import Request, ServingEngine

    cfg_lm, lm, merged, registry = stacked
    base_model = ModelConfig.tiny(max_length=64)
    cfg = dataclasses.replace(base_model, lm=cfg_lm)

    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    extras = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
    }
    params = {"lm": lm, **extras}

    engine = ServingEngine(params, cfg, num_slots=3, eos_token_id=-1,
                           adapter_registry=registry)

    def _req(uid, adapter, seed):
        rng = np.random.default_rng(seed)
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 7)).astype(np.int32)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 7), jnp.int32),
            labels=None, videos=None, images=None,
        )
        return Request(uid=uid, batch=batch, max_new_tokens=5,
                       temperature=0.0, adapter=adapter)

    reqs = [_req(0, "a", 10), _req(1, "b", 11), _req(2, None, 12)]
    for r in reqs:
        engine.submit(r)
    done = engine.run_until_drained()
    assert len(done) == 3 and all(r.done and r.error is None for r in reqs)

    for r, which in zip(reqs, ("a", "b", "base")):
        ref_params = {"lm": merged[which], **extras}
        ref = generate(ref_params, cfg, r.batch, jax.random.PRNGKey(0),
                       max_new_tokens=5, do_sample=False, eos_token_id=-1,
                       max_seq_len=cfg.max_length + 512)
        want = np.asarray(ref.tokens[0][: int(ref.lengths[0])]).tolist()
        assert r.tokens == want, f"request {r.uid} adapter {which}"

    # Unknown adapter name -> clean rejection, no decode.
    bad = _req(9, "nope", 13)
    engine.submit(bad)
    out = engine.run_until_drained()
    assert bad.done and bad.error and bad.tokens == []
    assert bad in out


def test_resolve_adapter_idx_errors():
    with pytest.raises(KeyError):
        resolve_adapter_idx({"a": 0}, ["missing"])
    idx = resolve_adapter_idx({"a": 0, "b": 1}, [None, "b", "a"])
    assert idx.tolist() == [-1, 1, 0]


def test_paged_engine_serves_adapters(stacked):
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.engine import generate
    from videollamb_tpu.serve.paged import PagedServingEngine
    from videollamb_tpu.serve.server import Request

    cfg_lm, lm, merged, registry = stacked
    base_model = ModelConfig.tiny(max_length=64)
    cfg = dataclasses.replace(base_model, lm=cfg_lm)

    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    extras = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
    }
    params = {"lm": lm, **extras}
    engine = PagedServingEngine(params, cfg, num_slots=2, page_size=16,
                                eos_token_id=-1, adapter_registry=registry)

    def _req(uid, adapter, seed):
        rng = np.random.default_rng(seed)
        ids = rng.integers(4, cfg.lm.vocab_size, size=(1, 7)).astype(np.int32)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.ones((1, 7), jnp.int32),
            labels=None, videos=None, images=None,
        )
        return Request(uid=uid, batch=batch, max_new_tokens=5,
                       temperature=0.0, adapter=adapter)

    reqs = [_req(0, "a", 20), _req(1, None, 21)]
    for r in reqs:
        engine.submit(r)
    engine.run_until_drained()
    assert all(r.done and r.error is None for r in reqs)

    for r, which in zip(reqs, ("a", "base")):
        ref_params = {"lm": merged[which], **extras}
        ref = generate(ref_params, cfg, r.batch, jax.random.PRNGKey(0),
                       max_new_tokens=5, do_sample=False, eos_token_id=-1,
                       max_seq_len=cfg.max_length + 512)
        want = np.asarray(ref.tokens[0][: int(ref.lengths[0])]).tolist()
        assert r.tokens == want, f"request {r.uid} adapter {which}"

    # adapter + shared prefix is refused (prefix KV is base-model).
    pid = engine.register_prefix(reqs[1].batch)
    bad = _req(5, "a", 22)
    bad.prefix_id = pid
    engine.submit(bad)
    engine.run_until_drained()
    assert bad.done and bad.error and "prefix" in bad.error


def test_trained_lora_checkpoint_feeds_multi_lora_stack(tmp_path):
    """The train->serve loop: a LoRA training checkpoint (full-params save,
    tune_mode='lora') restores, its adapter extracts, and the stacked
    serving params reproduce the merged model — no bespoke export step."""
    from videollamb_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from videollamb_tpu.train.step import TrainState

    cfg = _lm_cfg()
    base = init_llama_params(jax.random.PRNGKey(0), cfg)
    pa = _adapter(base, cfg, seed=5, r=4)

    state = TrainState(step=jnp.asarray(3), params=pa, opt_state=())
    path = save_checkpoint(str(tmp_path / "lora_run"), state, step=3)

    fresh = _adapter(base, cfg, seed=99, r=4)  # template: same tree shapes
    restored = restore_checkpoint(
        path, TrainState(step=jnp.asarray(0), params=fresh, opt_state=()))

    params, registry = add_multi_lora_params(
        {"lm": base}, {"run3": extract_lora_layers(restored.params)})
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(1, 4, cfg.hidden_size)).astype(np.float32))
    mask = jnp.ones((1, 4), jnp.int32)
    idx = jnp.asarray(resolve_adapter_idx(registry, ["run3"]))
    got = llama_forward(params["lm"], cfg, x, mask, adapter_idx=idx)
    want = llama_forward(merge_lora_params(pa)["lm"], cfg, x, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
