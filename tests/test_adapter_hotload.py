"""Runtime adapter management: PEFT loader + engine hot swap + HTTP admin."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import conftest as _c  # noqa: F401

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.models.lm.llama import init_llama_params
from videollamb_tpu.models.lm.mlora import (
    add_multi_lora_params,
    load_peft_adapter,
)


def _write_peft_adapter(path, cfg, seed=0, r=4, alpha=8.0):
    """A PEFT-format adapter dir over the tiny LM (torch .bin weights)."""
    path.mkdir(parents=True, exist_ok=True)
    (path / "adapter_config.json").write_text(json.dumps(
        {"r": r, "lora_alpha": alpha,
         "target_modules": ["q_proj", "v_proj"]}))
    g = torch.Generator().manual_seed(seed)
    sd = {}
    for layer in range(cfg.num_hidden_layers):
        for target in ("q_proj", "v_proj"):
            base = (f"base_model.model.model.layers.{layer}.self_attn."
                    f"{target}")
            sd[f"{base}.lora_A.weight"] = torch.randn(
                r, cfg.hidden_size, generator=g) * 0.2
            sd[f"{base}.lora_B.weight"] = torch.randn(
                cfg.hidden_size, r, generator=g) * 0.2
    torch.save(sd, path / "pytorch_model.bin")
    return sd


def _lm_cfg():
    from videollamb_tpu.config import LlamaConfig

    return LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=128,
    )


def test_load_peft_adapter_shapes_and_scale(tmp_path):
    cfg = _lm_cfg()
    sd = _write_peft_adapter(tmp_path / "ad", cfg, r=4, alpha=8.0)
    ad = load_peft_adapter(str(tmp_path / "ad"), cfg.num_hidden_layers)
    assert sorted(ad) == ["q_proj_lora_a", "q_proj_lora_b",
                          "v_proj_lora_a", "v_proj_lora_b"]
    assert ad["q_proj_lora_a"].shape == (2, cfg.hidden_size, 4)
    assert ad["q_proj_lora_b"].shape == (2, 4, cfg.hidden_size)
    # alpha/r folded into A: layer-0 q_proj A == torch A.T * (8/4).
    want = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"]
    np.testing.assert_allclose(ad["q_proj_lora_a"][0],
                               want.numpy().T * 2.0, rtol=1e-6)
    # And the delta matches the torch computation end to end.
    x = np.random.default_rng(0).normal(size=(3, cfg.hidden_size)).astype(np.float32)
    ours = (x @ ad["q_proj_lora_a"][0]) @ ad["q_proj_lora_b"][0]
    b = sd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"]
    ref = (torch.from_numpy(x) @ want.T @ b.T * 2.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_load_peft_adapter_rejects_partial_layers(tmp_path):
    cfg = _lm_cfg()
    _write_peft_adapter(tmp_path / "ad", cfg)
    sd = torch.load(tmp_path / "ad" / "pytorch_model.bin", weights_only=True)
    sd = {k: v for k, v in sd.items() if ".layers.0." in k}
    torch.save(sd, tmp_path / "ad" / "pytorch_model.bin")
    with pytest.raises(ValueError, match="missing layers"):
        load_peft_adapter(str(tmp_path / "ad"), cfg.num_hidden_layers)


@pytest.fixture(scope="module")
def hot_server(tmp_path_factory):
    from test_serving import ChatTokenizer
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.http_server import make_server
    from videollamb_tpu.serve.server import ServingEngine

    base_model = ModelConfig.tiny(max_length=64)
    import dataclasses

    cfg = dataclasses.replace(base_model, lm=_lm_cfg())
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence "
        "assistant describe the scene")
    chat = Chat(tok, params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)
    engine = ServingEngine(params, cfg, num_slots=2)
    httpd, srv = make_server(chat, engine, port=0, k=2, timeout_s=120)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    root = tmp_path_factory.mktemp("adapters")
    yield f"http://127.0.0.1:{httpd.server_address[1]}", cfg, root
    httpd.shutdown()
    srv.shutdown()


def _post(base, path, payload, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_hot_load_serve_unload_over_http(hot_server):
    base, cfg, root = hot_server
    # Initially: no adapters; adapter requests reject.
    with urllib.request.urlopen(base + "/v1/adapters", timeout=30) as r:
        assert json.loads(r.read())["adapters"] == []
    st, out = _post(base, "/v1/generate",
                    {"prompt": "describe the scene", "adapter": "med",
                     "max_new_tokens": 3})
    assert st == 400

    # Load an adapter from a PEFT dir at runtime.
    _write_peft_adapter(root / "med", cfg.lm, seed=7)
    st, out = _post(base, "/v1/adapters",
                    {"name": "med", "path": str(root / "med")})
    assert st == 200 and out["adapters"] == ["med"]

    st, base_out = _post(base, "/v1/generate",
                         {"prompt": "describe the scene", "max_new_tokens": 5})
    assert st == 200
    st, med_out = _post(base, "/v1/generate",
                        {"prompt": "describe the scene", "adapter": "med",
                         "max_new_tokens": 5})
    assert st == 200
    assert med_out["text"] != base_out["text"]

    # Second adapter joins; both serve.
    _write_peft_adapter(root / "legal", cfg.lm, seed=9)
    st, out = _post(base, "/v1/adapters",
                    {"name": "legal", "path": str(root / "legal")})
    assert st == 200 and out["adapters"] == ["legal", "med"]
    st, legal_out = _post(base, "/v1/generate",
                          {"prompt": "describe the scene", "adapter": "legal",
                           "max_new_tokens": 5})
    assert st == 200 and legal_out["text"] != med_out["text"]

    # Unload: requests for the gone adapter reject again; base unaffected.
    st, out = _post(base, "/v1/adapters", {"name": "med", "unload": True})
    assert st == 200 and out["adapters"] == ["legal"]
    st, _ = _post(base, "/v1/generate",
                  {"prompt": "describe the scene", "adapter": "med",
                   "max_new_tokens": 3})
    assert st == 400
    st, base2 = _post(base, "/v1/generate",
                      {"prompt": "describe the scene", "max_new_tokens": 5})
    assert st == 200 and base2["text"] == base_out["text"]


def test_engine_set_adapters_refuses_while_in_flight():
    import dataclasses

    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.lora import add_lora_params
    from videollamb_tpu.models.lm.mlora import extract_lora_layers
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.server import Request, ServingEngine

    cfg_lm = _lm_cfg()
    base_lm = init_llama_params(jax.random.PRNGKey(0), cfg_lm)
    p = add_lora_params({"lm": base_lm}, cfg_lm, r=4, alpha=8.0,
                        rng=jax.random.PRNGKey(1))
    params_lm, registry = add_multi_lora_params(
        {"lm": base_lm}, {"a": extract_lora_layers(p)})
    cfg = dataclasses.replace(ModelConfig.tiny(max_length=64), lm=cfg_lm)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    params = {"lm": params_lm["lm"],
              "video_tower": init_vision_params(k1, cfg.vision),
              "mm_projector": init_rmt_r_params(k2, cfg.bridge,
                                                cfg.lm.hidden_size)}
    engine = ServingEngine(params, cfg, num_slots=1, eos_token_id=-1,
                           adapter_registry=registry)
    ids = np.random.default_rng(0).integers(
        4, cfg.lm.vocab_size, size=(1, 6)).astype(np.int32)
    req = Request(uid=0, batch=MultimodalBatch(
        jnp.asarray(ids), jnp.ones((1, 6), jnp.int32), None, None, None),
        max_new_tokens=8, temperature=0.0, adapter="a")
    engine.submit(req)
    engine.step()  # admit: the adapter request is now in flight
    with pytest.raises(RuntimeError, match="in flight"):
        engine.set_adapters({"lm": base_lm, **{k: v for k, v in params.items()
                                               if k != "lm"}}, None)
    engine.run_until_drained()
    # Drained: the swap applies.
    engine.set_adapters({"lm": base_lm, **{k: v for k, v in params.items()
                                           if k != "lm"}}, None)
    assert engine.adapter_registry is None and engine.adapter_idx is None
