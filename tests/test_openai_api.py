"""OpenAI-compatible API (serve/openai_api.py + http_server routes):
request/response converters, server-side stop sequences, and e2e parity
between /v1/chat/completions, /v1/completions, and /v1/generate on a
tiny model over a live HTTP server."""

import base64
import json
import os
import threading
import urllib.error
import urllib.request

import pytest

import conftest as _c  # noqa: F401

import jax


# ---------------------------------------------------------------------
# Converter unit tests (pure host-side, no model).

def test_stop_matcher_never_emits_stop_prefix():
    from videollamb_tpu.serve.openai_api import StopMatcher

    m = StopMatcher(["END"])
    out1, hit1 = m.feed("hello E")      # "E" could grow into "END" — held
    assert (out1, hit1) == ("hello ", False)
    out2, hit2 = m.feed("N")            # "EN" still a prefix — held
    assert (out2, hit2) == ("", False)
    out3, hit3 = m.feed("D tail")       # completes the stop
    assert (out3, hit3) == ("", True)
    assert m.feed("more")[0] == ""      # nothing after a match


def test_stop_matcher_flush_releases_false_prefix():
    from videollamb_tpu.serve.openai_api import StopMatcher

    m = StopMatcher(["\n\n"])
    out, hit = m.feed("line\n")
    assert (out, hit) == ("line", False)
    assert m.flush() == "\n"            # never became a stop — released


def test_stop_matcher_multiple_stops_earliest_wins():
    from videollamb_tpu.serve.openai_api import StopMatcher

    m = StopMatcher(["xx", "yy"])
    out, hit = m.feed("a yy b xx")
    assert (out, hit) == ("a ", True)


def test_row_from_chat_completions_full_conversation(tmp_path):
    from videollamb_tpu.serve import openai_api as oai

    img = tmp_path / "pic.png"
    img.write_bytes(b"not-a-real-png")
    body = {
        "model": "base",
        "messages": [
            {"role": "system", "content": "be terse"},
            {"role": "user", "content": [
                {"type": "image_url",
                 "image_url": {"url": f"file://{img}"}},
                {"type": "text", "text": "what is this"},
            ]},
            {"role": "assistant", "content": "a test image"},
            {"role": "user", "content": "and now?"},
        ],
        "max_tokens": 7,
        "temperature": 0.5,
        "stop": ["\n"],
    }
    row, stops, temps = oai.row_from_chat_completions(body, "base", [])
    assert row["system"] == "be terse"
    assert row["history"] == [["<image>\nwhat is this", "a test image"]]
    assert row["prompt"] == "and now?"
    assert row["image"] == str(img)     # file:// stripped, no temp file
    assert row["max_new_tokens"] == 7 and row["temperature"] == 0.5
    assert stops == ["\n"] and temps == []


def test_row_from_chat_completions_data_uri_and_input_audio():
    from videollamb_tpu.serve import openai_api as oai

    payload = base64.b64encode(b"RIFFfakewav").decode()
    body = {"messages": [{"role": "user", "content": [
        {"type": "text", "text": "listen"},
        {"type": "input_audio",
         "input_audio": {"data": payload, "format": "wav"}},
    ]}]}
    row, stops, temps = oai.row_from_chat_completions(body, "m", [])
    assert len(temps) == 1 and row["audio"] == temps[0]
    assert temps[0].endswith(".wav") and os.path.exists(temps[0])
    with open(temps[0], "rb") as f:
        assert f.read() == b"RIFFfakewav"
    assert "<audio>" in row["prompt"]
    oai._cleanup(temps)
    assert not os.path.exists(temps[0])


@pytest.mark.parametrize("messages,msg", [
    ([], "'messages'"),
    ([{"role": "user", "content": "hi"},
      {"role": "assistant", "content": "yo"}], "last message"),
    ([{"role": "owl", "content": "x"},
      {"role": "user", "content": "hi"}], "unsupported role"),
    ([{"role": "assistant", "content": "a"},
      {"role": "user", "content": "b"}], "alternate"),
    ([{"role": "user", "content": "hi"},
      {"role": "system", "content": "late"},
      {"role": "user", "content": "hi"}], "system message must come first"),
])
def test_row_from_chat_completions_shape_errors(messages, msg):
    from videollamb_tpu.serve import openai_api as oai

    with pytest.raises(oai.BadRequest, match=msg):
        oai.row_from_chat_completions({"messages": messages}, "m", [])


def test_row_from_chat_completions_rejects_duplicate_modality():
    from videollamb_tpu.serve import openai_api as oai

    body = {"messages": [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": "a.png"}},
        {"type": "image_url", "image_url": {"url": "b.png"}},
        {"type": "text", "text": "which"},
    ]}]}
    with pytest.raises(oai.BadRequest, match="more than one image"):
        oai.row_from_chat_completions(body, "m", [])


def test_unsupported_params_rejected():
    from videollamb_tpu.serve import openai_api as oai

    base = {"messages": [{"role": "user", "content": "hi"}]}
    for extra, msg in (({"n": 9}, "between 1 and 8"),
                       ({"n": "2"}, "between 1 and 8"),
                       ({"tools": [{"type": "function"}]}, "tool"),
                       ({"response_format": {"type": "json_schema"}},
                        "response_format"),
                       ({"stop": [""]}, "stop")):
        with pytest.raises(oai.BadRequest, match=msg):
            oai.row_from_chat_completions({**base, **extra}, "m", [])


def test_resolve_model_routes_adapters_and_404s():
    from videollamb_tpu.serve import openai_api as oai

    assert oai.resolve_model({"model": "base"}, "base", ["ft"]) is None
    assert oai.resolve_model({}, "base", ["ft"]) is None
    assert oai.resolve_model({"model": "ft"}, "base", ["ft"]) == "ft"
    with pytest.raises(oai.BadRequest) as e:
        oai.resolve_model({"model": "nope"}, "base", ["ft"])
    assert e.value.status == 404 and e.value.code == "model_not_found"


def test_row_from_completions_is_raw():
    from videollamb_tpu.serve import openai_api as oai

    row, stops = oai.row_from_completions(
        {"prompt": "Once upon", "max_tokens": 3, "stop": "."}, "m", [])
    assert row == {"prompt": "Once upon", "raw": True,
                   "max_new_tokens": 3, "temperature": 0.0, "top_p": 1.0}
    assert stops == ["."]
    with pytest.raises(oai.BadRequest, match="echo"):
        oai.row_from_completions({"prompt": "x", "echo": True}, "m", [])


# ---------------------------------------------------------------------
# E2E over a live HTTP server (tiny model, ephemeral port).

@pytest.fixture(scope="module")
def oai_srv():
    from test_serving import ChatTokenizer
    from videollamb_tpu.config import ModelConfig
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.http_server import make_server
    from videollamb_tpu.serve.server import ServingEngine

    cfg = ModelConfig.tiny(max_length=128)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence "
        "assistant describe the scene what happened next")
    chat = Chat(tok, params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)
    engine = ServingEngine(params, cfg, num_slots=2)

    # Embeddings side-car: tiny binding model (serve/embeddings.py).
    from test_embeddings import ClipTokenizer
    from videollamb_tpu.config import VisionConfig
    from videollamb_tpu.models.binding import TextConfig, init_binding_params
    from videollamb_tpu.serve.embeddings import EmbeddingService

    vcfgs = {"image": VisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        add_time_attn=False)}
    tcfg = TextConfig(hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      vocab_size=100, max_position_embeddings=16)
    embedder = EmbeddingService(
        init_binding_params(jax.random.PRNGKey(1), vcfgs, tcfg,
                            projection_dim=24),
        vcfgs, ClipTokenizer(), {"image": ImageProcessor(size=32)},
        text_cfg=tcfg, model_name="bind-tiny")

    httpd, srv = make_server(chat, engine, port=0, k=2, timeout_s=120,
                             model_name="videollamb-tiny", embedder=embedder)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    httpd.shutdown()
    srv.shutdown()


def _post(base, path, payload, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _sse(base, path, payload, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                data = line[len("data: "):]
                events.append(data if data == "[DONE]" else json.loads(data))
    return events


def test_models_endpoint(oai_srv):
    with urllib.request.urlopen(oai_srv + "/v1/models", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["object"] == "list"
    assert payload["data"][0]["id"] == "videollamb-tiny"


def test_chat_completion_matches_generate(oai_srv):
    """Same prompt through the OpenAI route and the native route must
    produce identical greedy text (both assemble the same conversation
    template through build_requests)."""
    native = _post(oai_srv, "/v1/generate",
                   {"prompt": "describe the scene", "max_new_tokens": 6})[1]
    status, out = _post(oai_srv, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "describe the scene"}],
        "max_tokens": 6,
    })
    assert status == 200
    assert out["object"] == "chat.completion"
    assert out["model"] == "videollamb-tiny"
    choice = out["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert choice["message"]["content"] == native["text"]
    usage = out["usage"]
    assert usage["completion_tokens"] == native["tokens"]
    assert usage["prompt_tokens"] > 0
    assert usage["total_tokens"] == (usage["prompt_tokens"]
                                     + usage["completion_tokens"])


def test_chat_completion_stream_parity(oai_srv):
    body = {"messages": [{"role": "user", "content": "describe the scene"}],
            "max_tokens": 6}
    plain = _post(oai_srv, "/v1/chat/completions", body)[1]
    events = _sse(oai_srv, "/v1/chat/completions",
                  {**body, "stream": True,
                   "stream_options": {"include_usage": True}})
    assert events[-1] == "[DONE]"
    chunks = events[:-1]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(c["choices"][0]["delta"].get("content", "")
                   for c in chunks if c["choices"])
    assert text.strip() == plain["choices"][0]["message"]["content"]
    finish = [c for c in chunks
              if c["choices"] and c["choices"][0]["finish_reason"]]
    assert len(finish) == 1
    usage_chunks = [c for c in chunks if "usage" in c]
    assert len(usage_chunks) == 1 and not usage_chunks[0]["choices"]
    assert usage_chunks[0]["usage"] == plain["usage"]


def test_stop_sequence_truncates_and_cancels(oai_srv):
    body = {"messages": [{"role": "user", "content": "what happened next"}],
            "max_tokens": 8}
    full = _post(oai_srv, "/v1/chat/completions", body)[1]
    content = full["choices"][0]["message"]["content"]
    words = content.split()
    if len(words) < 2:
        pytest.skip("tiny model emitted too little text to pick a stop")
    stop = words[1]
    out = _post(oai_srv, "/v1/chat/completions", {**body, "stop": stop})[1]
    choice = out["choices"][0]
    assert choice["finish_reason"] == "stop"
    got = choice["message"]["content"]
    assert stop not in got
    assert got == content.split(stop, 1)[0].strip()
    # The stop fired mid-decode, so fewer tokens were committed.
    assert out["usage"]["completion_tokens"] <= full["usage"]["completion_tokens"]


def test_multiturn_history_round_trips(oai_srv):
    status, out = _post(oai_srv, "/v1/chat/completions", {
        "messages": [
            {"role": "system", "content": "A chat between a curious human "
             "and an artificial intelligence assistant"},
            {"role": "user", "content": "describe the scene"},
            {"role": "assistant", "content": "a scene"},
            {"role": "user", "content": "what happened next"},
        ],
        "max_tokens": 4,
    })
    assert status == 200
    assert out["choices"][0]["message"]["content"] is not None
    assert out["usage"]["completion_tokens"] > 0


def test_completions_raw_endpoint(oai_srv):
    status, out = _post(oai_srv, "/v1/completions",
                        {"prompt": "describe the scene", "max_tokens": 4})
    assert status == 200
    assert out["object"] == "text_completion"
    assert isinstance(out["choices"][0]["text"], str)
    assert out["usage"]["completion_tokens"] > 0
    # Raw rows skip the chat template: prompt tokens = BOS + 3 words.
    assert out["usage"]["prompt_tokens"] == 4


def test_completions_stream(oai_srv):
    events = _sse(oai_srv, "/v1/completions",
                  {"prompt": "describe the scene", "max_tokens": 4,
                   "stream": True})
    assert events[-1] == "[DONE]"
    assert all(e["object"] == "text_completion" for e in events[:-1])
    finishes = [e["choices"][0]["finish_reason"] for e in events[:-1]]
    assert finishes[-1] in ("stop", "length")


def test_unknown_model_is_404_with_openai_error_body(oai_srv):
    try:
        _post(oai_srv, "/v1/chat/completions", {
            "model": "gpt-4o",
            "messages": [{"role": "user", "content": "hi"}]})
        raise AssertionError("expected HTTP 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404
        err = json.loads(e.read())["error"]
        assert err["code"] == "model_not_found"
        assert "videollamb-tiny" in err["message"]


def test_malformed_conversation_is_400(oai_srv):
    try:
        _post(oai_srv, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"},
                         {"role": "assistant", "content": "yo"}]})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"]["type"] == "invalid_request_error"


def test_chat_completion_with_video_part(oai_srv, tmp_path):
    cv2 = pytest.importorskip("cv2")
    import numpy as np

    path = tmp_path / "clip.mp4"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(16):
        writer.write(rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
    writer.release()
    status, out = _post(oai_srv, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "video_url", "video_url": {"url": str(path)}},
            {"type": "text", "text": "describe the scene"},
        ]}],
        "max_tokens": 4,
    })
    assert status == 200
    assert out["usage"]["completion_tokens"] > 0


def test_chat_completion_logprobs(oai_srv):
    body = {"messages": [{"role": "user", "content": "describe the scene"}],
            "max_tokens": 5, "logprobs": True, "top_logprobs": 3}
    out = _post(oai_srv, "/v1/chat/completions", body)[1]
    choice = out["choices"][0]
    lp = choice["logprobs"]
    assert lp is not None and len(lp["content"]) == out["usage"]["completion_tokens"]
    for entry in lp["content"]:
        assert entry["logprob"] <= 1e-5
        assert isinstance(entry["token"], str)
        assert entry["bytes"] == list(entry["token"].encode())
        assert len(entry["top_logprobs"]) == 3
        # Greedy: the chosen token is the argmax alternative.
        assert entry["top_logprobs"][0]["token"] == entry["token"]
        vals = [t["logprob"] for t in entry["top_logprobs"]]
        assert vals == sorted(vals, reverse=True)


def test_chat_completion_stream_logprobs(oai_srv):
    body = {"messages": [{"role": "user", "content": "describe the scene"}],
            "max_tokens": 4, "logprobs": True, "top_logprobs": 2,
            "stream": True}
    events = _sse(oai_srv, "/v1/chat/completions", body)
    token_chunks = [c for c in events[:-1]
                    if c["choices"] and c["choices"][0]["delta"].get("content")]
    assert token_chunks
    for c in token_chunks:
        lp = c["choices"][0]["logprobs"]
        assert lp and len(lp["content"]) == 1
        assert lp["content"][0]["logprob"] <= 1e-5
        assert len(lp["content"][0]["top_logprobs"]) == 2


def test_completions_legacy_logprobs(oai_srv):
    out = _post(oai_srv, "/v1/completions",
                {"prompt": "describe the scene", "max_tokens": 4,
                 "logprobs": 2})[1]
    lp = out["choices"][0]["logprobs"]
    n = out["usage"]["completion_tokens"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == n
    assert len(lp["top_logprobs"]) == len(lp["text_offset"]) == n
    assert lp["text_offset"] == sorted(lp["text_offset"])
    for tok, tlp, top in zip(lp["tokens"], lp["token_logprobs"],
                             lp["top_logprobs"]):
        assert tlp <= 1e-5 and len(top) == 2
        # Greedy: chosen token's logprob equals its entry in the top map.
        assert abs(top[tok] - tlp) < 1e-5


def test_top_logprobs_without_logprobs_is_400(oai_srv):
    try:
        _post(oai_srv, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "top_logprobs": 3})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "top_logprobs" in json.loads(e.read())["error"]["message"]


def test_embeddings_endpoint(oai_srv):
    status, out = _post(oai_srv, "/v1/embeddings",
                        {"input": ["hello world", "goodbye"]})
    assert status == 200
    assert out["object"] == "list" and out["model"] == "bind-tiny"
    assert len(out["data"]) == 2
    import numpy as np

    emb = np.asarray(out["data"][0]["embedding"], np.float32)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, rtol=1e-3)
    assert out["usage"]["prompt_tokens"] > 0


def test_embeddings_model_listed(oai_srv):
    with urllib.request.urlopen(oai_srv + "/v1/models", timeout=30) as r:
        payload = json.loads(r.read())
    assert {m["id"] for m in payload["data"]} >= {"videollamb-tiny",
                                                  "bind-tiny"}


def test_embeddings_bad_request_is_4xx(oai_srv):
    try:
        _post(oai_srv, "/v1/embeddings", {"input": []})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert json.loads(e.read())["error"]["type"] == "invalid_request_error"


def test_n_choices_sampled(oai_srv):
    """n>1 returns n independent choices (indexes 0..n-1) that
    continuous-batch through the slot pool; usage sums completion tokens
    across choices."""
    status, out = _post(oai_srv, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "describe the scene"}],
        "max_tokens": 5, "temperature": 1.0, "n": 3})
    assert status == 200
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    texts = [c["message"]["content"] for c in out["choices"]]
    assert all(isinstance(t, str) for t in texts)
    assert len(set(texts)) >= 2, f"sampled choices all identical: {texts}"
    assert out["usage"]["completion_tokens"] == 15


def test_n_choices_greedy_are_identical(oai_srv):
    status, out = _post(oai_srv, "/v1/completions", {
        "prompt": "describe the scene", "max_tokens": 4,
        "temperature": 0.0, "n": 2})
    assert status == 200
    texts = [c["text"] for c in out["choices"]]
    assert len(texts) == 2 and texts[0] == texts[1]


def test_n_validation_and_streaming_rejects(oai_srv):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(oai_srv, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}], "n": 9})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(oai_srv, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hi"}],
            "n": 2, "stream": True})
    assert ei.value.code == 400
