"""HTTP serving front-end (serve/http_server.py): JSON API over the
continuous-batching engines, streaming SSE, concurrent clients sharing
one slot batch. Tiny model, ephemeral port."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax


@pytest.fixture(scope="module")
def http_srv():
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
        "assistant describe the scene")
    chat = Chat(tok, params, cfg, {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }, text_bucket=32)
    engine = ServingEngine(params, cfg, num_slots=2)
    httpd, srv = make_server(chat, engine, port=0, k=2, timeout_s=120)
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


def test_health(http_srv):
    with urllib.request.urlopen(http_srv + "/v1/health", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["status"] == "ok"
    assert payload["active"] == 0


def test_generate_text_only(http_srv):
    status, out = _post(http_srv, "/v1/generate",
                        {"prompt": "describe the scene",
                         "max_new_tokens": 4})
    assert status == 200
    assert out["tokens"] > 0
    assert isinstance(out["text"], str)
    assert out["id"].startswith("req-")


def test_missing_prompt_is_400(http_srv):
    try:
        _post(http_srv, "/v1/generate", {"max_new_tokens": 4})
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_concurrent_clients_batch_together(http_srv):
    """Two simultaneous requests must both complete (continuous batching
    across connections — each handler thread enqueues, one worker steps)."""
    results = {}

    def call(name):
        results[name] = _post(http_srv, "/v1/generate",
                              {"prompt": f"describe the scene {name}",
                               "max_new_tokens": 6})

    threads = [threading.Thread(target=call, args=(n,)) for n in ("a", "b")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {"a", "b"}
    for status, out in results.values():
        assert status == 200 and out["tokens"] > 0


def test_stream_events_match_plain_generate(http_srv):
    """SSE route: per-token events concatenate to the same greedy text a
    non-streaming call returns for the same prompt."""
    plain = _post(http_srv, "/v1/generate",
                  {"prompt": "describe the scene", "max_new_tokens": 5})[1]

    req = urllib.request.Request(
        http_srv + "/v1/generate",
        data=json.dumps({"prompt": "describe the scene",
                         "max_new_tokens": 5, "stream": True}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "text/event-stream"
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events and events[-1].get("done") is True
    assert events[-1]["text"] == plain["text"]
    assert len(events) - 1 == events[-1]["tokens"]


def test_generate_with_video(http_srv, tmp_path):
    cv2 = pytest.importorskip("cv2")
    path = tmp_path / "clip.mp4"
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (64, 48))
    rng = np.random.default_rng(0)
    for _ in range(16):
        writer.write(rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8))
    writer.release()
    status, out = _post(http_srv, "/v1/generate",
                        {"prompt": "describe the scene",
                         "video": str(path), "max_new_tokens": 4})
    assert status == 200 and out["tokens"] > 0


def test_worker_engine_error_fails_inflight_and_degrades_health(http_srv):
    """An exception out of engine.step must fail waiting clients with
    HTTP 500 (not hang them to the timeout) and flip /v1/health to
    degraded (round-3 code-review finding: the worker died silently)."""
    # Reach into the live server to make exactly one step raise. Other
    # test modules may hold their own Server instances in the same
    # process, so match THIS fixture's server by its bound port.
    import gc
    import http.server

    port = int(http_srv.rsplit(":", 1)[1])
    srv = None
    for obj in gc.get_objects():
        if (isinstance(obj, http.server.ThreadingHTTPServer)
                and obj.server_address[1] == port):
            srv = obj.RequestHandlerClass.server_obj
            break
    assert srv is not None
    real_step = srv.engine.step
    state = {"raised": False}

    def boom(k=1):
        if not state["raised"]:
            state["raised"] = True
            raise RuntimeError("synthetic engine failure")
        return real_step(k)

    srv.engine.step = boom
    try:
        try:
            _post(http_srv, "/v1/generate",
                  {"prompt": "describe the scene", "max_new_tokens": 4})
            raise AssertionError("expected HTTP 500")
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "synthetic engine failure" in json.loads(e.read())["error"]
    finally:
        srv.engine.step = real_step
    with urllib.request.urlopen(http_srv + "/v1/health", timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "degraded"
    assert "synthetic engine failure" in h["last_error"]
    # The engine itself still serves once the fault clears.
    status, out = _post(http_srv, "/v1/generate",
                        {"prompt": "describe the scene",
                         "max_new_tokens": 3})
    assert status == 200 and out["tokens"] > 0


def test_metrics_endpoint(http_srv):
    # Generate once so counters move, then scrape.
    status, out = _post(http_srv, "/v1/generate",
                        {"prompt": "describe the scene", "max_new_tokens": 3})
    assert status == 200
    with urllib.request.urlopen(http_srv + "/metrics", timeout=30) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
    vals = {}
    for line in body.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        vals[name] = float(val)
    assert vals["videollamb_requests_total"] >= 1
    assert vals["videollamb_tokens_generated_total"] >= 3
    assert vals["videollamb_ttft_seconds_count"] >= 1
    assert vals["videollamb_ttft_seconds_sum"] > 0
    assert vals["videollamb_e2e_seconds_count"] >= 1
    assert vals["videollamb_engine_up"] == 1
    assert vals["videollamb_slots_total"] == 2
    # Summary ordering: TTFT never exceeds end-to-end.
    assert vals["videollamb_ttft_seconds_sum"] <= vals["videollamb_e2e_seconds_sum"] + 1e-6


def test_embeddings_without_embedder_is_503(http_srv):
    """This fixture's server has no EmbeddingService configured."""
    try:
        _post(http_srv, "/v1/embeddings", {"input": "hi"})
        raise AssertionError("expected HTTP 503")
    except urllib.error.HTTPError as e:
        assert e.code == 503


def _get(base, path, timeout=120):
    with urllib.request.urlopen(base + path, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _delete(base, path, timeout=120):
    req = urllib.request.Request(base + path, method="DELETE")
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def _write_clip(path, frames=10, size=(64, 48)):
    cv2 = pytest.importorskip("cv2")
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             30, size)
    rng = np.random.default_rng(3)
    for _ in range(frames * 30):  # 30fps source -> `frames` at 1 fps
        writer.write(rng.integers(0, 255,
                                  size=(size[1], size[0], 3)).astype(np.uint8))
    writer.release()


def test_streaming_video_session_over_http(http_srv, tmp_path):
    """The VideoLLaMB-Live streaming engine as a served product
    (serve/streams_api.py): create a session with a video + query, tick
    through the stream, read back a timestamped response event, append a
    chunk, and close. The reference ships streaming as a CLI only."""
    clip = tmp_path / "live.mp4"
    _write_clip(clip, frames=6)
    status, out = _post(http_srv, "/v1/streams", {
        "video": str(clip), "fps": 1.0, "query": "what is happening",
        "query_time": 0.0, "max_seq_len": 256, "max_new_tokens": 4})
    assert status == 200 and out["id"].startswith("stream-")
    sid = out["id"]
    assert out["frames"] > 0

    event = None
    for _ in range(out["frames"]):
        status, t = _post(http_srv, f"/v1/streams/{sid}/tick", {})
        assert status == 200
        if t.get("event") and t["event"].get("response"):
            event = t["event"]
            break
    assert event is not None, "no response event over the whole stream"
    assert "Assistant" in event["response"]

    status, st = _get(http_srv, f"/v1/streams/{sid}")
    assert status == 200
    assert st["context_length"] > 0
    assert st["frames_ingested"] >= 1
    assert any(e.get("response") for e in st["events"])

    # Ticking past the buffered tail is backpressure, not a crash.
    n = st["frames_buffered"]
    err = None
    for _ in range(n + 2):
        try:
            _post(http_srv, f"/v1/streams/{sid}/tick", {})
        except urllib.error.HTTPError as e:
            err = e
            break
    assert err is not None and err.code == 400

    # Append a chunk -> ticking resumes.
    clip2 = tmp_path / "live2.mp4"
    _write_clip(clip2, frames=3)
    status, ap = _post(http_srv, f"/v1/streams/{sid}/video",
                       {"video": str(clip2)})
    assert status == 200 and ap["frames"] > 0
    status, t = _post(http_srv, f"/v1/streams/{sid}/tick", {})
    assert status == 200

    # Mid-stream query gets queued and answered on a later tick.
    status, q = _post(http_srv, f"/v1/streams/{sid}/query",
                      {"text": "and now?"})
    assert status == 200 and q["queued"]

    status, lst = _get(http_srv, "/v1/streams")
    assert sid in lst["streams"]
    status, d = _delete(http_srv, f"/v1/streams/{sid}")
    assert status == 200 and d["deleted"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(http_srv, f"/v1/streams/{sid}")
    assert ei.value.code == 404


def test_streaming_session_cap_and_validation(http_srv):
    sids = []
    for _ in range(4):
        status, out = _post(http_srv, "/v1/streams", {"max_seq_len": 256})
        assert status == 200
        sids.append(out["id"])
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(http_srv, "/v1/streams", {"max_seq_len": 256})
    assert ei.value.code == 409
    # Tick with no video buffered: 400, not a crash.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(http_srv, f"/v1/streams/{sids[0]}/tick", {})
    assert ei.value.code == 400
    for sid in sids:
        _delete(http_srv, f"/v1/streams/{sid}")
    status, lst = _get(http_srv, "/v1/streams")
    assert lst["streams"] == []


def test_streaming_tick_cadence_survives_awkward_fps(http_srv, tmp_path):
    """Bare ticks advance exactly one frame per call for ANY fps: the
    naive (f)/fps tick time truncates back to f-1 inside
    input_video_stream's int(t*fps) for fps like 7.0, livelocking the
    stream (code-review finding; fixed by frame-center tick times)."""
    clip = tmp_path / "c7.mp4"
    _write_clip(clip, frames=2)
    status, out = _post(http_srv, "/v1/streams", {
        "video": str(clip), "fps": 7.0, "max_seq_len": 256,
        "max_new_tokens": 2})
    assert status == 200
    sid, n = out["id"], out["frames"]
    assert n > 2
    for i in range(n):
        status, _ = _post(http_srv, f"/v1/streams/{sid}/tick", {})
        assert status == 200
        status, st = _get(http_srv, f"/v1/streams/{sid}")
        assert st["frames_ingested"] == i + 1, \
            f"tick {i} stalled at {st['frames_ingested']}"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(http_srv, f"/v1/streams/{sid}/tick", {})
    assert ei.value.code == 400
    _delete(http_srv, f"/v1/streams/{sid}")
