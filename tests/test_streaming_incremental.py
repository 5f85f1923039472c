"""Incremental streaming machinery: chunked KV-cache extension parity,
bridge stream-step parity vs the batch scan, and the bounded-memory
streaming session."""

import numpy as np
import pytest

import conftest as _c  # noqa: F401

import jax
import jax.numpy as jnp

from videollamb_tpu.config import BridgeConfig, LlamaConfig, ModelConfig


# ---------------------------------------------------------------------------
# llama_extend
# ---------------------------------------------------------------------------


def _lm():
    cfg = LlamaConfig.tiny()
    from videollamb_tpu.models.lm.llama import init_llama_params

    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_llama_extend_matches_single_prefill():
    """prefill(A) + extend(B) must produce the same last-token logits and
    the same subsequent greedy decode as prefill(A+B)."""
    from videollamb_tpu.models.lm.llama import (
        embed_tokens, init_kv_cache, llama_decode_step, llama_extend,
        llama_prefill,
    )

    cfg, params = _lm()
    rng = np.random.default_rng(0)
    ids_a = rng.integers(4, cfg.vocab_size, size=(1, 10)).astype(np.int32)
    ids_b = rng.integers(4, cfg.vocab_size, size=(1, 6)).astype(np.int32)
    full = np.concatenate([ids_a, ids_b], axis=1)

    def run_chain(cache, last_logits, steps=4):
        toks = []
        for _ in range(steps):
            nxt = int(jnp.argmax(last_logits[0]))
            toks.append(nxt)
            last_logits, cache = llama_decode_step(
                params, cfg, embed_tokens(params, jnp.asarray([[nxt]])), cache
            )
        return toks

    # One-shot prefill.
    cache1 = init_kv_cache(cfg, 1, 64, jnp.float32)
    lg1, cache1 = llama_prefill(
        params, cfg, embed_tokens(params, jnp.asarray(full)),
        jnp.ones_like(jnp.asarray(full)), cache1,
    )
    chain1 = run_chain(cache1, lg1)

    # Split prefill + extend.
    cache2 = init_kv_cache(cfg, 1, 64, jnp.float32)
    _, cache2 = llama_prefill(
        params, cfg, embed_tokens(params, jnp.asarray(ids_a)),
        jnp.ones_like(jnp.asarray(ids_a)), cache2,
    )
    lg2, cache2 = llama_extend(
        params, cfg, embed_tokens(params, jnp.asarray(ids_b)),
        jnp.ones_like(jnp.asarray(ids_b)), cache2,
    )
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg2), rtol=2e-4, atol=2e-4)
    assert run_chain(cache2, lg2) == chain1

    # Three-way split with a right-padded middle chunk.
    cache3 = init_kv_cache(cfg, 1, 64, jnp.float32)
    _, cache3 = llama_prefill(
        params, cfg, embed_tokens(params, jnp.asarray(ids_a)),
        jnp.ones_like(jnp.asarray(ids_a)), cache3,
    )
    padded = np.concatenate([ids_b[:, :3], np.zeros((1, 3), np.int32)], axis=1)
    mask = np.array([[1, 1, 1, 0, 0, 0]], np.int32)
    _, cache3 = llama_extend(
        params, cfg, embed_tokens(params, jnp.asarray(padded)), jnp.asarray(mask), cache3
    )
    lg3, cache3 = llama_extend(
        params, cfg, embed_tokens(params, jnp.asarray(ids_b[:, 3:])),
        jnp.ones((1, 3), jnp.int32), cache3,
    )
    np.testing.assert_allclose(np.asarray(lg1), np.asarray(lg3), rtol=2e-4, atol=2e-4)
    assert run_chain(cache3, lg3) == chain1


# ---------------------------------------------------------------------------
# Bridge stream step
# ---------------------------------------------------------------------------


def test_bridge_stream_step_matches_batch_scan():
    """Feeding the batch path's segment plan through rmt_r_stream_step must
    reproduce the scan's per-segment tokens and final memory."""
    from videollamb_tpu.models.bridge.rmt_r import (
        init_rmt_r_params, init_stream_state, pool_and_split,
        rmt_r_stream_step, rmt_r_video_forward,
    )
    from videollamb_tpu.ops.scene_tilling import segment_plan, segment_topk

    cfg = ModelConfig.tiny().bridge
    params = init_rmt_r_params(jax.random.PRNGKey(1), cfg, lm_hidden_size=64)
    t, n, d = 16, 17, cfg.hidden_size
    feats = jax.random.normal(jax.random.PRNGKey(2), (t, n, d))

    out = rmt_r_video_forward(params, cfg, feats)

    cls_states, _ = pool_and_split(feats, cfg)
    bounds = segment_topk(cls_states, k=cfg.segment_topk)
    frame_idx, frame_mask = segment_plan(bounds, t, max_frames=cfg.max_frames_per_segment)

    state = init_stream_state(cfg, cache_segments=cfg.max_segments)
    for s in range(cfg.max_segments):
        seg_feats = feats[np.asarray(frame_idx[s])]
        tokens, tmask, state = rmt_r_stream_step(
            params, cfg, seg_feats, frame_mask[s], state
        )
        np.testing.assert_allclose(
            np.asarray(tokens), np.asarray(out.all_tokens[s]), rtol=2e-4, atol=2e-4,
            err_msg=f"segment {s}",
        )
        assert np.asarray(tmask).tolist() == np.asarray(out.all_masks[s]).tolist()
    np.testing.assert_allclose(
        np.asarray(state.memory[0]), np.asarray(out.memory), rtol=2e-4, atol=2e-4
    )


def test_bridge_stream_ring_cache_bounded():
    """More segments than the ring: state stays static-shape, count grows,
    and the step keeps producing finite tokens."""
    from videollamb_tpu.models.bridge.rmt_r import (
        init_rmt_r_params, init_stream_state, rmt_r_stream_step,
    )

    cfg = ModelConfig.tiny().bridge
    params = init_rmt_r_params(jax.random.PRNGKey(1), cfg, lm_hidden_size=64)
    state = init_stream_state(cfg, cache_segments=2)
    f = cfg.max_frames_per_segment
    shapes = set()
    for s in range(5):
        feats = jax.random.normal(jax.random.PRNGKey(s), (f, 17, cfg.hidden_size))
        tokens, _, state = rmt_r_stream_step(
            params, cfg, feats, jnp.ones((f,), bool), state
        )
        assert np.isfinite(np.asarray(tokens)).all()
        shapes.add(state.cache.shape)
    assert shapes == {(1, 2 * cfg.num_memory_tokens, cfg.hidden_size)}
    assert int(state.count) == 5


# ---------------------------------------------------------------------------
# StreamingSession end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_chat():
    from videollamb_tpu.data.processing import ImageProcessor, VideoProcessor
    from videollamb_tpu.models.bridge.rmt_r import init_rmt_r_params
    from videollamb_tpu.models.lm.llama import init_llama_params
    from videollamb_tpu.models.vision.clip_vit import init_vision_params
    from videollamb_tpu.serve.chat import Chat
    from test_serving import ChatTokenizer

    cfg = ModelConfig.tiny()
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    params = {
        "video_tower": init_vision_params(k1, cfg.vision),
        "mm_projector": init_rmt_r_params(k2, cfg.bridge, cfg.lm.hidden_size),
        "lm": init_llama_params(k3, cfg.lm),
    }
    processors = {
        "VIDEO": VideoProcessor(size=cfg.vision.image_size),
        "IMAGE": ImageProcessor(size=cfg.vision.image_size),
    }
    tok = ChatTokenizer()
    tok("A chat between a curious human and an artificial intelligence assistant")
    return Chat(tok, params, cfg, processors, text_bucket=32)


def test_streaming_session_bounded_and_answers(tiny_chat):
    """A long synthetic stream: buffers stay bounded, queries get answered,
    context grows monotonically in the carried KV cache."""
    from videollamb_tpu.serve.incremental import StreamingSession

    tiny_chat.reset()
    sess = StreamingSession(
        tiny_chat, frame_fps=1.0, max_open_frames=6, max_seq_len=448,
        max_new_tokens=4,
    )
    t_total = 40
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(t_total, 56, 56, 3)).astype(np.uint8)
    frames[10:20] = 220  # scene structure
    frames[20:30] = 40
    sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
    sess.num_video_frames = t_total
    sess.video_duration = float(t_total)

    sess.input_query_stream("what is happening", video_time=5.0)
    sess.input_query_stream("and now", video_time=25.0)

    max_resident = 0
    answers = []
    ctx_lens = []
    for i in range(t_total):
        sess.input_video_stream(float(i))
        max_resident = max(max_resident, sess.hbm_resident_frames)
        q, r = sess()
        if r is not None:
            answers.append((q, r))
            ctx_lens.append(sess.context_length)

    # Bounded: the open-frame buffer never exceeded the cap.
    assert max_resident <= 6, max_resident
    # Both queries answered.
    assert sum("User:" in (q or "") for q, _ in answers) >= 2
    # Carried context: cache length strictly grows across responses.
    assert ctx_lens == sorted(ctx_lens) and len(set(ctx_lens)) == len(ctx_lens)
    # Segments were folded incrementally.
    assert int(sess.bridge_state.count) >= t_total // 6 - 1


def test_streaming_session_constant_state_shapes(tiny_chat):
    """State arrays (KV cache, bridge ring) keep static shapes for the whole
    stream — the constant-HBM property."""
    from videollamb_tpu.serve.incremental import StreamingSession

    tiny_chat.reset()
    sess = StreamingSession(tiny_chat, frame_fps=1.0, max_open_frames=4,
                            max_seq_len=448, max_new_tokens=2)
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, size=(24, 56, 56, 3)).astype(np.uint8)
    sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
    sess.num_video_frames = 24
    sess.video_duration = 24.0

    shapes = set()
    for i in range(24):
        sess.input_video_stream(float(i))
        sess()
        shapes.add((sess.kv.k.shape, sess.bridge_state.cache.shape))
    assert len(shapes) == 1


def test_streaming_prefetch_hits_and_parity(tiny_chat):
    """The encode double-buffer serves steady-state ticks from the
    prefetched window and produces identical answers to a cold session."""
    from videollamb_tpu.serve.incremental import StreamingSession

    def run():
        tiny_chat.reset()
        sess = StreamingSession(
            tiny_chat, frame_fps=1.0, max_open_frames=6, max_seq_len=448,
            max_new_tokens=4,
        )
        t_total = 16
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 255, size=(t_total, 56, 56, 3)).astype(np.uint8)
        frames[8:] = 200
        sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
        sess.num_video_frames = t_total
        sess.video_duration = float(t_total)
        sess.input_query_stream("what is happening", video_time=4.0)
        answers = []
        for i in range(t_total):
            sess.input_video_stream(float(i))
            q, r = sess()
            if r is not None:
                answers.append(r)
        return sess, answers

    sess_a, ans_a = run()
    # Steady-state 1-frame ticks: every tick after the first is a hit.
    assert sess_a.prefetch_hits >= sess_a.prefetch_misses
    assert sess_a.prefetch_hits + sess_a.prefetch_misses == 16

    sess_b, ans_b = run()
    assert ans_a == ans_b


def test_extend_full_width_chunk_near_buffer_end():
    """Regression: a padded extend chunk as wide as the cache buffer must
    not clobber the existing context. The old dynamic_update_slice write
    clamped its START index when start + chunk > buffer, silently rewriting
    the cache from position 0 (caught by the paged-engine prefix cache,
    whose suffix buckets are full-width)."""
    from videollamb_tpu.config import LlamaConfig
    from videollamb_tpu.models.lm.llama import (
        init_kv_cache,
        init_llama_params,
        llama_extend,
        llama_prefill,
    )

    cfg = LlamaConfig.tiny()
    params = init_llama_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(3)
    d = cfg.hidden_size
    full = jnp.asarray(rng.normal(size=(1, 14, d)).astype(np.float32))

    c1 = init_kv_cache(cfg, 1, 64, jnp.float32)
    ref, _ = llama_prefill(params, cfg, full, jnp.ones((1, 14), jnp.int32), c1)

    c2 = init_kv_cache(cfg, 1, 64, jnp.float32)
    _, c2 = llama_prefill(params, cfg, full[:, :11], jnp.ones((1, 11), jnp.int32), c2)
    # Chunk bucket == buffer width: 3 valid tokens + 61 pads.
    emb = jnp.concatenate(
        [full[:, 11:], jnp.zeros((1, 61, d), jnp.float32)], axis=1)
    mask = jnp.asarray(np.r_[np.ones(3), np.zeros(61)][None], jnp.int32)
    out, c2 = llama_extend(params, cfg, emb, mask, c2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)
    assert int(c2.length[0]) == 14


# ---------------------------------------------------------------------------
# Incremental boundary detection (VERDICT r2 #3): parity + compile stability
# ---------------------------------------------------------------------------


def test_boundary_detector_matches_segment_threshold():
    """Per-tick boundaries from the fixed-shape incremental detector equal
    the full recompute the r2 engine did (segment_threshold over the whole
    CLS history) at EVERY stream position that fits the window."""
    from videollamb_tpu.ops.scene_tilling import segment_threshold
    from videollamb_tpu.ops.streaming_boundaries import BoundaryDetector

    rng = np.random.default_rng(0)
    d, t_total = 16, 60
    # Piecewise-constant-ish CLS trajectory with real scene structure.
    cls = rng.normal(size=(t_total, d)).astype(np.float32) * 0.1
    cls[15:30] += rng.normal(size=d) * 2
    cls[30:47] -= rng.normal(size=d) * 2

    det = BoundaryDetector(dim=d, cap=128)
    for i in range(t_total):
        det.add_frame(cls[i])
        got = det.boundaries()
        if i + 1 < 3:
            assert got == [i], got
            continue
        bounds, valid = segment_threshold(jnp.asarray(cls[: i + 1]))
        want = np.asarray(bounds)[np.asarray(valid)].tolist()
        assert got == want, (i, got, want)


def test_boundary_detector_compile_stable_and_bounded():
    """500 ticks: the jit cache holds exactly one step entry (plus one
    slide entry once the window wraps) and host/device state stays at its
    fixed allocation — no per-tick recompiles, no growth."""
    from videollamb_tpu.ops.streaming_boundaries import BoundaryDetector

    rng = np.random.default_rng(1)
    d = 8
    det = BoundaryDetector(dim=d, cap=64)
    det.add_frame(rng.normal(size=d).astype(np.float32))
    warm_step, warm_slide = det.compile_cache_sizes  # other tests share the cache
    for i in range(499):
        det.add_frame(rng.normal(size=d).astype(np.float32))
    step_n, slide_n = det.compile_cache_sizes
    assert step_n == warm_step, (
        f"boundary step recompiled after warmup: {warm_step} -> {step_n}")
    assert slide_n <= warm_slide + 1, f"slide recompiled: {slide_n}"
    # Fixed-size state: window buffers never grew.
    assert det.cls_buf.shape == (64, d)
    assert det.sims.shape == (63,)
    assert det.n <= 64
    # Absolute indexing survives the slide.
    assert det.base + det.n == 500
    assert det.boundaries()[-1] == 499


def test_streaming_session_state_bounded_across_long_stream(tiny_chat):
    """The session's host-side bookkeeping (frame deque, boundary deque)
    stays bounded over a long stream — the r2 engine's cls_all/boundaries
    lists grew per tick."""
    from videollamb_tpu.serve.incremental import StreamingSession

    tiny_chat.reset()
    sess = StreamingSession(tiny_chat, frame_fps=1.0, max_open_frames=4,
                            max_seq_len=448, max_new_tokens=2)
    t_total = 48
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, size=(t_total, 56, 56, 3)).astype(np.uint8)
    frames[12:24] = 230
    frames[24:36] = 25
    sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
    sess.num_video_frames = t_total
    sess.video_duration = float(t_total)
    for i in range(t_total):
        sess.input_video_stream(float(i))
        sess()
    # frame_times fully drained each tick; boundaries bounded by window.
    assert len(sess.frame_times) == 0
    assert len(sess.boundaries) <= sess._detector.cap + 16


def test_compaction_answers_depend_on_bridge_memory(tiny_chat):
    """VERDICT r2 #8: after _ensure_room compacts the KV context, answers
    must still ROUTE THROUGH the bridge's recurrent memory (the stated
    long-horizon store) — ablating that memory must change the response,
    proving pre-compaction visual history actually feeds the answer."""
    import dataclasses

    from videollamb_tpu.serve.chat import Chat
    from videollamb_tpu.serve.incremental import StreamingSession
    from test_serving import ChatTokenizer

    def run(ablate: bool):
        # Isolated chat per run: the shared fixture's WordTokenizer grows
        # its vocab per tokenized string, so ids (and thus this test's
        # decoded answers) would depend on which tests ran earlier in the
        # module — a fresh tokenizer pins them.
        tok = ChatTokenizer()
        tok("A chat between a curious human and an artificial intelligence "
            "assistant")
        chat = Chat(tok, tiny_chat.params, tiny_chat.cfg,
                    tiny_chat.processors, text_bucket=32)
        # Tiny max_seq_len so compaction fires mid-stream.
        sess = StreamingSession(chat, frame_fps=1.0, max_open_frames=4,
                                max_seq_len=256, max_new_tokens=6)
        t_total = 40
        rng = np.random.default_rng(7)
        frames = rng.integers(0, 255, size=(t_total, 56, 56, 3)).astype(np.uint8)
        frames[8:16] = 240   # distinctive pre-compaction scene
        frames[24:32] = 10
        sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
        sess.num_video_frames = t_total
        sess.video_duration = float(t_total)
        response = None
        for i in range(t_total):
            # Ablate + query only AFTER compaction has fired, while frames
            # are still flowing (queries are served off the frame clock).
            if i == t_total - 3:
                assert sess._compactions > 0, \
                    "stream never compacted; test is vacuous"
                if ablate:
                    sess.bridge_state = sess.bridge_state._replace(
                        memory=jnp.zeros_like(sess.bridge_state.memory),
                        cache=jnp.zeros_like(sess.bridge_state.cache),
                    )
                sess.input_query_stream("what happened at the beginning",
                                        video_time=float(i))
            sess.input_video_stream(float(i))
            q, r = sess()
            if r is not None and "User:" in (q or ""):
                response = r
        assert response is not None
        return response

    real = run(ablate=False)
    ablated = run(ablate=True)
    assert real != ablated, (
        "ablating the bridge memory did not change the post-compaction "
        "answer — pre-compaction history is not feeding responses")


def test_stream_hour_bench_smoke():
    """The hour-scale stream bench (benchmarks/stream_hour.py) runs on the
    tiny config and reports bounded-state evidence: one state shape, open
    frames under the cap, zero detector recompiles after warmup."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from benchmarks.stream_hour import run

    out = run(minutes=0.75, cfg=ModelConfig.tiny(max_length=448), stride=4,
              max_new_tokens=2, query_every_s=20)
    assert out["stream_hour_frames"] == 45
    assert out["stream_hour_state_shapes"] == 1
    assert out["stream_hour_max_open_frames"] <= out["stream_hour_open_cap"]
    assert out["stream_hour_ctx_len"] <= out["stream_hour_ctx_cap"]
    assert out["stream_hour_recompiles_after_warmup"] == 0
    assert out["stream_hour_fps"] > 0


def test_context_never_exceeds_cache_capacity(tiny_chat):
    """Capacity invariant (round-5 fix): kv.length must NEVER exceed the
    allocated max_seq_len, including during compaction rebuilds. The r4
    rebuild replayed all recent_segments with _ensure_room disabled (the
    re-entrancy guard), so at production shapes kv.length reached
    3531/2048 — llama_extend's mode='drop' silently discarded the
    overflow while the mask kept attending never-written slots. This
    drives a stream whose retained segments + system + tail exceed the
    cap so the budgeted replay is what keeps the invariant."""
    from videollamb_tpu.serve.incremental import StreamingSession

    tiny_chat.reset()
    # Cap chosen so ~2 segments fit but the 4-deep recent_segments deque
    # plus system + tail does NOT: tiny segments carry 8 valid tokens and
    # the system preamble 24, so 56 = system + headroom + ~3 segments —
    # the 4-deep deque (32 tokens) forces the budgeted replay to drop.
    sess = StreamingSession(tiny_chat, frame_fps=1.0, max_open_frames=4,
                            max_seq_len=56, max_new_tokens=4)
    t_total = 48
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, size=(t_total, 56, 56, 3)).astype(np.uint8)
    frames[12:24] = 235
    frames[30:40] = 15
    sess.video_tensor = tiny_chat.processors["VIDEO"](frames)
    sess.num_video_frames = t_total
    sess.video_duration = float(t_total)
    for i in range(t_total):
        if i in (20, 40):
            sess.input_query_stream("what is happening", video_time=float(i))
        sess.input_video_stream(float(i))
        sess()
        assert sess.context_length + sess.max_new_tokens <= sess.max_seq_len, (
            f"tick {i}: context {sess.context_length} + headroom exceeds "
            f"cap {sess.max_seq_len}")
    assert sess._compactions > 0, "stream never compacted; test is vacuous"
    # At least one budgeted rebuild must have DROPPED a segment (the state
    # where the unbudgeted r4 replay silently overflowed) — counted by the
    # session itself, since the deque is pruned within the same tick.
    assert sess._compaction_drops > 0, (
        "no rebuild ever dropped a segment — the budgeted-drop path was "
        "not exercised; shrink max_seq_len")
