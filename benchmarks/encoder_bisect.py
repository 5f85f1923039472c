"""Per-op attribution of the ViT-L encoder layer time at batch 256.

encode_fps has been stuck at ~452 f/s (~24.6 ms/layer at batch 256)
against a ~680 f/s essential-FLOP ceiling (~16.3 ms/layer at the measured
139 TF/s). This bench bisects one encoder layer into cumulative variants
and prints ms/layer for each, attributing the gap to: the temporal
branch (kernel + its two transposes), the spatial attention core, layer
norms, and the GEMMs themselves (vs an ideal same-shape einsum chain).

Chained distinct inputs + one readback (tunnel-cache safe).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from videollamb_tpu.config import VisionConfig
from videollamb_tpu.models.vision.clip_vit import (
    _clip_attention,
    _dense,
    _encoder_layer,
    _layer_norm,
    init_vision_params,
)
from videollamb_tpu.models.bridge.layers import _act

B_VIDEOS, T, N, D = 32, 8, 257, 1024
N_LAYERS = 23


def layer_variant(cfg: VisionConfig, mode: str):
    """mode: full | old_temporal | no_temporal | no_spatial_core |
    gemms_only | no_ln."""

    def ln(p, x):
        if mode == "no_ln":
            return x
        return _layer_norm(p, x, cfg.layer_norm_eps)

    def layer(p, x, time_window):
        bt, n, d = x.shape
        if mode == "old_temporal" and cfg.add_time_attn:
            # The r1-r4 production path: (b,n,t,d) packed core behind an
            # explicit transpose pair. Kept to attribute the frame-major
            # core's win (full vs old_temporal = the transposes killed).
            t = time_window
            b = bt // t
            from videollamb_tpu.ops.temporal_attention import temporal_attention

            x_bntd = x.reshape(b, t, n, d).transpose(0, 2, 1, 3)
            y = temporal_attention(
                x_bntd, p["temporal_embedding"], p["temporal_layer_norm1"],
                p["temporal_attn"], cfg.num_attention_heads,
                cfg.layer_norm_eps)
            x = y.transpose(0, 2, 1, 3).reshape(bt, n, d)
        elif mode not in ("no_temporal", "gemms_only") and cfg.add_time_attn:
            # Live path (clip_vit._encoder_layer): frame-major core, zero
            # relayouts.
            t = time_window
            b = bt // t
            from videollamb_tpu.ops.temporal_attention import (
                temporal_attention_fm,
            )

            y = temporal_attention_fm(
                x.reshape(b, t, n, d), p["temporal_embedding"],
                p["temporal_layer_norm1"], p["temporal_attn"],
                cfg.num_attention_heads, cfg.layer_norm_eps)
            x = y.reshape(bt, n, d)
        elif mode == "gemms_only":
            # Temporal branch GEMM cost without the kernel/transposes.
            h = ln(p["temporal_layer_norm1"], x)
            ta = p["temporal_attn"]
            q = _dense(ta["q_proj"], h)
            k = _dense(ta["k_proj"], h)
            v = _dense(ta["v_proj"], h)
            x = x + _dense(ta["out_proj"], q + k * 0 + v * 0)

        residual = x
        h = ln(p["layer_norm1"], x)
        if mode in ("no_spatial_core", "gemms_only"):
            sa = p["self_attn"]
            q = _dense(sa["q_proj"], h)
            k = _dense(sa["k_proj"], h)
            v = _dense(sa["v_proj"], h)
            h = _dense(sa["out_proj"], q + k * 0 + v * 0)
        else:
            h = _clip_attention(p["self_attn"], h, cfg.num_attention_heads)
        x = residual + h
        residual = x
        h = ln(p["layer_norm2"], x)
        h = _act(cfg.hidden_act, _dense(p["mlp"]["fc1"], h))
        h = _dense(p["mlp"]["fc2"], h)
        return residual + h

    return layer


def main():
    cfg = VisionConfig()
    params = init_vision_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    jax.block_until_ready(params)
    layers = params["layers"][:N_LAYERS]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *layers)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B_VIDEOS * T, N, D),
                           jnp.bfloat16)

    out = {}
    modes = ("full", "old_temporal", "no_temporal", "no_spatial_core",
             "gemms_only", "no_ln")
    for mode in modes:
        layer = layer_variant(cfg, mode)

        @jax.jit
        def run(stacked, x, s):
            x = x + s * jnp.bfloat16(1e-3)

            def body(hidden, lp):
                return layer(lp, hidden, T), None

            x, _ = jax.lax.scan(body, x, stacked)
            return jnp.sum(x.astype(jnp.float32))

        s = run(stacked, x0, jnp.bfloat16(0))
        float(s)  # compile + warm
        # Best of 3 timing rounds: the first execution(s) after a remote
        # Mosaic compile can stall 1-10 s (executable finalization), which
        # a single warm call does not reliably absorb — it inflated the
        # round-5 first bisect by +10 ms/layer on the freshly compiled
        # mode. Chained distinct inputs, one readback per round.
        n = 4
        best = None
        for r in range(3):
            t0 = time.perf_counter()
            for j in range(n):
                s = run(stacked, x0,
                        s.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
                        + jnp.bfloat16(r * n + j))
            float(s)
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        ms = best / n / N_LAYERS * 1000
        out[f"{mode}_ms_per_layer"] = round(ms, 2)
        print(json.dumps({mode: out[f"{mode}_ms_per_layer"]}), flush=True)

    # Ideal same-shape GEMM chain: 4x (M,1024)@(1024,1024) [temporal qkv+o]
    # + 4x spatial + fc1/fc2 — the essential-FLOP floor at these shapes.
    m = B_VIDEOS * T * N
    w1 = jax.random.normal(jax.random.PRNGKey(2), (D, D), jnp.bfloat16)
    wup = jax.random.normal(jax.random.PRNGKey(3), (D, 4 * D), jnp.bfloat16)
    wdn = jax.random.normal(jax.random.PRNGKey(4), (4 * D, D), jnp.bfloat16)

    @jax.jit
    def ideal(x, s):
        x = x.reshape(m, D) + s * jnp.bfloat16(1e-3)

        def body(h, _):
            for _ in range(8):  # qkv+o for temporal and spatial
                h = jnp.dot(h, w1, preferred_element_type=jnp.bfloat16)
            hh = jnp.dot(h, wup, preferred_element_type=jnp.bfloat16)
            h = jnp.dot(hh, wdn, preferred_element_type=jnp.bfloat16)
            return h, None

        h, _ = jax.lax.scan(body, x, None, length=N_LAYERS)
        return jnp.sum(h.astype(jnp.float32))

    s = ideal(x0, jnp.bfloat16(0))
    float(s)
    n = 4
    best = None
    for r in range(3):
        t0 = time.perf_counter()
        for j in range(n):
            s = ideal(x0, s.astype(jnp.bfloat16) * jnp.bfloat16(1e-9)
                      + jnp.bfloat16(r * n + j))
        float(s)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    out["ideal_gemm_ms_per_layer"] = round(best / n / N_LAYERS * 1000, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
