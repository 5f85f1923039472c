"""Decode-attention shoot-out at the VERDICT r3 #3 shapes.

Compares, per layer-loop step (32 layers, 7B MHA dims), on the real chip:

  - pool-int8 (r3 shared-pool path): every slot attends the WHOLE pool
    (compute ~ B x pool);
  - stock Pallas paged kernel ((1, B, H_kv) matvec grid);
  - gathered int8 kernel (ops/gathered_paged_attention.py): per-slot
    page gather in-kernel, all heads in one MXU matmul per block.

Shapes: the two concession shapes from docs/PERFORMANCE.md item 6
(24 slots x 3072 ctx, 8 x 3072) plus the serving sweet spots
(8 x 512, 24 x 512).

    python benchmarks/paged_attention_bench.py

Prints one JSON line {shape: {path: ms_per_32layer_step}}.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H = H_KV = 32
DH = 128
PAGE = 64
LAYERS = 32


def _mk_case(rng, b, ctx, page=PAGE):
    pps = -(-ctx // page)
    pps = (pps + 3) // 4 * 4  # kernel block divisibility
    p_total = 1 + b * pps
    kd = H_KV * DH
    k_tm = jnp.asarray(rng.integers(-127, 128, size=(p_total, page, kd)),
                       jnp.int8)
    v_tm = jnp.asarray(rng.integers(-127, 128, size=(p_total, page, kd)),
                       jnp.int8)
    ks = jnp.asarray(rng.uniform(0.5, 2.0, size=(p_total, page, H_KV)),
                     jnp.float32)
    vs = jnp.asarray(rng.uniform(0.5, 2.0, size=(p_total, page, H_KV)),
                     jnp.float32)
    table = np.full((b, pps), 0, np.int32)
    nxt = 1
    for i in range(b):
        for j in range(pps):
            table[i, j] = nxt
            nxt += 1
    lengths = jnp.full((b,), ctx, jnp.int32)
    q = jnp.asarray(rng.normal(size=(b, H, DH)), jnp.float32) * 0.08
    return q, k_tm, v_tm, jnp.asarray(table), lengths, ks, vs, p_total, pps


def _layer_loop(fn):
    """32 chained calls (q perturbed by the previous output so the tunnel
    can't replay a cached execution)."""

    @jax.jit
    def run(q, *args):
        def body(carry, _):
            o, m, l = fn(carry, *args)
            return carry + o.astype(carry.dtype) * 1e-6, jnp.sum(l)
        out, ls = jax.lax.scan(body, q, None, length=LAYERS)
        return jnp.sum(out) + jnp.sum(ls)

    return run


def _time(run, q, args, reps=5):
    # TWO warmups: the first real execution after a remote Mosaic compile
    # stalls ~1-10 s (executable finalization through the tunnel) — one
    # warmup call is not enough, and averaging over a stalled rep reports
    # 5-60x the steady-state time. Median of the timed reps for the same
    # reason.
    out = run(q, *args)
    float(out)
    out = run(q + out * 1e-9, *args)
    float(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = run(q + out * 1e-9, *args)
        float(out)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] * 1000  # ms


def main() -> dict:
    from videollamb_tpu.ops.gathered_paged_attention import (
        _pick_ppb,
        gathered_paged_attention_int8,
    )
    from videollamb_tpu.ops.paged_attention_stats import (
        attend_pool_int8_stats,
        paged_attention_with_stats,
    )
    from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
        QuantizedTensor,
    )

    from videollamb_tpu.ops.gathered_paged_attention import (
        attend_token_major_int8_stats,
    )

    rng = np.random.default_rng(0)
    out = {}
    shapes = ((8, 512), (24, 512), (8, 3072), (24, 3072))
    if os.environ.get("PAB_SHAPES"):  # e.g. "8x1024,8x1536,24x1536"
        shapes = tuple(tuple(map(int, s.split("x")))
                       for s in os.environ["PAB_SHAPES"].split(","))
    for b, ctx in shapes:
        q, k_tm, v_tm, table, lengths, ks, vs, p_total, pps = _mk_case(
            rng, b, ctx)
        case = {}

        ppb = _pick_ppb(pps, PAGE)
        gk = _layer_loop(functools.partial(
            lambda qq, kp, vp, tb, ln, kss, vss: gathered_paged_attention_int8(
                qq, kp, vp, tb, ln, kss, vss, pages_per_block=ppb)))
        case["gathered_kernel_ms"] = round(
            _time(gk, q, (k_tm, v_tm, table, lengths, ks, vs)), 2)

        # The token-major XLA twin (transpose adapter + pool-int8) — the
        # dispatcher's short-context path.
        tw = _layer_loop(lambda qq, kp, vp, tb, ln, kss, vss:
                         attend_token_major_int8_stats(
                             qq, kp, vp, tb, ln, kss, vss))
        case["token_major_twin_ms"] = round(
            _time(tw, q, (k_tm, v_tm, table, lengths, ks, vs)), 2)

        # pool-int8 needs the head-major layout.
        kp_hm = k_tm.reshape(p_total, PAGE, H_KV, DH).transpose(2, 0, 1, 3)
        vp_hm = v_tm.reshape(p_total, PAGE, H_KV, DH).transpose(2, 0, 1, 3)
        ks_hm = ks.transpose(2, 0, 1)[..., None]
        vs_hm = vs.transpose(2, 0, 1)[..., None]
        pi = _layer_loop(lambda qq, kp, vp, tb, ln, kss, vss:
                         attend_pool_int8_stats(qq, kp, vp, tb, ln, kss, vss))
        case["pool_int8_ms"] = round(
            _time(pi, q, (kp_hm, vp_hm, table, lengths, ks_hm, vs_hm)), 2)

        block = 8
        while pps % block:
            block //= 2
        sk = _layer_loop(lambda qq, kp, vp, tb, ln, kss, vss:
                         paged_attention_with_stats(
                             qq, QuantizedTensor(kp, kss),
                             QuantizedTensor(vp, vss), ln, tb,
                             pages_per_compute_block=block))
        try:
            case["stock_kernel_ms"] = round(
                _time(sk, q, (kp_hm, vp_hm, table, lengths, ks_hm, vs_hm)), 2)
        except Exception as e:  # noqa: BLE001
            case["stock_kernel_ms"] = f"error: {e}"
        out[f"{b}x{ctx}"] = case
        print(f"{b}x{ctx}: {case}", flush=True)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
