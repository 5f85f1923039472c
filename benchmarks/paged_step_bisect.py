"""Bisect the paged decode step's device time at the serving-load shape.

Builds jitted k-step scans with parts of paged_decode_step disabled and
chains distinct inputs (tunnel-cache safe) to attribute per-step time to:
weights (GEMMs), paged attention reads, and fresh-KV pool writes.
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
import numpy as np

from videollamb_tpu.config import LlamaConfig
from videollamb_tpu.models.lm.llama import (
    _final,
    _lproj,
    _rms_norm,
    apply_rope,
    embed_tokens,
    init_llama_params,
    rope_cos_sin_cfg,
)
from videollamb_tpu.models.lm.quant import quantize_llama_params
from videollamb_tpu.models.lm.paged import init_paged_cache
from videollamb_tpu.ops.gathered_paged_attention import _pick_ppb
from videollamb_tpu.ops.gathered_paged_attention import (
    gathered_paged_attention_int8,
)
from videollamb_tpu.ops.paged_attention_stats import merge_one_token

B, K_STEPS = 8, 4
PAGE = 64


def step_variant(params, cfg, cache, mode: str, total_pages: int):
    """One decode step with parts disabled. mode in
    {'full', 'noattn', 'nowrite', 'min'}."""
    page, pps = PAGE, cache.pages_per_seq
    h, h_kv, dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)
    groups = h // h_kv
    scale = dh**-0.5
    kp, vp, kp_s, vp_s = (cache.k_pages, cache.v_pages, cache.k_scales,
                          cache.v_scales)
    ppb = _pick_ppb(pps, page)
    attn_on = mode in ("full", "nowrite", "kwrite")
    write_on = mode in ("full", "noattn", "kwrite")
    kernel_write = mode == "kwrite"

    def one_step(params, token_embeds, kp, vp, kp_s, vp_s, lengths, page_table):
        b = token_embeds.shape[0]
        pos = jnp.minimum(lengths, pps * page - 1)
        rows = jnp.arange(b)
        write_logical = page_table[rows, pos // page]
        write_off = pos % page
        cos, sin = rope_cos_sin_cfg(cfg, pos[:, None])

        def body(hidden, xs):
            l, lp = xs
            normed = _rms_norm(lp["input_layernorm"], hidden,
                               cfg.rms_norm_eps)
            q = _lproj(lp, "q_proj", normed, None).reshape(b, 1, h, dh)
            k = _lproj(lp, "k_proj", normed, None).reshape(b, 1, h_kv, dh)
            v = _lproj(lp, "v_proj", normed, None).reshape(b, 1, h_kv, dh)
            q = apply_rope(q, cos, sin)[:, 0] * scale
            k_new = apply_rope(k, cos, sin)[:, 0]
            v_new = v[:, 0]

            if attn_on:
                sc = jax.lax.dynamic_index_in_dim(kp_s, l, 0, keepdims=False)
                sv = jax.lax.dynamic_index_in_dim(vp_s, l, 0, keepdims=False)
                o_old, m_old, l_old = gathered_paged_attention_int8(
                    q, kp, vp, page_table, pos, sc, sv,
                    pages_per_block=ppb, layer=l)
            else:
                o_old = jnp.zeros((b, h, dh), jnp.float32)
                m_old = jnp.full((b, h), -jnp.inf)
                l_old = jnp.zeros((b, h))
            qg = q.reshape(b, h_kv, groups, dh).astype(jnp.float32)
            s_self = jnp.einsum("bkgd,bkd->bkg", qg,
                                k_new.astype(jnp.float32)).reshape(b, h)
            v_b = jnp.broadcast_to(
                v_new[:, :, None], (b, h_kv, groups, dh)).reshape(b, h, dh)
            attn = merge_one_token(o_old, m_old, l_old, s_self, v_b)
            attn = _lproj(lp, "o_proj",
                          attn.reshape(b, 1, cfg.hidden_size).astype(
                              hidden.dtype), None)
            hidden = hidden + attn
            normed = _rms_norm(lp["post_attention_layernorm"], hidden,
                               cfg.rms_norm_eps)
            gate = jax.nn.silu(
                _lproj(lp, "gate_proj", normed, None).astype(jnp.float32)
            ).astype(hidden.dtype)
            up = _lproj(lp, "up_proj", normed, None)
            hidden = hidden + _lproj(lp, "down_proj", gate * up, None)

            from jax.experimental.pallas.ops.tpu.paged_attention.quantization_utils import (
                get_quantization_scales, to_int8,
            )

            ks = get_quantization_scales(k_new.astype(jnp.float32))
            vs = get_quantization_scales(v_new.astype(jnp.float32))
            k_vals = to_int8(k_new.astype(jnp.float32), ks).astype(
                jnp.int8).reshape(b, h_kv * dh)
            v_vals = to_int8(v_new.astype(jnp.float32), vs).astype(
                jnp.int8).reshape(b, h_kv * dh)
            return hidden, (k_vals, v_vals, ks[..., 0], vs[..., 0])

        n_layers = cfg.num_hidden_layers
        x, fresh = jax.lax.scan(
            body, token_embeds,
            (jnp.arange(n_layers, dtype=jnp.int32), params["layers"]))
        logits = _final(params, cfg, x)[:, 0]

        if write_on:
            k_vals, v_vals, ks, vs = fresh

            def chain(pool, vals):
                for i in range(b):
                    for layer in range(n_layers):
                        upd = vals[layer, i][None, None, None, :]
                        pool = jax.lax.dynamic_update_slice(
                            pool, upd.astype(pool.dtype),
                            (layer, write_logical[i], write_off[i], 0))
                return pool

            if kernel_write:
                from videollamb_tpu.ops.paged_fresh_write import (
                    paged_fresh_write,
                )

                kp2, vp2 = paged_fresh_write(
                    kp, vp, k_vals.astype(jnp.int8), v_vals.astype(jnp.int8),
                    write_logical, write_off)
            else:
                kp2, vp2 = chain(kp, k_vals), chain(vp, v_vals)
            kps2, vps2 = chain(kp_s, ks), chain(vp_s, vs)
        else:
            kp2, vp2, kps2, vps2 = kp, vp, kp_s, vp_s
        return logits, kp2, vp2, kps2, vps2, lengths + 1

    @partial(jax.jit, donate_argnums=(2, 3, 4, 5))
    def k_scan(params, tok, kp_, vp_, kps_, vps_, lengths, page_table):
        def body(carry, _):
            tok, kp_, vp_, kps_, vps_, lengths = carry
            logits, kp_, vp_, kps_, vps_, lengths = one_step(
                params, tok, kp_, vp_, kps_, vps_, lengths, page_table)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            tok = embed_tokens(params, nxt[:, None]).astype(jnp.bfloat16)
            return (tok, kp_, vp_, kps_, vps_, lengths), nxt

        (tok, kp_, vp_, kps_, vps_, lengths), toks = jax.lax.scan(
            body, (tok, kp_, vp_, kps_, vps_, lengths), None,
            length=K_STEPS)
        return toks, kp_, vp_, kps_, vps_, lengths

    return k_scan


def main():
    cfg = LlamaConfig()
    params = init_llama_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    jax.block_until_ready(params)
    params = quantize_llama_params(params)
    jax.block_until_ready(params)

    pps = 32
    total_pages = 1 + B * pps
    rng = np.random.default_rng(0)
    out = {}
    for mode in ("min", "noattn", "nowrite", "full", "kwrite"):
        cache = init_paged_cache(cfg, B, total_pages, PAGE, pps,
                                 jnp.bfloat16, quantize=True)
        # Fill state: lengths mimic the load bench (192 text / ~770 video).
        lengths = jnp.asarray([192, 770, 192, 192, 770, 192, 192, 300],
                              jnp.int32)
        page_table = jnp.asarray(
            rng.permutation(total_pages - 1)[: B * pps].reshape(B, pps) + 1,
            jnp.int32) % total_pages
        fn = step_variant(params, cfg, cache, mode, total_pages)
        tok = jax.random.normal(jax.random.PRNGKey(1),
                                (B, 1, cfg.hidden_size), jnp.bfloat16)
        kp_, vp_, kps_, vps_ = (cache.k_pages, cache.v_pages,
                                cache.k_scales, cache.v_scales)
        toks, kp_, vp_, kps_, vps_, lengths = fn(
            params, tok, kp_, vp_, kps_, vps_, lengths, page_table)  # compile
        jax.block_until_ready(toks)
        n = 6
        per_call = []
        for j in range(n):
            # Distinct input per call + a scalar readback per call — the
            # tunnel replays cached executions for identical (code,
            # inputs) pairs, and only a readback proves the work ran.
            tok_j = tok + jnp.bfloat16(1e-3) * (j + 1)
            t0 = time.perf_counter()
            toks, kp_, vp_, kps_, vps_, lengths = fn(
                params, tok_j, kp_, vp_, kps_, vps_, lengths, page_table)
            int(jnp.sum(toks))
            per_call.append(time.perf_counter() - t0)
        per_call.sort()
        ms = per_call[len(per_call) // 2] / K_STEPS * 1000
        out[f"{mode}_ms_per_step"] = round(ms, 2)
        del cache, kp_, vp_, kps_, vps_
        print(json.dumps({mode: out[f"{mode}_ms_per_step"]}), flush=True)
    out["attn_ms"] = round(out["full_ms_per_step"] - out["noattn_ms_per_step"], 2)
    out["write_ms"] = round(out["full_ms_per_step"] - out["nowrite_ms_per_step"], 2)
    out["kwrite_saves_ms"] = round(
        out["full_ms_per_step"] - out["kwrite_ms_per_step"], 2)
    out["weights_ms"] = out["min_ms_per_step"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
