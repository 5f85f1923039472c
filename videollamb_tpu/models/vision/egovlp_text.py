"""EgoVLP text branch: RoBERTa encoder, dual-encoder projections, the
FIBER-style fusion heads (ITM / MLM), and retrieval metrics.

Reference: llava/model/multimodal_encoder/egovlp/model/{roberta.py (941
LoC — a vendored HF RoBERTa with cross-attention fusion bolted into the
last ``num_fuse_block`` layers), model.py:44-574 (FrozenInTime: txt/vid
projection MLPs, compute_text/compute_video, the ITM and MLM fusion
forwards), heads.py (Pooler/ITMHead/MLMHead), metric.py (t2v/v2t
retrieval + EgoMCQ accuracy)}. The vendored stack cannot import here
(hard timm dependency, cwd-relative yaml reads, a hardcoded /cis/home
checkpoint path); this is a from-scratch JAX implementation of the same
math. Like the reference factory entry (multimodal_encoder/builder.py:
56-58, commented out), it is an optional component — the video tower in
egovlp.py is the piece the LLaVA path consumes.

Design notes (TPU-first):
- the RoBERTa stack runs as ONE ``lax.scan`` over the unfused layers and
  one over the fused layers (stacked parameter pytrees — one compiled
  layer body each, not 12 inlined copies);
- attention is einsum-based with f32 scores; post-LN residual order
  follows the reference exactly (self-attn dense -> optional gated
  cross-attn -> LN(+residual) -> FFN -> LN);
- the text->video fusion gate alpha_t2i and the video->text gate
  alpha_i2t (egovlp.py::_i2t_cross) are zero-initialized scalars, so a
  freshly initialized fusion stack computes exactly the unfused stacks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.models.vision.egovlp import (
    EgoVLPConfig,
    _block,
    _linear,
    _ln,
)

Params = Dict[str, Any]
NEG_INF = -1e9


@dataclass(frozen=True)
class RobertaTextConfig:
    """roberta-base defaults + the EgoNCE_MLM_ITM_Config.yml fusion
    settings (vocab 50265, hidden 768, 12 layers/heads, mlp_ratio 4,
    num_fuse_block 6, input_image_embed_size 768)."""

    vocab_size: int = 50265
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    mlp_ratio: int = 4
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    num_fuse_block: int = 6
    dim_img: int = 768  # video hidden size feeding cross-attn k/v
    projection_dim: int = 4096  # FrozenInTime 'minimal' projection

    @property
    def intermediate_size(self) -> int:
        return self.hidden_size * self.mlp_ratio

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def create_position_ids(input_ids: jax.Array, pad_id: int) -> jax.Array:
    """RoBERTa's padding-aware position ids (roberta.py
    create_position_ids_from_input_ids): non-pad tokens count up from
    pad_id + 1; pad positions stay at pad_id."""
    mask = (input_ids != pad_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_id


def roberta_embed(p: Params, cfg: RobertaTextConfig,
                  input_ids: jax.Array) -> jax.Array:
    pos_ids = create_position_ids(input_ids, cfg.pad_token_id)
    x = (p["word_embeddings"][input_ids]
         + p["position_embeddings"][pos_ids]
         + p["token_type_embeddings"][0][None, None])
    return _ln(p["LayerNorm"], x, cfg.layer_norm_eps)


def _mha(q_in: jax.Array, kv_in: jax.Array, p: Params, h: int, e: int,
         bias: Optional[jax.Array]) -> jax.Array:
    """Standard multi-head attention; q from q_in, k/v from kv_in.
    ``bias`` is (b, 1, 1, n_kv) additive (0 valid / NEG_INF pad)."""
    b, nq, _ = q_in.shape
    nk = kv_in.shape[1]
    q = _linear(p["query"], q_in).reshape(b, nq, h, e)
    k = _linear(p["key"], kv_in).reshape(b, nk, h, e)
    v = _linear(p["value"], kv_in).reshape(b, nk, h, e)
    s = jnp.einsum("bihe,bjhe->bhij", q, k,
                   preferred_element_type=jnp.float32) * (e**-0.5)
    if bias is not None:
        s = s + bias
    pr = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhij,bjhe->bihe", pr, v,
                   preferred_element_type=jnp.float32).astype(q_in.dtype)
    return o.reshape(b, nq, h * e)


def _roberta_layer(lp: Params, cfg: RobertaTextConfig, x: jax.Array,
                   bias: jax.Array, video: Optional[jax.Array] = None,
                   last_norm: bool = True) -> jax.Array:
    """One post-LN RoBERTa layer (roberta.py RobertaLayer.forward):
    self-attn dense (NO LayerNorm inside SelfOutput — the vendored
    variant defers it), optional alpha-gated t2i cross-attention over
    the video stream, LN(+residual), FFN, LN(+residual) if last_norm."""
    h, e = cfg.num_attention_heads, cfg.head_dim
    ctx = _mha(x, x, lp["attention"], h, e, bias)
    attn_out = _linear(lp["attention"]["output"], ctx)
    if video is not None:
        cross_ctx = _mha(attn_out, video, lp["crossattention_t2i"], h, e,
                         bias=None)  # video tokens are all valid (model.py
        # passes encoder_attention_mask=None on both fusion paths)
        cross_out = _linear(lp["crossattention_t2i"]["output"], cross_ctx)
        alpha = lp["alpha_t2i"].astype(jnp.float32).astype(x.dtype)
        attn_out = alpha * cross_out + attn_out
    x = _ln(lp["attention"]["LayerNorm"], attn_out + x, cfg.layer_norm_eps)
    ff = _linear(lp["output"],
                 jax.nn.gelu(_linear(lp["intermediate"], x), approximate=False))
    out = ff + x
    if last_norm:
        out = _ln(lp["output_LayerNorm"], out, cfg.layer_norm_eps)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def roberta_encode(params: Params, cfg: RobertaTextConfig,
                   input_ids: jax.Array, attention_mask: jax.Array,
                   video: Optional[jax.Array] = None) -> jax.Array:
    """(B, L) ids -> (B, L, D) final hidden states.

    With ``video`` (B, N_v, dim_img), the last num_fuse_block layers run
    the alpha_t2i-gated cross-attention over it — the text half of the
    FIBER fusion (model.py:251-270). Without it, this is plain roberta
    (compute_text's path, model.py:491-505)."""
    x = roberta_embed(params["embeddings"], cfg, input_ids)
    bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF
                     ).astype(jnp.float32)[:, None, None, :]

    def unfused_body(hidden, lp):
        return _roberta_layer(lp, cfg, hidden, bias), None

    x, _ = jax.lax.scan(unfused_body, x, params["layers"])
    if params.get("fuse_layers") is not None:
        def fused_body(hidden, lp):
            return _roberta_layer(lp, cfg, hidden, bias, video=video), None

        x, _ = jax.lax.scan(fused_body, x, params["fuse_layers"])
    return x


def apply_projection(p: Params, x: jax.Array) -> jax.Array:
    """FrozenInTime 'minimal' projection (model.py:104-114): Linear(no
    bias) -> ReLU -> Linear -> ReLU -> Linear, 768 -> 4096 -> 4096."""
    y = jnp.einsum("...d,dk->...k", x, p["fc0"]["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jax.nn.relu(y)
    y = jax.nn.relu(_linear(p["fc1"], y))
    return _linear(p["fc2"], y)


def compute_text(params: Params, cfg: RobertaTextConfig,
                 input_ids: jax.Array, attention_mask: jax.Array,
                 tokens: bool = False) -> jax.Array:
    """roberta -> CLS (or all tokens) -> txt_proj (model.py:491-522).
    The dual-encoder text embedding for EgoNCE retrieval."""
    hid = roberta_encode(params["text_model"], cfg, input_ids, attention_mask)
    feats = hid if tokens else hid[:, 0]
    return apply_projection(params["txt_proj"], feats)


def compute_video_embed(params: Params, video_cls: jax.Array) -> jax.Array:
    """vid_proj over the space-time transformer CLS feature
    (model.py:524-530; the tower itself is egovlp.egovlp_encode)."""
    return apply_projection(params["vid_proj"], video_cls)


def sim_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Cosine similarity matrix (model.py:576-584)."""
    a_n = jnp.linalg.norm(a, axis=1, keepdims=True)
    b_n = jnp.linalg.norm(b, axis=1, keepdims=True)
    a = a / jnp.maximum(a_n, eps)
    b = b / jnp.maximum(b_n, eps)
    return a @ b.T


def pooler(p: Params, x: jax.Array) -> jax.Array:
    return jnp.tanh(_linear(p["dense"], x))


def itm_score(p: Params, cls_feats: jax.Array) -> jax.Array:
    return _linear(p["fc"], cls_feats)


def mlm_score(p: Params, cfg: RobertaTextConfig, x: jax.Array) -> jax.Array:
    """BertPredictionHeadTransform (dense+gelu+LN) then the vocab
    decoder + bias (heads.py MLMHead)."""
    x = jax.nn.gelu(_linear(p["transform"]["dense"], x), approximate=False)
    x = _ln(p["transform"]["LayerNorm"], x, cfg.layer_norm_eps)
    logits = jnp.einsum("...d,vd->...v", x,
                        p["decoder"]["kernel"].astype(x.dtype),
                        preferred_element_type=jnp.float32)
    return logits + p["bias"].astype(jnp.float32)


@partial(jax.jit, static_argnames=("vcfg", "tcfg", "mode"))
def fusion_forward(params: Params, vcfg: EgoVLPConfig,
                   tcfg: RobertaTextConfig, pixels: jax.Array,
                   input_ids: jax.Array, attention_mask: jax.Array,
                   mode: str = "itm") -> jax.Array:
    """The FIBER dual-stream fusion (model.py ITM :205-331 / MLM
    :333-366): both stacks run their unfused prefix independently, then
    the last num_fuse_block layers exchange — each video block
    cross-attends the CURRENT text state (alpha_i2t gate) while each
    text layer cross-attends the PREVIOUS video state (alpha_t2i gate;
    the reference feeds layer t2i the pre-fusion video tensor of the
    same index — video_data_itm is only overwritten AFTER the text
    layer runs).

    mode 'itm' -> (B, 2) matched/unmatched logits from the concatenated
    pooled CLS features; mode 'mlm' -> (B, L, vocab) logits over every
    text position."""
    f = pixels.shape[1]
    from videollamb_tpu.models.vision.egovlp import egovlp_embed_patches

    x_vid = egovlp_embed_patches(params["video"], pixels, vcfg)
    x_txt = roberta_embed(params["text_model"]["embeddings"], tcfg, input_ids)
    bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF
                     ).astype(jnp.float32)[:, None, None, :]
    # i2t needs the (b, n_text) additive form.
    y_bias = jnp.where(attention_mask.astype(bool), 0.0, NEG_INF
                       ).astype(jnp.float32)

    def vid_unfused(hidden, lp):
        return _block(lp, hidden, vcfg, f), None

    def txt_unfused(hidden, lp):
        return _roberta_layer(lp, tcfg, hidden, bias), None

    x_vid, _ = jax.lax.scan(vid_unfused, x_vid, params["video"]["blocks"])
    x_txt, _ = jax.lax.scan(txt_unfused, x_txt, params["text_model"]["layers"])

    def fused_body(carry, lps):
        vid, txt = carry
        vlp, tlp = lps
        new_vid = _block(vlp, vid, vcfg, f, y=txt, y_bias=y_bias)
        new_txt = _roberta_layer(tlp, tcfg, txt, bias, video=vid)
        return (new_vid, new_txt), None

    (x_vid, x_txt), _ = jax.lax.scan(
        fused_body, (x_vid, x_txt),
        (params["video"]["fuse_blocks"], params["text_model"]["fuse_layers"]))

    if mode == "mlm":
        txt_tokens = apply_transform_to_hidden(params, tcfg, x_txt)
        return mlm_score(params["mlm_head"], tcfg, txt_tokens)

    vid_cls = _ln(params["video"]["norm"], x_vid, vcfg.layer_norm_eps)[:, 0]
    txt_cls = x_txt[:, 0]
    txt_c = _linear(params["cross_modal_text_transform"], txt_cls)
    vid_c = _linear(params["cross_modal_video_transform"], vid_cls)
    cls_feats = jnp.concatenate(
        [pooler(params["cross_modal_text_pooler"], txt_c),
         pooler(params["cross_modal_video_pooler"], vid_c)], axis=-1)
    return itm_score(params["itm_head"], cls_feats)


def apply_transform_to_hidden(params: Params, tcfg: RobertaTextConfig,
                              x_txt: jax.Array) -> jax.Array:
    """MLM path projects EVERY text token through
    cross_modal_text_transform before scoring (model.py:360-366)."""
    return _linear(params["cross_modal_text_transform"], x_txt)


# ---------------------------------------------------------------------------
# Initialization / HF weight conversion
# ---------------------------------------------------------------------------

def _dense(key, din, dout, dtype, std=0.02):
    return {"kernel": jax.random.normal(key, (din, dout), dtype) * std,
            "bias": jnp.zeros((dout,), dtype)}


def _ln_p(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _layer_params(key, cfg: RobertaTextConfig, dtype, fused: bool) -> Params:
    d, inter = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 8)
    lp = {
        "attention": {
            "query": _dense(ks[0], d, d, dtype),
            "key": _dense(ks[1], d, d, dtype),
            "value": _dense(ks[2], d, d, dtype),
            "output": _dense(ks[3], d, d, dtype),
            "LayerNorm": _ln_p(d, dtype),
        },
        "intermediate": _dense(ks[4], d, inter, dtype),
        "output": _dense(ks[5], inter, d, dtype),
        "output_LayerNorm": _ln_p(d, dtype),
    }
    if fused:
        lp["crossattention_t2i"] = {
            "query": _dense(ks[6], d, d, dtype),
            "key": _dense(ks[7], cfg.dim_img, d, dtype),
            "value": _dense(jax.random.fold_in(ks[7], 1), cfg.dim_img, d, dtype),
            "output": _dense(jax.random.fold_in(ks[6], 1), d, d, dtype),
        }
        lp["alpha_t2i"] = jnp.zeros((), dtype)
    return lp


def init_roberta_params(rng: jax.Array, cfg: RobertaTextConfig,
                        dtype=jnp.float32, fusion: bool = True) -> Params:
    """Text-model tree: embeddings + stacked unfused layers + stacked
    fused layers (separate stacks so each scans with its own body)."""
    n_fuse = cfg.num_fuse_block if fusion else 0
    n_plain = cfg.num_hidden_layers - n_fuse
    ks = jax.random.split(rng, cfg.num_hidden_layers + 2)
    d = cfg.hidden_size

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees) if trees else None

    return {
        "embeddings": {
            "word_embeddings": jax.random.normal(
                ks[0], (cfg.vocab_size, d), dtype) * 0.02,
            "position_embeddings": jax.random.normal(
                ks[1], (cfg.max_position_embeddings, d), dtype) * 0.02,
            "token_type_embeddings": jnp.zeros((cfg.type_vocab_size, d), dtype),
            "LayerNorm": _ln_p(d, dtype),
        },
        "layers": stack([_layer_params(ks[2 + i], cfg, dtype, fused=False)
                         for i in range(n_plain)]),
        "fuse_layers": stack([
            _layer_params(ks[2 + n_plain + i], cfg, dtype, fused=True)
            for i in range(n_fuse)]),
    }


def init_egovlp_text_params(rng: jax.Array, tcfg: RobertaTextConfig,
                            vcfg: Optional[EgoVLPConfig] = None,
                            dtype=jnp.float32) -> Params:
    """Full FrozenInTime tree minus the video tower (which lives in
    egovlp.init_egovlp_params under 'video'): text model, projections,
    fusion transforms, poolers, ITM/MLM heads."""
    d, pd = tcfg.hidden_size, tcfg.projection_dim
    ks = jax.random.split(rng, 12)

    def proj(key, din):
        k0, k1, k2 = jax.random.split(key, 3)
        return {"fc0": {"kernel": jax.random.normal(k0, (din, pd), dtype) * 0.02},
                "fc1": _dense(k1, pd, pd, dtype),
                "fc2": _dense(k2, pd, pd, dtype)}

    return {
        "text_model": init_roberta_params(ks[0], tcfg, dtype),
        "txt_proj": proj(ks[1], d),
        "vid_proj": proj(ks[2], (vcfg or EgoVLPConfig()).hidden_size),
        "cross_modal_text_transform": _dense(ks[3], d, d, dtype),
        "cross_modal_video_transform": _dense(ks[4], tcfg.dim_img, d, dtype),
        "cross_modal_text_pooler": {"dense": _dense(ks[5], d, d, dtype)},
        "cross_modal_video_pooler": {"dense": _dense(ks[6], d, d, dtype)},
        "itm_head": {"fc": _dense(ks[7], 2 * d, 2, dtype)},
        "mlm_head": {
            "transform": {"dense": _dense(ks[8], d, d, dtype),
                          "LayerNorm": _ln_p(d, dtype)},
            "decoder": {"kernel": jax.random.normal(
                ks[9], (tcfg.vocab_size, d), dtype) * 0.02},
            "bias": jnp.zeros((tcfg.vocab_size,), dtype),
        },
    }


def init_fusion_video_params(rng: jax.Array, vcfg: EgoVLPConfig,
                             tcfg: RobertaTextConfig,
                             dtype=jnp.float32) -> Params:
    """Video-side tree for fusion_forward: the plain tower blocks split
    into a stacked unfused prefix and a stacked fused suffix whose
    attention carries the i2t cross params (qkv_text_i2t / qkv_i2t /
    proj_i2t / norm_i2t_i / alpha_i2t, zero-gated at init —
    video_transformer.py:108-115)."""
    from videollamb_tpu.models.vision.egovlp import init_egovlp_params

    base = init_egovlp_params(rng, vcfg, dtype=dtype)
    d = vcfg.hidden_size
    n_fuse = tcfg.num_fuse_block
    blocks = base.pop("blocks")
    ks = jax.random.split(jax.random.fold_in(rng, 99), n_fuse)

    def add_i2t(lp, key):
        k0, k1, k2 = jax.random.split(key, 3)
        lp = dict(lp)
        lp["attn"] = dict(lp["attn"])
        lp["attn"].update({
            "qkv_text_i2t": _dense(k0, tcfg.hidden_size, 2 * d, dtype),
            "qkv_i2t": _dense(k1, d, d, dtype),
            "proj_i2t": _dense(k2, d, d, dtype),
            "norm_i2t_i": _ln_p(d, dtype),
            "alpha_i2t": jnp.zeros((), dtype),
        })
        return lp

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

    base["blocks"] = stack(blocks[: len(blocks) - n_fuse])
    base["fuse_blocks"] = stack([add_i2t(lp, ks[i]) for i, lp in
                                 enumerate(blocks[len(blocks) - n_fuse:])])
    return base


def convert_roberta_state_dict(sd, cfg: RobertaTextConfig,
                               prefix: str = "") -> Params:
    """HF ``RobertaModel`` state dict -> our text-model tree. Kernels
    transpose (torch Linear stores (out, in)); embedding tables copy.
    EgoVLP checkpoints prefix the same names with 'text_model.'."""
    import numpy as _np

    def t(name):
        return jnp.asarray(_np.asarray(sd[prefix + name]).T)

    def c(name):
        return jnp.asarray(_np.asarray(sd[prefix + name]))

    def lin(name):
        return {"kernel": t(name + ".weight"), "bias": c(name + ".bias")}

    def lnp(name):
        return {"scale": c(name + ".weight"), "bias": c(name + ".bias")}

    def layer(i, fused):
        b = f"encoder.layer.{i}."
        lp = {
            "attention": {
                "query": lin(b + "attention.self.query"),
                "key": lin(b + "attention.self.key"),
                "value": lin(b + "attention.self.value"),
                "output": lin(b + "attention.output.dense"),
                "LayerNorm": lnp(b + "attention.output.LayerNorm"),
            },
            "intermediate": lin(b + "intermediate.dense"),
            "output": lin(b + "output.dense"),
            "output_LayerNorm": lnp(b + "output.LayerNorm"),
        }
        if fused:
            if prefix + b + "crossattention_t2i.self.query.weight" in sd:
                lp["crossattention_t2i"] = {
                    "query": lin(b + "crossattention_t2i.self.query"),
                    "key": lin(b + "crossattention_t2i.self.key"),
                    "value": lin(b + "crossattention_t2i.self.value"),
                    "output": lin(b + "crossattention_t2i.output.dense"),
                }
                lp["alpha_t2i"] = c(b + "alpha_t2i").reshape(())
            else:  # plain HF checkpoint: fusion params start at zero gate
                d = cfg.hidden_size
                lp["crossattention_t2i"] = {
                    "query": {"kernel": jnp.zeros((d, d)), "bias": jnp.zeros((d,))},
                    "key": {"kernel": jnp.zeros((cfg.dim_img, d)), "bias": jnp.zeros((d,))},
                    "value": {"kernel": jnp.zeros((cfg.dim_img, d)), "bias": jnp.zeros((d,))},
                    "output": {"kernel": jnp.zeros((d, d)), "bias": jnp.zeros((d,))},
                }
                lp["alpha_t2i"] = jnp.zeros(())
        return lp

    n_plain = cfg.num_hidden_layers - cfg.num_fuse_block

    def stack(trees):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *trees) if trees else None

    return {
        "embeddings": {
            "word_embeddings": c("embeddings.word_embeddings.weight"),
            "position_embeddings": c("embeddings.position_embeddings.weight"),
            "token_type_embeddings": c("embeddings.token_type_embeddings.weight"),
            "LayerNorm": lnp("embeddings.LayerNorm"),
        },
        "layers": stack([layer(i, False) for i in range(n_plain)]),
        "fuse_layers": stack([layer(n_plain + i, True)
                              for i in range(cfg.num_fuse_block)]),
    }


# ---------------------------------------------------------------------------
# Retrieval metrics (metric.py) — numpy, eval-side
# ---------------------------------------------------------------------------

def _cols2metrics(cols: np.ndarray, num_queries: int) -> Dict[str, float]:
    metrics = {}
    for k in (1, 5, 10, 50):
        metrics[f"R{k}"] = 100 * float(np.sum(cols < k)) / num_queries
    metrics["MedR"] = float(np.median(cols)) + 1
    metrics["MeanR"] = float(np.mean(cols)) + 1
    metrics["geometric_mean_R1-R5-R10"] = float(
        np.exp(np.mean(np.log([max(metrics["R1"], 1e-12),
                               max(metrics["R5"], 1e-12),
                               max(metrics["R10"], 1e-12)]))))
    return metrics


def t2v_metrics(sims: np.ndarray) -> Dict[str, float]:
    """Text->video retrieval over an (N_text, N_vid) similarity matrix
    with tie-averaged ranks (metric.py:26-131; queries_per_video texts
    map to each video in order)."""
    sims = np.asarray(sims)
    num_queries, num_vids = sims.shape
    dists = -sims
    sorted_dists = np.sort(dists, axis=1)
    qpv = num_queries // num_vids
    gt_dists = np.stack([dists[i, i // qpv] for i in range(num_queries)]
                        )[:, None]
    rows, cols = np.where((sorted_dists - gt_dists) == 0)
    if rows.size > num_queries:  # ties: average the tied rank positions
        cols = np.array([np.mean(cols[rows == i]) for i in range(num_queries)])
    return _cols2metrics(cols, num_queries)


def v2t_metrics(sims: np.ndarray) -> Dict[str, float]:
    """Video->text retrieval: for each video take the BEST-ranked of its
    ground-truth captions (metric.py:134-223, VSE-style)."""
    sims = np.asarray(sims).T  # (num_vids, num_caps)
    num_queries, num_caps = sims.shape
    dists = -sims
    qpv = num_caps // num_queries
    ranks = []
    for i in range(num_queries):
        order = np.argsort(dists[i])  # ascending distance
        gt_mask = np.zeros(num_caps, bool)
        gt_mask[i * qpv: (i + 1) * qpv] = True
        ranks.append(int(np.nonzero(gt_mask[order])[0][0]))
    return _cols2metrics(np.asarray(ranks), num_queries)


def egomcq_accuracy_metrics(preds: np.ndarray, labels: np.ndarray,
                            types: np.ndarray) -> Dict[str, float]:
    """EgoMCQ inter/intra-video accuracy (metric.py:225-243): argmax of
    each 5-way similarity row vs the label, grouped by question type."""
    preds, labels, types = map(np.asarray, (preds, labels, types))
    out = {}
    for type_i, group in zip(np.unique(types), ("Inter-video", "Intra-video")):
        sel = types == type_i
        correct = (np.argmax(preds[sel], axis=1) == labels[sel]).sum()
        out[group] = 100.0 * float(correct) / max(1, int(sel.sum()))
    return out
