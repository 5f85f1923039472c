"""Parity dress rehearsal: torch reference vs this framework, one command.

Environment blocks the released VideoLLaMB-7B weights (zero egress), so
real-weight parity cannot run here. This script converts that from
"blocked" into "one scp away" (VERDICT r2 #4): it exercises the ENTIRE
checkpoint-to-greedy-tokens path on both stacks with seeded random
weights in the reference's own on-disk format:

  (a) build a reference-format checkpoint: a local LanguageBind video
      tower dir + a LlavaLlamaForCausalLM checkpoint dir (config.json +
      pytorch_model.bin, fp16) + a tokenizer, all torch-seeded;
  (b) run the torch reference's OWN model classes on it
      (llava.model.LlavaLlamaForCausalLM.generate with X/X_modalities —
      the llava/serve/cli.py:25-111 protocol), greedy on CPU;
  (c) load the same checkpoint dir through videollamb_tpu
      (models/builder.load_pretrained_model) and run our greedy engine;
  (d) assert token-for-token equality.

Deviations from a byte-level `python -m llava.serve.cli` run, all forced
by this environment and listed in RUNBOOK.md: video decode is bypassed
(decord is absent — both sides get the SAME preprocessed pixel tensor),
the torch stack runs via scripts/reference_shims.py package stubs, and
weights are fp16-saved/f32-computed on both sides. With real weights on
a machine that has decord, replace build_checkpoint() with the released
checkpoint path and the same comparison runs unchanged.

Usage:  python scripts/parity_rehearsal.py [--max-new 12] [--keep DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from reference_shims import install_reference_shims  # noqa: E402

# Tiny-but-real dims: 2-layer ViT tower, rmt_r bridge, 2-layer Llama.
VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=28, patch_size=14,
              num_frames=8, add_time_attn=True, force_patch_dropout=0.0)
LM = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
          num_hidden_layers=2, num_attention_heads=4,
          num_key_value_heads=4, max_position_embeddings=512)


def build_tokenizer(ckpt_dir: str):
    """A tiny self-contained BPE tokenizer in HF-fast format (no hub)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2, "<pad>": 3}
    words = ("a chat between curious human and an artificial intelligence "
             "assistant the gives helpful detailed polite answers to "
             "questions user what is happening in this video describe it "
             ". : ' s").split()
    for w in words:
        vocab.setdefault(w, len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.,:'?!<>/\\-_0123456789":
        vocab.setdefault(ch, len(vocab))
    # Pad to exactly the LM vocab so the reference's
    # resize_token_embeddings(len(tokenizer)) (builder.py:163) is a no-op
    # instead of truncating the logits the JAX side still sees.
    i = 0
    while len(vocab) < LM["vocab_size"]:
        vocab.setdefault(f"<extra_{i}>", len(vocab))
        i += 1
    tok = Tokenizer(models.WordPiece(vocab, unk_token="<unk>",
                                     max_input_chars_per_word=64))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A", pair="<s> $A $B",
        special_tokens=[("<s>", 1)],
    )
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="<s>", eos_token="</s>",
        unk_token="<unk>", pad_token="<pad>", model_max_length=512,
    )
    fast.save_pretrained(ckpt_dir)
    return fast


def build_checkpoint(root: str):
    """Seeded reference-format checkpoint (tower dir + llava dir)."""
    import torch

    from llava.model.multimodal_encoder.languagebind.video.configuration_video import (
        LanguageBindVideoConfig,
    )
    from llava.model.multimodal_encoder.languagebind.video.modeling_video import (
        LanguageBindVideo,
    )
    from llava.model.language_model.llava_llama import (
        LlavaConfig,
        LlavaLlamaForCausalLM,
    )

    # Dir name must contain "LanguageBind_Video_merge": the reference's
    # tower factory dispatches on the NAME (multimodal_encoder/builder.py
    # :54-56), even for local paths.
    tower_dir = os.path.join(root, "LanguageBind_Video_merge")
    ckpt_dir = os.path.join(root, "checkpoint")

    tower_cfg = LanguageBindVideoConfig(
        text_config={"hidden_size": 16, "intermediate_size": 32,
                     "num_hidden_layers": 1, "num_attention_heads": 2},
        vision_config=dict(VISION),
    )
    tower_cfg.vision_config._attn_implementation = "eager"
    torch.manual_seed(0)
    tower = LanguageBindVideo(tower_cfg).eval()
    tower.save_pretrained(tower_dir, safe_serialization=False)
    # save_pretrained nests our dims under vision_config already.

    llava_cfg = LlavaConfig(
        **LM,
        mm_video_tower=tower_dir,
        mm_projector_type="rmt_r_transformer1x",
        mm_hidden_size=VISION["hidden_size"],
        mm_vision_select_layer=-2,
        mm_vision_select_feature="patch",
        mm_use_x_start_end=False,
        mm_use_x_patch_token=False,
        # Bridge (rmt_r projector) dims, reference config surface:
        mm_num_attention_heads=4,
        mm_intermediate_size=64,
        mm_hidden_act="gelu",
        mm_layer_norm_eps=1e-12,
        mm_hidden_dropout_prob=0.0,
        mm_attention_probs_dropout_prob=0.0,
        X=["VIDEO"],
        num_frames=VISION["num_frames"],
        tokenizer_model_max_length=512,
    )
    llava_cfg._attn_implementation = "eager"
    torch.manual_seed(1)
    model = LlavaLlamaForCausalLM(llava_cfg).eval()
    model.half()  # fp16 on disk: both sides round identically, compute f32
    model.save_pretrained(ckpt_dir, safe_serialization=False)
    build_tokenizer(ckpt_dir)
    return tower_dir, ckpt_dir


def make_prompt():
    from llava.constants import DEFAULT_X_TOKEN
    from llava.conversation import conv_templates

    conv = conv_templates["llava_v1"].copy()
    conv.append_message(conv.roles[0],
                        DEFAULT_X_TOKEN["VIDEO"] + "\n" + "what is happening")
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def torch_greedy(ckpt_dir: str, tower_dir: str, pixels, max_new: int):
    """Greedy tokens from the reference stack (llava/serve/cli.py:79-101
    generate protocol; builder.py:119-195 load steps, f32 on CPU)."""
    import torch

    from llava.constants import X_TOKEN_INDEX
    from llava.mm_utils import tokenizer_x_token
    from llava.model.language_model.llava_llama import LlavaLlamaForCausalLM
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(ckpt_dir, use_fast=True)
    model = LlavaLlamaForCausalLM.from_pretrained(
        ckpt_dir, torch_dtype=torch.float32, low_cpu_mem_usage=True).eval()
    video_tower = model.get_video_tower()
    if not video_tower.is_loaded:
        video_tower.load_model()
    video_tower.to(dtype=torch.float32)
    model.resize_token_embeddings(len(tokenizer))

    def set_eager(cfg):
        # Modern transformers dispatches attention through
        # config._attn_implementation, which round-trips as None through
        # the vendored configs.
        cfg._attn_implementation = "eager"
        for sub in ("vision_config", "text_config"):
            if hasattr(cfg, sub) and getattr(cfg, sub) is not None:
                set_eager(getattr(cfg, sub))

    set_eager(model.config)
    for mod in model.modules():
        if hasattr(mod, "config") and hasattr(mod.config, "_attn_implementation"):
            set_eager(mod.config)

    prompt = make_prompt()
    input_ids = tokenizer_x_token(
        prompt, tokenizer, X_TOKEN_INDEX["VIDEO"], return_tensors="pt"
    ).unsqueeze(0)
    video = torch.from_numpy(pixels)  # (C, T, H, W) — processor output shape
    with torch.inference_mode():
        out = model.generate(
            input_ids,
            X=[video], X_modalities=["VIDEO"], X_sizes=[None],
            do_sample=False, max_new_tokens=max_new, use_cache=True,
            cache_position=None,
        )
    return out[0].tolist(), prompt


def jax_greedy(ckpt_dir: str, tower_dir: str, pixels, max_new: int):
    """Greedy tokens from this framework on the SAME checkpoint dir."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videollamb_tpu.constants import X_TOKEN_INDEX
    from videollamb_tpu.mm_utils import tokenizer_x_token
    from videollamb_tpu.models.assembly import MultimodalBatch
    from videollamb_tpu.models.builder import load_pretrained_model
    from videollamb_tpu.models.engine import generate

    tokenizer, params, cfg, _, _ = load_pretrained_model(
        ckpt_dir, video_tower_path=tower_dir, dtype="float32")
    prompt = make_prompt()
    ids = tokenizer_x_token(prompt, tokenizer, X_TOKEN_INDEX["VIDEO"],
                            return_tensors="np")[None]
    batch = MultimodalBatch(
        input_ids=jnp.asarray(ids),
        attention_mask=jnp.ones_like(jnp.asarray(ids)),
        labels=None,
        videos=jnp.asarray(pixels.transpose(1, 0, 2, 3))[None],  # (1,T,C,H,W)
        images=None,
    )
    eos = int(tokenizer.eos_token_id)
    result = generate(
        params, cfg, batch, jax.random.PRNGKey(0),
        max_new_tokens=max_new, do_sample=False, eos_token_id=eos,
        pad_token_id=int(tokenizer.pad_token_id or 0),
        max_seq_len=cfg.max_length + 64,
    )
    n = int(result.lengths[0])
    return np.asarray(result.tokens[0][:n]).tolist(), eos


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--max-new", type=int, default=12)
    parser.add_argument("--keep", default=None,
                        help="build into this dir and keep it")
    parser.add_argument("--ckpt", default=None,
                        help="existing reference-format checkpoint dir "
                             "(e.g. released VideoLLaMB-7B) instead of the "
                             "seeded-random build")
    parser.add_argument("--tower", default=None,
                        help="LanguageBind video tower dir (with --ckpt)")
    parser.add_argument("--video", default=None,
                        help="real video file; decoded once with our "
                             "reader and fed to BOTH sides")
    args = parser.parse_args(argv)

    # This sandbox pre-imports jax targeting the TPU tunnel AND exports
    # JAX_PLATFORMS=axon; the rehearsal is a CPU cross-check (torch CPU vs
    # XLA:CPU), so FORCE cpu — direct assignment plus a live-config update
    # before any backend initializes (same technique as tests/conftest.py).
    # Override with VIDEOLLAMB_REHEARSAL_PLATFORM to run the JAX side on a
    # real accelerator (expect bf16-vs-f32 drift on long generations).
    platform = os.environ.get("VIDEOLLAMB_REHEARSAL_PLATFORM", "cpu")
    os.environ["JAX_PLATFORMS"] = platform
    import jax

    jax.config.update("jax_platforms", platform)

    install_reference_shims()
    import numpy as np

    root_ctx = (tempfile.TemporaryDirectory() if args.keep is None else None)
    root = args.keep or root_ctx.name
    os.makedirs(root, exist_ok=True)

    if args.ckpt:
        tower_dir, ckpt_dir = args.tower, args.ckpt
    else:
        tower_dir, ckpt_dir = build_checkpoint(root)
    t, s = VISION["num_frames"], VISION["image_size"]
    if args.video:
        from videollamb_tpu.data.processing import VideoProcessor
        from videollamb_tpu.data.video_reader import load_video

        raw = load_video(args.video, num_frames=t)
        pixels = np.asarray(
            VideoProcessor(size=s)(raw)).transpose(1, 0, 2, 3)  # (C,T,H,W)
    else:
        rng = np.random.default_rng(7)
        pixels = rng.normal(size=(3, t, s, s)).astype(np.float32) * 0.5

    ref_out, prompt = torch_greedy(ckpt_dir, tower_dir, pixels, args.max_new)
    ours, eos = jax_greedy(ckpt_dir, tower_dir, pixels, args.max_new)

    # The reference returns prompt-stripped new tokens (generate with
    # inputs_embeds path returns only generated ids for Llava); normalize
    # both to the generated suffix, truncated at the first EOS.
    def gen_suffix(toks):
        if eos in toks:
            toks = toks[: toks.index(eos)]
        return toks

    ref_gen = gen_suffix(ref_out)
    our_gen = gen_suffix(ours)
    report = {
        "prompt": prompt,
        "reference_tokens": ref_gen,
        "videollamb_tpu_tokens": our_gen,
        "match": ref_gen == our_gen,
    }
    print(json.dumps(report))
    if root_ctx is not None:
        root_ctx.cleanup()
    if not report["match"]:
        raise SystemExit(1)
    return report


if __name__ == "__main__":
    main()
