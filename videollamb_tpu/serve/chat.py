"""High-level chat wrapper: load once, answer multimodal prompts.

Counterpart of the reference serve stack (llava/serve/cli.py:25-111 REPL and
gradio_utils.py:51-120 Chat): conversation template -> tokenizer_x_token ->
multimodal generate -> stop-string trim. Text lengths are padded to bucket
multiples so XLA compiles a handful of prefill shapes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from videollamb_tpu.config import ModelConfig
from videollamb_tpu.constants import DEFAULT_X_TOKEN, X_TOKEN_INDEX
from videollamb_tpu.conversation import SeparatorStyle, conv_templates
from videollamb_tpu.mm_utils import (
    KeywordStopper,
    tokenizer_multi_x_token,
    tokenizer_x_token,
)
from videollamb_tpu.models.assembly import MultimodalBatch
from videollamb_tpu.models.engine import generate


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class Chat:
    def __init__(self, tokenizer, params: Dict[str, Any], cfg: ModelConfig,
                 processors: Dict[str, Any], conv_mode: str = "llava_v1",
                 text_bucket: int = 64):
        self.tokenizer = tokenizer
        self.params = params
        self.cfg = cfg
        self.processors = processors
        self.conv_mode = conv_mode
        self.text_bucket = text_bucket
        self.conv = conv_templates[conv_mode].copy()

    def reset(self) -> None:
        self.conv = conv_templates[self.conv_mode].copy()

    def stop_str(self) -> str:
        return (self.conv.sep if self.conv.sep_style != SeparatorStyle.TWO
                else self.conv.sep2)

    def _prepare_ids(self, prompt: str, modality: str) -> np.ndarray:
        ids = tokenizer_x_token(prompt, self.tokenizer, X_TOKEN_INDEX[modality],
                                return_tensors="np")
        t = _round_up(len(ids), self.text_bucket)
        out = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        out[0, : len(ids)] = ids
        mask[0, : len(ids)] = 1
        return out, mask

    def _prepare_multi_ids(self, prompt: str):
        """Mixed-modality prompt -> (ids, mask, modalities): every
        <image>/<video>/<audio> tag becomes its own sentinel, in prompt
        order (mm_utils.tokenizer_multi_x_token)."""
        ids, modalities = tokenizer_multi_x_token(
            prompt, self.tokenizer, return_tensors="np")
        t = _round_up(len(ids), self.text_bucket)
        out = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        out[0, : len(ids)] = ids
        mask[0, : len(ids)] = 1
        return out, mask, modalities

    def generate_text(
        self,
        prompt: str,
        *,
        videos: Optional[np.ndarray] = None,  # (T, C, H, W)
        images: Optional[np.ndarray] = None,  # (C, H, W)
        max_new_tokens: int = 512,
        temperature: float = 0.2,
        do_sample: bool = True,
        seed: int = 0,
    ) -> str:
        modality = "VIDEO" if videos is not None else "IMAGE"
        ids, mask = self._prepare_ids(prompt, modality)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            labels=None,
            videos=jnp.asarray(videos[None], self._dtype()) if videos is not None else None,
            images=jnp.asarray(images[None], self._dtype()) if images is not None else None,
        )
        stopper = KeywordStopper([self.stop_str()], self.tokenizer)
        eos = self.tokenizer.eos_token_id or 2
        result = generate(
            self.params, self.cfg, batch, jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens, do_sample=do_sample,
            temperature=temperature, eos_token_id=int(eos),
            pad_token_id=int(self.tokenizer.pad_token_id or 0),
            max_seq_len=self.cfg.max_length + _round_up(max_new_tokens, 64),
        )
        n = int(result.lengths[0])
        tokens = np.asarray(result.tokens[0][:n]).tolist()
        if tokens and tokens[-1] == eos:
            tokens = tokens[:-1]
        text = self.tokenizer.decode(tokens, skip_special_tokens=True).strip()
        return stopper.trim(text)

    def stream_text(
        self,
        prompt: str,
        *,
        videos: Optional[np.ndarray] = None,
        images: Optional[np.ndarray] = None,
        max_new_tokens: int = 512,
        temperature: float = 0.2,
        do_sample: bool = True,
        seed: int = 0,
    ):
        """Incremental generation: yields the partial decoded text after
        every token (counterpart of the reference TextIteratorStreamer
        path, gradio_demo.py:33-110). Uses the same prefill + cached
        decode-step machinery as generate, but the loop lives on the host
        so the UI can render tokens as they arrive."""
        from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
        from videollamb_tpu.models.lm.llama import (
            embed_tokens,
            init_kv_cache,
            llama_decode_step,
            llama_prefill,
        )

        modality = "VIDEO" if videos is not None else "IMAGE"
        ids, mask = self._prepare_ids(prompt, modality)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            labels=None,
            videos=jnp.asarray(videos[None], self._dtype()) if videos is not None else None,
            images=jnp.asarray(images[None], self._dtype()) if images is not None else None,
        )
        spliced = prepare_multimodal_embeds_fast(self.params, self.cfg, batch)
        cache = init_kv_cache(
            self.cfg.lm, 1, self.cfg.max_length + _round_up(max_new_tokens, 64),
            self._dtype(),
        )
        logits, cache = llama_prefill(
            self.params["lm"], self.cfg.lm, spliced.embeds,
            spliced.attention_mask, cache,
        )
        stopper = KeywordStopper([self.stop_str()], self.tokenizer)
        stop_ids = set(stopper.stop_token_ids())
        eos = int(self.tokenizer.eos_token_id or 2)
        rng = jax.random.PRNGKey(seed)
        toks = []
        for _ in range(max_new_tokens):
            if do_sample and temperature > 0:
                rng, sub = jax.random.split(rng)
                nxt = int(jax.random.categorical(sub, logits[0] / temperature))
            else:
                nxt = int(jnp.argmax(logits[0]))
            if nxt == eos or nxt in stop_ids:
                break
            toks.append(nxt)
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
            trimmed = stopper.trim(text)
            yield trimmed
            if trimmed != text.strip():
                break
            logits, cache = llama_decode_step(
                self.params["lm"], self.cfg.lm,
                embed_tokens(self.params["lm"], jnp.asarray([[nxt]])), cache,
            )

    def generate_speculative(
        self,
        prompt: str,
        *,
        videos: Optional[np.ndarray] = None,
        images: Optional[np.ndarray] = None,
        max_new_tokens: int = 512,
        ngram: int = 3,
        k: int = 8,
        draft_params=None,
        draft_cfg=None,
    ):
        """Greedy generation with speculative decoding (models/
        speculative.py): identical text to greedy generate, fewer forward
        passes. Default is prompt lookup (draft-free; wins when the answer
        reuses prompt phrases). Passing ``draft_params`` switches to
        draft-model speculation — the natural TPU pairing is an int8/int4
        quantized copy of the SAME model (models/lm/quant.py) drafting for
        the bf16 target: it shares this model's multimodal embeds, so any
        hidden-size-compatible draft works. Returns (text, stats)."""
        from videollamb_tpu.mm_utils import tokenizer_x_token
        from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
        from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill
        from videollamb_tpu.models.speculative import (
            speculative_decode,
            speculative_decode_draft,
        )

        modality = "VIDEO" if videos is not None else "IMAGE"
        ids, mask = self._prepare_ids(prompt, modality)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            labels=None,
            videos=jnp.asarray(videos[None], self._dtype()) if videos is not None else None,
            images=jnp.asarray(images[None], self._dtype()) if images is not None else None,
        )
        spliced = prepare_multimodal_embeds_fast(self.params, self.cfg, batch)
        cache = init_kv_cache(
            self.cfg.lm, 1, self.cfg.max_length + _round_up(max_new_tokens, 64),
            self._dtype(),
        )
        logits, cache = llama_prefill(
            self.params["lm"], self.cfg.lm, spliced.embeds,
            spliced.attention_mask, cache,
        )
        stopper = KeywordStopper([self.stop_str()], self.tokenizer)
        if draft_params is not None:
            d_cfg = draft_cfg or self.cfg.lm
            d_cache = init_kv_cache(
                d_cfg, 1, self.cfg.max_length + _round_up(max_new_tokens, 64),
                self._dtype(),
            )
            d_lm = draft_params["lm"] if "lm" in draft_params else draft_params
            _, d_cache = llama_prefill(
                d_lm, d_cfg, spliced.embeds, spliced.attention_mask, d_cache,
            )
            toks, _, _, stats = speculative_decode_draft(
                self.params, self.cfg.lm, cache, logits,
                draft_params=draft_params, draft_cfg=d_cfg, draft_cache=d_cache,
                max_new_tokens=max_new_tokens,
                eos_token_id=int(self.tokenizer.eos_token_id or 2),
                stop_ids=set(stopper.stop_token_ids()),
                k=k,
            )
            text = self.tokenizer.decode(toks, skip_special_tokens=True).strip()
            return stopper.trim(text), stats
        prompt_tokens = tokenizer_x_token(
            prompt, self.tokenizer, X_TOKEN_INDEX[modality], return_tensors="np"
        )
        ctx = [int(t) for t in prompt_tokens if int(t) >= 0]
        toks, _, _, stats = speculative_decode(
            self.params, self.cfg.lm, cache, logits, ctx,
            max_new_tokens=max_new_tokens,
            eos_token_id=int(self.tokenizer.eos_token_id or 2),
            stop_ids=set(stopper.stop_token_ids()),
            ngram=ngram, k=k,
        )
        text = self.tokenizer.decode(toks, skip_special_tokens=True).strip()
        return stopper.trim(text), stats

    def ask_about_video(self, question: str, frames: np.ndarray,
                        first_turn: bool = True, speculative: str = None,
                        draft_params=None, draft_cfg=None,
                        **gen_kwargs) -> str:
        """frames: processed (T, C, H, W). Maintains the conversation.

        ``speculative``: None (plain greedy/sampled generate), 'lookup'
        (prompt-lookup speculation) or 'draft' (draft-model speculation
        with ``draft_params``); both are greedy-exact."""
        if first_turn:
            question = DEFAULT_X_TOKEN["VIDEO"] + "\n" + question
        self.conv.append_message(self.conv.roles[0], question)
        self.conv.append_message(self.conv.roles[1], None)
        prompt = self.conv.get_prompt()
        if speculative:
            answer, _ = self.generate_speculative(
                prompt, videos=frames,
                max_new_tokens=gen_kwargs.get("max_new_tokens", 512),
                draft_params=draft_params if speculative == "draft" else None,
                draft_cfg=draft_cfg,
            )
        else:
            answer = self.generate_text(prompt, videos=frames, **gen_kwargs)
        self.conv.messages[-1][1] = answer
        return answer

    def ask_mixed(self, question: str, blocks, first_turn: bool = True,
                  max_new_tokens: int = 512, temperature: float = 0.0,
                  do_sample: bool = False, seed: int = 0) -> str:
        """Mixed-modality turn: ``blocks`` is an ordered list of
        ("VIDEO"|"IMAGE"|"AUDIO", pixels) — video (T,C,H,W), image/audio
        (C,H,W), already processed. One tag per block is prepended to the
        question (unless the question already places them); the k-th tag
        binds block k through the K-sentinel splice
        (models/assembly.encode_mixed). Reference protocol:
        llava/eval/model_videoqa_act.py:117-120's (X, X_modalities)."""
        if first_turn:
            # Prepend one tag per block BEYOND those already placed in the
            # question (counted per modality, so repeated blocks of one
            # modality each get a sentinel).
            need: Dict[str, int] = {}
            for modality, _ in blocks:
                need[modality] = need.get(modality, 0) + 1
            for modality, _ in reversed(blocks):
                if question.count(DEFAULT_X_TOKEN[modality]) < need[modality]:
                    question = DEFAULT_X_TOKEN[modality] + "\n" + question
        self.conv.append_message(self.conv.roles[0], question)
        self.conv.append_message(self.conv.roles[1], None)
        ids, mask, tag_order = self._prepare_multi_ids(self.conv.get_prompt())
        by_mod: Dict[str, list] = {}
        for modality, px in blocks:
            by_mod.setdefault(modality, []).append(px)
        if sorted(tag_order) != sorted(m for m, _ in blocks):
            raise ValueError(
                f"prompt tags {tag_order} do not match the supplied blocks "
                f"{[m for m, _ in blocks]} — every <image>/<video>/<audio> "
                "tag needs exactly one block of that modality")
        ordered = tuple(
            (m, jnp.asarray(by_mod[m].pop(0), self._dtype())) for m in tag_order)
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            labels=None, videos=None, images=None, blocks=ordered,
        )
        stopper = KeywordStopper([self.stop_str()], self.tokenizer)
        eos = self.tokenizer.eos_token_id or 2
        # The modality strings in ``blocks`` are static jit keys: the fast
        # splice routes them through _encode_mixed_jit, then runs the
        # jitted continuation.
        from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
        from videollamb_tpu.models.engine import generate_spliced

        spliced = prepare_multimodal_embeds_fast(self.params, self.cfg, batch)
        result = generate_spliced(
            self.params, self.cfg, spliced, jax.random.PRNGKey(seed),
            max_new_tokens=max_new_tokens, do_sample=do_sample,
            temperature=temperature, eos_token_id=int(eos),
            pad_token_id=int(self.tokenizer.pad_token_id or 0),
            max_seq_len=self.cfg.max_length + _round_up(max_new_tokens, 64),
        )
        n = int(result.lengths[0])
        tokens = np.asarray(result.tokens[0][:n]).tolist()
        if tokens and tokens[-1] == eos:
            tokens = tokens[:-1]
        answer = stopper.trim(
            self.tokenizer.decode(tokens, skip_special_tokens=True).strip())
        self.conv.messages[-1][1] = answer
        return answer

    def _dtype(self):
        return jnp.bfloat16 if self.cfg.dtype == "bfloat16" else jnp.float32


class KVChatSession:
    """Multi-turn video chat with KV reuse.

    The reference (and ``Chat.ask_about_video``) re-encodes the video and
    re-prefills the WHOLE conversation every turn. Here the video is
    encoded and prefilled once; each later turn extends the running KV
    cache with only the new tokens (llama_extend — same machinery as the
    incremental streaming engine), so per-turn latency is O(new tokens),
    not O(conversation).

    Exactness: the session tracks the raw token ids whose K/V live in the
    cache. Each turn re-tokenizes the full conversation prompt; if the
    cached ids are not an exact prefix (tokenizers may merge across the
    answer/separator boundary), it falls back to a full re-prefill — so
    output always equals the from-scratch greedy chain.
    """

    def __init__(self, chat: Chat, max_new_tokens: int = 512):
        self.chat = chat
        self.max_new_tokens = max_new_tokens
        self.cache = None
        self.logits = None
        self.cached_ids: list = []
        self.frames: Optional[np.ndarray] = None
        self.full_prefills = 0  # diagnostics: how often the fallback ran
        self.extends = 0

    def _ids(self, prompt: str) -> list:
        return [int(t) for t in tokenizer_x_token(
            prompt, self.chat.tokenizer, X_TOKEN_INDEX["VIDEO"],
            return_tensors="np")]

    def _full_prefill(self, ids: list):
        from videollamb_tpu.models.assembly import prepare_multimodal_embeds_fast
        from videollamb_tpu.models.lm.llama import init_kv_cache, llama_prefill

        chat = self.chat
        t = _round_up(len(ids), chat.text_bucket)
        arr = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        arr[0, : len(ids)] = ids
        mask[0, : len(ids)] = 1
        batch = MultimodalBatch(
            input_ids=jnp.asarray(arr), attention_mask=jnp.asarray(mask),
            labels=None,
            videos=jnp.asarray(self.frames[None], chat._dtype()),
            images=None,
        )
        spliced = prepare_multimodal_embeds_fast(chat.params, chat.cfg, batch)
        self.cache = init_kv_cache(
            chat.cfg.lm, 1,
            chat.cfg.max_length + _round_up(self.max_new_tokens, 64),
            chat._dtype(),
        )
        self.logits, self.cache = llama_prefill(
            chat.params["lm"], chat.cfg.lm, spliced.embeds,
            spliced.attention_mask, self.cache,
        )
        self.cached_ids = list(ids)
        self.full_prefills += 1

    def _extend(self, delta: list):
        from videollamb_tpu.models.lm.llama import embed_tokens, llama_extend

        chat = self.chat
        t = _round_up(len(delta), chat.text_bucket)
        arr = np.zeros((1, t), np.int32)
        mask = np.zeros((1, t), np.int32)
        arr[0, : len(delta)] = delta
        mask[0, : len(delta)] = 1
        self.logits, self.cache = llama_extend(
            chat.params["lm"], chat.cfg.lm,
            embed_tokens(chat.params["lm"], jnp.asarray(arr)).astype(
                self.cache.k.dtype),
            jnp.asarray(mask), self.cache,
        )
        self.cached_ids.extend(delta)
        self.extends += 1

    def ask(self, question: str, frames: Optional[np.ndarray] = None,
            max_new_tokens: Optional[int] = None,
            speculative: bool = False) -> str:
        """One greedy turn. ``frames`` (processed (T, C, H, W)) required on
        the first call; later turns reuse the cached video K/V.

        ``speculative=True`` additionally runs prompt-lookup speculation
        over the SAME session cache (models/speculative.py — rollbacks
        shrink ``cache.length``, which composes with the turn diff because
        only committed tokens enter ``cached_ids``)."""
        from videollamb_tpu.models.lm.llama import embed_tokens, llama_decode_step

        chat = self.chat
        if frames is not None:
            self.frames = frames
        first = self.cache is None
        if first:
            assert self.frames is not None, "first turn needs frames"
            question = DEFAULT_X_TOKEN["VIDEO"] + "\n" + question
        chat.conv.append_message(chat.conv.roles[0], question)
        chat.conv.append_message(chat.conv.roles[1], None)
        ids = self._ids(chat.conv.get_prompt())

        if (not first and len(ids) > len(self.cached_ids)
                and ids[: len(self.cached_ids)] == self.cached_ids):
            self._extend(ids[len(self.cached_ids):])
        else:
            self._full_prefill(ids)

        stopper = KeywordStopper([chat.stop_str()], chat.tokenizer)
        stop_ids = set(stopper.stop_token_ids())
        eos = int(chat.tokenizer.eos_token_id or 2)
        budget = max_new_tokens or self.max_new_tokens

        if speculative:
            from videollamb_tpu.models.speculative import speculative_decode

            toks, self.cache, self.logits, _ = speculative_decode(
                chat.params, chat.cfg.lm, self.cache, self.logits,
                [t for t in self.cached_ids if t >= 0],
                max_new_tokens=budget, eos_token_id=eos, stop_ids=stop_ids,
            )
            # Only committed tokens are in the cache (rollbacks shrank
            # length past rejects and the stop token).
            self.cached_ids.extend(toks)
        else:
            toks = []
            logits = self.logits
            for _ in range(budget):
                nxt = int(jnp.argmax(logits[0]))
                if nxt == eos or nxt in stop_ids:
                    break
                toks.append(nxt)
                # Feed the token: its K/V lands in the cache, so it counts
                # as cached context for the next turn's diff.
                logits, self.cache = llama_decode_step(
                    chat.params["lm"], chat.cfg.lm,
                    embed_tokens(chat.params["lm"], jnp.asarray([[nxt]])).astype(
                        self.cache.k.dtype),
                    self.cache,
                )
                self.cached_ids.append(nxt)
            self.logits = logits
        text = chat.tokenizer.decode(toks, skip_special_tokens=True).strip()
        answer = stopper.trim(text)
        chat.conv.messages[-1][1] = answer
        return answer
