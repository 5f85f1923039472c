"""Batch serving CLI: drive the continuous-batching engines from JSONL.

Reference has no batch-serving surface (one request at a time through
``llava.serve.cli``); this exposes the slot engines (serve/server.py,
serve/paged.py) as a deployment entry point:

    python -m videollamb_tpu.serve.batch_cli \
        --model-path <ckpt> --requests in.jsonl --output out.jsonl \
        --paged --quantize-kv --num-slots 8

Each input line: {"id": ..., "prompt": ..., "video": <path, optional>,
"image": <path, optional>, "max_new_tokens": ..., "temperature": ...}.
Each output line: {"id": ..., "text": ..., "tokens": N}.
"""

from __future__ import annotations

import argparse
import json
from typing import Any, Dict, List


def _sampling_controls(row: Dict[str, Any]) -> Dict[str, Any]:
    """Optional sampling-control row fields -> Request kwargs
    (logit_bias / presence_penalty / frequency_penalty / min_tokens /
    top_k; see serve/server.Request)."""
    out: Dict[str, Any] = {}
    if row.get("logit_bias"):
        out["logit_bias"] = {int(t): float(b)
                             for t, b in row["logit_bias"].items()}
    for key, cast in (("presence_penalty", float),
                      ("frequency_penalty", float),
                      ("min_tokens", int), ("top_k", int)):
        if row.get(key):
            out[key] = cast(row[key])
    return out


def build_requests(lines: List[Dict[str, Any]], chat) -> List[Any]:
    """Host-side preprocessing: conversation template + media -> Requests
    (one fresh conversation per request, reference cli.py prompt assembly).

    Optional row fields beyond the module docstring's schema:
      "history": [[user, assistant], ...] — prior turns appended before the
          prompt (multi-turn chat over the stateless engines; the OpenAI
          /v1/chat/completions route builds these rows);
      "system": replaces the conversation template's system prompt;
      "raw": true — no template at all, the prompt is tokenized verbatim
          (OpenAI /v1/completions semantics; text-only).
    """
    import jax.numpy as jnp
    import numpy as np

    from videollamb_tpu.constants import DEFAULT_X_TOKEN
    from videollamb_tpu.models.assembly import MultimodalBatch

    reqs = []
    from videollamb_tpu.serve.server import Request

    from videollamb_tpu.data.media import load_media_blocks

    for row in lines:
        # Constrained decoding: "choices": ["A", "B", ...] on a row pins
        # the output to one of the strings (serve/constrained.py).
        choice_ids = None
        if row.get("choices"):
            from videollamb_tpu.serve.constrained import tokenize_choice

            choice_ids = [tokenize_choice(chat.tokenizer, c)
                          for c in row["choices"]]
        # Grammar-constrained decoding: "response_format": "json_object"
        # guarantees the output parses as a JSON object (serve/grammar.py);
        # {"type": "json_schema", "schema": {...}} additionally enforces
        # the schema (serve/schema.py — OpenAI structured outputs).
        grammar = None
        fmt = row.get("response_format")
        if isinstance(fmt, dict):
            if fmt.get("type") == "tool_call":
                # Forced tool calling (serve/tools.py): the alternation of
                # the tools' call schemas.
                from videollamb_tpu.serve.schema import alternation_constraint

                grammar = alternation_constraint(chat.tokenizer,
                                                 fmt["schemas"])
            elif fmt.get("type") == "regex":
                # Regex-constrained decoding (serve/regex_grammar.py):
                # the output full-matches the pattern, budget-closed.
                from videollamb_tpu.serve.regex_grammar import regex_constraint

                grammar = regex_constraint(chat.tokenizer, fmt["regex"])
            else:
                from videollamb_tpu.serve.schema import schema_constraint

                grammar = schema_constraint(chat.tokenizer, fmt["schema"])
        elif fmt:
            from videollamb_tpu.serve.grammar import json_constraint

            grammar = json_constraint(chat.tokenizer, mode=fmt)
        if row.get("raw"):
            if any(row.get(k) for k in ("video", "image", "audio")):
                raise ValueError("'raw' rows are text-only (no template to "
                                 "place media tags in)")
            ids_list = chat.tokenizer(row["prompt"]).input_ids
            t = max(chat.text_bucket,
                    -(-len(ids_list) // chat.text_bucket) * chat.text_bucket)
            ids = np.zeros((1, t), np.int32)
            mask = np.zeros((1, t), np.int32)
            ids[0, : len(ids_list)] = ids_list
            mask[0, : len(ids_list)] = 1
            reqs.append(Request(
                uid=row.get("id"),
                batch=MultimodalBatch(
                    input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
                    labels=None, videos=None, images=None),
                max_new_tokens=int(row.get("max_new_tokens", 128)),
                temperature=float(row.get("temperature", 0.0)),
                adapter=row.get("adapter"),
                choices=choice_ids,
                grammar=grammar,
                logprobs=bool(row.get("logprobs")),
                top_logprobs=int(row.get("top_logprobs", 0)),
                **_sampling_controls(row),
            ))
            continue
        # Load every medium the row names, in (video, image, audio) order —
        # a row with 2+ media becomes ONE mixed-modality request whose k-th
        # prompt tag binds block k (reference multi-X request assembly,
        # llava/eval/model_videoqa_act.py:117-120). AUDIO is the WAV ->
        # log-mel fbank extension (scripts/finetune_audio.sh recipe).
        media = [
            (m, jnp.asarray(px, chat._dtype()))
            for m, px in load_media_blocks(
                {"VIDEO": row.get("video"), "IMAGE": row.get("image"),
                 "AUDIO": row.get("audio")},
                chat.processors, strict=True)
        ]

        chat.reset()
        if row.get("system") is not None:
            chat.conv.system = row["system"]
        if row.get("system_suffix"):
            # Tool definitions etc. append to whatever system prompt is in
            # effect (template default or the row's override).
            chat.conv.system = (chat.conv.system or "") + row["system_suffix"]
        history = row.get("history") or []
        question = row["prompt"]
        # Prepend one tag per medium not already placed in the prompt text
        # (or in a prior turn — multi-turn rows may have bound the medium
        # when it was first shown).
        seen = question + "".join(u + (a or "") for u, a in history)
        for modality, _ in reversed(media):
            if DEFAULT_X_TOKEN[modality] not in seen:
                question = DEFAULT_X_TOKEN[modality] + "\n" + question
        for user_msg, assistant_msg in history:
            chat.conv.append_message(chat.conv.roles[0], user_msg)
            chat.conv.append_message(chat.conv.roles[1], assistant_msg)
        chat.conv.append_message(chat.conv.roles[0], question)
        chat.conv.append_message(chat.conv.roles[1], None)

        videos = images = blocks = None
        if len(media) >= 2:
            ids, mask, tag_order = chat._prepare_multi_ids(chat.conv.get_prompt())
            by_mod = dict(media)
            if sorted(tag_order) != sorted(by_mod):
                raise ValueError(
                    f"request {row.get('id')!r}: prompt tags {tag_order} do "
                    f"not match the attached media {sorted(by_mod)} — remove "
                    "stray <image>/<video>/<audio> tags or attach the file")
            blocks = tuple((m, by_mod[m]) for m in tag_order)
        else:
            modality = media[0][0] if media else None
            ids, mask = chat._prepare_ids(chat.conv.get_prompt(),
                                          modality or "IMAGE")
            if modality == "VIDEO":
                videos = media[0][1][None]
            elif modality in ("IMAGE", "AUDIO"):
                images = media[0][1][None]
        batch = MultimodalBatch(
            input_ids=jnp.asarray(ids), attention_mask=jnp.asarray(mask),
            labels=None, videos=videos, images=images, blocks=blocks,
        )
        prefix_kw: Dict[str, Any] = {}
        if row.get("shared_prefix"):
            # Automatic prefix caching (paged engine): split the tokenized
            # prompt AFTER the last media sentinel — system + history +
            # media become the (engine-cached, content-hashed) prefix
            # batch, the question tail a text-only suffix. Splitting the
            # token-id ARRAY (not the prompt string) keeps BPE boundaries
            # exact: prefix KV never depends on suffix tokens.
            if not media:
                raise ValueError(
                    f"request {row.get('id')!r}: 'shared_prefix' needs "
                    "attached media (the shared part is system + media)")
            ids_np = np.asarray(batch.input_ids)
            valid = int(np.asarray(batch.attention_mask).sum())
            sentinels = np.nonzero(ids_np[0, :valid] < 0)[0]
            p = int(sentinels[-1]) + 1
            prefix_kw["prefix_batch"] = MultimodalBatch(
                input_ids=jnp.asarray(ids_np[:, :p]),
                attention_mask=jnp.ones((1, p), jnp.int32),
                labels=None, videos=videos, images=images, blocks=blocks,
            )
            sfx = ids_np[0, p:valid]
            t = max(chat.text_bucket,
                    -(-len(sfx) // chat.text_bucket) * chat.text_bucket)
            sids = np.zeros((1, t), np.int32)
            smask = np.zeros((1, t), np.int32)
            sids[0, : len(sfx)] = sfx
            smask[0, : len(sfx)] = 1
            batch = MultimodalBatch(
                input_ids=jnp.asarray(sids),
                attention_mask=jnp.asarray(smask),
                labels=None, videos=None, images=None,
            )
        reqs.append(Request(
            uid=row.get("id"),
            batch=batch,
            max_new_tokens=int(row.get("max_new_tokens", 128)),
            temperature=float(row.get("temperature", 0.0)),
            adapter=row.get("adapter"),
            choices=choice_ids,
            grammar=grammar,
            logprobs=bool(row.get("logprobs")),
            top_logprobs=int(row.get("top_logprobs", 0)),
            **prefix_kw,
            **_sampling_controls(row),
        ))
    return reqs


def serve_requests(engine, requests, tokenizer, k: int = 8):
    for r in requests:
        engine.submit(r)
    done = engine.run_until_drained(k=k)
    out = []
    for r in done:
        text = tokenizer.decode(r.tokens, skip_special_tokens=True)
        out.append({"id": r.uid, "text": text.strip(), "tokens": len(r.tokens)})
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model-path", required=True)
    parser.add_argument("--model-base", default=None)
    parser.add_argument("--requests", required=True, help="input JSONL")
    parser.add_argument("--output", required=True, help="output JSONL")
    parser.add_argument("--num-slots", type=int, default=4)
    parser.add_argument("--paged", action="store_true",
                        help="paged KV pool (serve/paged.py) instead of "
                             "dense per-slot strips")
    parser.add_argument("--page-size", type=int, default=64)
    parser.add_argument("--quantize-kv", action="store_true",
                        help="int8 KV pages (paged engine only)")
    parser.add_argument("--prefix-cache-size", type=int, default=8,
                        help="max automatically cached prompt prefixes "
                             "(paged engine; 'shared_prefix' rows)")
    parser.add_argument("--load-8bit", action="store_true")
    parser.add_argument("--device-preprocess", action="store_true",
                        help="resize/normalize video frames on the TPU "
                             "(benchmarks/ingest_bench.py)")
    parser.add_argument("--sync-every", type=int, default=8,
                        help="device-side decode steps between host syncs")
    args = parser.parse_args(argv)

    from videollamb_tpu.models.builder import load_pretrained_model
    from videollamb_tpu.serve.chat import Chat

    tokenizer, params, cfg, processors, _ = load_pretrained_model(
        args.model_path, model_base=args.model_base, load_8bit=args.load_8bit,
        device_preprocess=args.device_preprocess,
    )
    chat = Chat(tokenizer, params, cfg, processors)

    if args.paged:
        from videollamb_tpu.serve.paged import PagedServingEngine

        engine = PagedServingEngine(
            params, cfg, num_slots=args.num_slots, page_size=args.page_size,
            quantize_kv=args.quantize_kv,
            eos_token_id=int(tokenizer.eos_token_id or 2),
        )
    else:
        from videollamb_tpu.serve.server import ServingEngine

        engine = ServingEngine(
            params, cfg, num_slots=args.num_slots,
            eos_token_id=int(tokenizer.eos_token_id or 2),
        )

    with open(args.requests) as f:
        lines = [json.loads(l) for l in f if l.strip()]
    reqs = build_requests(lines, chat)
    out = serve_requests(engine, reqs, tokenizer, k=args.sync_every)
    with open(args.output, "w") as f:
        for row in out:
            f.write(json.dumps(row) + "\n")
    print(f"served {len(out)} requests -> {args.output}")


if __name__ == "__main__":
    main()
