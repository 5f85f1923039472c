"""Constrained decoding: restrict generation to a fixed set of choices.

Production serving + MC-eval helper beyond the reference: the reference's
MC drivers ask the model to "answer with the option's letter"
(llava/eval/model_videoqa_mc.py:202-207) and then string-match the free
output — an off-format answer scores wrong even when the model knew the
option. Here a request can carry token-level constraints so the decoder
CANNOT leave the choice set.

Design (host-side, engine-agnostic):
- a :class:`TokenTrie` holds the tokenized choices; each slot carries a
  cursor (trie node) advanced as tokens commit;
- each step the active cursors yield a per-slot boolean vocab mask
  (allowed continuations), applied additively to the logits before
  argmax/sampling — so greedy AND temperature/top-p sampling both stay
  inside the constraint;
- a cursor that reaches a leaf terminates its row (the engine treats it
  like EOS).

The mask ride-along costs one (B, V) bool host->device transfer per step
for batches with constrained rows (~256 KB at V=32k B=8); unconstrained
batches pay nothing — the engines keep their device-side k-step greedy
loop when no constraint is active.

Grammar coverage is deliberately the choice-set case (what the eval
protocol needs); the trie API is the extension point for richer state
machines (JSON grammars etc.).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


class TokenTrie:
    """Prefix trie over token-id sequences."""

    def __init__(self, sequences: Sequence[Sequence[int]]):
        if not sequences:
            raise ValueError("no sequences")
        # node: dict token -> child node index; leaf marked by None entry.
        self.children: List[Dict[int, int]] = [{}]
        self.is_leaf: List[bool] = [False]
        for seq in sequences:
            seq = [int(t) for t in seq]
            if not seq:
                raise ValueError("empty choice sequence")
            node = 0
            for tok in seq:
                nxt = self.children[node].get(tok)
                if nxt is None:
                    nxt = len(self.children)
                    self.children.append({})
                    self.is_leaf.append(False)
                    self.children[node][tok] = nxt
                node = nxt
            self.is_leaf[node] = True

    def allowed(self, node: int) -> List[int]:
        return list(self.children[node].keys())

    def step(self, node: int, token: int) -> Optional[int]:
        """Advance; None if the token is not an allowed continuation."""
        return self.children[node].get(int(token))

    def done(self, node: int) -> bool:
        """A leaf with no continuations ends the row. (A choice that is a
        strict prefix of another keeps decoding until a leaf-with-no-child
        or the engine's budget.)"""
        return self.is_leaf[node] and not self.children[node]


class ChoiceConstraint:
    """Per-request decode state over a TokenTrie."""

    def __init__(self, trie: TokenTrie):
        self.trie = trie
        self.node: Optional[int] = 0  # None after a dead/finished path

    def mask(self, vocab_size: int) -> np.ndarray:
        """(V,) bool — True where the next token is allowed."""
        m = np.zeros((vocab_size,), bool)
        if self.node is not None:
            m[self.trie.allowed(self.node)] = True
        return m

    def advance(self, token: int) -> None:
        if self.node is not None:
            self.node = self.trie.step(self.node, token)

    @property
    def finished(self) -> bool:
        """True when a full choice has been emitted (or the path died —
        only possible if the caller ignored the mask)."""
        return self.node is None or self.trie.done(self.node)


def choices_to_constraint(tokenizer, choices: Sequence[str]) -> ChoiceConstraint:
    """Tokenize choice strings continuation-style (no BOS) into a
    constraint. Tokenizers whose __call__ prepends BOS have it stripped."""
    seqs = []
    for c in choices:
        ids = list(tokenizer(c).input_ids)
        bos = getattr(tokenizer, "bos_token_id", None)
        if bos is not None and ids and ids[0] == bos:
            ids = ids[1:]
        if not ids:
            raise ValueError(f"choice {c!r} tokenizes to nothing")
        seqs.append(ids)
    return ChoiceConstraint(TokenTrie(seqs))


def apply_constraint_masks(
    logits: np.ndarray, slots: Sequence, vocab_size: int
) -> Optional[np.ndarray]:
    """Build the (B, V) additive mask for the current slot set, or None
    when no slot is constrained. ``slots`` holds engine Requests (or None);
    a request participates iff it has a live ``_constraint``."""
    rows = []
    any_active = False
    for r in slots:
        c = getattr(r, "_constraint", None) if r is not None else None
        if c is None or c.node is None:
            rows.append(None)
        else:
            rows.append(c.mask(vocab_size))
            any_active = True
    if not any_active:
        return None
    out = np.zeros((len(slots), vocab_size), np.float32)
    for i, m in enumerate(rows):
        if m is not None:
            out[i, ~m] = -1e30
    return out
