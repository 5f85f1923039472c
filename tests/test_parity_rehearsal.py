"""Parity dress rehearsal (VERDICT r2 #4): reference-format checkpoint ->
torch reference greedy == our greedy, token for token.

Runs scripts/parity_rehearsal.py end to end: seeded reference-format
checkpoint (local LanguageBind tower dir + Llava dir + tokenizer), the
torch reference's own LlavaLlamaForCausalLM.generate (llava/serve/cli.py
protocol), our models/builder.load_pretrained_model + greedy engine on
the same directory. ~4-6 min on the 1-CPU runner — scheduled as its own
shard by scripts/run_tests.sh.
"""

import os
import sys

import pytest

import conftest as _c  # noqa: F401  (forces CPU before jax init)

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(_c.REPO_ROOT, "scripts"))


def test_reference_and_tpu_stacks_agree_token_for_token(tmp_path):
    import parity_rehearsal

    report = parity_rehearsal.main(
        ["--max-new", "10", "--keep", str(tmp_path / "ckpt")])
    assert report["match"], report
    # The comparison must not be vacuous: tokens were actually generated.
    assert len(report["reference_tokens"]) >= 5
