"""Shared tokenizer loader with the reference's LLaMA id fixup.

The reference forces ``bos_token_id=1, eos_token_id=2`` on every LLaMA
tokenizer (`gptq_pb/datautils.py:14-26`, a transformers-4.28 compat fix):
a drifted llama tokenizer config would silently shift every calibration
window and eval text, invalidating window-identical parity.  All four CLIs
and the parity sweep load through this helper (VERDICT r3 #6).
"""

from __future__ import annotations


def get_tokenizer(model_id: str):
    """`AutoTokenizer.from_pretrained(model_id, use_fast=False)` plus the
    LLaMA BOS/EOS pin.  Slow tokenizers throughout: the reference's window
    replay is pinned to their tokenizations."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_id, use_fast=False)
    # Pin ONLY for llama-1/2-family sentencepiece tokenizers (vocab 32000)
    # — the reference's compat fix targets those.  A blanket substring
    # match would rewrite Llama-3-style ids (bos 128000/eos 128001) to
    # 1/2 and silently corrupt every window instead of protecting them.
    if "llama" in model_id.lower() and getattr(tok, "vocab_size", None) == 32000:
        if (getattr(tok, "bos_token_id", None) != 1
                or getattr(tok, "eos_token_id", None) != 2):
            try:
                tok.bos_token_id = 1
                tok.eos_token_id = 2
            except AttributeError:  # pragma: no cover - exotic tokenizers
                pass
    return tok
