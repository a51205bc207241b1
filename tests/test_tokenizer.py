"""Shared tokenizer loader: the reference's LLaMA BOS/EOS pin
(`gptq_pb/datautils.py:14-26`) applied by every CLI (VERDICT r3 #6).

Offline image: no real tokenizers — transformers.AutoTokenizer is stubbed;
the point under test is the id fixup + slow-tokenizer request, exactly the
bits a drifted llama tokenizer config would silently break."""

import sys
import types

import pytest

from pb_llm_tpu.utils.tokenizer import get_tokenizer


class _StubTok:
    def __init__(self, bos, eos, vocab=32000):
        self.bos_token_id = bos
        self.eos_token_id = eos
        self.vocab_size = vocab


@pytest.fixture
def stub_auto(monkeypatch):
    calls = {}

    class _Auto:
        @staticmethod
        def from_pretrained(model_id, use_fast=True):
            calls["model_id"] = model_id
            calls["use_fast"] = use_fast
            ids = calls.pop("ids", (0, 2))
            return _StubTok(*ids, vocab=calls.pop("vocab", 32000))

    mod = types.SimpleNamespace(AutoTokenizer=_Auto)
    monkeypatch.setitem(sys.modules, "transformers", mod)
    return calls


def test_llama_bos_eos_pinned(stub_auto):
    """A llama tokenizer with drifted ids (bos=0, the transformers-4.28
    regression the reference patches) comes back pinned to bos=1/eos=2."""
    stub_auto["ids"] = (0, 0)
    tok = get_tokenizer("huggyllama/llama-7b")
    assert (tok.bos_token_id, tok.eos_token_id) == (1, 2)
    assert stub_auto["use_fast"] is False  # slow tokenizers: window parity


def test_llama_correct_ids_untouched(stub_auto):
    stub_auto["ids"] = (1, 2)
    tok = get_tokenizer("decapoda-research/llama-7b-hf")
    assert (tok.bos_token_id, tok.eos_token_id) == (1, 2)


def test_non_llama_left_alone(stub_auto):
    """OPT's ids (bos=2/eos=2 in HF configs) must NOT be rewritten — the
    fixup is llama-only in the reference."""
    stub_auto["ids"] = (2, 2)
    tok = get_tokenizer("facebook/opt-1.3b")
    assert (tok.bos_token_id, tok.eos_token_id) == (2, 2)
    assert stub_auto["use_fast"] is False


def test_llama3_style_vocab_left_alone(stub_auto):
    """A 'llama' id with a NON-32000 vocab (Llama-3-style: bos 128000) must
    NOT be rewritten to 1/2 — the pin targets the llama-1/2 sentencepiece
    tokenizers the reference's compat fix was written for."""
    stub_auto["ids"] = (128000, 128001)
    stub_auto["vocab"] = 128256
    tok = get_tokenizer("meta-llama/Meta-Llama-3-8B")
    assert (tok.bos_token_id, tok.eos_token_id) == (128000, 128001)
