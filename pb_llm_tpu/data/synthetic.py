"""Offline substitutes: byte-level tokenizer + synthetic corpora.

The build environment has zero egress, so tests and smoke runs need a
tokenizer and corpus that exist without downloads.  `ByteTokenizer` encodes
UTF-8 bytes (vocab 256 + specials) and `synthetic_source` generates
deterministic pseudo-text; both plug into `data.loaders` through its
``tokenizer`` / ``source`` parameters, leaving the reference-parity joining
and sampling logic untouched.
"""

from __future__ import annotations

import numpy as np

from .loaders import TextSource


class ByteTokenizer:
    """UTF-8 byte tokenizer. vocab: 0..255 bytes, 256 bos, 257 eos, 258 pad."""

    vocab_size = 259
    bos_token_id = 256
    eos_token_id = 257
    pad_token_id = 258

    def encode(self, text: str):
        return list(text.encode("utf-8"))

    def decode(self, ids):
        return bytes(i for i in ids if i < 256).decode("utf-8", errors="replace")

    def __call__(self, text, **kw):
        return {"input_ids": self.encode(text)}


_WORDS = (
    "the quantized llama ran over binary weights while salient outliers "
    "kept eight bits of precision and the hessian chose which columns stay "
    "dense on the tpu mesh with packed sign planes streaming from hbm"
).split()


def synthetic_texts(n_docs: int, seed: int, min_words: int = 20, max_words: int = 400):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n_docs):
        k = int(rng.integers(min_words, max_words))
        docs.append(" ".join(_WORDS[i] for i in rng.integers(0, len(_WORDS), k)))
    return docs


def synthetic_source(n_docs: int = 200, seed: int = 0) -> TextSource:
    """A TextSource covering every dataset/split the loaders ask for."""
    texts = {}
    for i, key in enumerate(
        [
            "wikitext2/train", "wikitext2/test",
            "ptb/train", "ptb/test", "ptb/validation",
            "c4/train", "c4/validation",
            "red_pajama/train", "english_quotes/train",
        ]
    ):
        texts[key] = synthetic_texts(n_docs, seed + i)
    return TextSource(texts)
