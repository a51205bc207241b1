"""Calibration / evaluation text loaders — exact reference parity.

The reference has TWO diverging copies of this logic and the differences are
part of the numbers (SURVEY.md §2 "duplication with divergence"):

  PTQ flavor (`gptq_pb/datautils.py`):
    wikitext2: train joined " "  (sic), test joined "\n\n"       (:33-34)
    ptb:       *test* split, joined " "                           (:47-52)
    c4:        train = random windows of random docs; val = first 1100
               val-docs joined " ", truncated to 256·seqlen tokens (:69-98)
  QAT flavor (root `datautils.py`):
    wikitext2: train AND test joined "\n\n"                       (:78-79)
    ptb:       *validation* split, joined "\n\n"                  (:103-120)
    c4:        val = 256 random windows stacked (seed 0)          (:216-229)
    eval loaders: wikitext2 test / ptb validation / c4 validation,
                  all joined "\n\n"                               (:260-286)

Calibration windows are drawn with the stdlib ``random`` module after
``random.seed(seed)`` — replicated verbatim so a parity run samples the same
token windows.  Caching mirrors `gptq_pb/datautils.py:100-120`.

This environment can be fully offline; pass ``texts=...`` (or a synthetic
corpus from `pb_llm_tpu.data.synthetic`) to substitute the HF datasets while
keeping the joining/sampling logic identical.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _window_samples(token_ids: np.ndarray, nsamples: int, seqlen: int, seed: int) -> np.ndarray:
    """nsamples random [seqlen] windows using the reference's RNG protocol
    (`gptq_pb/datautils.py:36-44`)."""
    random.seed(seed)
    n = token_ids.shape[-1]
    out = np.empty((nsamples, seqlen), np.int64)
    for s in range(nsamples):
        i = random.randint(0, n - seqlen - 1)
        out[s] = token_ids[i : i + seqlen]
    return out


def _doc_window_samples(doc_token_fn, ndocs: int, nsamples: int, seqlen: int, seed: int, min_len_exclusive: bool) -> np.ndarray:
    """C4-style: pick random docs until one is long enough, then one window
    (`gptq_pb/datautils.py:77-90`; root `datautils.py:199-214` uses >= not >)."""
    random.seed(seed)
    out = np.empty((nsamples, seqlen), np.int64)
    for s in range(nsamples):
        while True:
            i = random.randint(0, ndocs - 1)
            enc = doc_token_fn(i)
            ok = enc.shape[-1] > seqlen if min_len_exclusive else enc.shape[-1] >= seqlen
            if ok:
                break
        j = random.randint(0, enc.shape[-1] - seqlen - 1)
        out[s] = enc[j : j + seqlen]
    return out


class TextSource:
    """Pluggable corpus: either HF datasets (online) or provided text lists."""

    def __init__(self, texts: Optional[dict] = None):
        self.texts = texts or {}

    def get(self, dataset: str, split: str) -> List[str]:
        key = f"{dataset}/{split}"
        if key in self.texts:
            return self.texts[key]
        from datasets import load_dataset  # network / cache required

        if dataset == "wikitext2":
            return load_dataset("wikitext", "wikitext-2-raw-v1", split=split)["text"]
        if dataset == "ptb":
            return load_dataset("ptb_text_only", "penn_treebank", split=split)["sentence"]
        if dataset == "c4":
            files = {
                "train": {"train": "en/c4-train.00000-of-01024.json.gz"},
                "validation": {"validation": "en/c4-validation.00000-of-00008.json.gz"},
            }[split]
            return load_dataset("allenai/c4", "allenai--c4", data_files=files, split=split)["text"]
        if dataset == "red_pajama":
            # reference `datautils.py:18-31`: the percent slice is applied at
            # load time via the split spec (see get_qat_dataset) — here we
            # load the requested split string verbatim
            return load_dataset("togethercomputer/RedPajama-Data-1T-Sample", split=split)["text"]
        if dataset == "english_quotes":
            # reference `datautils.py:34-37`: field is "quote"
            return load_dataset("Abirate/english_quotes", split=split)["quote"]
        raise NotImplementedError(dataset)


def get_loaders(
    name: str,
    tokenizer,
    nsamples: int = 128,
    seed: int = 0,
    seqlen: int = 2048,
    flavor: str = "ptq",
    source: Optional[TextSource] = None,
    cache_dir: Optional[str] = None,
    model: str = "",
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (calib [nsamples, seqlen] int64, eval_tokens [N] int64).

    ``tokenizer``: any callable/obj with `.encode(text) -> list[int]`.
    Flavors reproduce the two reference pipelines' text construction.
    """
    if cache_dir:
        cache_file = os.path.join(cache_dir, f"{name}_{nsamples}_{seed}_{seqlen}_{flavor}_{model.replace('/', '_')}.pkl")
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as fh:
                return pickle.load(fh)

    src = source or TextSource()
    enc = lambda text: np.asarray(tokenizer.encode(text), np.int64)

    if name == "wikitext2":
        join_train = " " if flavor == "ptq" else "\n\n"
        train = enc(join_train.join(src.get("wikitext2", "train")))
        test = enc("\n\n".join(src.get("wikitext2", "test")))
        calib = _window_samples(train, nsamples, seqlen, seed)
        evaltok = test
    elif name == "ptb":
        if flavor == "ptq":
            train = enc(" ".join(src.get("ptb", "train")))
            evaltok = enc(" ".join(src.get("ptb", "test")))
        else:
            train = enc("\n\n".join(src.get("ptb", "train")))
            evaltok = enc("\n\n".join(src.get("ptb", "validation")))
        calib = _window_samples(train, nsamples, seqlen, seed)
    elif name == "c4":
        train_docs = src.get("c4", "train")
        doc_fn = lambda i: enc(train_docs[i])
        calib = _doc_window_samples(
            doc_fn, len(train_docs), nsamples, seqlen, seed,
            min_len_exclusive=(flavor == "ptq"),
        )
        val_docs = src.get("c4", "validation")
        if flavor == "ptq":
            evaltok = enc(" ".join(val_docs[:1100]))[: 256 * seqlen]
        else:
            vfn = lambda i: enc(val_docs[i])
            evaltok = _doc_window_samples(vfn, len(val_docs), 256, seqlen, 0, min_len_exclusive=False).reshape(-1)
    elif name == "mix":
        # 1/3 each with the remainder on wikitext2, no eval set (datautils.py:245-257)
        n3 = nsamples // 3
        c_w, _ = get_loaders("wikitext2", tokenizer, n3 + (nsamples - 3 * n3), seed, seqlen, flavor, src)
        c_p, _ = get_loaders("ptb", tokenizer, n3, seed, seqlen, flavor, src)
        c_c, _ = get_loaders("c4", tokenizer, n3, seed, seqlen, flavor, src)
        calib = np.concatenate([c_w, c_p, c_c], axis=0)
        evaltok = np.zeros((0,), np.int64)
    else:
        raise NotImplementedError(f"dataset {name}")

    result = (calib, evaltok)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        with open(cache_file, "wb") as fh:
            pickle.dump(result, fh)
    return result


def get_eval_tokens(name: str, tokenizer, source: Optional[TextSource] = None) -> np.ndarray:
    """QAT-eval text (`datautils.py:260-286`): all splits joined "\n\n"."""
    src = source or TextSource()
    enc = lambda text: np.asarray(tokenizer.encode(text), np.int64)
    if name == "wikitext2":
        return enc("\n\n".join(src.get("wikitext2", "test")))
    if name == "ptb":
        return enc("\n\n".join(src.get("ptb", "validation")))
    if name == "c4":
        return enc("\n\n".join(src.get("c4", "validation")))
    raise NotImplementedError(name)


def get_qat_dataset(
    name: str,
    tokenizer,
    data_percent: float = 100,
    seqlen: int = 2048,
    batch_size: int = 2,
    seed: int = 42,
    source: Optional[TextSource] = None,
):
    """Training batches for QAT (`datautils.py:18-49`): tokenized docs,
    shuffled, truncated to seqlen; yields {"input_ids", "attention_mask"}
    batches forever (HF Trainer-style infinite sampling with grouping)."""
    src = source or TextSource()
    if name in ("red_pajama", "redpajama"):
        # reference `datautils.py:22-25`: percent != 100 slices the split to
        # the first int(850000*percent/100) docs — a FIXED 850k total, not
        # len(dataset) — then tokenizes (truncation max_length=seqlen) and
        # shuffles (`datautils.py:48`)
        docs = src.get("red_pajama", "train")
        if data_percent != 100:
            docs = docs[: int(850000 * data_percent / 100)]
    elif name in ("Abirate/english_quotes", "english_quotes"):
        docs = src.get("english_quotes", "train")  # no percent slicing (datautils.py:34-37)
    else:
        docs = src.get(name, "train")
        if data_percent != 100:
            docs = docs[: int(len(docs) * data_percent / 100)]
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(docs))

    def batches():
        i = 0
        while True:
            ids_list, mask_list = [], []
            for _ in range(batch_size):
                text = docs[order[i % len(order)]]
                i += 1
                ids = np.asarray(tokenizer.encode(text), np.int64)[:seqlen]
                ids_list.append(ids)
                mask_list.append(np.ones_like(ids))
            maxlen = max(len(x) for x in ids_list)
            pad = lambda xs: np.stack([np.pad(x, (0, maxlen - len(x))) for x in xs])
            yield {"input_ids": pad(ids_list), "attention_mask": pad(mask_list)}

    return batches()
