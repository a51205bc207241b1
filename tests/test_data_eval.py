"""Data loaders (parity logic on synthetic corpora) + task harness."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.data.loaders import get_eval_tokens, get_loaders, get_qat_dataset
from pb_llm_tpu.data.synthetic import ByteTokenizer, synthetic_source
from pb_llm_tpu.eval import tasks as T
from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for


@pytest.fixture(scope="module")
def tok():
    return ByteTokenizer()


@pytest.fixture(scope="module")
def src():
    return synthetic_source(n_docs=60, seed=0)


def test_wikitext2_flavors_differ(tok, src):
    c1, e1 = get_loaders("wikitext2", tok, nsamples=3, seqlen=64, flavor="ptq", source=src)
    c2, e2 = get_loaders("wikitext2", tok, nsamples=3, seqlen=64, flavor="qat", source=src)
    assert c1.shape == (3, 64)
    # train joins differ (" " vs "\n\n") -> different token streams
    assert not np.array_equal(c1, c2)
    # test text identical ("\n\n" join both)
    np.testing.assert_array_equal(e1, e2)


def test_ptb_split_divergence(tok, src):
    _, e_ptq = get_loaders("ptb", tok, nsamples=2, seqlen=32, flavor="ptq", source=src)
    _, e_qat = get_loaders("ptb", tok, nsamples=2, seqlen=32, flavor="qat", source=src)
    # ptq evals on test/" ", qat on validation/"\n\n"
    assert e_ptq.shape != e_qat.shape or not np.array_equal(e_ptq, e_qat)


def test_c4_ptq_eval_truncation(tok, src):
    _, ev = get_loaders("c4", tok, nsamples=2, seqlen=32, flavor="ptq", source=src)
    assert ev.shape[0] <= 256 * 32


def test_seeded_windows_reproducible(tok, src):
    c1, _ = get_loaders("wikitext2", tok, nsamples=4, seqlen=32, seed=7, source=src)
    c2, _ = get_loaders("wikitext2", tok, nsamples=4, seqlen=32, seed=7, source=src)
    np.testing.assert_array_equal(c1, c2)
    c3, _ = get_loaders("wikitext2", tok, nsamples=4, seqlen=32, seed=8, source=src)
    assert not np.array_equal(c1, c3)


def test_window_sampling_matches_reference_rng(tok, src):
    """The exact stdlib-random protocol of gptq_pb/datautils.py:36-44."""
    import random

    text = " ".join(src.get("wikitext2", "train"))
    ids = np.asarray(tok.encode(text), np.int64)
    calib, _ = get_loaders("wikitext2", tok, nsamples=3, seqlen=16, seed=5, source=src)
    random.seed(5)
    for s in range(3):
        i = random.randint(0, ids.shape[0] - 16 - 1)
        np.testing.assert_array_equal(calib[s], ids[i : i + 16])


def test_cache_roundtrip(tok, src, tmp_path):
    kw = dict(nsamples=2, seqlen=16, source=src, cache_dir=str(tmp_path))
    c1, e1 = get_loaders("wikitext2", tok, **kw)
    c2, e2 = get_loaders("wikitext2", tok, **kw)  # cache hit
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(e1, e2)


def test_eval_tokens(tok, src):
    for name in ("wikitext2", "ptb", "c4"):
        ev = get_eval_tokens(name, tok, source=src)
        assert ev.ndim == 1 and ev.size > 100


def test_qat_dataset_batches(tok, src):
    it = get_qat_dataset("red_pajama", tok, data_percent=50, seqlen=64, batch_size=2, source=src)
    b = next(it)
    assert b["input_ids"].shape[0] == 2
    assert b["input_ids"].shape == b["attention_mask"].shape
    assert b["input_ids"].shape[1] <= 64


def test_task_suite_expansion():
    assert len(T.expand_tasks(["mmlu"])) == 57
    assert T.expand_tasks(["llmqat"])[:2] == ["boolq", "piqa"]
    assert T.expand_tasks(["boolq", "piqa"]) == ["boolq", "piqa"]


def test_formatters():
    ex = T.fmt_boolq({"passage": "p", "question": "q", "answer": 1})
    assert ex.choices == [" no", " yes"] and ex.gold == 1
    # v0.3 winogrande: option-substituted contexts, shared " ran" continuation
    ex = T.fmt_winogrande({"sentence": "the _ ran", "option1": "dog", "option2": "cat", "answer": "2"})
    assert ex.contexts == ["the dog", "the cat"] and ex.choices == [" ran", " ran"] and ex.gold == 1
    ex = T.fmt_mmlu({"question": "Q?", "choices": ["a", "b", "c", "d"], "answer": 2})
    assert ex.gold == 2 and ex.choices[2] == " C"
    ex = T.fmt_arc({"question": "q", "choices": {"label": ["A", "B"], "text": ["x", "y"]}, "answerKey": "B"})
    assert ex.gold == 1


@pytest.fixture(scope="module")
def tiny_lm():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=300, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    return params, cfg, family_for("opt")


def test_loglikelihood_scoring_consistency(tiny_lm, tok):
    params, cfg, fam = tiny_lm
    scorer = T.LoglikelihoodScorer(params, cfg, fam, tok, buckets=(32, 64))
    ll_a, _ = scorer.score("the weather is", " nice")
    ll_b, _ = scorer.score("the weather is", " nice")
    assert ll_a == ll_b and ll_a < 0.0
    # independent check: manual forward
    ids = tok.encode("the weather is" + " nice")
    logits, _ = fam.forward(params, jnp.asarray([ids]), cfg)
    lp = np.asarray(jnp.log(jnp.exp(logits[0].astype(jnp.float32) - jnp.max(logits[0], -1, keepdims=True)) /
                            jnp.sum(jnp.exp(logits[0] - jnp.max(logits[0], -1, keepdims=True)), -1, keepdims=True)))
    n_cont = len(tok.encode(" nice"))
    want = sum(lp[len(ids) - n_cont - 1 + i, ids[len(ids) - n_cont + i]] for i in range(n_cont))
    np.testing.assert_allclose(ll_a, want, rtol=1e-4)


def test_evaluate_task_end_to_end(tiny_lm, tok):
    params, cfg, fam = tiny_lm
    examples = [
        T.Example("question one answer:", [" alpha", " beta"], 0),
        T.Example("question two answer:", [" gamma", " delta"], 1),
    ]
    out = T.evaluate_model_tasks(params, cfg, fam, tok, ["custom"], examples_by_task={"custom": examples})
    assert 0.0 <= out["mean_acc"] <= 1.0
    assert out["results"]["custom"]["n"] == 2


def test_mix_dataset(tok, src):
    calib, ev = get_loaders("mix", tok, nsamples=7, seqlen=32, source=src)
    assert calib.shape == (7, 32)  # 3 + 2 + 2
    assert ev.size == 0


def test_score_many_batched_matches_sequential(tiny_lm, tok):
    """Batched scoring (several same-bucket requests in ONE forward) must be
    row-wise equal to one-at-a-time scoring — including mixed buckets and a
    non-power-of-two group (padded rows discarded)."""
    params, cfg, fam = tiny_lm
    pairs = [
        ("the weather is", " nice"),
        ("the weather is", " bad"),
        ("a much longer context sentence that lands in the bigger bucket "
         "because it keeps going and going", " yes"),
        ("tiny", " x"),
        ("the weather is", " okay"),
    ]
    seq = T.LoglikelihoodScorer(params, cfg, fam, tok, buckets=(32, 64), max_batch=1)
    bat = T.LoglikelihoodScorer(params, cfg, fam, tok, buckets=(32, 64), max_batch=4)
    want = [seq.score(c, t) for c, t in pairs]
    got = bat.score_many(pairs)
    for (lw, gw), (lg, gg) in zip(want, got):
        np.testing.assert_allclose(lg, lw, rtol=1e-5, atol=1e-6)
        assert gg == gw


def test_perplexity_window_batch_matches_sequential(tiny_lm, tok):
    """Batched windows (incl. a masked tail pad) must reproduce the
    sequential protocol value."""
    from pb_llm_tpu.eval.ppl import perplexity

    params, cfg, fam = tiny_lm
    ids = np.random.default_rng(3).integers(0, 300, size=(5 * 24,))
    want = perplexity(params, cfg, fam.forward, ids, seqlen=24, window_batch=1)
    got = perplexity(params, cfg, fam.forward, ids, seqlen=24, window_batch=4)
    np.testing.assert_allclose(got, want, rtol=1e-5)
