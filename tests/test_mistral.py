"""Mistral family support: rides the llama module (identical state-dict
layout, GQA, RoPE, SiLU MLP) plus sliding-window attention via
`LlamaConfig.sliding_window` (`models/attention.causal_allowed(window=...)`).

Parity oracle: a random-init HF `MistralForCausalLM` with a SMALL sliding
window (so the window actually binds at test seqlens) — the differential
style of tests/test_models.py, extended to the windowed mask.

Beyond-reference breadth: the reference supports OPT + LLaMA only
(`gptq_pb/run.py:21-30`); Mistral is the same-architecture family its
users quantize next.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import FAMILIES, family_for


def _tiny_mistral(sliding_window=8):
    torch.manual_seed(0)
    cfg = transformers.MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=sliding_window,
        attn_implementation="eager")
    m = transformers.MistralForCausalLM(cfg)
    m.eval()
    return m


def test_family_dispatch():
    assert family_for("mistralai/Mistral-7B-v0.1") is FAMILIES["llama"]
    m = _tiny_mistral()
    params, cfg, famname = hf_import.from_torch_model(m)
    assert famname == "llama"
    assert cfg.sliding_window == 8
    assert cfg.kv_heads == 2


def test_forward_matches_hf_windowed():
    """Full-forward logits vs HF eager Mistral with a BINDING sliding
    window (seqlen 32 >> window 8): any mask-semantics drift shows up as
    large logit error on late positions."""
    m = _tiny_mistral(sliding_window=8)
    params, cfg, famname = hf_import.from_torch_model(m)
    fam = FAMILIES[famname]
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, 32))
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
    ours, _ = fam.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)
    # sanity: the window binds — a dense-causal run must NOT match
    import dataclasses

    dense_cfg = dataclasses.replace(cfg, sliding_window=None)
    dense, _ = fam.forward(params, jnp.asarray(ids), dense_cfg)
    assert float(jnp.max(jnp.abs(dense - ours))) > 1e-2


def test_engine_decode_matches_full_forward_windowed():
    """Greedy cached decode (strip caches, per-slot lengths) == uncached
    full forward under the sliding window."""
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    m = _tiny_mistral(sliding_window=8)
    params, cfg, famname = hf_import.from_torch_model(m)
    fam = FAMILIES[famname]
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16)))
    prompt = [5, 17, 99, 3, 21, 8, 54, 7, 7, 2]

    ids = list(prompt)
    want = []
    for _ in range(8):
        logits, _ = fam.forward(params, jnp.asarray([ids]), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        want.append(nxt)
        ids.append(nxt)

    got = [eng.prefill(0, prompt)]
    for _ in range(7):
        got.append(eng.decode_step()[0])
    assert got == want


def test_ppl_protocol_windowed():
    """eval.ppl.perplexity runs the windowed forward (protocol unchanged;
    the window only alters the mask) — equals a hand NLL computation."""
    from pb_llm_tpu.eval.ppl import perplexity

    m = _tiny_mistral(sliding_window=8)
    params, cfg, famname = hf_import.from_torch_model(m)
    fam = FAMILIES[famname]
    rng = np.random.RandomState(1)
    tok = rng.randint(0, 256, size=(1, 2 * 32))
    ppl = perplexity(params, cfg, fam.forward, tok, seqlen=32)
    with torch.no_grad():
        nlls = []
        for i in range(2):
            w = torch.tensor(tok[:, i * 32:(i + 1) * 32])
            logits = m(w).logits
            loss = torch.nn.functional.cross_entropy(
                logits[:, :-1].reshape(-1, 256), w[:, 1:].reshape(-1))
            nlls.append(float(loss) * 32)
    ref = float(np.exp(sum(nlls) / (2 * 32)))
    assert ppl == pytest.approx(ref, rel=1e-4)


def test_ptq_pipeline_on_mistral():
    """GPTQ-PB calibrates a mistral-shaped model end-to-end (the linear
    names match llama's, so the registry drives the same pipeline)."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig

    m = _tiny_mistral(sliding_window=8)
    params, cfg, famname = hf_import.from_torch_model(m)
    fam = FAMILIES[famname]
    rng = np.random.RandomState(2)
    calib = rng.randint(0, 256, size=(2, 16))
    qparams, report = quantize_model_ptq(
        params, cfg, fam, calib,
        SolverConfig(low_method="xnor", low_frac=0.5, salient_metric="magnitude"),
        fmt="sim", log=None)
    assert len(report.masks) == 2 * 7  # 2 layers x 7 llama-family linears
    assert all(np.isfinite(v) for v in report.errors.values())


def test_paged_pool_rejects_sliding_window():
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    m = _tiny_mistral(sliding_window=8)
    params, cfg, famname = hf_import.from_torch_model(m)
    eng = Engine(params, cfg, FAMILIES[famname], EngineConfig(
        n_slots=2, max_seq=32, prefill_buckets=(8,), page_size=8))
    with pytest.raises(NotImplementedError, match="sliding-window"):
        eng.prefill(0, [5, 17, 99, 3])
