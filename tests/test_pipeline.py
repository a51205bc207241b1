"""End-to-end PTQ pipeline on a tiny OPT + the exact ppl protocol.

This is the minimum end-to-end slice of BASELINE.json configs[0]
(opt-style model, xnor, low_frac, high_bit=8, magnitude, wikitext2-protocol
ppl) — CPU-runnable with synthetic data since the environment is offline.
"""

import copy

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.calib.pipeline import load_masks, quantize_model_ptq, save_masks
from pb_llm_tpu.calib.solver import SolverConfig
from pb_llm_tpu.eval.ppl import cross_entropy_shifted, perplexity
from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for


@pytest.fixture(scope="module")
def tiny_opt_setup():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128,
        hidden_size=32,
        ffn_dim=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        word_embed_proj_dim=32,
        dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    fam = family_for("opt")
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 128, size=(4, 32))
    eval_ids = rng.integers(0, 128, size=(4 * 32,))
    return params, cfg, fam, calib, eval_ids


def _ppl(params, cfg, fam, eval_ids):
    return perplexity(params, cfg, fam.forward, eval_ids, seqlen=32)


def test_ppl_protocol_matches_torch_reference(tiny_opt_setup):
    """Our windowed nll/ppl formula vs an independent torch computation."""
    params, cfg, fam, _, eval_ids = tiny_opt_setup
    seqlen = 32
    # torch oracle of the protocol (eval_ppl_utils.py:71-86) on OUR logits
    nlls = []
    for i in range(eval_ids.size // seqlen):
        w = eval_ids[i * seqlen : (i + 1) * seqlen]
        logits, _ = fam.forward(params, jnp.asarray(w[None, :]), cfg)
        lg = torch.from_numpy(np.asarray(logits, np.float32))
        loss = torch.nn.functional.cross_entropy(lg[0, :-1], torch.from_numpy(w[1:]))
        nlls.append(float(loss) * seqlen)
    ppl_ref = float(np.exp(np.sum(nlls) / (len(nlls) * seqlen)))
    ppl_got = _ppl(params, cfg, fam, eval_ids)
    np.testing.assert_allclose(ppl_got, ppl_ref, rtol=1e-4)


def test_cross_entropy_shifted_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 16, 50)).astype(np.float32)
    tgt = rng.integers(0, 50, size=(1, 16))
    got = float(cross_entropy_shifted(jnp.asarray(logits), jnp.asarray(tgt)))
    want = float(
        torch.nn.functional.cross_entropy(
            torch.from_numpy(logits[0, :-1]), torch.from_numpy(tgt[0, 1:])
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ptq_high_only_nearly_lossless(tiny_opt_setup):
    """low_frac≈0 ⇒ almost everything 8-bit ⇒ ppl barely moves."""
    params, cfg, fam, calib, eval_ids = tiny_opt_setup
    base = _ppl(params, cfg, fam, eval_ids)
    p2, report = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.02, salient_metric="magnitude", blocksize=32),
        log=None,
    )
    q = _ppl(p2, cfg, fam, eval_ids)
    assert abs(q - base) / base < 0.05
    assert len(report.errors) == 2 * 6  # 2 layers × 6 linears


def test_batched_capture_bit_identical(tiny_opt_setup):
    """VERDICT r2 item 5: batched Hessian capture must be protocol-identical
    — masks BIT-identical and errors equal to the per-sample path (the fold
    replays the reference's sample-sequential rescale inside one program)."""
    params, cfg, fam, calib, eval_ids = tiny_opt_setup
    scfg = SolverConfig(low_frac=0.5, salient_metric="hessian", blocksize=32)
    _, rep1 = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, scfg,
                                 log=None, capture_batch=1)
    _, rep4 = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, scfg,
                                 log=None, capture_batch=4)
    _, rep3 = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, scfg,
                                 log=None, capture_batch=3)  # ragged final chunk
    assert set(rep1.masks) == set(rep4.masks) == set(rep3.masks)
    for k in rep1.masks:
        np.testing.assert_array_equal(rep1.masks[k], rep4.masks[k])
        np.testing.assert_array_equal(rep1.masks[k], rep3.masks[k])
    for k in rep1.errors:
        np.testing.assert_allclose(rep1.errors[k], rep4.errors[k], rtol=1e-5)
        np.testing.assert_allclose(rep1.errors[k], rep3.errors[k], rtol=1e-5)


def test_ptq_packed_matches_sim_exactly(tiny_opt_setup):
    params, cfg, fam, calib, eval_ids = tiny_opt_setup
    cfgq = SolverConfig(low_frac=0.5, salient_metric="hessian", blocksize=32)
    p_sim, _ = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, cfgq, fmt="sim", log=None)
    p_pkd, _ = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, cfgq, fmt="packed", log=None)
    ppl_sim = _ppl(p_sim, cfg, fam, eval_ids)
    ppl_pkd = _ppl(p_pkd, cfg, fam, eval_ids)
    np.testing.assert_allclose(ppl_pkd, ppl_sim, rtol=1e-3)


def test_gptq_no_worse_than_rtn_end_to_end(tiny_opt_setup):
    params, cfg, fam, calib, eval_ids = tiny_opt_setup
    kw = dict(low_frac=0.8, salient_metric="hessian", blocksize=32)
    p_g, rep_g = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, SolverConfig(**kw), log=None)
    p_r, _ = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, SolverConfig(disable_gptq=True, **kw), log=None)
    ppl_g = _ppl(p_g, cfg, fam, eval_ids)
    ppl_r = _ppl(p_r, cfg, fam, eval_ids)
    # gptq's error feedback should not be dramatically worse; usually better
    assert ppl_g < ppl_r * 1.10
    assert all(np.isfinite(v) for v in rep_g.errors.values())


def test_layer_filtering(tiny_opt_setup):
    params, cfg, fam, calib, _ = tiny_opt_setup
    _, rep = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.5, blocksize=32), minlayer=0, maxlayer=1, quant_only="fc", log=None,
    )
    assert set(rep.errors) == {"layer_0/fc1", "layer_0/fc2"}


def test_mask_save_load_roundtrip(tiny_opt_setup, tmp_path):
    params, cfg, fam, calib, _ = tiny_opt_setup
    _, rep = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib, SolverConfig(low_frac=0.5, blocksize=32), log=None
    )
    f = str(tmp_path / "masks.npz")
    save_masks(f, rep.masks, 0.5)
    masks, frac = load_masks(f)
    assert frac == 0.5
    np.testing.assert_array_equal(masks["layer_0/q_proj"], rep.masks["layer_0/q_proj"])


def test_resume_from_layer_checkpoints(tiny_opt_setup, tmp_path):
    """Crash-resume: second run skips solved layers and reproduces results."""
    params, cfg, fam, calib, eval_ids = tiny_opt_setup
    rdir = str(tmp_path / "resume")
    scfg = SolverConfig(low_frac=0.5, blocksize=32)
    p1, rep1 = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib, scfg, resume_dir=rdir, log=None)

    logs = []
    p2, rep2 = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib, scfg, resume_dir=rdir, log=logs.append
    )
    assert sum("resumed from checkpoint" in m for m in logs) == 2  # both layers skipped
    assert rep2.errors == rep1.errors
    np.testing.assert_allclose(_ppl(p2, cfg, fam, eval_ids), _ppl(p1, cfg, fam, eval_ids), rtol=1e-6)


def test_layer_output_mse_reported(tiny_opt_setup):
    """The reference's DEBUG check (gptq.py:170-174) as a report field: output
    drift should be small for near-lossless quantization, larger otherwise."""
    params, cfg, fam, calib, _ = tiny_opt_setup
    _, rep_hi = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.02, blocksize=32), log=None,
    )
    _, rep_lo = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.95, blocksize=32), log=None,
    )
    assert set(rep_hi.layer_output_mse) == {"layer_0", "layer_1"}
    assert all(np.isfinite(v) for v in rep_hi.layer_output_mse.values())
    # heavily binarized drifts more than almost-8-bit
    assert sum(rep_lo.layer_output_mse.values()) > sum(rep_hi.layer_output_mse.values())


def test_llama_family_pipeline_end_to_end():
    """PTQ + packed + ppl for the llama family (rope, no biases, 7 linears)."""
    import jax

    from pb_llm_tpu.models.llama import LlamaConfig, init_params

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=64,
    )
    fam = family_for("llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 96, size=(3, 24))
    eval_ids = rng.integers(0, 96, size=(3 * 24,))

    base = perplexity(params, cfg, fam.forward, eval_ids, seqlen=24)
    p_sim, rep = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.3, salient_metric="hessian", blocksize=16), log=None,
    )
    p_pkd, _ = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.3, salient_metric="hessian", blocksize=16), fmt="packed", log=None,
    )
    assert len(rep.errors) == 2 * 7  # 7 llama linears per layer
    ppl_sim = perplexity(p_sim, cfg, fam.forward, eval_ids, seqlen=24)
    ppl_pkd = perplexity(p_pkd, cfg, fam.forward, eval_ids, seqlen=24)
    assert np.isfinite(ppl_sim) and np.isfinite(base)
    np.testing.assert_allclose(ppl_pkd, ppl_sim, rtol=1e-3)
