"""QAT layers + trainer: numerics vs torch oracles, gradient flow, end-to-end."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.quant import qat as q
from pb_llm_tpu.quant.ste import fda_sign, irnet_sign, ste_sign
from pb_llm_tpu.train import qat as tq


def _w(oc=8, ic=64, seed=0):
    return np.random.default_rng(seed).standard_normal((oc, ic)).astype(np.float32)


# --- torch oracles (independent restatement of outlier_quantizer.py math) ----


def torch_quant_8bit(w):
    t = torch.from_numpy(w)
    rng_ = t.max(-1, keepdim=True).values - t.min(-1, keepdim=True).values
    zp = torch.round(t.min(-1, keepdim=True).values)
    qv = torch.clamp(torch.round((t - zp) / rng_ * 255), 0, 255)
    return (qv * (rng_ / 255) + zp).numpy()


def torch_outlier_mask(w, frac):
    t = torch.from_numpy(w).view(-1)
    lo = torch.kthvalue(t, int(t.numel() * frac / 2)).values
    hi = torch.kthvalue(t, int(t.numel() * (1 - frac / 2))).values
    return ((torch.from_numpy(w) < lo) | (torch.from_numpy(w) > hi)).numpy()


def test_weight_quant_8bit_matches_oracle():
    w = _w()
    np.testing.assert_allclose(np.asarray(q.weight_quant_8bit(jnp.asarray(w))), torch_quant_8bit(w), rtol=1e-5, atol=1e-6)


def test_outlier_mask_matches_kthvalue():
    w = _w(seed=1)
    got = np.asarray(q.gen_outlier_mask(jnp.asarray(w), 0.1))
    want = torch_outlier_mask(w, 0.1)
    np.testing.assert_array_equal(got, want)
    frac = got.mean()
    assert abs(frac - 0.1) < 0.02


def test_binary_scale_is_scalar_mean_of_nonoutliers():
    w = _w(seed=2)
    lin = q.make_qat_linear(jnp.asarray(w), None, 0.1, freeze_8bit=False)
    mask = np.asarray(lin.outlier_mask)
    want = np.abs(w[~mask]).mean()
    np.testing.assert_allclose(float(q.binary_scale_of(lin)), want, rtol=1e-6)


def test_quant_weight_value_set():
    w = _w(seed=3)
    lin = q.make_qat_linear(jnp.asarray(w), None, 0.1)
    wq = np.asarray(q.quant_weight(lin))
    mask = np.asarray(lin.outlier_mask)
    scale = float(q.binary_scale_of(lin))
    # non-outliers are ±scale (sign(0)=0 measure-zero aside)
    binary_vals = np.unique(np.round(np.abs(wq[~mask]) / scale, 5))
    assert (binary_vals == 1.0).all()
    # outliers equal the sim-8bit master weight
    np.testing.assert_allclose(wq[mask], np.asarray(lin.weight)[mask], rtol=1e-6)


def test_hessian_variant_inverts_gptq_mask():
    w = _w(seed=4)
    gmask = np.zeros_like(w, bool)
    gmask[:, :32] = True  # binarized
    lin = q.make_qat_linear(jnp.asarray(w), None, 0.5, method="xnor_outlier_hessian", gptq_mask=gmask)
    np.testing.assert_array_equal(np.asarray(lin.outlier_mask), ~gmask)


def test_ste_gradients():
    x = jnp.asarray(np.linspace(-2, 2, 9).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(ste_sign(v)))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)  # identity bwd
    g2 = jax.grad(lambda v: jnp.sum(irnet_sign(v)))(x)
    want = 10.0 * 0.1 * (1 - np.tanh(np.asarray(x) * 0.1) ** 2)
    np.testing.assert_allclose(np.asarray(g2), want, rtol=1e-5)
    g3 = jax.grad(lambda v: jnp.sum(fda_sign(v)))(x)
    assert float(g3[0]) == 0.0 and float(g3[-1]) == 0.0  # zeroed outside [-1,1]


def test_gradient_only_flows_to_binary_positions():
    w = _w(seed=5)
    lin = q.make_qat_linear(jnp.asarray(w), None, 0.2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 64)).astype(np.float32))

    def loss(weight):
        lin2 = q.QATLinear(weight=weight, bias=None, outlier_mask=lin.outlier_mask)
        return jnp.sum(q.apply_qat_linear(lin2, x) ** 2)

    g = np.asarray(jax.grad(loss)(lin.weight))
    mask = np.asarray(lin.outlier_mask)
    assert np.abs(g[mask]).max() == 0.0      # outliers detached
    assert np.abs(g[~mask]).max() > 0.0      # STE passes through elsewhere


def test_mean_effective_bits():
    w = _w(oc=64, ic=64, seed=6)
    lin = q.make_qat_linear(jnp.asarray(w), None, 0.1)
    bits = q.mean_effective_bits(lin)
    # 1 + ~0.1*16 + crow overhead
    assert 2.4 < bits < 3.2


@pytest.fixture(scope="module")
def tiny_model():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64, word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    return params, cfg, family_for("opt")


def test_qat_training_reduces_loss(tiny_model):
    params, cfg, fam = tiny_model
    qcfg = tq.QATConfig(outlier_fraction=0.1, train_steps=12, learning_rate=5e-3, remat=True)
    params = tq.replace_linears(params, fam, qcfg)
    bits = tq.mean_bits_report(params, fam)
    assert 2.0 < bits < 4.0

    rng = np.random.default_rng(0)
    fixed = rng.integers(0, 128, size=(2, 24))  # overfit one batch

    def batches():
        while True:
            yield {"input_ids": fixed}

    params, losses = tq.train(params, cfg, fam, qcfg, batches())
    assert losses[-1] < losses[0]  # optimizes

    # frozen leaves unchanged
    emb0 = np.asarray(tiny_model[0]["embed_tokens"])
    np.testing.assert_array_equal(np.asarray(params["embed_tokens"]), emb0)


def test_export_dense_matches_qat_forward(tiny_model):
    params, cfg, fam = tiny_model
    import copy

    qcfg = tq.QATConfig(outlier_fraction=0.1, train_steps=1)
    p = tq.replace_linears(copy.deepcopy(params), fam, qcfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, size=(1, 16)))
    logits_qat, _ = fam.forward(p, ids, cfg, linear_fn=tq.qat_linear_fn)
    dense = tq.export_dense(p, fam)
    logits_dense, _ = fam.forward(dense, ids, cfg)
    np.testing.assert_allclose(np.asarray(logits_qat), np.asarray(logits_dense), rtol=1e-4, atol=1e-5)


def test_bireal_activation_gradient():
    import jax

    from pb_llm_tpu.quant.qat import bireal_activation

    x = jnp.asarray(np.linspace(-2, 2, 9).astype(np.float32))
    y = bireal_activation(x)
    np.testing.assert_allclose(np.asarray(y), np.sign(np.asarray(x)))
    g = np.asarray(jax.grad(lambda v: jnp.sum(bireal_activation(v)))(x))
    assert g[0] == 0.0 and g[-1] == 0.0     # flat outside [-1, 1]
    assert g[4] == 2.0                       # d/dx(±x²+2x) at 0 = 2


def test_param_reports():
    from pb_llm_tpu.utils.params import count_parameters, zero_fraction_report

    lin = q.make_qat_linear(jnp.asarray(_w()), None, 0.1)
    tree = {"layers": [{"q": lin, "fc2": {"w": jnp.zeros((4, 4)), "b": None}}], "norm": jnp.ones(3)}
    t, a = count_parameters(tree)
    assert t == lin.weight.size and a == t + 16 + 3
    zr = zero_fraction_report(tree)
    assert any("fc2" in k for k in zr) and max(zr.values()) == 1.0
