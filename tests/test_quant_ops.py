"""Low/high quantizer numerics vs independent torch oracles.

The oracles below re-state the closed forms of the reference quantizers
(`gptq_pb/low_quant.py`, `gptq_pb/high_quant.py`) in minimal torch so the JAX
implementations are checked against a second, independently-written source of
the same math.
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick
import torch

from pb_llm_tpu.quant.high_quant import high_calibrate, high_codes, high_dequant_codes, high_quantize
from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize, low_quantize_cols


def _rand(oc, ic, seed=0):
    return np.random.default_rng(seed).standard_normal((oc, ic)).astype(np.float32)


# --- torch oracles -----------------------------------------------------------


def torch_xnor(w):
    t = torch.from_numpy(w)
    mu = t.mean(-1, keepdim=True)
    sc = (t - mu).abs().mean(-1, keepdim=True)
    return (torch.sign(t - mu) * sc + mu).numpy(), mu.numpy(), sc.numpy()


def torch_high_asym(w, bits):
    t = torch.from_numpy(w)
    maxq = 2**bits - 1
    xmin = torch.clamp_max(t.min(-1).values, 0.0)
    xmax = torch.clamp_min(t.max(-1).values, 0.0)
    deg = (xmin == 0) & (xmax == 0)
    xmin, xmax = torch.where(deg, -torch.ones_like(xmin), xmin), torch.where(deg, torch.ones_like(xmax), xmax)
    scale = (xmax - xmin) / maxq
    zero = torch.round(-xmin / scale)
    q = torch.clamp(torch.round(t / scale[:, None]) + zero[:, None], 0, maxq)
    return (scale[:, None] * (q - zero[:, None])).numpy(), scale.numpy(), zero.numpy()


# --- tests -------------------------------------------------------------------


def test_xnor_matches_oracle():
    w = _rand(16, 64)
    st = low_calibrate(jnp.asarray(w), "xnor")
    q = low_quantize(jnp.asarray(w), st, "xnor")
    q_ref, mu_ref, sc_ref = torch_xnor(w)
    np.testing.assert_allclose(np.asarray(st["mean"])[0], mu_ref[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st["scale"])[0], sc_ref[:, 0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q), q_ref, rtol=1e-5, atol=1e-6)


def test_xnor_value_set_is_mean_pm_scale():
    w = _rand(4, 32, seed=3)
    st = low_calibrate(jnp.asarray(w), "xnor")
    q = np.asarray(low_quantize(jnp.asarray(w), st, "xnor"))
    mu, sc = np.asarray(st["mean"])[0], np.asarray(st["scale"])[0]
    for r in range(4):
        vals = np.unique(q[r])
        assert len(vals) <= 2
        np.testing.assert_allclose(sorted(vals), [mu[r] - sc[r], mu[r] + sc[r]], rtol=1e-5)


def test_xnor_masked_calibration_includes_zeros():
    # GPTQ-PB calibrates on W*mask with zeroed salient entries included in the
    # mean denominator (gptq_pb/gptq.py:103-104 semantics).
    w = _rand(2, 8, seed=4)
    mask = np.ones_like(w, bool)
    mask[:, :4] = False  # half salient -> zeroed
    wm = w * mask
    st = low_calibrate(jnp.asarray(wm), "xnor")
    expected_mean = wm.mean(-1)  # zeros included
    np.testing.assert_allclose(np.asarray(st["mean"])[0], expected_mean, rtol=1e-6)


def test_sign_method():
    w = _rand(8, 32, seed=5)
    st = low_calibrate(jnp.asarray(w), "sign")
    q = np.asarray(low_quantize(jnp.asarray(w), st, "sign"))
    scale = np.maximum(w, 0).mean(-1)
    np.testing.assert_allclose(np.asarray(st["scale"])[0], scale, rtol=1e-6)
    np.testing.assert_allclose(q, (w > 0) * scale[:, None], rtol=1e-6)


def test_rtn_method():
    w = _rand(8, 32, seed=6)
    st = low_calibrate(jnp.asarray(w), "rtn")
    q = np.asarray(low_quantize(jnp.asarray(w), st, "rtn"))
    scale = np.abs(w).mean(-1) + 1e-5
    expected = np.clip(np.round(np.maximum(w, 0) / scale[:, None]), 0, 1) * scale[:, None]
    np.testing.assert_allclose(q, expected, rtol=1e-6)


def test_prune_and_no():
    w = _rand(4, 16, seed=7)
    st = low_calibrate(jnp.asarray(w), "prune")
    assert np.asarray(low_quantize(jnp.asarray(w), st, "prune")).sum() == 0
    st = low_calibrate(jnp.asarray(w), "no")
    np.testing.assert_allclose(np.asarray(low_quantize(jnp.asarray(w), st, "no")), w)


def test_2bit_4bit_levels():
    for method, maxq in (("2bit", 3), ("4bit", 7)):
        w = _rand(8, 32, seed=8)
        st = low_calibrate(jnp.asarray(w), method)
        q = np.asarray(low_quantize(jnp.asarray(w), st, method))
        scale = np.asarray(st["scale"])[0][:, None]
        zero = np.asarray(st["zero"])[0][:, None]
        codes = q / scale + zero
        assert np.allclose(codes, np.round(codes), atol=1e-4)
        assert codes.min() >= -1e-4 and codes.max() <= maxq + 1e-4


def test_grouped_calibration():
    w = _rand(4, 64, seed=9)
    st = low_calibrate(jnp.asarray(w), "xnor", groupsize=16)
    assert st["scale"].shape == (4, 4)
    # group 2 params == whole-row params of the slice
    st_g2 = low_calibrate(jnp.asarray(w[:, 32:48]), "xnor")
    np.testing.assert_allclose(np.asarray(st["mean"])[2], np.asarray(st_g2["mean"])[0], rtol=1e-6)
    q = np.asarray(low_quantize(jnp.asarray(w), st, "xnor", groupsize=16))
    q_cols = np.asarray(low_quantize_cols(jnp.asarray(w[:, 32:48]), st, "xnor", 2))
    np.testing.assert_allclose(q[:, 32:48], q_cols, rtol=1e-6)


def test_high_quantizer_matches_oracle():
    w = _rand(16, 64, seed=10)
    st = high_calibrate(jnp.asarray(w), bits=8)
    q = np.asarray(high_quantize(jnp.asarray(w), st))
    q_ref, sc_ref, z_ref = torch_high_asym(w, 8)
    np.testing.assert_allclose(np.asarray(st["scale"]), sc_ref, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st["zero"]), z_ref, rtol=1e-6)
    np.testing.assert_allclose(q, q_ref, rtol=1e-5, atol=1e-6)


def test_high_quantizer_degenerate_row():
    w = np.zeros((2, 8), np.float32)
    w[1] = _rand(1, 8, seed=11)
    st = high_calibrate(jnp.asarray(w), bits=8)
    # all-zero row -> range [-1, 1]
    np.testing.assert_allclose(np.asarray(st["scale"])[0], 2.0 / 255.0, rtol=1e-6)
    q = np.asarray(high_quantize(jnp.asarray(w), st))
    np.testing.assert_allclose(q[0], 0.0, atol=1e-6)


def test_high_quantizer_sym():
    w = _rand(8, 32, seed=12)
    st = high_calibrate(jnp.asarray(w), bits=8, sym=True)
    np.testing.assert_allclose(np.asarray(st["zero"]), 128.0)


def test_high_quantizer_mse_not_worse():
    w = _rand(8, 64, seed=13)
    st0 = high_calibrate(jnp.asarray(w), bits=4)
    st1 = high_calibrate(jnp.asarray(w), bits=4, mse=True)
    e0 = np.abs(np.asarray(high_quantize(jnp.asarray(w), st0)) - w) ** 2.4
    e1 = np.abs(np.asarray(high_quantize(jnp.asarray(w), st1)) - w) ** 2.4
    assert e1.sum(-1).max() <= e0.sum(-1).max() + 1e-5


def test_high_codes_roundtrip():
    w = _rand(8, 32, seed=14)
    st = high_calibrate(jnp.asarray(w), bits=8)
    codes = high_codes(jnp.asarray(w), st)
    assert codes.dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(high_dequant_codes(codes, st)),
        np.asarray(high_quantize(jnp.asarray(w), st)),
        rtol=1e-6,
    )
