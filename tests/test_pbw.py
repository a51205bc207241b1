"""PBW packed format: pack → dequantize exactness, serialization round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from pb_llm_tpu.core import pbw
from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize


def _make_quantized(oc=16, ic=64, method="xnor", groupsize=-1, frac_binary=0.8, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    # mask=True ⇔ binarized (GPTQ-PB convention)
    thresh = np.quantile(np.abs(w), frac_binary)
    mask = np.abs(w) <= thresh
    low_state = low_calibrate(jnp.asarray(w * mask), method, groupsize)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, method, groupsize))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)
    return w_q, mask, low_state, high_state


@pytest.mark.parametrize("method", ["xnor", "sign", "rtn", "prune"])
def test_pack_dequant_exact(method):
    w_q, mask, low_state, high_state = _make_quantized(method=method)
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, method)
    assert diag["pack_mismatch"] == 0.0
    w_rt = np.asarray(pbw.dequantize(p)).T
    np.testing.assert_allclose(w_rt, w_q, rtol=1e-6, atol=1e-7)


def test_pack_grouped():
    w_q, mask, low_state, high_state = _make_quantized(oc=8, ic=128, groupsize=32)
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor", groupsize=32)
    assert p.low_scale.shape == (4, 8)
    assert diag["pack_mismatch"] == 0.0


def test_matmul_reference_matches_dense():
    w_q, mask, low_state, high_state = _make_quantized()
    bias = np.linspace(-1, 1, 16).astype(np.float32)
    p, _ = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor", bias=jnp.asarray(bias))
    x = np.random.default_rng(1).standard_normal((5, 64)).astype(np.float32)
    y = np.asarray(pbw.matmul_reference(jnp.asarray(x), p))
    np.testing.assert_allclose(y, x @ w_q.T + bias, rtol=1e-4, atol=1e-4)


def test_effective_bits_bp2():
    w_q, mask, low_state, high_state = _make_quantized(oc=128, ic=256)
    p, _ = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
    bits = p.effective_bits()
    assert 10.0 <= bits < 10.6  # 1 sign + 1 mask + 8 sidecar + per-oc scale overhead


def test_save_load_roundtrip(tmp_path):
    w_q, mask, low_state, high_state = _make_quantized()
    p, _ = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
    pbw.save_pbw(str(tmp_path / "ckpt"), {"layer0.q_proj": p}, {"model": "test"})
    layers, extra = pbw.load_pbw(str(tmp_path / "ckpt"))
    assert extra == {"model": "test"}
    p2 = layers["layer0.q_proj"]
    assert (p2.ic, p2.oc, p2.groupsize) == (p.ic, p.oc, p.groupsize)
    np.testing.assert_allclose(np.asarray(pbw.dequantize(p2)), np.asarray(pbw.dequantize(p)))
    assert p2.bias is None


@pytest.mark.parametrize("method,bits", [("2bit", 2), ("4bit", 4)])
def test_pack_multiplane_low(method, bits):
    """2-bit/4-bit low methods pack as stacked bitplanes, exactly."""
    rng = np.random.default_rng(11)
    oc, ic = 16, 128
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.7)
    low_state = low_calibrate(jnp.asarray(w * mask), method)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, method))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, method)
    assert p.low_bits == bits
    assert p.sign_packed.shape == (bits * ic // 32, oc)
    assert diag["pack_mismatch"] == 0.0
    np.testing.assert_allclose(np.asarray(pbw.dequantize(p)).T, w_q, rtol=1e-5, atol=1e-6)

    x = jnp.asarray(rng.standard_normal((4, ic)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(pbw.matmul_reference(x, p)), np.asarray(x) @ w_q.T, rtol=1e-4, atol=1e-4
    )
