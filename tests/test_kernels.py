"""Pallas fused kernel vs the XLA dequant reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pb_llm_tpu.core import pbw
from pb_llm_tpu.ops import binary_matmul, pallas_pb
from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize


def _packed(oc, ic, groupsize=-1, frac_binary=0.8, seed=0, bias=False):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    thresh = np.quantile(np.abs(w), frac_binary)
    mask = np.abs(w) <= thresh
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor", groupsize)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor", groupsize))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)
    b = jnp.asarray(rng.standard_normal(oc).astype(np.float32)) if bias else None
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor", groupsize, bias=b)
    assert diag["pack_mismatch"] == 0.0
    return p


@pytest.mark.parametrize(
    "oc,ic,gs",
    [
        (128, 256, -1),      # single ic tile
        (256, 512, -1),      # multi oc + ic tiles
        (128, 512, 256),     # groupsize == ic tile
        (128, 512, 128),     # two groups per ic tile
        (128, 64, -1),       # short ic (< one pack block)
    ],
)
def test_pallas_matches_xla_reference(oc, ic, gs):
    p = _packed(oc, ic, groupsize=gs, bias=True)
    assert pallas_pb.pallas_supported(p)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((5, ic)).astype(np.float32))
    y_ref = pbw.matmul_reference(x, p)
    y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-4)


def test_pallas_no_bias_and_tall_x():
    p = _packed(128, 256, bias=False)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((64, 256)).astype(np.float32))
    y_ref = pbw.matmul_reference(x, p)
    y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-4)


def test_dispatch_backend_control():
    p = _packed(128, 256)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((3, 256)).astype(np.float32))
    binary_matmul.set_backend("xla")
    y_x = binary_matmul.pb_matmul(x, p)
    binary_matmul.set_backend("pallas_interpret")
    y_p = binary_matmul.pb_matmul(x, p)
    binary_matmul.set_backend("auto")
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-4)


def test_unsupported_shapes_fall_back():
    p = _packed(48, 32)  # oc not a lane multiple
    assert not pallas_pb.pallas_supported(p)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 32)).astype(np.float32))
    binary_matmul.set_backend("auto")
    y = binary_matmul.pb_matmul(x, p)  # must not crash; uses XLA path
    np.testing.assert_allclose(np.asarray(y), np.asarray(pbw.matmul_reference(x, p)), rtol=1e-5)


def test_high_bit4_nibble_sidecar():
    """--high_bit 4 configs pack the sidecar as nibbles (6 bits/w total)."""
    from pb_llm_tpu.core import packing

    rng = np.random.default_rng(5)
    oc, ic = 128, 512
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.8)
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor")
    high_state = high_calibrate(jnp.asarray(w), bits=4)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor"))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
    assert p.sidecar_bits == 4
    assert p.sidecar.shape == (ic // 2, oc)
    assert diag["pack_mismatch"] == 0.0
    assert p.effective_bits() < 6.6

    x = jnp.asarray(rng.standard_normal((5, ic)).astype(np.float32))
    y_ref = pbw.matmul_reference(x, p)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(x) @ w_q.T, rtol=1e-4, atol=1e-4)
    assert pallas_pb.pallas_supported(p)
    y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-4)


def test_nibble_packing_roundtrip():
    from pb_llm_tpu.core import packing

    rng = np.random.default_rng(6)
    codes = rng.integers(0, 16, size=(544, 12)).astype(np.uint8)
    b = packing.pack_nibbles_np(codes, 256)
    assert b.shape == (272, 12)
    np.testing.assert_array_equal(packing.unpack_nibbles_np(b, 544, 256), codes)
    bj = packing.pack_nibbles(jnp.asarray(codes), 256)
    np.testing.assert_array_equal(np.asarray(bj), b)
    np.testing.assert_array_equal(np.asarray(packing.unpack_nibbles(bj, 544, 256)), codes)


def test_large_m_select_dispatch_matches():
    """m>=256 routes to the one-dot select kernel; results match planar/XLA."""
    p = _packed(128, 512)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((300, 512)).astype(np.float32))
    y_ref = pbw.matmul_reference(x, p)
    y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=2e-4)


def test_large_m_select_nibble_sidecar():
    from pb_llm_tpu.quant.high_quant import high_calibrate as hc

    rng = np.random.default_rng(8)
    oc, ic = 128, 512
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.7)
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor")
    high_state = hc(jnp.asarray(w), bits=4)
    w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor")),
                   np.asarray(high_quantize(jnp.asarray(w), high_state)))
    p, _ = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
    assert p.sidecar_bits == 4
    x = jnp.asarray(rng.standard_normal((300, ic)).astype(np.float32))
    y_ref = pbw.matmul_reference(x, p)
    y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=2e-4)


def test_qat_grad_accum_matches_full_batch():
    """grad_accum microbatching == one big batch (same update)."""
    import copy

    import torch
    from transformers import OPTConfig, OPTForCausalLM

    from pb_llm_tpu.models import hf_import
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.train import qat as tq

    hf_cfg = OPTConfig(vocab_size=64, hidden_size=16, ffn_dim=32, num_hidden_layers=1,
                       num_attention_heads=2, max_position_embeddings=32, word_embed_proj_dim=16, dropout=0.0)
    torch.manual_seed(0)
    params, cfg, _ = hf_import.from_torch_model(OPTForCausalLM(hf_cfg).eval().float())
    fam = family_for("opt")
    batch = {"input_ids": np.random.default_rng(0).integers(0, 64, size=(4, 8))}

    outs = []
    for accum in (1, 4):
        qcfg = tq.QATConfig(outlier_fraction=0.2, train_steps=2, learning_rate=1e-3, grad_accum=accum, remat=False)
        qp = tq.replace_linears(copy.deepcopy(params), fam, qcfg)
        opt = tq.make_optimizer(qcfg, qp)
        st = opt.init(qp)
        import jax

        step = jax.jit(tq.make_train_step(cfg, fam, qcfg, opt))
        qp, st, loss = step(qp, st, {k: jnp.asarray(v) for k, v in batch.items()})
        outs.append((float(loss), np.asarray(qp["layers"][0]["fc1"].weight)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("method", ["2bit", "4bit"])
def test_pallas_multiplane_low(method):
    rng = np.random.default_rng(12)
    oc, ic = 128, 512
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.8)
    low_state = low_calibrate(jnp.asarray(w * mask), method)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, method)),
                   np.asarray(high_quantize(jnp.asarray(w), high_state)))
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, method)
    assert diag["pack_mismatch"] == 0.0
    assert pallas_pb.pallas_supported(p)
    for m in (5, 300):  # planar (decode) and select (prefill) paths
        x = jnp.asarray(rng.standard_normal((m, ic)).astype(np.float32))
        y_ref = pbw.matmul_reference(x, p)
        y_pal = pallas_pb.pb_matmul_pallas(x, p, interpret=True)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=2e-4)


def test_planar_grouped_fast_path():
    """groupsize=128 decode hits the PLANAR kernel (per-group coefficient
    slices, ROADMAP item 3) instead of the select fallback, and matches the
    XLA reference exactly."""
    for oc, ic, gs in ((128, 512, 128), (128, 512, 256), (256, 256, 64)):
        p = _packed(oc, ic, groupsize=gs, bias=True)
        assert p.pack_block <= gs and gs % p.pack_block == 0, (p.pack_block, gs)
        assert pallas_pb._planar_ok(8, p), (oc, ic, gs)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((8, ic)).astype(np.float32))
        y_ref = pbw.matmul_reference(x, p)
        y_pal = pallas_pb._planar_call(x, p, pallas_pb._default_oc_tile(oc), interpret=True)
        np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref), rtol=1e-5, atol=1e-4)
