"""PBW v2 (column-structured sidecar): pack/dequant exactness, budget,
serialization, kernel parity (interpret mode), and the quality-delta bound
of structured vs elementwise selection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pb_llm_tpu.core import pbw
from pb_llm_tpu.ops import pallas_pb
from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize


def _make_v2(oc=64, ic=128, method="xnor", low_frac=0.8, col_tile=16, seed=0, bias=False,
             high_bits=8):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    # column-heavy scales so the structured mask is a realistic selection
    w *= (1.0 + 3.0 * (rng.random(ic) < 0.1))[None, :]
    mask = np.asarray(pbw.column_structured_mask(jnp.abs(jnp.asarray(w)), low_frac, col_tile))
    low_state = low_calibrate(jnp.asarray(w * mask), method, -1)
    high_state = high_calibrate(jnp.asarray(w), bits=high_bits)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, method, -1))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)
    b = rng.standard_normal(oc).astype(np.float32) if bias else None
    p, diag = pbw.pack_linear_v2(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state,
                                 method, col_tile=col_tile,
                                 bias=None if b is None else jnp.asarray(b))
    return w_q, mask, p, diag, b


def test_column_mask_structure_and_budget():
    rng = np.random.default_rng(1)
    metric = jnp.asarray(rng.random((64, 128)).astype(np.float32))
    mask = np.asarray(pbw.column_structured_mask(metric, 0.9, 16))
    # exactly round(0.1*128)=13 salient columns per 16-row group
    sal = ~mask
    for t in range(4):
        blk = sal[t * 16 : (t + 1) * 16]
        assert (blk == blk[0:1]).all()
        assert blk[0].sum() == 13


@pytest.mark.parametrize("method", ["xnor", "sign", "rtn", "prune"])
def test_v2_pack_dequant_exact(method):
    w_q, mask, p, diag, _ = _make_v2(method=method)
    assert diag["pack_mismatch"] == 0.0
    w_rt = np.asarray(pbw.dequantize_v2(p)).T
    np.testing.assert_allclose(w_rt, w_q, rtol=1e-6, atol=1e-7)


def test_v2_effective_bits():
    _, _, p, diag, _ = _make_v2(oc=256, ic=512, low_frac=0.9, col_tile=64)
    # 1 (sign) + ~0.1·8 (values, padded) + small index/scale overhead
    assert diag["effective_bits"] < 3.5
    assert diag["salient_frac"] == pytest.approx(0.1, abs=0.01)


def test_v2_matmul_reference_matches_dense():
    w_q, _, p, _, b = _make_v2(bias=True)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, p.ic)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        y = np.asarray(pbw.matmul_reference_v2(x, p))
        ref = np.asarray(x) @ w_q.T + b
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("oc_tile,col_tile", [(128, 128), (128, 256), (256, 128)])
def test_v2_kernel_interpret_matches_reference(oc_tile, col_tile):
    w_q, _, p, _, b = _make_v2(oc=256, ic=256, col_tile=col_tile, bias=True)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((8, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=oc_tile))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_kernel_interpret_prefill_m_tiling():
    w_q, _, p, _, _ = _make_v2(oc=256, ic=256, col_tile=128)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((300, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_serialization_roundtrip(tmp_path):
    _, _, p, _, b = _make_v2(bias=True)
    pbw.save_pbw(str(tmp_path / "ck"), {"layer_0/q_proj": p})
    loaded, _ = pbw.load_pbw(str(tmp_path / "ck"))
    q = loaded["layer_0/q_proj"]
    assert isinstance(q, pbw.PackedLinearV2)
    assert q.col_tile == p.col_tile and q.k_pad == p.k_pad
    np.testing.assert_array_equal(np.asarray(q.side_idx), np.asarray(p.side_idx))
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(q)), np.asarray(pbw.dequantize_v2(p)))


def test_v2_rejects_unstructured_mask():
    rng = np.random.default_rng(7)
    w = rng.standard_normal((32, 64)).astype(np.float32)
    mask = rng.random((32, 64)) < 0.9  # elementwise-random
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor", -1)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    with pytest.raises(ValueError, match="column-structured"):
        pbw.pack_linear_v2(jnp.asarray(w), jnp.asarray(mask), low_state, high_state,
                           "xnor", col_tile=16)


def test_structured_vs_elementwise_output_mse():
    """The structured selection's RTN output-MSE penalty vs the reference's
    elementwise mask must stay bounded on column-heavy weights (the regime
    real LLMs are in; GPTQ error feedback shrinks it further)."""
    rng = np.random.default_rng(9)
    oc, ic, low_frac = 128, 256, 0.9
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    w *= (1.0 + 4.0 * (rng.random(ic) < 0.08))[None, :]

    def quantize_with(mask):
        low_state = low_calibrate(jnp.asarray(w * mask), "xnor", -1)
        high_state = high_calibrate(jnp.asarray(w), bits=8)
        q = np.where(mask,
                     np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor", -1)),
                     np.asarray(high_quantize(jnp.asarray(w), high_state)))
        x = rng.standard_normal((64, ic)).astype(np.float32)
        return float(((x @ (q - w).T) ** 2).mean())

    # reference: elementwise magnitude quantile (gptq_pb/gptq.py:84-101)
    thresh = np.quantile(np.abs(w), low_frac)
    mask_elem = np.abs(w) <= thresh
    mask_col = np.asarray(pbw.column_structured_mask(jnp.abs(jnp.asarray(w)), low_frac, 32))
    mse_elem = quantize_with(mask_elem)
    mse_col = quantize_with(mask_col)
    # structured selection costs at most 2x the elementwise output MSE here
    assert mse_col < 2.0 * mse_elem, (mse_elem, mse_col)


# ---------------------------------------------------------------------------
# solver + pipeline integration
# ---------------------------------------------------------------------------


def test_solver_column_mask_structure():
    from pb_llm_tpu.calib.solver import SolverConfig, gptq_pb

    rng = np.random.default_rng(11)
    oc, ic = 64, 128
    w = jnp.asarray(rng.standard_normal((oc, ic)).astype(np.float32))
    x = rng.standard_normal((256, ic)).astype(np.float32)
    h = jnp.asarray((2.0 / 256) * x.T @ x)

    cfg = SolverConfig(low_method="xnor", low_frac=0.9, salient_metric="hessian",
                       mask_structure="column", col_tile=16)
    out = gptq_pb(w, h, cfg)
    sal = ~np.asarray(out["mask"])
    for t in range(oc // 16):
        blk = sal[t * 16 : (t + 1) * 16]
        assert (blk == blk[0:1]).all()
        assert blk[0].sum() == round(ic * 0.1)
    # GPTQ error feedback still produces a finite, nontrivial solution
    assert np.isfinite(float(out["error"]))


def test_solver_column_vs_element_error_bounded():
    """GPTQ compensation: the structured mask's reconstruction error must stay
    within a small factor of the elementwise mask's on column-heavy weights."""
    from pb_llm_tpu.calib.solver import SolverConfig, gptq_pb

    rng = np.random.default_rng(13)
    oc, ic = 64, 128
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    w *= (1.0 + 4.0 * (rng.random(ic) < 0.1))[None, :]
    x = rng.standard_normal((256, ic)).astype(np.float32)
    h = jnp.asarray((2.0 / 256) * x.T @ x)

    base = dict(low_method="xnor", low_frac=0.9, salient_metric="hessian")
    err_elem = float(gptq_pb(jnp.asarray(w), h, SolverConfig(**base))["error"])
    err_col = float(gptq_pb(jnp.asarray(w), h, SolverConfig(**base, mask_structure="column", col_tile=16))["error"])
    assert err_col < 2.5 * err_elem, (err_elem, err_col)


def test_pipeline_packed_v2_end_to_end():
    """quantize_model_ptq(fmt='packed_v2') → PackedLinearV2 leaves → forward
    runs through the packed dispatch and matches the sim-format model."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    import pb_llm_tpu.ops.binary_matmul  # registers packed dispatch

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=4, max_position_embeddings=64)
    fam = family_for("huggyllama/llama-7b")
    rng = np.random.default_rng(17)
    calib = rng.integers(0, 64, size=(2, 16))

    scfg = SolverConfig(low_method="xnor", low_frac=0.8, salient_metric="magnitude",
                        mask_structure="column", col_tile=16)

    params_sim = jllama.init_params(cfg, jax.random.PRNGKey(3))
    params_sim, _ = quantize_model_ptq(params_sim, cfg, fam, calib, scfg, fmt="sim", log=None)

    params_v2 = jllama.init_params(cfg, jax.random.PRNGKey(3))
    params_v2, rep = quantize_model_ptq(params_v2, cfg, fam, calib, scfg, fmt="packed_v2", log=None)
    assert isinstance(params_v2["layers"][0]["q_proj"], pbw.PackedLinearV2)

    ids = jnp.asarray(rng.integers(0, 64, size=(1, 8)))
    with jax.default_matmul_precision("float32"):
        y_sim, _ = jllama.forward(params_sim, ids, cfg)
        y_v2, _ = jllama.forward(params_v2, ids, cfg)
    np.testing.assert_allclose(np.asarray(y_v2), np.asarray(y_sim), rtol=2e-4, atol=2e-4)


def test_pipeline_packed_v2_requires_column_masks():
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=1, num_attention_heads=4,
                             num_key_value_heads=4, max_position_embeddings=64)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="mask_structure"):
        quantize_model_ptq(params, cfg, family_for("huggyllama/llama-7b"),
                           np.zeros((1, 8), np.int64),
                           SolverConfig(low_frac=0.5), fmt="packed_v2", log=None)


# ---------------------------------------------------------------------------
# ic_shards (row-parallel TP layout)
# ---------------------------------------------------------------------------


def _make_v2_sharded(oc=64, ic=128, ic_shards=4, low_frac=0.8, col_tile=16, seed=21):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.asarray(pbw.column_structured_mask(jnp.abs(jnp.asarray(w)), low_frac, col_tile,
                                                 ic_shards=ic_shards))
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor", -1)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor", -1)),
                   np.asarray(high_quantize(jnp.asarray(w), high_state)))
    p, diag = pbw.pack_linear_v2(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state,
                                 "xnor", col_tile=col_tile, ic_shards=ic_shards,
                                 pack_block=ic // ic_shards, k_multiple=8)
    return w_q, mask, p, diag


def test_v2_ic_shards_pack_dequant_exact():
    w_q, mask, p, diag = _make_v2_sharded()
    assert diag["pack_mismatch"] == 0.0
    assert p.shards_local == 4 and p.ic_shard_local == 32
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(p)).T, w_q, rtol=1e-6, atol=1e-7)


def test_v2_ic_shards_kernel_interpret():
    w_q, _, p, _ = _make_v2_sharded(oc=256, ic=256, ic_shards=4, col_tile=128)
    x = jnp.asarray(np.random.default_rng(22).standard_normal((8, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_local_shard_view_is_plain_v2():
    """Slicing the shard-major planes by shard (what P('tp', None) does under
    shard_map) yields a normal single-shard v2 whose dequant equals the
    corresponding ic rows of the global dequant."""
    import dataclasses as dc

    w_q, _, p, _ = _make_v2_sharded()
    full = np.asarray(pbw.dequantize_v2(p))  # [ic, oc]
    S, kps, ic_s = p.shards_local, p.k_pad_shard_local, p.ic_shard_local
    wpp = p.sign_packed.shape[0] // S
    for s in range(S):
        local = dc.replace(
            p,
            sign_packed=p.sign_packed[s * wpp : (s + 1) * wpp],
            side_val=p.side_val[s * kps : (s + 1) * kps],
            side_idx=p.side_idx[s * kps : (s + 1) * kps],
        )
        assert local.shards_local == 1
        np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(local)),
                                   full[s * ic_s : (s + 1) * ic_s], rtol=1e-6, atol=1e-7)


def test_tpengine_with_v2_leaves():
    """The flagship composition: v2-packed weights (ic_shards=tp for the
    row-parallel layers) under TP shard_map + continuous batching, token-
    exact vs the single-device Engine."""
    import copy

    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime import tp_engine
    from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    TP = 4
    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=8, max_position_embeddings=64)
    fam = family_for("huggyllama/llama-7b")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 128, size=(2, 16))
    scfg = SolverConfig(low_frac=0.8, blocksize=32, mask_structure="column",
                        col_tile=16, ic_shards=TP)
    packed, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None, pack_block=32)
    assert isinstance(packed["layers"][0]["down_proj"], pbw.PackedLinearV2)

    reqs = lambda: [Request(request_id=i, prompt_ids=[3 + i, 7, 11, 2], max_new_tokens=5)
                    for i in range(4)]
    ecfg = EngineConfig(n_slots=2, max_seq=32, prefill_buckets=(8,))
    done_ref = ContinuousBatcher(Engine(copy.deepcopy(packed), cfg, fam, ecfg)).run(reqs())

    mesh = pmesh.make_mesh(dp=1, tp=TP)
    eng_tp = tp_engine.TPEngine(copy.deepcopy(packed), cfg, fam, ecfg, mesh)
    done_tp = ContinuousBatcher(eng_tp).run(reqs())
    for a, b in zip(done_ref, done_tp):
        assert a.output_ids == b.output_ids, (a.request_id, a.output_ids, b.output_ids)


# ---------------------------------------------------------------------------
# global column selection (col_tile=0 → whole layer, the default layout)
# ---------------------------------------------------------------------------


def test_v2_global_columns_pack_dequant_and_kernel():
    w_q, mask, p, diag, b = _make_v2(oc=256, ic=256, col_tile=0, bias=True)
    assert p.col_tile == 256 and p.n_row_groups == 1  # normalized to oc
    assert diag["pack_mismatch"] == 0.0
    sal = ~mask
    assert (sal == sal[0:1]).all()  # one shared column set
    x = jnp.asarray(np.random.default_rng(6).standard_normal((8, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_global_columns_col_parallel_spec_replicates_side_idx():
    """Under TP, a global-selection layer sharded on oc shares ONE column
    set: side_idx must replicate (not shard) or the all-or-nothing sanitizer
    would replicate the whole layer."""
    from pb_llm_tpu.parallel.sharding import _leaf_spec
    from jax.sharding import PartitionSpec as P

    _, _, p, _, _ = _make_v2(oc=256, ic=256, col_tile=0)
    spec = _leaf_spec("up_proj", p)
    assert spec.side_idx == P()
    assert spec.side_val == P(None, "tp")
    assert spec.sign_packed == P(None, "tp")

    _, _, p_rg, _, _ = _make_v2(oc=256, ic=256, col_tile=64)
    spec_rg = _leaf_spec("up_proj", p_rg)
    assert spec_rg.side_idx == P(None, "tp")


def test_v2_prefill_kernel_bf16_close():
    w_q, _, p, _, b = _make_v2(oc=256, ic=256, col_tile=0, bias=True)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((300, 256)).astype(np.float32))
    ref = np.asarray(pbw.matmul_reference_v2(x, p))
    got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128,
                                                   prefill_bf16=True))
    # bound by the error a plain bf16 matmul of the dequantized weights makes
    # (the kernel accumulates in f32, so it is typically BELOW this envelope)
    wd = pbw.dequantize_v2(p)
    oracle = np.asarray(x.astype(jnp.bfloat16) @ wd.astype(jnp.bfloat16)) + np.asarray(p.bias)
    env = np.abs(oracle - ref).max()
    assert np.abs(got - ref).max() < 2.0 * env, (np.abs(got - ref).max(), env)


def test_v2_prefill_kernel_ic_shards():
    w_q, _, p, _ = _make_v2_sharded(oc=256, ic=256, ic_shards=4, col_tile=128)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((300, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_decode_dot_paths_match_reference():
    """Decode dot-path arms (VERDICT r2 item 1): "bf16" and "pair" round
    only x to bf16 — planes {0,2} and uint8 codes are bf16-exact — so both
    must match the reference within bf16 tolerance; "pair" additionally
    exercises the u16 sublane bitcast + pair-permuted x layout."""
    for (oc, ic, ct, hb, shards) in [(256, 128, 0, 8, 1), (256, 256, 64, 8, 1),
                                     (128, 416, 0, 4, 1)]:
        w_q, _, p, _, b = _make_v2(oc=oc, ic=ic, col_tile=ct, bias=True,
                                   high_bits=hb, low_frac=0.9)
        x = jnp.asarray(np.random.default_rng(11).standard_normal((4, ic)).astype(np.float32))
        with jax.default_matmul_precision("float32"):
            ref = np.asarray(pbw.matmul_reference_v2(x, p))
            for dd in ("bf16", "pair"):
                got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
                    x, p, interpret=True, oc_tile=128, decode_dot=dd))
                scale = np.abs(ref).max() + 1e-9
                assert np.abs(got - ref).max() / scale < 2e-2, (oc, ic, ct, hb, dd)


def test_v2_decode_dot_int8_close():
    """decode_dot="int8" (byte-lane extraction, per-row absmax x): relative
    error is bounded by x's int8 rounding — same engine-grade bar as the
    bf16/pair arms.  Global-selection layouts only (col_tile=0)."""
    for (oc, ic, hb) in [(256, 128, 8), (128, 416, 4), (256, 2048, 8)]:
        w_q, _, p, _, b = _make_v2(oc=oc, ic=ic, col_tile=0, bias=True,
                                   high_bits=hb, low_frac=0.9)
        x = jnp.asarray(np.random.default_rng(13).standard_normal((4, ic)).astype(np.float32))
        with jax.default_matmul_precision("float32"):
            ref = np.asarray(pbw.matmul_reference_v2(x, p))
            got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
                x, p, interpret=True, oc_tile=128, decode_dot="int8"))
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 2e-2, (oc, ic, hb)


def test_v2_decode_dot_int8_exact_at_unit_scale():
    """When every row of x is integer-valued with absmax exactly 127
    (sx = 1), the int8 quantization is lossless and the int8 kernel matches
    the exact f32 kernel bit-for-bit: integer dots < 2^24 are exact in both
    f32 and int32 accumulation, and both paths then apply the same f32
    coefficient math."""
    oc, ic = 256, 256
    w_q, _, p, _, b = _make_v2(oc=oc, ic=ic, col_tile=0, bias=True, low_frac=0.9)
    r = np.random.default_rng(14)
    x = r.integers(-127, 128, size=(4, ic)).astype(np.float32)
    x[:, 0] = 127.0  # pin each row's absmax to 127 → sx == 1.0
    x = jnp.asarray(x)
    with jax.default_matmul_precision("float32"):
        f32 = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, decode_dot="f32"))
        i8 = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, decode_dot="int8"))
    np.testing.assert_allclose(i8, f32, rtol=1e-6, atol=1e-5)


def test_byte_permute_is_permutation():
    """byte_permute_x is a pure column permutation whose order matches the
    int8 byte-plane rows: new col b·4g + 4i + j == old col (8j + b)·g + i."""
    ic, pack_block = 256, 64
    x = jnp.asarray(np.arange(2 * ic, dtype=np.float32).reshape(2, ic))
    xp = np.asarray(pallas_pb.byte_permute_x(x, ic, pack_block))
    assert sorted(xp[0].tolist()) == sorted(np.asarray(x)[0].tolist())
    g = pack_block // 32
    for b_ in (0, 3, 7):
        for i in range(g):
            for j in range(4):
                assert xp[0, b_ * 4 * g + 4 * i + j] == (8 * j + b_) * g + i


def test_v2_decode_dot_pair_ic_shards():
    """Pair path with the row-parallel TP sidecar layout (ic_shards > 1)."""
    w_q, _, p, _ = _make_v2_sharded(oc=256, ic=256, ic_shards=4, col_tile=0)
    x = jnp.asarray(np.random.default_rng(12).standard_normal((4, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, decode_dot="pair"))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-2


def test_pair_permute_is_permutation():
    """pair_permute_x is a pure column permutation (rowsums invariant) whose
    order matches the paired plane rows: checked against a direct unpack."""
    from pb_llm_tpu.core import packing

    ic, pack_block = 256, 64
    x = jnp.asarray(np.arange(2 * ic, dtype=np.float32).reshape(2, ic))
    xp = np.asarray(pallas_pb.pair_permute_x(x, ic, pack_block))
    assert sorted(xp[0].tolist()) == sorted(np.asarray(x)[0].tolist())
    # block 0: g = 64//32 = 2; new col p*2g + 2i + h == old col (p + 16h)*g + i
    g = pack_block // 32
    for p_ in (0, 3, 15):
        for i in range(g):
            assert xp[0, p_ * 2 * g + 2 * i] == p_ * g + i
            assert xp[0, p_ * 2 * g + 2 * i + 1] == (p_ + 16) * g + i


def test_v2_prefill_variants_match_reference():
    """ROADMAP 1c experiment paths: one-hot-dot gather and pure-XLA
    extraction must equal the default take/pallas hybrid numerics."""
    w_q, _, p, _, b = _make_v2(oc=256, ic=256, col_tile=0, bias=True)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((300, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        for gather in ("take", "dot"):
            for extract in ("pallas", "xla"):
                got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
                    x, p, interpret=True, oc_tile=128,
                    prefill_gather=gather, prefill_extract=extract))
                np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4,
                                           err_msg=f"{gather}/{extract}")


def test_v2_prefill_variants_ic_shards():
    # col_tile=0 → global selection (n_row_groups == 1) so the hybrid path
    # (the only consumer of gather/extract) actually runs
    w_q, _, p, _ = _make_v2_sharded(oc=256, ic=256, ic_shards=4, col_tile=0)
    assert p.n_row_groups == 1
    x = jnp.asarray(np.random.default_rng(10).standard_normal((300, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128,
            prefill_gather="dot", prefill_extract="xla"))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_dequant_v2_binary_xla_matches_pallas():
    _, _, p, _, _ = _make_v2(oc=256, ic=256, col_tile=0, bias=True)
    w_pl = np.asarray(pallas_pb._dequant_v2_binary(p, dtype=jnp.float32, interpret=True))
    w_xla = np.asarray(pallas_pb.dequant_v2_binary_xla(p, dtype=jnp.float32))
    np.testing.assert_allclose(w_xla, w_pl, rtol=0, atol=0)


def test_tpengine_v2_hybrid_prefill():
    """v2 global-column leaves under TP with a bucket >= 256: exercises the
    hybrid prefill (Pallas dequant + XLA two-dot) inside shard_map, token-
    exact vs the single-device engine."""
    import copy

    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime import tp_engine
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    TP = 4
    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=8, max_position_embeddings=512)
    fam = family_for("huggyllama/llama-7b")
    params = jllama.init_params(cfg, jax.random.PRNGKey(1))
    calib = np.random.default_rng(1).integers(0, 128, size=(2, 16))
    scfg = SolverConfig(low_frac=0.8, blocksize=32, mask_structure="column",
                        col_tile=0, ic_shards=TP)
    packed, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None, pack_block=32)
    assert packed["layers"][0]["down_proj"].n_row_groups == 1

    ecfg = EngineConfig(n_slots=1, max_seq=320, prefill_buckets=(256,))
    prompt = list(np.random.default_rng(9).integers(0, 128, size=30))

    ref = Engine(copy.deepcopy(packed), cfg, fam, ecfg)
    want = [ref.prefill(0, prompt)]
    for _ in range(3):
        want.append(ref.decode_step()[0])

    mesh = pmesh.make_mesh(dp=1, tp=TP)
    eng = tp_engine.TPEngine(copy.deepcopy(packed), cfg, fam, ecfg, mesh)
    got = [eng.prefill(0, prompt)]
    for _ in range(3):
        got.append(eng.decode_step()[0])
    assert got == want, (got, want)


# ---------------------------------------------------------------------------
# 4-bit sidecar (side_bits=4: two codes per byte, block-paired nibbles)
# ---------------------------------------------------------------------------


def test_v2_4bit_sidecar_pack_dequant_exact():
    w_q, mask, p, diag, _ = _make_v2(oc=64, ic=128, high_bits=4)
    assert p.side_bits == 4
    assert diag["pack_mismatch"] == 0.0
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(p)).T, w_q,
                               rtol=1e-6, atol=1e-7)


def test_v2_4bit_effective_bits_halves_sidecar():
    _, _, p8, d8, _ = _make_v2(oc=256, ic=512, low_frac=0.9, col_tile=64, high_bits=8)
    _, _, p4, d4, _ = _make_v2(oc=256, ic=512, low_frac=0.9, col_tile=64, high_bits=4)
    assert p4.side_val.shape[0] * 2 == p8.side_val.shape[0]
    assert p4.k_pad == p8.k_pad  # row accounting stays in unpacked units
    # sidecar stream halves: ~1 + 0.1·4 vs ~1 + 0.1·8 (plus shared overhead)
    assert d4["effective_bits"] < d8["effective_bits"] - 0.3


def test_v2_4bit_kernel_decode_and_prefill_match_reference():
    w_q, _, p, _, b = _make_v2(oc=256, ic=256, col_tile=0, bias=True, high_bits=4)
    assert p.side_bits == 4 and p.n_row_groups == 1
    for m in (8, 300):  # planar decode path and hybrid prefill path
        x = jnp.asarray(np.random.default_rng(m).standard_normal((m, 256)).astype(np.float32))
        with jax.default_matmul_precision("float32"):
            ref = np.asarray(pbw.matmul_reference_v2(x, p))
            got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4, err_msg=f"m={m}")


def test_v2_4bit_row_groups_kernel():
    """Per-row-group layout (col_tile < oc) also runs the planar kernel with
    nibble unpack."""
    w_q, _, p, diag, _ = _make_v2(oc=256, ic=256, col_tile=64, high_bits=4)
    assert p.side_bits == 4 and p.n_row_groups == 4
    assert diag["pack_mismatch"] == 0.0
    x = jnp.asarray(np.random.default_rng(5).standard_normal((8, 256)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=128))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_4bit_ic_shards_pack_dequant():
    rng = np.random.default_rng(31)
    oc, ic, S = 64, 256, 4
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.asarray(pbw.column_structured_mask(jnp.abs(jnp.asarray(w)), 0.8, 0, ic_shards=S))
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor", -1)
    high_state = high_calibrate(jnp.asarray(w), bits=4)
    w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor", -1)),
                   np.asarray(high_quantize(jnp.asarray(w), high_state)))
    p, diag = pbw.pack_linear_v2(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state,
                                 "xnor", col_tile=0, ic_shards=S, pack_block=ic // S)
    assert p.side_bits == 4 and p.shards_local == S
    assert diag["pack_mismatch"] == 0.0
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(p)).T, w_q, rtol=1e-6, atol=1e-7)
    x = jnp.asarray(rng.standard_normal((8, ic)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(x, p, interpret=True, oc_tile=64))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_v2_4bit_serialization_roundtrip(tmp_path):
    from pb_llm_tpu.core.pbw import load_pbw, save_pbw

    _, _, p, _, _ = _make_v2(oc=64, ic=128, high_bits=4, bias=True)
    save_pbw(str(tmp_path / "pbw4"), {"l": p})
    loaded, _ = load_pbw(str(tmp_path / "pbw4"))
    lp = loaded["l"]
    assert lp.side_bits == 4 and lp.k_pad == p.k_pad
    np.testing.assert_array_equal(np.asarray(lp.side_val), np.asarray(p.side_val))
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(lp)),
                               np.asarray(pbw.dequantize_v2(p)), rtol=0, atol=0)


def test_engine_decode_dot_int8_quality_bound():
    """Engine-level quality of decode_dot="int8" (per-row absmax x): the
    teacher-forced decode NLL through the pallas-interpret engine moves
    < 2% relative vs the exact f32 arm — same bar as the int8 KV cache."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.ops import binary_matmul
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=8, max_position_embeddings=64)
    fam = family_for("huggyllama/llama-7b")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 128, size=(2, 16))
    scfg = SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column",
                        col_tile=0)  # global columns: the int8 path's layout
    packed, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None, pack_block=32)

    prompt = [5, 17, 42, 3]
    forced = [7, 21, 9, 33, 2]
    nll = {}
    binary_matmul.set_backend("pallas_interpret")
    try:
        for dd in ("f32", "int8"):
            binary_matmul.set_decode_dot(dd)
            eng = Engine(packed, cfg, fam,
                         EngineConfig(n_slots=1, max_seq=32, prefill_buckets=(8,)))
            eng.prefill(0, prompt)
            nll[dd] = eng.forced_decode_nll(0, forced)
    finally:
        binary_matmul.set_backend("auto")
        binary_matmul.set_decode_dot("auto")
    assert np.isfinite(nll["int8"]) and nll["int8"] > 0
    assert abs(nll["int8"] - nll["f32"]) / nll["f32"] < 0.02, nll


def test_engine_prefill_int8_quality_bound_and_per_engine_kernels():
    """Engine-level quality gate for the fused int8 prefill (the TPU serving
    DEFAULT since round 4): teacher-forced NLL with prefill="int8" moves
    < 2% relative vs the exact hybrid — same bar as the int8 decode dot
    (VERDICT r3 #4).  Also pins the per-engine KernelConfig plumbing
    (VERDICT r3 #5): the two engines carry DIFFERENT prefill arms in ONE
    process via EngineConfig.kernels, no env vars or module globals."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.ops import binary_matmul  # noqa: F401  (registers dispatch)
    from pb_llm_tpu.ops.kernel_config import KernelConfig
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=8, max_position_embeddings=512)
    fam = family_for("huggyllama/llama-7b")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 128, size=(2, 16))
    scfg = SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column",
                        col_tile=0)  # global columns: the int8 path's layout
    packed, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None, pack_block=32)

    r = np.random.default_rng(3)
    prompt = r.integers(0, 128, size=260).tolist()  # bucket 512 ≥ _V2_PREFILL_M
    forced = r.integers(0, 128, size=4).tolist()
    engines = {}
    for arm in ("hybrid", "int8"):
        kc = KernelConfig(backend="pallas_interpret", decode_dot="f32",
                          prefill=arm, attention="xla")
        engines[arm] = Engine(packed, cfg, fam,
                              EngineConfig(n_slots=1, max_seq=512,
                                           prefill_buckets=(512,), kernels=kc))
    # interleave the two engines' programs: per-engine arms must not leak
    for arm, eng in engines.items():
        eng.prefill(0, prompt)
    nll = {arm: eng.forced_decode_nll(0, forced) for arm, eng in engines.items()}
    assert np.isfinite(nll["int8"]) and nll["int8"] > 0
    assert abs(nll["int8"] - nll["hybrid"]) / nll["hybrid"] < 0.02, nll
    # the arms actually differ (int8 rounds x): identical NLLs would mean
    # the per-engine config silently fell through to one shared arm
    assert nll["int8"] != nll["hybrid"]


def test_v2_prefill_int8_close():
    """Opt-in int8 prefill (fused byte-lane kernel at large m, 2-D grid with
    m-tiling): int8-rounding-bounded error vs the exact reference, across an
    m that spans multiple 512-row m tiles."""
    oc, ic = 256, 256
    w_q, _, p, _, b = _make_v2(oc=oc, ic=ic, col_tile=0, bias=True, low_frac=0.9)
    x = jnp.asarray(np.random.default_rng(15).standard_normal((600, ic)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, p))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, prefill_int8=True))
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-2


def test_v2_stacked_kernel_matches_per_layer():
    """Scalar-prefetch stacked kernel (`pb_matmul_pallas_v2_stacked`): for
    every layer index, output matches the per-layer reference — f32 arm
    exactly, int8 arm within its x-rounding bound."""
    oc, ic = 256, 256
    layers = [_make_v2(oc=oc, ic=ic, col_tile=0, bias=True, low_frac=0.9, seed=s)[2]
              for s in (0, 1, 2)]
    sp = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)
    x = jnp.asarray(np.random.default_rng(21).standard_normal((4, ic)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        for li, p in enumerate(layers):
            ref = np.asarray(pbw.matmul_reference_v2(x, p))
            f32 = np.asarray(pallas_pb.pb_matmul_pallas_v2_stacked(
                x, sp, jnp.int32(li), interpret=True, oc_tile=128, decode_dot="f32"))
            np.testing.assert_allclose(f32, ref, rtol=1e-4, atol=1e-4)
            i8 = np.asarray(pallas_pb.pb_matmul_pallas_v2_stacked(
                x, sp, jnp.int32(li), interpret=True, oc_tile=128, decode_dot="int8"))
            scale = np.abs(ref).max() + 1e-9
            assert np.abs(i8 - ref).max() / scale < 2e-2, li


def test_engine_scan_layers_pallas_stacked_parity():
    """scan_layers engine under pallas_interpret drives the marker →
    stacked-kernel path end-to-end: greedy tokens match the unrolled
    pallas_interpret engine (both f32, exact)."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.ops import binary_matmul
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=128, intermediate_size=256,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=8, max_position_embeddings=64)
    fam = family_for("huggyllama/llama-7b")
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 128, size=(2, 16))
    scfg = SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column", col_tile=0)
    packed, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None, pack_block=32)

    def run(scan):
        eng = Engine(packed, cfg, fam, EngineConfig(
            n_slots=1, max_seq=32, prefill_buckets=(8,), scan_layers=scan))
        toks = [eng.prefill(0, [5, 17, 42, 3])]
        toks += [eng.decode_step()[0] for _ in range(4)]
        return toks

    binary_matmul.set_backend("pallas_interpret")
    binary_matmul.set_decode_dot("f32")
    try:
        assert run(True) == run(False)
    finally:
        binary_matmul.set_backend("auto")
        binary_matmul.set_decode_dot("auto")


# ---------------------------------------------------------------------------
# multi-bit low (2bit/4bit ablations, `gptq_pb/low_quant.py:44-65`) in the
# v2 column-structured format — VERDICT r3 stretch #9
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("method,bits", [("2bit", 2), ("4bit", 4)])
def test_v2_pack_multiplane_low(method, bits):
    """2/4-bit low codes pack as stacked v2 bitplanes, exactly; the f32
    planar kernel and the hybrid prefill serve them (the int8/pair/dma arms
    gate back to f32 — multi-bit has no byte-lane variant)."""
    from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
    from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize

    rng = np.random.default_rng(21)
    oc, ic = 128, 128
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    cols = np.sort(np.argsort(-np.abs(w).sum(0))[:12])  # global column set
    mask = np.ones((oc, ic), bool)
    mask[:, cols] = False  # mask=True ⇔ binarized
    low_state = low_calibrate(jnp.asarray(w * mask), method)
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    q_low = np.asarray(low_quantize(jnp.asarray(w), low_state, method))
    q_high = np.asarray(high_quantize(jnp.asarray(w), high_state))
    w_q = np.where(mask, q_low, q_high)

    p, diag = pbw.pack_linear_v2(jnp.asarray(w_q), jnp.asarray(mask),
                                 low_state, high_state, method, col_tile=0,
                                 pack_block=64)
    assert p.low_bits == bits
    assert p.sign_packed.shape == (bits * ic // 32, oc)
    assert diag["pack_mismatch"] == 0.0
    np.testing.assert_allclose(np.asarray(pbw.dequantize_v2(p)).T, w_q,
                               rtol=1e-5, atol=1e-6)

    for m in (4, 300):  # decode planar + prefill hybrid paths
        x = jnp.asarray(rng.standard_normal((m, ic)).astype(np.float32))
        with jax.default_matmul_precision("float32"):
            ref = np.asarray(pbw.matmul_reference_v2(x, p))
            got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
                x, p, interpret=True, oc_tile=128, decode_dot="f32"))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=5e-3)
    # the int8 arm routes multi-bit layouts to the exact f32 kernel
    x = jnp.asarray(rng.standard_normal((4, ic)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        a = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, decode_dot="int8"))
        b = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, p, interpret=True, oc_tile=128, decode_dot="f32"))
    np.testing.assert_array_equal(a, b)


def test_v2_multiplane_save_load_roundtrip(tmp_path):
    from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
    from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize

    rng = np.random.default_rng(22)
    oc, ic = 128, 64
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    cols = np.sort(np.argsort(-np.abs(w).sum(0))[:6])
    mask = np.ones((oc, ic), bool)
    mask[:, cols] = False
    low_state = low_calibrate(jnp.asarray(w * mask), "2bit")
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, "2bit")),
                   np.asarray(high_quantize(jnp.asarray(w), high_state)))
    p, _ = pbw.pack_linear_v2(jnp.asarray(w_q), jnp.asarray(mask),
                              low_state, high_state, "2bit", col_tile=0,
                              pack_block=64)
    pbw.save_pbw(str(tmp_path / "ckpt"), {"l.q_proj": p})
    layers, _ = pbw.load_pbw(str(tmp_path / "ckpt"))
    p2 = layers["l.q_proj"]
    assert p2.low_bits == 2
    np.testing.assert_array_equal(np.asarray(pbw.dequantize_v2(p2)),
                                  np.asarray(pbw.dequantize_v2(p)))


def test_run_ptq_2bit_packed_v2_matches_sim():
    """End-to-end: `run_ptq ... 2bit --format packed_v2 --synthetic` produces
    the same perplexities as the sim format (pack_mismatch 0 ⇒ identical
    forward numerics)."""
    from pb_llm_tpu.cli import run_ptq

    ppls = {}
    for fmt in ("sim", "packed_v2"):
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = run_ptq.main([
                "facebook/opt-125m", "wikitext2", "2bit", "--low_frac", "0.5",
                "--synthetic", "--nsamples", "2", "--format", fmt,
                "--mask_structure", "column"])  # same mask for both formats
        assert rc == 0
        out = buf.getvalue()
        ppls[fmt] = [line for line in out.splitlines() if "perplexity" in line]
    assert ppls["sim"] and ppls["sim"] == ppls["packed_v2"], ppls
