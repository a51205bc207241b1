"""Multi-chip semantics on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import copy

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.parallel import collectives, mesh as pmesh, sharding
from pb_llm_tpu.train import qat as tq


@pytest.fixture(scope="module")
def tiny_llama_setup():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    return params, cfg, family_for("llama")


def test_mesh_construction():
    m = pmesh.make_mesh(dp=2, tp=4)
    assert m.shape == {"dp": 2, "tp": 4}
    assert len(jax.devices()) == 8


def test_tp_sharded_forward_matches_unsharded(tiny_llama_setup):
    params, cfg, fam = tiny_llama_setup
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 16)))
    ref, _ = fam.forward(params, ids, cfg)

    m = pmesh.make_mesh(dp=1, tp=8)
    sharded = sharding.shard_params(copy.deepcopy(params), m, "llama")
    # check a column-parallel weight is actually split over tp
    qw = sharded["layers"][0]["q_proj"]["w"]
    assert qw.sharding.spec == P(None, "tp")

    fwd = jax.jit(lambda p, i: fam.forward(p, i, cfg)[0])
    got = fwd(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_dp_batch_sharding(tiny_llama_setup):
    params, cfg, fam = tiny_llama_setup
    ids = np.random.default_rng(1).integers(0, 128, size=(4, 16))
    ref, _ = fam.forward(params, jnp.asarray(ids), cfg)

    m = pmesh.make_mesh(dp=4, tp=2)
    sharded = sharding.shard_params(copy.deepcopy(params), m, "llama")
    ids_sh = jax.device_put(jnp.asarray(ids), NamedSharding(m, P("dp", None)))
    got = jax.jit(lambda p, i: fam.forward(p, i, cfg)[0])(sharded, ids_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)


def _make_packed(oc, ic, seed=0, bias=True, pack_block=None):
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
    from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize

    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.8)
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor")
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    w_q = np.where(
        mask,
        np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor")),
        np.asarray(high_quantize(jnp.asarray(w), high_state)),
    )
    b = jnp.asarray(rng.standard_normal(oc).astype(np.float32)) if bias else None
    p, _ = pbw.pack_linear(
        jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor",
        bias=b, pack_block=pack_block,
    )
    return p, w_q, b


def test_column_parallel_packed_matmul():
    m = pmesh.make_mesh(dp=1, tp=8)
    p, w_q, b = _make_packed(1024, 256)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 256)).astype(np.float32))
    y = collectives.column_parallel_pb_matmul(x, p, m, gather=True)
    want = np.asarray(x) @ w_q.T + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-3, rtol=1e-4)


def test_row_parallel_packed_matmul():
    m = pmesh.make_mesh(dp=1, tp=8)
    # ic sharded: 2048/8 = 256 rows per shard; pack blocks must tile a shard
    p, w_q, b = _make_packed(128, 2048, pack_block=256)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 2048)).astype(np.float32))
    y = collectives.row_parallel_pb_matmul(x, p, m)
    want = np.asarray(x) @ w_q.T + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-3, rtol=1e-4)


def test_qat_train_step_sharded_matches_unsharded(tiny_llama_setup):
    params, cfg, fam = tiny_llama_setup
    qcfg = tq.QATConfig(outlier_fraction=0.1, train_steps=4, learning_rate=1e-3, remat=False)
    qp = tq.replace_linears(copy.deepcopy(params), fam, qcfg)
    batch = {"input_ids": np.random.default_rng(4).integers(0, 128, size=(4, 16))}

    opt = tq.make_optimizer(qcfg, qp)
    step = jax.jit(tq.make_train_step(cfg, fam, qcfg, opt))

    # unsharded
    s0 = opt.init(qp)
    p1, _, loss_ref = step(qp, s0, {k: jnp.asarray(v) for k, v in batch.items()})

    # tp=4 dp=2 sharded
    m = pmesh.make_mesh(dp=2, tp=4)
    qp_sh = sharding.shard_params(copy.deepcopy(qp), m, "llama")
    s0_sh = opt.init(qp_sh)
    ids_sh = jax.device_put(jnp.asarray(batch["input_ids"]), NamedSharding(m, P("dp", None)))
    p1_sh, _, loss_sh = step(qp_sh, s0_sh, {"input_ids": ids_sh})

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    w_ref = np.asarray(p1["layers"][0]["q_proj"].weight)
    w_sh = np.asarray(p1_sh["layers"][0]["q_proj"].weight)
    np.testing.assert_allclose(w_sh, w_ref, atol=1e-5, rtol=1e-4)


def test_qat_train_step_fsdp_matches_unsharded(tiny_llama_setup):
    """FSDP (ZeRO-3-style) parameter sharding over dp: the big QAT leaves
    (weight + frozen outlier_mask) live sharded over dp ON TOP of the tp
    layout, GSPMD all-gathers them per use, and the train step's numerics
    are unchanged."""
    params, cfg, fam = tiny_llama_setup
    qcfg = tq.QATConfig(outlier_fraction=0.1, train_steps=4, learning_rate=1e-3, remat=False)
    qp = tq.replace_linears(copy.deepcopy(params), fam, qcfg)
    batch = {"input_ids": np.random.default_rng(4).integers(0, 128, size=(4, 16))}

    opt = tq.make_optimizer(qcfg, qp)
    step = jax.jit(tq.make_train_step(cfg, fam, qcfg, opt))
    s0 = opt.init(qp)
    p1, _, loss_ref = step(qp, s0, {k: jnp.asarray(v) for k, v in batch.items()})

    m = pmesh.make_mesh(dp=2, tp=4)
    qp_sh = sharding.shard_params(copy.deepcopy(qp), m, "llama", fsdp=True)
    # the big leaves must actually be dp-sharded (storage, not just specs)
    w = qp_sh["layers"][0]["q_proj"].weight
    spec_axes = {a for ax in w.sharding.spec if ax is not None
                 for a in (ax if isinstance(ax, tuple) else (ax,))}
    assert "dp" in spec_axes, w.sharding
    mask = qp_sh["layers"][0]["q_proj"].outlier_mask
    assert any(ax is not None for ax in mask.sharding.spec), mask.sharding

    s0_sh = opt.init(qp_sh)
    ids_sh = jax.device_put(jnp.asarray(batch["input_ids"]), NamedSharding(m, P("dp", None)))
    p1_sh, _, loss_sh = step(qp_sh, s0_sh, {"input_ids": ids_sh})

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    w_ref = np.asarray(p1["layers"][0]["q_proj"].weight)
    w_sh = np.asarray(p1_sh["layers"][0]["q_proj"].weight)
    np.testing.assert_allclose(w_sh, w_ref, atol=1e-5, rtol=1e-4)
    # optimizer state followed the param sharding (ZeRO: no replicated moments)
    mu = jax.tree_util.tree_leaves(
        s0_sh, is_leaf=lambda x: hasattr(x, "sharding"))
    assert any(
        "dp" in {a for ax in getattr(l.sharding, "spec", P()) if ax is not None
                 for a in (ax if isinstance(ax, tuple) else (ax,))}
        for l in mu if hasattr(l, "sharding") and getattr(l, "ndim", 0) >= 2)
