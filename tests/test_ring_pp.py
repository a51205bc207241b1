"""Sequence-parallel ring attention + pipeline parallelism on the CPU mesh.

The reference has neither (SURVEY.md §2.3: PP/SP both "No"); these are the
TPU-native additions.  Contract tested: sharded == unsharded numerics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pb_llm_tpu.models.attention import causal_allowed, masked_softmax_attention
from pb_llm_tpu.parallel.ring_attention import make_sp_mesh, ring_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _qkv(b, t, h, d, seed=0):
    r = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(r.standard_normal((b, t, h, d)).astype(np.float32))
        for _ in range(3)
    )


@pytest.mark.parametrize("sp", [4, 8])
def test_ring_attention_matches_full(sp):
    b, t, h, d = 2, 256, 4, 32
    q, k, v = _qkv(b, t, h, d)
    scale = float(1.0 / np.sqrt(d))

    ref = masked_softmax_attention(q, k, v, causal_allowed(0, t, t, None), scale)
    mesh = make_sp_mesh(sp)
    out = ring_attention(q, k, v, scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_attention_rejects_indivisible():
    mesh = make_sp_mesh(8)
    q, k, v = _qkv(1, 36, 2, 16)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, 0.25, mesh)


# ---------------------------------------------------------------------------
# pipeline parallelism
# ---------------------------------------------------------------------------


def _tiny_llama(layers=4):
    from pb_llm_tpu.models.llama import LlamaConfig, init_params

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=layers, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=64,
    )
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


@pytest.mark.parametrize("pp,n_micro", [(4, 2), (2, 4), (8, 1)])
def test_pipeline_forward_matches_single_device(pp, n_micro):
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.models.stacking import stack_layers
    from pb_llm_tpu.parallel.pipeline import make_pp_mesh, pipeline_forward

    cfg, params = _tiny_llama(layers=8)
    fam = family_for("llama")
    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, size=(4, 16))
    )
    ref, _ = fam.forward(params, ids, cfg)

    stacked = stack_layers(params)
    mesh = make_pp_mesh(pp)
    out = pipeline_forward(stacked, ids, cfg, mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_forward_packed_leaves():
    """pp=4 with PackedLinearV2 leaves (VERDICT r2 item 10): the eval
    pipeline runs the 1.8 b/w packed format — stacked planes shard on the
    layer axis like dense trees, and logits match the single-device packed
    forward."""
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.core.pbw import PackedLinearV2
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.models.stacking import stack_layers
    from pb_llm_tpu.parallel.pipeline import make_pp_mesh, pipeline_forward

    cfg, params = _tiny_llama(layers=8)
    fam = family_for("llama")
    calib = np.random.default_rng(7).integers(0, cfg.vocab_size, size=(2, 16))
    scfg = SolverConfig(low_method="xnor", low_frac=0.8,
                        mask_structure="column", col_tile=cfg.hidden_size)
    params, _ = quantize_model_ptq(params, cfg, fam, calib, scfg,
                                   fmt="packed_v2", log=None)
    assert isinstance(params["layers"][0]["q_proj"], PackedLinearV2)

    ids = jnp.asarray(
        np.random.default_rng(3).integers(0, cfg.vocab_size, size=(4, 16))
    )
    with jax.default_matmul_precision("float32"):
        ref, _ = fam.forward(params, ids, cfg)
        out = pipeline_forward(stack_layers(params), ids, cfg,
                               make_pp_mesh(4), n_micro=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_forward_rejects_bad_shapes():
    from pb_llm_tpu.models.stacking import stack_layers
    from pb_llm_tpu.parallel.pipeline import make_pp_mesh, pipeline_forward

    cfg, params = _tiny_llama(layers=4)
    mesh = make_pp_mesh(8)  # 4 layers not divisible by 8 stages
    ids = jnp.zeros((4, 8), jnp.int32)
    with pytest.raises(ValueError):
        pipeline_forward(stack_layers(params), ids, cfg, mesh, n_micro=2)
    with pytest.raises(ValueError):
        pipeline_forward(params, ids, cfg, make_pp_mesh(4), n_micro=2)


@pytest.mark.parametrize("sp", [4])
def test_ring_attention_flash_inner_matches_full(sp):
    """Kernelized ring inner (flash residuals + lax.switch block kinds)
    matches full attention — ROADMAP item 9."""
    b, t, h, d = 1, 256, 2, 32
    q, k, v = _qkv(b, t, h, d, seed=5)
    scale = float(1.0 / np.sqrt(d))
    ref = masked_softmax_attention(q, k, v, causal_allowed(0, t, t, None), scale)
    out = ring_attention(q, k, v, scale, make_sp_mesh(sp), inner="flash_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp_forward_perplexity_matches_single_device():
    """ROADMAP 9 wiring: the whole eval forward under sequence_parallel
    (ring attention, activations T-sharded) reproduces the single-device
    windowed perplexity exactly (protocol of eval_ppl_utils.py:71-86)."""
    from pb_llm_tpu.eval.ppl import perplexity, perplexity_sp
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.parallel.ring_attention import make_sp_mesh

    cfg, params = _tiny_llama(layers=2)
    fam = family_for("llama")
    ids = np.random.default_rng(7).integers(0, cfg.vocab_size, size=(3 * 32,))
    want = perplexity(params, cfg, fam.forward, ids, seqlen=32)
    got = perplexity_sp(params, cfg, fam.forward, ids, make_sp_mesh(8), seqlen=32)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_sp_forward_gqa_matches():
    """GQA KV heads repeat before the ring (same contract as flash)."""
    from pb_llm_tpu.models import llama as jllama
    from pb_llm_tpu.models.attention import sequence_parallel
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.parallel.ring_attention import make_sp_mesh

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                             num_hidden_layers=2, num_attention_heads=8,
                             num_key_value_heads=2, max_position_embeddings=128)
    params = jllama.init_params(cfg, jax.random.PRNGKey(3))
    fam = family_for("llama")
    ids = jnp.asarray(np.random.default_rng(8).integers(0, 64, size=(2, 32)))
    ref, _ = fam.forward(params, ids, cfg)
    with sequence_parallel(make_sp_mesh(8)):
        got, _ = jax.jit(lambda p, i: fam.forward(p, i, cfg))(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
