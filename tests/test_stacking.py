"""lax.scan over stacked decoder layers == unrolled forward (dense, packed
v1/v2 leaves; with and without KV caches; engine integration)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pb_llm_tpu.ops.binary_matmul  # noqa: F401 — registers packed dispatch
from pb_llm_tpu.models import llama as jllama, opt as jopt, stacking
from pb_llm_tpu.models.registry import family_for


def _llama(nl=3):
    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=nl, num_attention_heads=4,
                             num_key_value_heads=2, max_position_embeddings=64)
    return cfg, jllama.init_params(cfg, jax.random.PRNGKey(0))


def test_stack_unstack_roundtrip():
    cfg, params = _llama()
    st = stacking.stack_layers(params)
    assert st["layers_stacked"]["q_proj"]["w"].shape[0] == 3
    back = stacking.unstack_layers(st)
    for a, b in zip(params["layers"], back["layers"]):
        np.testing.assert_array_equal(np.asarray(a["q_proj"]["w"]), np.asarray(b["q_proj"]["w"]))


@pytest.mark.parametrize("family", ["llama", "opt"])
def test_scan_forward_matches_unrolled(family):
    if family == "llama":
        cfg, params = _llama()
        fwd = jllama.forward
    else:
        cfg = jopt.OPTConfig(vocab_size=64, hidden_size=32, ffn_dim=64,
                             num_hidden_layers=3, num_attention_heads=4,
                             max_position_embeddings=64)
        params = jopt.init_params(cfg, jax.random.PRNGKey(1))
        fwd = jopt.forward
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, size=(2, 12)))
    with jax.default_matmul_precision("float32"):
        y_unrolled, _ = fwd(params, ids, cfg)
        y_scanned, _ = fwd(stacking.stack_layers(params), ids, cfg)
    np.testing.assert_allclose(np.asarray(y_scanned), np.asarray(y_unrolled), rtol=1e-5, atol=1e-5)


def test_scan_forward_with_caches_matches_unrolled():
    from pb_llm_tpu.runtime import kv_cache as kvmod

    cfg, params = _llama()
    fam = family_for("huggyllama/llama-7b")
    nl, kvh, hd = kvmod.cache_spec_for(cfg, "llama")
    caches = kvmod.make_caches(cfg, 1, 16, nl, kvh, hd, jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 64, size=(1, 8)))

    with jax.default_matmul_precision("float32"):
        y_u, caches_u = jllama.forward(params, ids, cfg, kv_caches=caches, pos=0)
        st = stacking.stack_layers(params)
        y_s, caches_s = jllama.forward(st, ids, cfg, kv_caches=stacking.stack_caches(caches), pos=0)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_u), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(caches_s["k"][1]), np.asarray(caches_u[1]["k"]), rtol=1e-5, atol=1e-5)


def test_scan_forward_packed_v2_leaves():
    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.core.pbw import PackedLinearV2

    cfg, params = _llama(nl=2)
    fam = family_for("huggyllama/llama-7b")
    calib = np.random.default_rng(4).integers(0, 64, size=(2, 16))
    scfg = SolverConfig(low_method="xnor", low_frac=0.8, mask_structure="column", col_tile=16)
    params, _ = quantize_model_ptq(params, cfg, fam, calib, scfg, fmt="packed_v2", log=None)
    assert isinstance(params["layers"][0]["q_proj"], PackedLinearV2)

    ids = jnp.asarray(np.random.default_rng(5).integers(0, 64, size=(1, 8)))
    with jax.default_matmul_precision("float32"):
        y_u, _ = jllama.forward(params, ids, cfg)
        y_s, _ = jllama.forward(stacking.stack_layers(params), ids, cfg)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_u), rtol=1e-5, atol=1e-5)


def test_engine_scan_layers_token_parity():
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    cfg, params = _llama()
    fam = family_for("huggyllama/llama-7b")
    prompt = [5, 17, 42, 3]

    def run(scan):
        eng = Engine(params, cfg, fam, EngineConfig(n_slots=2, max_seq=32, prefill_buckets=(8,),
                                                    scan_layers=scan))
        toks = [eng.prefill(0, prompt)]
        toks += [eng.decode_step()[0] for _ in range(5)]
        return toks

    assert run(False) == run(True)


def test_engine_scan_layers_int8_cache():
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    cfg, params = _llama()
    fam = family_for("huggyllama/llama-7b")
    eng = Engine(params, cfg, fam, EngineConfig(n_slots=1, max_seq=32, prefill_buckets=(8,),
                                                cache_dtype=jnp.int8, scan_layers=True))
    eng.prefill(0, [5, 17, 42])
    nll = eng.forced_decode_nll(0, [7, 21, 9])
    assert np.isfinite(nll) and nll > 0
