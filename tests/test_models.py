"""JAX model forward parity vs tiny HF torch models (offline-constructed)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.models import hf_import, llama as jllama, opt as jopt
from pb_llm_tpu.models.registry import family_for


@pytest.fixture(scope="module")
def tiny_opt():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=128,
        hidden_size=32,
        ffn_dim=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        word_embed_proj_dim=32,
        dropout=0.0,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval().float()
    return model


@pytest.fixture(scope="module")
def tiny_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=64,
        attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(cfg).eval().float()
    return model


def _logits_match(torch_model, params, cfg, forward, seq=16, batch=2, atol=2e-4):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(batch, seq))
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(ids)).logits.numpy()
    got, _ = forward(params, jnp.asarray(ids), cfg)
    got = np.asarray(got)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


def test_opt_forward_parity(tiny_opt):
    params, cfg, fam = hf_import.from_torch_model(tiny_opt)
    assert fam == "opt"
    _logits_match(tiny_opt, params, cfg, jopt.forward)


def test_llama_forward_parity(tiny_llama):
    params, cfg, fam = hf_import.from_torch_model(tiny_llama)
    assert fam == "llama"
    _logits_match(tiny_llama, params, cfg, jllama.forward)


def test_llama_gqa_forward_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(2)
    model = LlamaForCausalLM(cfg).eval().float()
    params, jcfg, _ = hf_import.from_torch_model(model)
    _logits_match(model, params, jcfg, jllama.forward)


def test_opt_350m_style_projections():
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=128,
        hidden_size=48,
        ffn_dim=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=64,
        word_embed_proj_dim=24,  # triggers project_in / project_out like opt-350m
        do_layer_norm_before=False,  # opt-350m also post-norms
        dropout=0.0,
    )
    torch.manual_seed(3)
    model = OPTForCausalLM(cfg).eval().float()
    params, jcfg, _ = hf_import.from_torch_model(model)
    assert params["project_in"] is not None and params["project_out"] is not None
    _logits_match(model, params, jcfg, jopt.forward)


def test_kv_cache_decode_matches_full_forward(tiny_llama):
    params, cfg, _ = hf_import.from_torch_model(tiny_llama)
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 12)))
    full, _ = jllama.forward(params, ids, cfg)

    max_len = 16
    caches = [
        {
            "k": jnp.zeros((1, max_len, cfg.kv_heads, cfg.head_dim)),
            "v": jnp.zeros((1, max_len, cfg.kv_heads, cfg.head_dim)),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    # prefill 8 tokens, then decode 4 one by one
    logits, caches = jllama.forward(params, ids[:, :8], cfg, kv_caches=caches, pos=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :8]), atol=2e-4, rtol=1e-3)
    for t in range(8, 12):
        logits, caches = jllama.forward(params, ids[:, t : t + 1], cfg, kv_caches=caches, pos=t)
        np.testing.assert_allclose(np.asarray(logits[0, 0]), np.asarray(full[0, t]), atol=2e-4, rtol=1e-3)


def test_opt_kv_cache_decode(tiny_opt):
    params, cfg, _ = hf_import.from_torch_model(tiny_opt)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 10)))
    full, _ = jopt.forward(params, ids, cfg)
    caches = [
        {
            "k": jnp.zeros((1, 16, cfg.num_attention_heads, cfg.head_dim)),
            "v": jnp.zeros((1, 16, cfg.num_attention_heads, cfg.head_dim)),
        }
        for _ in range(cfg.num_hidden_layers)
    ]
    logits, caches = jopt.forward(params, ids[:, :6], cfg, kv_caches=caches, pos=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :6]), atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, caches = jopt.forward(params, ids[:, t : t + 1], cfg, kv_caches=caches, pos=t)
        np.testing.assert_allclose(np.asarray(logits[0, 0]), np.asarray(full[0, t]), atol=2e-4, rtol=1e-3)


def test_registry_dispatch():
    assert family_for("facebook/opt-125m").name == "opt"
    assert family_for("huggyllama/llama-7b").name == "llama"
    # mistral rides the llama family since round 5 (tests/test_mistral.py)
    assert family_for("mistralai/Mistral-7B-v0.1").name == "llama"
    with pytest.raises(NotImplementedError):
        family_for("tiiuae/falcon-7b")


def test_layerwise_equals_forward(tiny_opt):
    """embed → per-layer → head must equal the fused forward (pipeline contract)."""
    params, cfg, _ = hf_import.from_torch_model(tiny_opt)
    fam = family_for("opt")
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 128, size=(1, 8)))
    x = fam.embed(params, ids, cfg)
    for lp in params["layers"]:
        x, _ = fam.decoder_layer(lp, x, cfg)
    logits = fam.head(params, x, cfg)
    ref, _ = fam.forward(params, ids, cfg)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-5, rtol=1e-5)
