"""HF-interop export: params tree → save_pretrained dir → transformers
reload → logits parity (reference `gptq_pb/run.py:315-319`,
`qat/run_qat.py:140-148` end in save_pretrained)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pb_llm_tpu.models import hf_export, hf_import
from pb_llm_tpu.models import llama as jllama, opt as jopt


def _roundtrip(params, cfg, family, forward, tmp_path, vocab):
    out = hf_export.save_pretrained(params, cfg, family, str(tmp_path / "export"))
    import transformers

    cls = transformers.LlamaForCausalLM if family == "llama" else transformers.OPTForCausalLM
    reloaded = cls.from_pretrained(out).eval().float()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, vocab, size=(2, 16))
    with torch.no_grad():
        ref = reloaded(torch.from_numpy(ids)).logits.numpy()
    with jax.default_matmul_precision("float32"):
        got, _ = forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=1e-3)


def test_llama_export_roundtrip(tmp_path):
    cfg = jllama.LlamaConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=4,
                             num_key_value_heads=2, max_position_embeddings=64)
    params = jllama.init_params(cfg, jax.random.PRNGKey(0))
    _roundtrip(params, cfg, "llama", jllama.forward, tmp_path, 128)


def test_opt_export_roundtrip(tmp_path):
    cfg = jopt.OPTConfig(vocab_size=128, hidden_size=32, ffn_dim=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         max_position_embeddings=64)
    params = jopt.init_params(cfg, jax.random.PRNGKey(1))
    _roundtrip(params, cfg, "opt", jopt.forward, tmp_path, 128)


def test_opt_350m_style_projections_roundtrip(tmp_path):
    """word_embed_proj_dim != hidden_size exercises project_in/out export."""
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
                       num_attention_heads=4, max_position_embeddings=64,
                       word_embed_proj_dim=16, do_layer_norm_before=False,
                       dropout=0.0, attention_dropout=0.0)
    torch.manual_seed(3)
    src = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, fam = hf_import.from_torch_model(src)
    _roundtrip(params, cfg, "opt", jopt.forward, tmp_path, 96)


def test_packed_leaves_export_dense(tmp_path):
    """A PTQ'd (packed) tree exports by dequantizing each PackedLinear."""
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
    from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize

    cfg = jllama.LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                             num_hidden_layers=1, num_attention_heads=4,
                             num_key_value_heads=4, max_position_embeddings=64)
    params = jllama.init_params(cfg, jax.random.PRNGKey(2))

    rng = np.random.default_rng(5)
    lp = params["layers"][0]
    for n in jllama.LINEAR_NAMES:
        w = np.asarray(lp[n]["w"]).T  # [oc, ic]
        mask = rng.random(w.shape) < 0.9  # True ⇔ binarized
        low_state = low_calibrate(jnp.asarray(w * mask), "xnor", -1)
        high_state = high_calibrate(jnp.asarray(w), bits=8)
        w_q = np.where(mask, np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor", -1)),
                       np.asarray(high_quantize(jnp.asarray(w), high_state)))
        packed, _ = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
        lp[n] = packed

    out = hf_export.save_pretrained(params, cfg, "llama", str(tmp_path / "pk"))
    import transformers

    reloaded = transformers.LlamaForCausalLM.from_pretrained(out).eval().float()
    ids = rng.integers(0, 64, size=(1, 8))
    with torch.no_grad():
        ref = reloaded(torch.from_numpy(ids)).logits.numpy()
    with jax.default_matmul_precision("float32"):
        got, _ = jllama.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=1e-3)
