"""Streamed HF→PBW conversion: sharded artifact == in-memory packing."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.core.pbw import load_pbw, install_pbw
from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.hf_stream import iter_hf_tensors, rtn_pack_fn, stream_pack_to_pbw
from pb_llm_tpu.models.registry import family_for


def _tiny_opt_dir(tmp_path, safe=True):
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(cfg).eval().float()
    d = tmp_path / ("hf_safe" if safe else "hf_bin")
    model.save_pretrained(str(d), safe_serialization=safe)
    return model, str(d)


@pytest.mark.parametrize("safe", [True, False])
def test_stream_matches_in_memory(tmp_path, safe):
    model, d = _tiny_opt_dir(tmp_path, safe=safe)
    out = str(tmp_path / "pbw")
    pack = rtn_pack_fn(method="xnor", low_frac=0.8, fmt="packed_v2")
    done = stream_pack_to_pbw(d, out, "opt", pack_fn=pack)
    assert len(done) == 2 * 6  # 2 layers x 6 linears

    layers, meta = load_pbw(out)
    assert meta["family"] == "opt"

    # in-memory reference: same pack fn on the state dict
    sd = model.state_dict()
    for i in range(2):
        for name, sub in [("q_proj", "self_attn.q_proj"), ("fc1", "fc1")]:
            w = sd[f"model.decoder.layers.{i}.{sub}.weight"].numpy()
            b = sd[f"model.decoder.layers.{i}.{sub}.bias"].numpy()
            want = pack(name, w, b)
            got = layers[f"layer_{i}/{name}"]
            np.testing.assert_array_equal(np.asarray(got.sign_packed), np.asarray(want.sign_packed))
            np.testing.assert_array_equal(np.asarray(got.side_val), np.asarray(want.side_val))
            np.testing.assert_allclose(np.asarray(got.bias), np.asarray(want.bias))


def test_streamed_artifact_serves(tmp_path):
    """load_pbw(sharded) → install → forward runs and differs from dense only
    by quantization (finite logits, correct shape)."""
    model, d = _tiny_opt_dir(tmp_path)
    out = str(tmp_path / "pbw")
    stream_pack_to_pbw(d, out, "opt", pack_fn=rtn_pack_fn(low_frac=0.8, fmt="packed_v2"))

    params, cfg, _ = hf_import.from_torch_model(model)
    layers, _ = load_pbw(out)
    packed_params = install_pbw(params, layers)
    fam = family_for("opt")
    ids = jnp.asarray([[5, 17, 29, 3]])
    logits, _ = fam.forward(packed_params, ids, cfg)
    assert logits.shape == (1, 4, 96) and bool(jnp.isfinite(logits).all())


def test_streamed_gptq_matches_resident(tmp_path):
    """VERDICT r2 item 6: GPTQ-PB with the checkpoint streamed one layer at a
    time (multi-shard safetensors) must produce bit-identical masks and
    packed planes to the whole-model-resident pipeline, while never holding
    more than ONE decoder layer's weights (peak host memory O(layer))."""
    import copy

    from pb_llm_tpu.calib.pipeline import quantize_model_ptq, quantize_model_ptq_streamed
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models.hf_stream import StreamedLayerLoader

    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=96, hidden_size=32, ffn_dim=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(1)
    model = OPTForCausalLM(hf_cfg).eval().float()
    d = str(tmp_path / "hf_sharded")
    model.save_pretrained(d, max_shard_size="50KB")  # force multi-shard layout
    import os

    assert os.path.exists(os.path.join(d, "model.safetensors.index.json"))

    params, cfg, _ = hf_import.from_torch_model(model)
    fam = family_for("opt")
    calib = np.random.default_rng(0).integers(0, 96, size=(4, 16))
    scfg = SolverConfig(low_frac=0.5, salient_metric="hessian", blocksize=16,
                        mask_structure="column", col_tile=0)

    p_res, rep_res = quantize_model_ptq(copy.deepcopy(params), cfg, fam, calib,
                                        scfg, fmt="packed_v2", log=None)

    loader = StreamedLayerLoader(d, "opt")
    assert loader.n_layers() == 3
    out = str(tmp_path / "pbw_gptq")
    rep_st = quantize_model_ptq_streamed(loader, cfg, fam, calib, scfg, out,
                                         fmt="packed_v2", log=None)
    assert loader.max_live == 1  # never more than one layer resident

    assert set(rep_res.masks) == set(rep_st.masks)
    for k in rep_res.masks:
        np.testing.assert_array_equal(rep_res.masks[k], rep_st.masks[k])
    for k in rep_res.errors:
        np.testing.assert_allclose(rep_res.errors[k], rep_st.errors[k], rtol=1e-5)

    layers, meta = load_pbw(out)
    assert meta["gptq"] is True
    for i, lp in enumerate(p_res["layers"]):
        for n in fam.linear_names:
            got, want = layers[f"layer_{i}/{n}"], lp[n]
            np.testing.assert_array_equal(np.asarray(got.sign_packed),
                                          np.asarray(want.sign_packed))
            np.testing.assert_array_equal(np.asarray(got.side_val),
                                          np.asarray(want.side_val))


def test_iter_hf_tensors_lists_everything(tmp_path):
    model, d = _tiny_opt_dir(tmp_path)
    keys = {k for k, _ in iter_hf_tensors(d)}
    want = {k for k in model.state_dict().keys()}
    # save_pretrained drops tied/aliased heads; every saved key must surface
    assert want - keys in (set(), {"lm_head.weight"})
