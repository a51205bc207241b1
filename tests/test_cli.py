"""CLI smoke tests (synthetic/offline mode) + checkpoint round-trips."""

import numpy as np
import pytest

import jax.numpy as jnp

from pb_llm_tpu.cli import run_eval, run_ptq, run_qat, serve


def test_run_ptq_synthetic(tmp_path, capsys):
    rc = run_ptq.main([
        "facebook/opt-synth", "wikitext2", "xnor",
        "--low_frac", "0.5", "--high_bit", "8", "--salient_metric", "magnitude",
        "--nsamples", "2", "--blocksize", "32", "--synthetic",
        "--format", "packed",
        "--save_pbw", str(tmp_path / "pbw"),
        "--mask_out", str(tmp_path / "masks.npz"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "perplexity" in out
    from pb_llm_tpu.core.pbw import load_pbw

    layers, extra = load_pbw(str(tmp_path / "pbw"))
    assert len(layers) == 2 * 6  # 2 layers x 6 opt linears
    from pb_llm_tpu.calib.pipeline import load_masks

    masks, frac = load_masks(str(tmp_path / "masks.npz"))
    assert frac == 0.5 and len(masks) == 12


def test_run_ptq_rtn_hessian(capsys):
    rc = run_ptq.main([
        "huggyllama/llama-synth", "c4", "xnor",
        "--low_frac", "0.8", "--salient_metric", "hessian", "--disable_gptq",
        "--nsamples", "2", "--blocksize", "32", "--synthetic",
    ])
    assert rc == 0
    assert "perplexity" in capsys.readouterr().out


def test_run_qat_synthetic(tmp_path, capsys):
    rc = run_qat.main([
        "--model_id", "facebook/opt-synth", "--dataset", "red_pajama",
        "--train_steps", "3", "--outlier_fraction", "0.1",
        "--out_dir", str(tmp_path), "--synthetic", "--seqlen", "32",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "mean_bit:" in out and "model saved" in out


def test_run_qat_then_eval(tmp_path, capsys):
    rc = run_qat.main([
        "--model_id", "facebook/opt-synth", "--train_steps", "2",
        "--dataset", "red_pajama", "--out_dir", str(tmp_path), "--synthetic", "--seqlen", "32",
    ])
    assert rc == 0
    ckpt = str(tmp_path / "facebook/opt-synth/xnor_outlier_0.1_2")
    rc = run_eval.main([
        ckpt, "--model_id", "facebook/opt-synth", "--eval_ppl", "wikitext2",
        "--synthetic", "--seqlen", "32",
    ])
    assert rc == 0
    assert "wikitext2 perplexity" in capsys.readouterr().out


def test_serve_synthetic(capsys):
    rc = serve.main([
        "--model_id", "facebook/opt-synth", "--synthetic",
        "--slots", "2", "--n_requests", "3", "--max_new_tokens", "4",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tokens/s=" in out and "requests=3" in out


def test_serve_kv_dtype_flag(capsys):
    """--kv_dtype int8 forces the quantized cache off-TPU; auto resolves to
    f32 on CPU (the serving default resolution, EngineConfig.cache_dtype)."""
    rc = serve.main([
        "--model_id", "facebook/opt-synth", "--synthetic",
        "--slots", "2", "--n_requests", "2", "--max_new_tokens", "3",
        "--kv_dtype", "int8",
    ])
    assert rc == 0
    assert "tokens/s=" in capsys.readouterr().out


def test_serve_synthetic_draft_model_spec(capsys):
    """--spec_gamma + --draft_synthetic: the draft-model speculative path
    end-to-end through the CLI (streams are exactness-tested in
    test_spec_decode; this covers the wiring)."""
    rc = serve.main([
        "--model_id", "facebook/opt-synth", "--synthetic",
        "--slots", "2", "--n_requests", "3", "--max_new_tokens", "4",
        "--spec_gamma", "2", "--draft_synthetic",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "tokens/s=" in out and "requests=3" in out


def test_serve_draft_requires_spec_gamma():
    import pytest
    with pytest.raises(SystemExit):
        serve.main([
            "--model_id", "facebook/opt-synth", "--synthetic",
            "--draft_synthetic",
        ])


def test_checkpoint_roundtrip_mixed_tree(tmp_path):
    from pb_llm_tpu.utils.checkpoint import load_dense_checkpoint, save_dense_checkpoint
    from tests.test_sharding import _make_packed

    p, _, _ = _make_packed(128, 256)
    tree = {
        "layers": [{"q": {"w": jnp.ones((4, 8)), "b": None}, "packed": p}],
        "norm": jnp.arange(3.0),
        "maybe": None,
    }
    save_dense_checkpoint(str(tmp_path / "ck"), tree, {"note": "hi"})
    loaded, extra = load_dense_checkpoint(str(tmp_path / "ck"))
    assert extra == {"note": "hi"}
    assert loaded["maybe"] is None
    np.testing.assert_array_equal(np.asarray(loaded["norm"]), np.arange(3.0))
    assert loaded["layers"][0]["q"]["b"] is None
    lp = loaded["layers"][0]["packed"]
    assert (lp.ic, lp.oc, lp.pack_block) == (p.ic, p.oc, p.pack_block)
    from pb_llm_tpu.core.pbw import dequantize

    np.testing.assert_array_equal(np.asarray(dequantize(lp)), np.asarray(dequantize(p)))


def test_serve_from_pbw_checkpoint(tmp_path, capsys):
    """run_ptq --save_pbw → serve --pbw: the intended deployment flow."""
    rc = run_ptq.main([
        "facebook/opt-synth", "wikitext2", "xnor",
        "--low_frac", "0.5", "--nsamples", "2", "--blocksize", "32",
        "--synthetic", "--format", "packed", "--save_pbw", str(tmp_path / "pbw"),
    ])
    assert rc == 0
    capsys.readouterr()
    rc = serve.main([
        "--model_id", "facebook/opt-synth", "--synthetic",
        "--pbw", str(tmp_path / "pbw"),
        "--slots", "1", "--n_requests", "2", "--max_new_tokens", "3",
    ])
    assert rc == 0
    assert "tokens/s=" in capsys.readouterr().out


def test_parity_sweep_synthetic_dry_run(tmp_path, capsys):
    """`scripts/parity_sweep.py --synthetic` (VERDICT r2 item 4): the
    one-command real-data parity sweep must dry-run offline, assert the
    pinned protocol goldens, and write its results section into a
    BASELINE.md between the sweep markers."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "parity_sweep",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "parity_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    md = tmp_path / "BASELINE.md"
    rc = mod.main(["--synthetic", "--out", str(tmp_path / "out"),
                   "--baseline_md", str(md),
                   "--skip-qat", "--skip-llama", "--skip-opt13b"])
    assert rc == 0
    text = md.read_text()
    assert mod.BEGIN in text and mod.END in text
    assert "goldens=hold" in text
    # re-run replaces (not duplicates) the marker section
    rc = mod.main(["--synthetic", "--out", str(tmp_path / "out2"),
                   "--baseline_md", str(md),
                   "--skip-qat", "--skip-llama", "--skip-opt13b"])
    assert rc == 0
    assert md.read_text().count(mod.BEGIN) == 1
    capsys.readouterr()


def test_run_ptq_synthetic_golden_ppl(capsys):
    """Pinned end-to-end perplexities for the full synthetic protocol
    (loaders -> tokenizer -> GPTQ-PB -> packed_v2 -> windowed eval).

    These constants were recorded on CPU (seeded torch-free synthetic model,
    deterministic corpus); ANY drift in tokenization, window construction,
    solver numerics, packing, or the eval order moves them — the offline
    stand-in for real-data reference parity (VERDICT r1 item 3).  If this
    fails after an intentional protocol change, re-record and say why in the
    commit message."""
    rc = run_ptq.main([
        "facebook/opt-125m", "wikitext2", "xnor",
        "--low_frac", "0.5", "--synthetic", "--nsamples", "2",
        "--format", "packed_v2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    import re

    ppls = {m.group(1): float(m.group(2))
            for m in re.finditer(r"(\w+) perplexity: ([0-9.]+)", out)}
    golden = {"wikitext2": 269.0968063188994, "ptb": 269.2145182145074, "c4": 268.6829047971141}
    for ds, want in golden.items():
        assert abs(ppls[ds] - want) / want < 5e-4, (ds, ppls[ds], want)
