"""Parallel-linear fusion (models.fusion): quality-identical merged layers.

q|k|v / gate|up share their input, so serving fuses each set into one
PackedLinearV2 with one ROW GROUP per constituent — dequantization must be
exactly the horizontal concat of the parts, the int8 kernel must handle the
multi-group sidecar, and engine token streams must not change."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pb_llm_tpu.calib.pipeline import quantize_model_ptq
from pb_llm_tpu.calib.solver import SolverConfig
from pb_llm_tpu.core import pbw
from pb_llm_tpu.models.fusion import fuse_parallel_linears
from pb_llm_tpu.models.llama import LlamaConfig, init_params
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.ops import pallas_pb


@pytest.fixture(scope="module")
def packed_v2_llama():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=8, max_position_embeddings=64,
    )
    fam = family_for("llama")
    params = init_params(cfg, jax.random.PRNGKey(3))
    calib = np.random.default_rng(3).integers(0, 128, size=(2, 16))
    packed, _ = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column", col_tile=0),
        fmt="packed_v2", log=None, pack_block=32,
    )
    return packed, cfg, fam


def test_merged_dequant_is_concat(packed_v2_llama):
    packed, cfg, fam = packed_v2_llama
    lp = packed["layers"][0]
    parts = [lp["q_proj"], lp["k_proj"], lp["v_proj"]]
    merged = pbw.merge_packed_linears_v2(parts)
    assert merged.n_row_groups == 3 and merged.oc == 3 * parts[0].oc
    want = np.concatenate([np.asarray(pbw.dequantize_v2(p)) for p in parts], axis=1)
    got = np.asarray(pbw.dequantize_v2(merged))
    np.testing.assert_array_equal(got, want)


def test_merged_reference_matmul_is_concat(packed_v2_llama):
    packed, cfg, fam = packed_v2_llama
    lp = packed["layers"][0]
    parts = [lp["gate_proj"], lp["up_proj"]]
    merged = pbw.merge_packed_linears_v2(parts)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((4, 128)).astype(np.float32))
    want = np.concatenate([np.asarray(pbw.matmul_reference_v2(x, p)) for p in parts], axis=1)
    got = np.asarray(pbw.matmul_reference_v2(x, merged))
    # dequants are bit-identical (test above); the matmul itself may tile
    # differently at the wider N — accumulation-order tolerance only
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_int8_kernel_multi_row_group_close(packed_v2_llama):
    """The int8 byte-lane kernel's per-chunk sidecar path (n_row_groups > 1,
    the fused layout) vs the reference, decode and prefill m."""
    packed, cfg, fam = packed_v2_llama
    lp = packed["layers"][0]
    merged = pbw.merge_packed_linears_v2(
        [lp["q_proj"], lp["k_proj"], lp["v_proj"]])
    r = np.random.default_rng(6)
    for m in (4, 300):
        x = jnp.asarray(r.standard_normal((m, 128)).astype(np.float32))
        with jax.default_matmul_precision("float32"):
            ref = np.asarray(pbw.matmul_reference_v2(x, merged))
            got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
                x, merged, interpret=True, oc_tile=128, decode_dot="int8",
                prefill_int8=True))
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 2e-2, m


def test_int8_kernel_multi_row_group_exact_at_unit_scale(packed_v2_llama):
    packed, cfg, fam = packed_v2_llama
    lp = packed["layers"][0]
    merged = pbw.merge_packed_linears_v2(
        [lp["q_proj"], lp["k_proj"], lp["v_proj"]])
    r = np.random.default_rng(7)
    x = r.integers(-127, 128, size=(4, 128)).astype(np.float32)
    x[:, 0] = 127.0  # absmax exactly 127 → sx == 1, int8 lossless
    x = jnp.asarray(x)
    with jax.default_matmul_precision("float32"):
        f32 = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, merged, interpret=True, oc_tile=128, decode_dot="f32"))
        i8 = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, merged, interpret=True, oc_tile=128, decode_dot="int8"))
    np.testing.assert_allclose(i8, f32, rtol=1e-6, atol=1e-4)


def test_merged_default_tiles_stay_group_aligned():
    """col_tile = 384 (not divisible by the 512/256 default tiles): the
    dispatch must pick a group-aligned tile (128) — a tile straddling a
    group boundary would apply group 0's gathered x to group 1's columns.
    Regression for the fused-gate|up llama-7b case (col_tile=11008, default
    512 tile → silent reference fallback in round 4's first fused bench)."""
    from pb_llm_tpu.models import linear as _lin
    from pb_llm_tpu.models.llama import LlamaConfig, init_params as _init

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=128, intermediate_size=384, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=32,
    )
    fam = family_for("llama")
    params = _init(cfg, jax.random.PRNGKey(9))
    calib = np.random.default_rng(9).integers(0, 64, size=(1, 8))
    packed, _ = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column", col_tile=0),
        fmt="packed_v2", log=None, pack_block=32,
    )
    lp = packed["layers"][0]
    merged = pbw.merge_packed_linears_v2([lp["gate_proj"], lp["up_proj"]])
    assert merged.oc == 768 and merged.col_tile == 384
    assert pallas_pb.pallas_supported_v2(merged)
    assert pallas_pb._aligned_oc_tile_v2(merged) == 128
    # decode tile = half-oc (2 groups -> 1 group per tile)
    assert pallas_pb._decode_oc_tile_v2_int8(merged, 4) == 384
    x = jnp.asarray(np.random.default_rng(10).standard_normal((4, 128)).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        ref = np.asarray(pbw.matmul_reference_v2(x, merged))
        got = np.asarray(pallas_pb.pb_matmul_pallas_v2(
            x, merged, interpret=True, decode_dot="int8"))  # default tiles
    scale = np.abs(ref).max() + 1e-9
    assert np.abs(got - ref).max() / scale < 2e-2


def test_engine_fused_stream_matches_unfused(packed_v2_llama):
    """Continuous batching with fuse_linears on vs off: identical token
    streams (merged dequant is the exact concat; the matmul differs only in
    accumulation order, far below greedy-argmax sensitivity here)."""
    from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig

    packed, cfg, fam = packed_v2_llama
    reqs = lambda: [
        Request(request_id=i, prompt_ids=list(p), max_new_tokens=5)
        for i, p in enumerate(np.random.default_rng(31).integers(0, 128, size=(3, 5)))
    ]
    done = {}
    for fuse in (False, True):
        ecfg = EngineConfig(n_slots=2, max_seq=32, prefill_buckets=(8,),
                            fuse_linears=fuse)
        eng = Engine(copy.deepcopy(packed), cfg, fam, ecfg)
        if fuse:
            assert "qkv_proj" in eng.params["layers"][0]
            assert "gateup_proj" in eng.params["layers"][0]
        done[fuse] = ContinuousBatcher(eng).run(reqs())
    for a, b in zip(done[False], done[True]):
        assert a.output_ids == b.output_ids, (a.request_id, a.output_ids, b.output_ids)


def test_fusion_skips_gqa_kv():
    """GQA (narrower k/v) must not fuse qkv — widths differ; gate/up still
    fuse."""
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=32,
    )
    fam = family_for("llama")
    params = init_params(cfg, jax.random.PRNGKey(4))
    calib = np.random.default_rng(4).integers(0, 64, size=(1, 8))
    packed, _ = quantize_model_ptq(
        copy.deepcopy(params), cfg, fam, calib,
        SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column", col_tile=0),
        fmt="packed_v2", log=None, pack_block=32,
    )
    fused = fuse_parallel_linears(packed, "llama")
    lp = fused["layers"][0]
    assert "qkv_proj" not in lp and "q_proj" in lp  # oc mismatch → skipped
    assert "gateup_proj" in lp and "gate_proj" not in lp
