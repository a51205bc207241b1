"""Compile-time: scan_layers vs unrolled under TP shard_map (VERDICT r3 #3).

Round 2 measured the single-device win (20 s scanned vs 74 s unrolled for a
32-layer decode program on TPU).  This script shows the win SURVIVES the TP
composition: it builds the TP decode step on an 8-virtual-CPU mesh (tp=4)
over an L-layer PBW-v2 llama and times the first decode_step call
(trace + XLA compile + run) with scan_layers on and off.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scan_tp_compile.py [--layers 16] [--hidden 256]
"""

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--tp", type=int, default=4)
    args = ap.parse_args()

    import jax

    from pb_llm_tpu.calib.pipeline import quantize_model_ptq
    from pb_llm_tpu.calib.solver import SolverConfig
    from pb_llm_tpu.models.llama import LlamaConfig, init_params
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime.engine import EngineConfig
    from pb_llm_tpu.runtime.tp_engine import TPEngine
    import pb_llm_tpu.ops.binary_matmul  # noqa: F401

    h = args.hidden
    cfg = LlamaConfig(vocab_size=256, hidden_size=h, intermediate_size=2 * h,
                      num_hidden_layers=args.layers, num_attention_heads=8,
                      num_key_value_heads=8, max_position_embeddings=64)
    fam = family_for("llama")
    params = init_params(cfg, jax.random.PRNGKey(0))
    calib = np.random.default_rng(0).integers(0, 256, size=(1, 16))
    t0 = time.time()
    packed, _ = quantize_model_ptq(
        params, cfg, fam, calib,
        SolverConfig(low_frac=0.9, blocksize=32, mask_structure="column",
                     col_tile=0, ic_shards=args.tp),
        fmt="packed_v2", log=None, pack_block=h // args.tp // 2)
    print(f"packed {args.layers} layers in {time.time()-t0:.0f}s", flush=True)

    mesh = pmesh.make_mesh(dp=1, tp=args.tp)
    out = {}
    for scan in (True, False):
        ecfg = EngineConfig(n_slots=2, max_seq=32, prefill_buckets=(8,),
                            scan_layers=scan)
        eng = TPEngine(copy.deepcopy(packed), cfg, fam, ecfg, mesh)
        eng.prefill(0, [5, 17, 42])  # activate a slot (its own program)
        t0 = time.time()
        eng.decode_step()            # first call: trace + compile + run
        dt = time.time() - t0
        out["scan" if scan else "unrolled"] = round(dt, 1)
        print(f"{'scan' if scan else 'unrolled'}: first decode_step "
              f"(compile) {dt:.1f}s", flush=True)
    out["speedup"] = round(out["unrolled"] / out["scan"], 2)
    print(json.dumps({"metric": f"TP={args.tp} decode-step compile time, "
                                f"{args.layers} layers (s)", **out}))


if __name__ == "__main__":
    main()
