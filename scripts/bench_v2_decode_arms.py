"""TPU experiment: decode kernel dot-path arms at llama-7b MLP decode shape.

Arms (interleaved; same slope methodology as bench.py):
  dense  — bf16 dense matmul baseline
  f32    — planar v2, f32 bit-plane dots (the round-2 shipping kernel)
  bf16   — planar v2, operands cast to bf16 (3 VPU ops/bit extraction)
  pair   — paired bf16 planes (1 VPU op/bit, k-doubled dots)

Prints per-arm µs, packed-stream GB/s, and % of the 819 GB/s v5e HBM
roofline (VERDICT r2 item 1: report %-of-roofline, target ≥60% ⇒ ≤21 µs at
this 10.2 MB/matmul shape).

Usage: python scripts/bench_v2_decode_arms.py [arm ...]
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("M", "8"))
IC, OC = 4096, 11008
K = 8
L_SHORT, L_LONG = 16, 272
FRAC_BINARY = 0.9
HBM_GBPS = 819e9


def log(msg):
    print(msg, flush=True)


def make_planes(seed):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import importlib
    bench = importlib.import_module("bench")
    return bench.make_planes(seed)


def interleaved(arms, reps=6):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32))
          for i in range(reps + 2)]
    fns = {}
    for tag, (mk, args) in arms.items():
        fns[tag] = {}
        for L in (L_SHORT, L_LONG):
            f = mk(L)
            t0 = time.perf_counter()
            float(f(xs[0], *args))
            log(f"  [{tag}] L={L} compile+first: {time.perf_counter()-t0:.1f}s")
            fns[tag][L] = f
    times = {tag: {L: [] for L in (L_SHORT, L_LONG)} for tag in arms}
    for i in range(1, reps + 1):
        for tag, (mk, args) in arms.items():
            for L in (L_SHORT, L_LONG):
                t0 = time.perf_counter()
                float(fns[tag][L](xs[i], *args))
                times[tag][L].append(time.perf_counter() - t0)
    out = {}
    for tag in arms:
        med = {L: float(np.median(times[tag][L])) for L in (L_SHORT, L_LONG)}
        out[tag] = (med[L_LONG] - med[L_SHORT]) / (L_LONG - L_SHORT)
    return out


def mk_dense():
    W = jnp.asarray(np.random.default_rng(1).standard_normal((K, IC, OC)), jnp.bfloat16)

    def mk(L):
        @jax.jit
        def loop(x, W):
            def body(c, k):
                y = (c.astype(jnp.bfloat16) @ W[k]).astype(jnp.float32)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return mk, (W,)


def mk_packed(decode_dot, oc_tile=None):
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    planes = []
    for s in range(K):
        p, pack_block, k_pad = make_planes(s)
        planes.append(p)
    stk = tuple(jnp.asarray(np.stack([p[i] for p in planes])) for i in range(7))

    def mk(L):
        @jax.jit
        def loop(x, s0, s1, s2, s3, s4, s5, s6):
            def body(c, k):
                p = pbw.PackedLinearV2(
                    sign_packed=s0[k], side_val=s1[k], side_idx=s2[k],
                    low_scale=s3[k], low_mean=s4[k], high_scale=s5[k], high_zero=s6[k],
                    bias=None, ic=IC, oc=OC, col_tile=OC, pack_block=pack_block,
                    k_pad_shard=k_pad,
                )
                y = pallas_pb.pb_matmul_pallas_v2(c, p, decode_dot=decode_dot,
                                                  oc_tile=oc_tile)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return mk, stk, k_pad


def main():
    log(f"backend: {jax.default_backend()}, M={M}")
    want = sys.argv[1:] or ["dense", "f32", "pair", "bf16"]
    arms = {}
    k_pad = 416
    for tag in want:
        if tag == "dense":
            arms[tag] = mk_dense()
        else:
            dd, _, ot = tag.partition("@")  # e.g. f32@512 → oc_tile=512
            mk, stk, k_pad = mk_packed(dd, oc_tile=int(ot) if ot else None)
            arms[tag] = (mk, stk)
    slopes = interleaved(arms)
    pbits = IC * OC / 8 + k_pad * OC + k_pad * 4
    floor = pbits / HBM_GBPS
    t_dense = slopes.get("dense")
    for tag, t in slopes.items():
        if tag == "dense":
            log(f"dense bf16: {t*1e6:.1f} us ({IC*OC*2/t/1e9:.0f} GB/s weight stream)")
            continue
        msg = (f"v2 {tag}: {t*1e6:.1f} us | packed stream {pbits/t/1e9:.0f} GB/s | "
               f"roofline {floor/t*100:.0f}%")
        if t_dense:
            msg += f" | vs dense {t_dense/t:.3f}x"
        log(msg)
    print(json.dumps({t: round(s * 1e6, 2) for t, s in slopes.items()}))


if __name__ == "__main__":
    main()
