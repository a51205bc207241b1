"""TPU experiment: PBW v2 kernel vs dense bf16 vs v1 at llama-7b MLP decode.

Same slope methodology as bench.py (axon tunnel: in-graph scan over K
distinct weights, two loop lengths, median reps). Run ONE at a time on the
tunnel.  Usage: python scripts/bench_v2_experiment.py [oc_tile ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

M = 8
IC, OC = 4096, 11008
K = 8
L_SHORT, L_LONG = 16, 272
FRAC_BINARY = float(os.environ.get("FRAC_BINARY", "0.9"))  # 1.0 → sign-only floor
# COL_TILE=11008 (== OC) → one global salient column set: the activation
# gather shrinks from n_rg·k_pad to k_pad elements
COL_TILE = int(os.environ.get("COL_TILE", "256"))


def log(msg):
    print(msg, flush=True)


def make_v2_planes(seed):
    from pb_llm_tpu.core import packing

    pack_block = packing.default_pack_block(IC)
    r = np.random.default_rng(seed)
    w = r.standard_normal((OC, IC)).astype(np.float32)
    # column-heavy weights (realistic outlier channels)
    w *= (1.0 + 3.0 * (r.random(IC) < 0.1))[None, :]

    n_rg = OC // COL_TILE
    k = int(round(IC * (1 - FRAC_BINARY)))
    k_pad = max(32, -(-k // 32) * 32)  # min one sentinel-only slot row block

    salient = np.zeros((OC, IC), bool)
    side_idx = np.full((k_pad, n_rg), IC, np.int32)
    for t in range(n_rg):
        agg = np.abs(w[t * COL_TILE : (t + 1) * COL_TILE]).sum(0)
        cols = np.argsort(-agg)[:k]
        cols.sort()
        side_idx[:k, t] = cols
        salient[t * COL_TILE : (t + 1) * COL_TILE, cols] = True

    mask = ~salient
    wm = w * mask
    mean = wm.mean(-1)
    scale = np.abs(wm - mean[:, None]).mean(-1)
    xmin = np.minimum(w.min(1), 0)
    xmax = np.maximum(w.max(1), 0)
    hs = ((xmax - xmin) / 255).astype(np.float32)
    hz = np.round(-xmin / hs).astype(np.float32)
    codes = np.clip(np.round(w / hs[:, None]) + hz[:, None], 0, 255).astype(np.uint8)

    side_val = np.zeros((k_pad, OC), np.uint8)
    for t in range(n_rg):
        lo, hi = t * COL_TILE, (t + 1) * COL_TILE
        cols = side_idx[:k, t]
        side_val[:k, lo:hi] = codes[lo:hi][:, cols].T

    bits = (((w - mean[:, None]) >= 0).T) & ~salient.T
    return (
        packing.pack_bits_np(bits.astype(np.uint32), pack_block),
        side_val,
        side_idx,
        scale[None, :].astype(np.float32),
        mean[None, :].astype(np.float32),
        hs,
        hz,
    ), pack_block


def slope_time(loop_maker, args, reps=6, tag=""):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32)) for i in range(reps + 2)]
    res = {}
    for L in (L_SHORT, L_LONG):
        f = loop_maker(L)
        t0 = time.perf_counter()
        float(f(xs[0], *args))
        log(f"  [{tag}] L={L} compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            float(f(xs[i], *args))
            ts.append(time.perf_counter() - t0)
        res[L] = float(np.median(ts))
        log(f"  [{tag}] L={L} median: {res[L]*1e3:.1f}ms")
    return (res[L_LONG] - res[L_SHORT]) / (L_LONG - L_SHORT)


def bench_dense():
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

    return slope_time(mk, (W,), tag="dense")


def bench_v2(oc_tile):
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    planes = []
    for s in range(K):
        p, pack_block = make_v2_planes(s)
        planes.append(p)
    stk = tuple(jnp.asarray(np.stack([p[i] for p in planes])) for i in range(7))

    def mk(L):
        @jax.jit
        def loop(x, s0, s1, s2, s3, s4, s5, s6):
            def body(c, k):
                p = pbw.PackedLinearV2(
                    sign_packed=s0[k], side_val=s1[k], side_idx=s2[k],
                    low_scale=s3[k], low_mean=s4[k], high_scale=s5[k], high_zero=s6[k],
                    bias=None, ic=IC, oc=OC, col_tile=COL_TILE, pack_block=pack_block,
                )
                y = pallas_pb.pb_matmul_pallas_v2(c, p, oc_tile=oc_tile)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return slope_time(mk, stk, tag=f"v2 ot={oc_tile}")


def main():
    log(f"backend: {jax.default_backend()}, col_tile={COL_TILE}")
    oc_tiles = [int(a) for a in sys.argv[1:]] or [512, 256]

    t_dense = float(os.environ.get("DENSE_US", "0")) * 1e-6
    if not t_dense:
        t_dense = bench_dense()
    log(f"dense bf16: {t_dense*1e6:.1f} us ({IC*OC*2/t_dense/1e9:.0f} GB/s)")

    k_pad = -(-int(round(IC * (1 - FRAC_BINARY))) // 32) * 32
    stream_bytes = IC * OC / 8 + k_pad * OC + (k_pad * (OC // COL_TILE)) * 4
    for ot in oc_tiles:
        t = bench_v2(ot)
        log(f"v2 planar oc_tile={ot}: {t*1e6:.1f} us | vs dense {t_dense/t:.3f}x | "
            f"packed stream {stream_bytes/t/1e9:.0f} GB/s | "
            f"roofline frac {(stream_bytes/819e9)/t:.2f}")


if __name__ == "__main__":
    main()
