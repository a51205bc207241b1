"""TPU experiment: PBW v2 PREFILL kernel vs dense bf16 at llama-7b MLP m=2048.

Measures the scratch-reconstruction prefill path (`_v2_prefill_call`):
dense weight tile rebuilt once per oc tile, then plain MXU dots — the
VERDICT round-1 item 6 target is >= 0.9x dense bf16 at m=2048, 4096x11008.

Same slope methodology as bench.py (axon tunnel: in-graph scan over K
distinct weights, two loop lengths, median reps). Run ONE at a time on the
tunnel.  Usage: python scripts/bench_v2_prefill.py [oc_tile ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("M", "2048"))
IC, OC = 4096, 11008
K = 8
L_SHORT, L_LONG = 8, 40
FRAC_BINARY = float(os.environ.get("FRAC_BINARY", "0.9"))
PREFILL_BF16 = os.environ.get("PREFILL_BF16", "1") == "1"


def log(msg):
    print(msg, flush=True)


def make_v2_planes(seed):
    """Global-column v2 planes (n_rg=1), same construction as bench.py."""
    from pb_llm_tpu.core import packing

    pack_block = packing.default_pack_block(IC)
    r = np.random.default_rng(seed)
    w = r.standard_normal((OC, IC)).astype(np.float32)
    w *= (1.0 + 3.0 * (r.random(IC) < 0.1))[None, :]

    k = int(round(IC * (1 - FRAC_BINARY)))
    k_pad = max(32, -(-k // 32) * 32)
    agg = np.abs(w).sum(0)
    cols = np.sort(np.argsort(-agg)[:k])
    side_idx = np.full((k_pad, 1), IC, np.int32)
    side_idx[:k, 0] = cols
    salient = np.zeros((OC, IC), bool)
    salient[:, cols] = True

    mask = ~salient
    wm = (w * mask).astype(np.float32)
    mean = wm.mean(-1)
    scale = np.abs(wm - mean[:, None]).mean(-1)
    xmin = np.minimum(w.min(1), 0)
    xmax = np.maximum(w.max(1), 0)
    hs = ((xmax - xmin) / 255).astype(np.float32)
    hz = np.round(-xmin / hs).astype(np.float32)
    codes = np.clip(np.round(w / hs[:, None]) + hz[:, None], 0, 255).astype(np.uint8)
    side_val = np.zeros((k_pad, OC), np.uint8)
    side_val[:k] = codes[:, cols].T

    bits = (((w - mean[:, None]) >= 0).T) & ~salient.T
    return (
        packing.pack_bits_np(bits.astype(np.uint32), pack_block),
        side_val,
        side_idx,
        scale[None, :].astype(np.float32),
        mean[None, :].astype(np.float32),
        hs,
        hz,
    ), pack_block, k_pad


def slope_time(loop_maker, args, reps=5, tag=""):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32))
          for i in range(reps + 2)]
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


def bench_v2_prefill(oc_tile, gather="take", extract="pallas"):
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    planes = []
    for s in range(K):
        p, pack_block, k_pad = make_v2_planes(s)
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
                )
                y = pallas_pb.pb_matmul_pallas_v2(c, p, oc_tile=oc_tile,
                                                  prefill_bf16=PREFILL_BF16,
                                                  prefill_gather=gather,
                                                  prefill_extract=extract)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return slope_time(mk, stk, tag=f"v2pf ot={oc_tile} {gather}/{extract}"), k_pad


def main_variants():
    """ROADMAP 1c: gather (take vs one-hot dot) x extract (pallas vs XLA)
    arms + dense, all in ONE process so tunnel drift cancels."""
    log(f"backend: {jax.default_backend()}, M={M}, bf16={PREFILL_BF16} [variants]")
    t_dense = bench_dense()
    flops = 2 * M * IC * OC
    log(f"dense bf16 m={M}: {t_dense*1e6:.1f} us ({flops/t_dense/1e12:.1f} TFLOP/s)")
    results = {}
    for gather, extract in (("take", "pallas"), ("dot", "pallas"),
                            ("take", "xla"), ("dot", "xla")):
        (t, _), = (bench_v2_prefill(256, gather, extract),)
        results[f"{gather}/{extract}"] = t
        log(f"v2 prefill {gather}/{extract}: {t*1e6:.1f} us | vs dense {t_dense/t:.3f}x"
            f" | {flops/t/1e12:.1f} TFLOP/s")
    best = min(results, key=results.get)
    log(f"BEST: {best} {results[best]*1e6:.1f} us ({t_dense/results[best]:.3f}x dense)")


def main():
    log(f"backend: {jax.default_backend()}, M={M}, bf16={PREFILL_BF16}")
    oc_tiles = [int(a) for a in sys.argv[1:]] or [256]

    t_dense = float(os.environ.get("DENSE_US", "0")) * 1e-6
    if not t_dense:
        t_dense = bench_dense()
    flops = 2 * M * IC * OC
    log(f"dense bf16 m={M}: {t_dense*1e6:.1f} us ({flops/t_dense/1e12:.1f} TFLOP/s)")

    for ot in oc_tiles:
        (t, k_pad) = bench_v2_prefill(ot)
        stream = IC * OC / 8 + k_pad * OC + k_pad * 4
        log(f"v2 prefill oc_tile={ot}: {t*1e6:.1f} us | vs dense {t_dense/t:.3f}x | "
            f"{flops/t/1e12:.1f} TFLOP/s | packed stream {stream/t/1e9:.0f} GB/s")




# --------------------------------------------------------------------------
# diagnostic arms (run with ARMS=diag): Pallas MXU ceiling + XLA fused path
# --------------------------------------------------------------------------


def bench_pallas_dense():
    """Pure dense bf16 matmul as a Pallas kernel with the SAME structure as
    the prefill kernel (x resident, grid over oc tiles) — isolates Pallas's
    MXU dot rate from the quantization work."""
    import functools
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    OT = int(os.environ.get("OT", "128"))

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((x.shape[0], OC), jnp.float32),
            grid=(OC // OT,),
            in_specs=[
                pl.BlockSpec((x.shape[0], IC), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((IC, OT), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((x.shape[0], OT), lambda i: (0, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)

    W = jnp.asarray(np.random.default_rng(1).standard_normal((K, IC, OC)), jnp.bfloat16)

    def mk(L):
        @jax.jit
        def loop(x, W):
            def body(c, k):
                y = pmm(c.astype(jnp.bfloat16), W[k])
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return slope_time(mk, (W,), tag=f"pallas-dense ot={OT}")


def bench_xla_fused():
    """XLA does everything: y = x @ dequantize_v2(p) jitted whole."""
    from pb_llm_tpu.core import pbw

    planes = []
    for s in range(K):
        p, pack_block, k_pad = make_v2_planes(s)
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
                )
                w = pbw.dequantize_v2(p).astype(jnp.bfloat16)
                y = (c.astype(jnp.bfloat16) @ w).astype(jnp.float32)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return slope_time(mk, stk, tag="xla-fused"), k_pad


def diag():
    log(f"backend: {jax.default_backend()}, M={M} (diag arms)")
    t_dense = float(os.environ.get("DENSE_US", "0")) * 1e-6
    flops = 2 * M * IC * OC
    if not t_dense:
        t_dense = bench_dense()
    log(f"dense bf16 m={M}: {t_dense*1e6:.1f} us ({flops/t_dense/1e12:.1f} TFLOP/s)")
    try:
        t = bench_pallas_dense()
        log(f"pallas dense: {t*1e6:.1f} us | vs dense {t_dense/t:.3f}x | {flops/t/1e12:.1f} TFLOP/s")
    except Exception as e:
        log(f"pallas dense failed: {e}")
    try:
        t, _ = bench_xla_fused()
        log(f"xla fused dequant+dot: {t*1e6:.1f} us | vs dense {t_dense/t:.3f}x | {flops/t/1e12:.1f} TFLOP/s")
    except Exception as e:
        log(f"xla fused failed: {str(e)[:500]}")




def bench_decomp():
    """Time dequant alone / dequant+scatter / matmul-on-fresh-temp to locate
    the hybrid path's overhead."""
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    planes = []
    for s in range(K):
        p, pack_block, k_pad = make_v2_planes(s)
        planes.append(p)
    stk = tuple(jnp.asarray(np.stack([p[i] for p in planes])) for i in range(7))

    def mkp(k):
        return pbw.PackedLinearV2(
            sign_packed=stk[0][k], side_val=stk[1][k], side_idx=stk[2][k],
            low_scale=stk[3][k], low_mean=stk[4][k], high_scale=stk[5][k], high_zero=stk[6][k],
            bias=None, ic=IC, oc=OC, col_tile=OC, pack_block=pack_block,
        )

    def arm(tag, body):
        def mk(L):
            @jax.jit
            def loop(x, s0, s1, s2, s3, s4, s5, s6):
                def step(c, k):
                    p = pbw.PackedLinearV2(
                        sign_packed=s0[k], side_val=s1[k], side_idx=s2[k],
                        low_scale=s3[k], low_mean=s4[k], high_scale=s5[k], high_zero=s6[k],
                        bias=None, ic=IC, oc=OC, col_tile=OC, pack_block=pack_block,
                    )
                    return body(c, p)
                c, _ = jax.lax.scan(step, x, jnp.tile(jnp.arange(K), L // K))
                return jnp.sum(c)
            return loop
        t = slope_time(mk, stk, tag=tag)
        log(f"{tag}: {t*1e6:.1f} us")
        return t

    def dequant_only(c, p):
        import dataclasses
        # binary part only: skip the scatter by zeroing... use internal kernel
        w = pallas_pb.dequant_v2_pallas(p, dtype=jnp.bfloat16)
        return c + jnp.sum(w.astype(jnp.float32), axis=1)[None, :IC] * 1e-8, ()

    def dequant_dot(c, p):
        w = pallas_pb.dequant_v2_pallas(p, dtype=jnp.bfloat16)
        y = jnp.dot(c.astype(jnp.bfloat16), w, preferred_element_type=jnp.float32)
        return c + y[:, :IC] * 1e-8, ()

    arm("dequant+scatter+rowsum", dequant_only)
    arm("dequant+scatter+dot", dequant_dot)


def main_flat():
    """Flat-harness arms at m=2048 (ARMS=flat): dense / hybrid-bf16 /
    fused-int8, interleaved in one process.  The stacked harness's in-scan
    weight slices materialize pallas operands (scripts/bench_v2_decompose.py
    — ~1.5x understatement at decode; smaller at prefill but still unfair),
    and a bare y[:, :IC] epilogue lets XLA DCE a static-weight dense matmul
    to its first IC columns, so dense folds every output column."""
    log(f"backend: {jax.default_backend()}, M={M} [flat arms]")
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    def fold(y):
        y1 = y[:, :IC] + y[:, IC : 2 * IC]
        rest = y[:, 2 * IC :]
        y2 = jnp.zeros((y.shape[0], IC), y.dtype).at[:, : rest.shape[1]].set(rest)
        return y1 + y2

    planes = []
    k_pad = None
    for s in range(K):
        p, pack_block, k_pad = make_v2_planes(s)
        planes.append(p)
    flat = tuple(jnp.asarray(a) for p in planes for a in p)
    Ws = tuple(jnp.asarray(np.random.default_rng(1 + i).standard_normal((IC, OC)), jnp.bfloat16)
               for i in range(K))

    def mk_packed(call_kw, oc_tile=None):
        def mk(L):
            @jax.jit
            def loop(x, *flat):
                def body(c, _):
                    for kk in range(K):
                        s0, s1, s2, s3, s4, s5, s6 = flat[kk * 7 : (kk + 1) * 7]
                        p = pbw.PackedLinearV2(
                            sign_packed=s0, side_val=s1, side_idx=s2,
                            low_scale=s3, low_mean=s4, high_scale=s5,
                            high_zero=s6, bias=None, ic=IC, oc=OC,
                            col_tile=OC, pack_block=pack_block,
                            k_pad_shard=k_pad)
                        y = pallas_pb.pb_matmul_pallas_v2(c, p, oc_tile=oc_tile, **call_kw)
                        c = c + fold(y) * 1e-8
                    return c, ()
                c, _ = jax.lax.scan(body, x, None, length=L // K)
                return jnp.sum(c)
            return loop
        return mk, flat

    def mk_dense():
        def mk(L):
            @jax.jit
            def loop(x, *Ws):
                def body(c, _):
                    for W in Ws:
                        y = (c.astype(jnp.bfloat16) @ W).astype(jnp.float32)
                        c = c + fold(y) * 1e-8
                    return c, ()
                c, _ = jax.lax.scan(body, x, None, length=L // K)
                return jnp.sum(c)
            return loop
        return mk, Ws

    arms = {
        "dense": mk_dense(),
        "hybrid_bf16": mk_packed(dict(prefill_bf16=True)),
        "int8": mk_packed(dict(prefill_int8=True)),
        "int8_wholeoc": mk_packed(dict(prefill_int8=True), oc_tile=OC),
    }
    want = sys.argv[1:]
    if want:
        arms = {k: v for k, v in arms.items() if k in want}

    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32))
          for i in range(7)]
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
    for i in range(1, 6):
        for tag in arms:
            for L in (L_SHORT, L_LONG):
                t0 = time.perf_counter()
                float(fns[tag][L](xs[i], *arms[tag][1]))
                times[tag][L].append(time.perf_counter() - t0)
    flops = 2 * M * IC * OC
    slopes = {}
    for tag in arms:
        med = {L: float(np.median(times[tag][L])) for L in (L_SHORT, L_LONG)}
        slopes[tag] = (med[L_LONG] - med[L_SHORT]) / (L_LONG - L_SHORT)
    t_dense = slopes.get("dense")
    for tag, t in slopes.items():
        msg = f"{tag}: {t*1e6:.1f} us | {flops/t/1e12:.1f} TFLOP/s"
        if t_dense and tag != "dense":
            msg += f" | vs dense {t_dense/t:.3f}x"
        log(msg)
    import json
    print(json.dumps({t: round(s * 1e6, 1) for t, s in slopes.items()}))


if __name__ == "__main__":
    if os.environ.get("ARMS") == "diag":
        diag()
    elif os.environ.get("ARMS") == "decomp":
        bench_decomp()
    elif os.environ.get("ARMS") == "variants":
        main_variants()
    elif os.environ.get("ARMS") == "flat":
        main_flat()
    else:
        main()
