"""TPU experiment: find a Pallas matmul structure matching XLA's MXU rate.

Pure dense bf16 [2048,4096]@[4096,11008]: XLA hits ~318 TF/s; the x-resident
single-axis-grid Pallas kernel only ~128 TF/s.  Sweep grid/block structures
to find what closes the gap — the winner becomes the v2 prefill kernel's
skeleton.  Usage: python scripts/bench_pallas_matmul.py [variant ...]
variants: xres128 xres256 grid2_512_256 grid2_256_256 grid3_512_256_1024
          kchunk xres_par
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, IC, OC = 2048, 4096, 11008
K = 8
L_SHORT, L_LONG = 8, 40


def log(msg):
    print(msg, flush=True)


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
    return (res[L_LONG] - res[L_SHORT]) / (L_LONG - L_SHORT)


def _loop_over(pmm):
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

    return mk, (W,)


def xres(ot, parallel=False):
    """x resident, grid over oc tiles only."""
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, OC), jnp.float32),
            grid=(OC // ot,),
            in_specs=[
                pl.BlockSpec((M, IC), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((IC, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel" if parallel else "arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)
    return pmm


def grid2(mt, ot):
    """Classic (m, n) grid, m OUTER so each x panel loads once; w streams
    per m tile (cheap for the packed format: planes are 10 MB)."""
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, OC), jnp.float32),
            grid=(M // mt, OC // ot),
            in_specs=[
                pl.BlockSpec((mt, IC), lambda mi, i: (mi, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((IC, ot), lambda mi, i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mt, ot), lambda mi, i: (mi, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)
    return pmm


def grid3(mt, ot, kt):
    """(m, n, k) grid with VMEM f32 accumulator, k innermost."""
    def kern(x_ref, w_ref, o_ref, acc_ref):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)

        @pl.when(ki == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, OC), jnp.float32),
            grid=(M // mt, OC // ot, IC // kt),
            in_specs=[
                pl.BlockSpec((mt, kt), lambda mi, i, ki: (mi, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec((kt, ot), lambda mi, i, ki: (ki, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((mt, ot), lambda mi, i, ki: (mi, i), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((mt, ot), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)
    return pmm


def kchunk(ot, nk=4):
    """x resident, oc grid, dot split into nk sequential K chunks."""
    def kern(x_ref, w_ref, o_ref):
        kc = IC // nk
        acc = jnp.zeros((M, o_ref.shape[1]), jnp.float32)
        for j in range(nk):
            acc += jnp.dot(x_ref[:, j * kc : (j + 1) * kc], w_ref[j * kc : (j + 1) * kc, :],
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc

    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, OC), jnp.float32),
            grid=(OC // ot,),
            in_specs=[
                pl.BlockSpec((M, IC), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((IC, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)
    return pmm


VARIANTS = {
    "xres128": lambda: xres(128),
    "xres256": lambda: xres(256),
    "xres_par": lambda: xres(256, parallel=True),
    "grid2_512_256": lambda: grid2(512, 256),
    "grid2_256_256": lambda: grid2(256, 256),
    "grid2_1024_256": lambda: grid2(1024, 256),
    "grid3_512_256_1024": lambda: grid3(512, 256, 1024),
    "grid3_256_256_512": lambda: grid3(256, 256, 512),
    "kchunk": lambda: kchunk(256, 4),
}


def main():
    names = sys.argv[1:] or ["grid2_512_256", "grid2_256_256", "grid3_512_256_1024", "kchunk"]
    flops = 2 * M * IC * OC
    t_dense = float(os.environ.get("DENSE_US", "581.1")) * 1e-6
    log(f"dense bf16 reference: {t_dense*1e6:.1f} us ({flops/t_dense/1e12:.1f} TFLOP/s)")
    for name in names:
        try:
            mk, args = _loop_over(VARIANTS[name]())
            t = slope_time(mk, args, tag=name)
            log(f"{name}: {t*1e6:.1f} us | vs XLA {t_dense/t:.3f}x | {flops/t/1e12:.1f} TFLOP/s")
        except Exception as e:
            log(f"{name} FAILED: {str(e)[:300]}")




def xres_int8(ot):
    """x resident int8 x int8 -> int32, grid over oc tiles."""
    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    def pmm(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, OC), jnp.int32),
            grid=(OC // ot,),
            in_specs=[
                pl.BlockSpec((M, IC), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((IC, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, ot), lambda i: (0, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(x, w)
    return pmm


def _loop_over_int8(pmm):
    r = np.random.default_rng(1)
    W = jnp.asarray(r.integers(-127, 127, size=(K, IC, OC)), jnp.int8)

    def mk(L):
        @jax.jit
        def loop(x, W):
            def body(c, k):
                xq = jnp.clip(jnp.round(c * 12.7), -127, 127).astype(jnp.int8)
                y = pmm(xq, W[k])
                return c + y[:, :IC].astype(jnp.float32) * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return mk, (W,)


VARIANTS["xres_int8_256"] = lambda: xres_int8(256)
VARIANTS["xres_int8_128"] = lambda: xres_int8(128)


def main_int8():
    flops = 2 * M * IC * OC
    t_dense = float(os.environ.get("DENSE_US", "581.1")) * 1e-6
    log(f"dense bf16 reference: {t_dense*1e6:.1f} us ({flops/t_dense/1e12:.1f} TFLOP/s)")
    for name in ["xres_int8_256", "xres_int8_128"]:
        try:
            mk, args = _loop_over_int8(VARIANTS[name]())
            t = slope_time(mk, args, tag=name)
            log(f"{name}: {t*1e6:.1f} us | vs XLA bf16 {t_dense/t:.3f}x | {flops/t/1e12:.1f} TOP/s")
        except Exception as e:
            log(f"{name} FAILED: {str(e)[:300]}")


if __name__ == "__main__":
    if os.environ.get("ARMS") == "int8":
        main_int8()
    else:
        main()
