"""TPU experiment: Mosaic int8 dot rate vs f32/bf16 (w8a8 feasibility check).

Round-1 finding: int8 x int8 -> int32 dots lowered ~3x SLOWER than f32 for
the bit-plane dot. This re-measures on the current jax to decide whether a
w8a8 engine mode (quantized activations, zero-convert V-dot) is worth
building.  Shapes: decode bit-plane dot [8, 128] @ [128, 256] x 32 strips,
and one large dot [2048, 4096] @ [4096, 256].

Interleaved arms (see bench.py: the tunnel drifts between runs).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 2048, 4096, 256
L_SHORT, L_LONG = 16, 80
REPS = 5


def log(m):
    print(m, flush=True)


def make_pallas_dot(in_dtype, acc_dtype):
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype)

    def dot(a, b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), acc_dtype),
            in_specs=[pl.BlockSpec((M, K), lambda: (0, 0)),
                      pl.BlockSpec((K, N), lambda: (0, 0))],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b)
    return dot


def arm(in_dtype, acc_dtype, tag, results):
    r = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(r.integers(-127, 127, size=(M, K)), jnp.int8)
        bs = [jnp.asarray(r.integers(-127, 127, size=(K, N)), jnp.int8) for _ in range(8)]
    else:
        a = jnp.asarray(r.standard_normal((M, K)), in_dtype)
        bs = [jnp.asarray(r.standard_normal((K, N)), in_dtype) for _ in range(8)]
    b_stk = jnp.stack(bs)
    dot = make_pallas_dot(in_dtype, acc_dtype)

    def mk(L):
        @jax.jit
        def loop(a, b_stk):
            def body(c, k):
                y = dot((a + c.astype(a.dtype)).astype(a.dtype), b_stk[k])
                return c + y[:1, :1].astype(jnp.float32) * 1e-8, ()
            c, _ = jax.lax.scan(body, jnp.zeros((1, 1), jnp.float32),
                                jnp.tile(jnp.arange(8), L // 8))
            return jnp.sum(c) + jnp.float32(0)
        return loop

    fns = {}
    for L in (L_SHORT, L_LONG):
        f = mk(L)
        t0 = time.perf_counter()
        float(f(a, b_stk))
        log(f"  [{tag}] L={L} compile: {time.perf_counter()-t0:.1f}s")
        fns[L] = f
    results[tag] = (fns, (a, b_stk))


def main():
    log(f"backend: {jax.default_backend()}")
    arms = {}
    arm(jnp.float32, jnp.float32, "f32", arms)
    arm(jnp.bfloat16, jnp.float32, "bf16", arms)
    arm(jnp.int8, jnp.int32, "int8", arms)

    times = {tag: {L: [] for L in (L_SHORT, L_LONG)} for tag in arms}
    for i in range(REPS):
        for tag, (fns, args) in arms.items():
            for L in (L_SHORT, L_LONG):
                t0 = time.perf_counter()
                float(fns[L](*args))
                times[tag][L].append(time.perf_counter() - t0)
    flops = 2 * M * K * N
    for tag in arms:
        med = {L: float(np.median(times[tag][L])) for L in (L_SHORT, L_LONG)}
        slope = (med[L_LONG] - med[L_SHORT]) / (L_LONG - L_SHORT)
        log(f"{tag}: {slope*1e6:.1f} us/dot | {flops/slope/1e12:.1f} TOP/s")


if __name__ == "__main__":
    main()
