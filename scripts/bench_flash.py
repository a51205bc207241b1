"""TPU experiment: flash attention block-size / dtype sweep vs the XLA path.

Decides `_flash_eligible` (VERDICT round-1 item 9) with data: measures the
Pallas flash kernel across (block_q, block_k, dots_bf16) against the XLA
masked-softmax path at T in {2048, 4096}, B=1, H=32, D=128 (llama-7b eval
window and a long-context point).

Slope methodology (axon tunnel — see bench.py): in-graph scan over K
distinct qkv sets, two loop lengths, median reps.
Usage: python scripts/bench_flash.py [T ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

B, H, D = 1, 32, 128
K = 4
L_SHORT, L_LONG = 4, 20
REPS = 5


def log(msg):
    print(msg, flush=True)


def slope_time(loop_maker, args, tag=""):
    res = {}
    for L in (L_SHORT, L_LONG):
        f = loop_maker(L)
        t0 = time.perf_counter()
        float(f(*args))
        log(f"  [{tag}] L={L} compile+first: {time.perf_counter()-t0:.1f}s")
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        res[L] = float(np.median(ts))
    return (res[L_LONG] - res[L_SHORT]) / (L_LONG - L_SHORT)


def make_qkv(t):
    r = np.random.default_rng(0)
    def one(i):
        return jnp.asarray(r.standard_normal((B, t, H, D)).astype(np.float32))
    return tuple(jnp.stack([one(i) for i in range(K)]) for _ in range(3))


def bench_xla(t, qkv):
    from pb_llm_tpu.models.attention import masked_softmax_attention, causal_allowed

    scale = 1.0 / np.sqrt(D)
    allowed = causal_allowed(0, t, t, None)

    def mk(L):
        @jax.jit
        def loop(qs, ks, vs):
            def body(c, i):
                o = masked_softmax_attention(qs[i] + c, ks[i], vs[i], allowed, scale)
                return c + jnp.mean(o) * 1e-8, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.tile(jnp.arange(K), L // K))
            return c
        return loop

    return slope_time(mk, qkv, tag=f"xla T={t}")


def bench_flash(t, qkv, bq, bk, bf16):
    from pb_llm_tpu.ops.flash_attention import flash_attention

    scale = float(1.0 / np.sqrt(D))

    def mk(L):
        @jax.jit
        def loop(qs, ks, vs):
            def body(c, i):
                o = flash_attention(qs[i] + c, ks[i], vs[i], scale, causal=True,
                                    block_q=bq, block_k=bk, dots_bf16=bf16)
                return c + jnp.mean(o) * 1e-8, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), jnp.tile(jnp.arange(K), L // K))
            return c
        return loop

    return slope_time(mk, qkv, tag=f"flash T={t} bq={bq} bk={bk} bf16={int(bf16)}")


def main():
    log(f"backend: {jax.default_backend()}")
    ts = [int(a) for a in sys.argv[1:]] or [2048, 4096]
    blocks = [(128, 128), (256, 256), (512, 512), (256, 512)]
    for t in ts:
        qkv = make_qkv(t)
        t_xla = bench_xla(t, qkv)
        log(f"T={t}: XLA {t_xla*1e3:.2f} ms")
        for bf16 in (True, False):
            for bq, bk in blocks:
                tt = bench_flash(t, qkv, bq, bk, bf16)
                log(f"T={t}: flash bq={bq} bk={bk} bf16={int(bf16)}: {tt*1e3:.2f} ms "
                    f"| vs XLA {t_xla/tt:.2f}x")


if __name__ == "__main__":
    main()
