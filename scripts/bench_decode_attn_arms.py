"""Decompose the strip decode-attention kernel's cost (TPU, same-run arms).

The first full kernel measured 260 GB/s vs XLA's 719-939 same-run
(scripts/bench_attn_layout.py).  Arms isolate: pure block DMA, the scores
dot, the PV dot, the flash bookkeeping, block size.

Usage: python scripts/bench_decode_attn_arms.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pb_llm_tpu.utils.compile_cache import enable_compile_cache
from pb_llm_tpu.ops.decode_attention import decode_attention

enable_compile_cache()

B, S, H, D = 8, 512, 32, 128
HD = H * D
NEG_INF = -1e30


def make_variant(mode: str, block_s: int):
    n_blocks = S // block_s

    def kern(len_ref, q_ref, k_ref, v_ref, o_ref, qbd_ref, m_ref, l_ref, acc_ref):
        b = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)
            qt = q_ref[0].astype(jnp.float32).T
            tiled = jnp.broadcast_to(qt[None], (H, D, H)).reshape(HD, H)
            row_h = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 0) // D
            col_h = jax.lax.broadcasted_iota(jnp.int32, (HD, H), 1)
            qbd_ref[:] = jnp.where(row_h == col_h, tiled, 0.0).astype(qbd_ref.dtype)

        if mode == "dma":
            # touch the blocks minimally: one row reduce into acc
            acc_ref[:] += (k_ref[0, 0].astype(jnp.float32)
                           + v_ref[0, 0].astype(jnp.float32))
        elif mode == "scores":
            k2 = k_ref[0].reshape(block_s, HD)
            s = jax.lax.dot_general(k2, qbd_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(s, axis=0, keepdims=True).reshape(1, H).T * 0 \
                + v_ref[0, 0].astype(jnp.float32) + s[0, :].reshape(H, 1) * 1e-6
        elif mode == "dots":
            k2 = k_ref[0].reshape(block_s, HD)
            s = jax.lax.dot_general(k2, qbd_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            pw = s.astype(jnp.bfloat16)
            v2 = v_ref[0].reshape(block_s, HD)
            full = jax.lax.dot_general(pw, v2, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            f3 = full.reshape(H, H, D)
            qh = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 0)
            kh = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 1)
            acc_ref[:] += jnp.sum(jnp.where(qh == kh, f3, 0.0), axis=1)
        elif mode == "full":
            base = len_ref[b]
            start = j * block_s
            k2 = k_ref[0].reshape(block_s, HD)
            s = jax.lax.dot_general(k2, qbd_ref[:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            rows = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            allowed = rows < base
            s = jnp.where(allowed, s, NEG_INF)
            m_prev = m_ref[:]
            l_prev = l_ref[:]
            m_curr = jnp.max(s, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            pw = jnp.exp(s - m_next)
            pw = jnp.where(allowed, pw, 0.0)
            l_ref[:] = alpha * l_prev + jnp.sum(pw, axis=0, keepdims=True)
            m_ref[:] = m_next
            v2 = v_ref[0].reshape(block_s, HD)
            full = jax.lax.dot_general(pw.astype(v2.dtype), v2,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
            f3 = full.reshape(H, H, D)
            qh = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 0)
            kh = jax.lax.broadcasted_iota(jnp.int32, (H, H, 1), 1)
            pv = jnp.sum(jnp.where(qh == kh, f3, 0.0), axis=1)
            acc_ref[:] = acc_ref[:] * alpha.reshape(H, 1) + pv

        @pl.when(j == n_blocks - 1)
        def _():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v, lengths):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, n_blocks),
                in_specs=[
                    pl.BlockSpec((1, H, D), lambda i, j, ln: (i, 0, 0)),
                    pl.BlockSpec((1, block_s, H, D), lambda i, j, ln: (i, j, 0, 0)),
                    pl.BlockSpec((1, block_s, H, D), lambda i, j, ln: (i, j, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, H, D), lambda i, j, ln: (i, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((HD, H), jnp.bfloat16),
                    pltpu.VMEM((1, H), jnp.float32),
                    pltpu.VMEM((1, H), jnp.float32),
                    pltpu.VMEM((H, D), jnp.float32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(lengths, q, k, v)

    return run


def main():
    L = 8
    key = jax.random.PRNGKey(0)
    layers = [{"k": jax.random.normal(jax.random.PRNGKey(i), (B, S, H, D), jnp.bfloat16),
               "v": jax.random.normal(jax.random.PRNGKey(100 + i), (B, S, H, D), jnp.bfloat16)}
              for i in range(L)]
    lengths = jnp.full((B,), S, jnp.int32)

    # in-scan chained harness: L layers per step (one kernel call each,
    # chained through q) so the slope rides above tunnel jitter
    def chained(fn):
        def run(q0, data, lengths, n):
            def body(qq, _):
                out = qq
                for lay in data:
                    out = fn(out.astype(jnp.bfloat16), lay["k"], lay["v"], lengths)
                return (out / (1.0 + jnp.max(jnp.abs(out)))).astype(jnp.float32), ()
            o, _ = jax.lax.scan(body, q0.astype(jnp.float32), None, length=n)
            return jnp.sum(o)
        return run

    arms = {}
    for mode in ("dma", "scores", "dots", "full"):
        for bs in (128, 256):
            arms[f"{mode}_{bs}"] = make_variant(mode, bs)
    arms["ship_256"] = lambda q, k, v, ln: decode_attention(
        q.astype(jnp.float32), k, v, ln, 1.0, s_used=S, block_s=256)

    fns, raw = {}, {}
    q0 = jax.random.normal(key, (B, H, D), jnp.float32)
    for name, fn in arms.items():
        c = chained(fn)
        for n in (4, 12):
            f = jax.jit(lambda q, data, ln, c=c, n=n: c(q, data, ln, n))
            t0 = time.time()
            float(f(q0, layers, lengths))
            print(f"compiled {name} n={n} in {time.time()-t0:.0f}s", flush=True)
            fns[(name, n)] = f
            raw[(name, n)] = []
    for rep in range(6):
        for name in arms:
            for n in (4, 12):
                t0 = time.perf_counter()
                float(fns[(name, n)](q0 + rep * 1e-3, layers, lengths))
                raw[(name, n)].append(time.perf_counter() - t0)
    out = {}
    nbytes = L * 2 * B * S * H * D * 2
    for name in arms:
        ms = (min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3
        out[name] = {"ms": round(ms, 3), "gbps": round(nbytes / ms / 1e6, 1)}
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps({"metric": f"decode-attn kernel decomposition ({L}L)", "arms": out}))


if __name__ == "__main__":
    main()
