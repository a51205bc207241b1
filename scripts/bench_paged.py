"""Paged-attention kernel variant microbench (TPU, interleaved arms).

The e2e diagnostic (bench_e2e --arms strips,paged,paged_int8) shows the
paged decode kernel streams pages well under HBM bandwidth while the XLA
strip path runs near peak.  This script times isolated kernel variants in
ONE process (tunnel drift cancels):

  base      — production kernel (ops.paged_attention): separate k/v pages,
              batched MXU dots [Hkv, G, page]
  fused     — k and v fused into one [P+1, 2, H, page, D] array: ONE page
              DMA per grid step instead of two
  vpu       — scores/PV via VPU multiply-reduce instead of 2·Hkv MXU
              micro-dots per step
  fused_vpu — both
  multislotN — N slots share one grid step (grid (B/N, maxp), N
              table-directed page operands): each step's dots carry batch
              N·Hkv so the MXU work is big enough to hide the VPU softmax,
              and Mosaic can overlap N independent page DMAs
              (docs/ROADMAP.md item 7's remaining candidate)

Timing: kernel inside lax.scan over iterations; per-iteration tables (scan
xs) point at different pages of a pool far larger than VMEM, so every read
is a true HBM stream (the VMEM-residency trap).  Slope between two scan
lengths removes dispatch overhead; host-fetch syncs (block_until_ready is
a no-op through the axon tunnel).
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from pb_llm_tpu.ops.paged_attention import paged_attention  # noqa: E402

NEG_INF = -1e30


def log(m):
    print(m, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- variants
def _kernel_var(table_ref, len_ref, q_ref, kv_ref, o_ref, m_ref, l_ref, acc_ref,
                *, page_size, n_pages_per_slot, n_groups, fused, vpu):
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]
    start = p * page_size

    @pl.when(start < length)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        hkv = hq // n_groups
        q = q_ref[0].reshape(hkv, n_groups, d)
        if fused:
            k = kv_ref[0, 0]
            v = kv_ref[0, 1]
        else:
            k = kv_ref[0]
            v = None  # separate-ref layout only used with fused here
        if vpu:
            # [Hkv, G, 1, D] * [Hkv, 1, page, D] summed over D
            s = jnp.sum(q[:, :, None, :] * k[:, None, :, :], axis=3)
        else:
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        s = s.astype(jnp.float32)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos < length, s, NEG_INF)
        m_prev = m_ref[:, :1].reshape(hkv, n_groups, 1)
        l_prev = l_ref[:, :1].reshape(hkv, n_groups, 1)
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        pw = jnp.exp(s - m_next)
        pw = jnp.where(pos < length, pw, 0.0)
        l_next = alpha * l_prev + jnp.sum(pw, axis=2, keepdims=True)
        l_ref[:] = jnp.broadcast_to(l_next.reshape(hq, 1), l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_next.reshape(hq, 1), m_ref.shape)
        if vpu:
            pv = jnp.sum(pw[:, :, :, None].astype(v.dtype) * v[:, None, :, :], axis=2)
            pv = pv.astype(jnp.float32)
        else:
            pv = jax.lax.dot_general(
                pw.astype(v.dtype) if v.dtype != jnp.float32 else pw, v,
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha.reshape(hq, 1) + pv.reshape(hq, d)

    @pl.when(p == n_pages_per_slot - 1)
    def _():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page_size", "vpu"))
def paged_fused(q, kv_pages, table, lengths, scale, page_size, vpu=False):
    """kv_pages [P+1, 2, H, page, D] — one DMA per (slot, page) step."""
    b, hq, d = q.shape
    hkv = kv_pages.shape[2]
    maxp = table.shape[1]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0)),
            pl.BlockSpec((1, 2, hkv, page_size, d), lambda bi, p, tbl, ln: (tbl[bi, p], 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_var, page_size=page_size, n_pages_per_slot=maxp,
        n_groups=hq // hkv, fused=True, vpu=vpu)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(table.astype(jnp.int32), lengths.astype(jnp.int32), q, kv_pages)


def _kernel_multislot(table_ref, len_ref, q_ref, *rest, page_size,
                      n_pages_per_slot, n_groups, n_slots):
    """S slots per grid step: page operands k0..k{S-1} are table-directed
    per slot; dots run batched over S·Hkv.  Uniform lengths assumed (bench
    harness uses lengths == ctx everywhere)."""
    kv_refs = rest[:n_slots]
    o_ref, m_ref, l_ref, acc_ref = rest[n_slots:]
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[pl.program_id(0) * n_slots]
    start = p * page_size

    @pl.when(start < length)
    def _():
        s_, hq, d = q_ref.shape
        hkv = hq // n_groups
        q = q_ref[:].reshape(n_slots * hkv, n_groups, d)
        k = jnp.concatenate([kv_refs[s][0, 0] for s in range(n_slots)], axis=0)
        v = jnp.concatenate([kv_refs[s][0, 1] for s in range(n_slots)], axis=0)
        # [S*Hkv, G, page]: batch over slot-kv-head pairs, contract D
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos < length, s, NEG_INF)
        m_prev = m_ref[:, :1].reshape(n_slots * hkv, n_groups, 1)
        l_prev = l_ref[:, :1].reshape(n_slots * hkv, n_groups, 1)
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        pw = jnp.exp(s - m_next)
        pw = jnp.where(pos < length, pw, 0.0)
        l_next = alpha * l_prev + jnp.sum(pw, axis=2, keepdims=True)
        l_ref[:] = jnp.broadcast_to(l_next.reshape(n_slots * hq, 1), l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_next.reshape(n_slots * hq, 1), m_ref.shape)
        pv = jax.lax.dot_general(
            pw.astype(v.dtype) if v.dtype != jnp.float32 else pw, v,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha.reshape(n_slots * hq, 1) + pv.reshape(n_slots * hq, d)

    @pl.when(p == n_pages_per_slot - 1)
    def _():
        d = q_ref.shape[2]
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[:] = (acc_ref[:] * l_inv).reshape(o_ref.shape).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page_size", "n_slots"))
def paged_multislot(q, kv_pages, table, lengths, scale, page_size, n_slots=4):
    b, hq, d = q.shape
    hkv = kv_pages.shape[2]
    maxp = table.shape[1]
    assert b % n_slots == 0
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    def page_spec(s):
        return pl.BlockSpec(
            (1, 2, hkv, page_size, d),
            lambda bi, p, tbl, ln, s=s: (tbl[bi * n_slots + s, p], 0, 0, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // n_slots, maxp),
        in_specs=[pl.BlockSpec((n_slots, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0))]
                 + [page_spec(s) for s in range(n_slots)],
        out_specs=pl.BlockSpec((n_slots, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((n_slots * hq, 128), jnp.float32),
            pltpu.VMEM((n_slots * hq, 128), jnp.float32),
            pltpu.VMEM((n_slots * hq, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _kernel_multislot, page_size=page_size, n_pages_per_slot=maxp,
        n_groups=hq // hkv, n_slots=n_slots)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(table.astype(jnp.int32), lengths.astype(jnp.int32), q,
      *([kv_pages] * n_slots))


# ---------------------------------------------------------------- harness
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--page", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--pool_mb", type=int, default=1024,
                    help="page pool size — far larger than VMEM so reads hit HBM")
    args = ap.parse_args()
    B, H, D, PS = args.b, args.heads, args.d, args.page
    maxp = args.ctx // PS
    page_bytes = H * PS * D * 2  # bf16
    n_pages = max(B * maxp, args.pool_mb * 1024 * 1024 // (2 * page_bytes))
    log(f"pool: {n_pages} pages ({2 * n_pages * page_bytes / 1e6:.0f} MB k+v)")

    # pools are generated ON DEVICE — shipping a 1 GB host array through the
    # axon tunnel takes forever (arrays ride an HTTP transport)
    r = np.random.default_rng(0)
    kk = jax.random.split(jax.random.PRNGKey(0), 3)
    kp = jax.jit(lambda k: jax.random.normal(k, (n_pages + 1, H, PS, D), jnp.bfloat16))(kk[0])
    vp = jax.jit(lambda k: jax.random.normal(k, (n_pages + 1, H, PS, D), jnp.bfloat16))(kk[1])
    kvp = jax.jit(lambda a, b: jnp.stack([a, b], axis=1))(kp, vp)  # [P+1, 2, H, PS, D]
    q = jnp.asarray(r.standard_normal((B, H, D)).astype(np.float32))
    lengths = jnp.full((B,), args.ctx, jnp.int32)
    scale = 1.0 / np.sqrt(D)

    def tables(n_iters, seed):
        t = np.random.default_rng(seed).integers(0, n_pages, size=(n_iters, B, maxp))
        return jnp.asarray(t.astype(np.int32))

    # the pool must ride as a jit ARGUMENT — a closure-captured device array
    # is baked into the compile request as a constant (the axon tunnel ships
    # the HLO over HTTP: 1 GB constant = stall/413)
    def make_scan(fn):
        def run(q0, tbls, *pool):
            def body(carry, tbl):
                out = fn(carry, tbl, *pool)
                return out.astype(carry.dtype), ()
            out, _ = jax.lax.scan(body, q0, tbls)
            return jnp.sum(out)
        return jax.jit(run)

    arms = {
        "base": (lambda qq, tbl, a, b: paged_attention(qq, a, b, tbl, lengths, scale, PS), (kp, vp)),
        "fused": (lambda qq, tbl, a: paged_fused(qq, a, tbl, lengths, scale, PS, vpu=False), (kvp,)),
        "fused_vpu": (lambda qq, tbl, a: paged_fused(qq, a, tbl, lengths, scale, PS, vpu=True), (kvp,)),
        "multislot2": (lambda qq, tbl, a: paged_multislot(qq, a, tbl, lengths, scale, PS, n_slots=2), (kvp,)),
        "multislot4": (lambda qq, tbl, a: paged_multislot(qq, a, tbl, lengths, scale, PS, n_slots=4), (kvp,)),
    }

    # correctness cross-check (same table)
    tb = tables(1, 99)[0]
    ref = paged_attention(q, kp, vp, tb, lengths, scale, PS)
    for name in ("fused", "fused_vpu", "multislot2", "multislot4"):
        fn, pool = arms[name]
        got = fn(q, tb, *pool)
        err = float(jnp.max(jnp.abs(got - ref)))
        log(f"{name}: max|Δ| vs base = {err:.2e}")
        assert err < 3e-2, (name, err)

    fns, raw = {}, {}
    for name, (fn, pool) in arms.items():
        for n in (8, 24):
            f = make_scan(fn)
            tb_n = tables(n, n)
            t0 = time.time()
            float(f(q, tb_n, *pool))
            log(f"compiled {name} n={n} in {time.time()-t0:.0f}s")
            fns[(name, n)] = (f, tb_n, pool)
            raw[(name, n)] = []
    for rep in range(5):
        for name in arms:
            for n in (8, 24):
                f, tb_n, pool = fns[(name, n)]
                t0 = time.perf_counter()
                float(f(q + 0.01 * rep, tb_n, *pool))
                raw[(name, n)].append(time.perf_counter() - t0)

    bytes_per_call = B * maxp * 2 * page_bytes
    out = {}
    for name in arms:
        per_call = (min(raw[(name, 24)]) - min(raw[(name, 8)])) / 16
        gbs = bytes_per_call / per_call / 1e9
        out[name] = {"us_per_call": round(per_call * 1e6, 1), "GB_s": round(gbs, 0)}
        log(f"{name}: {per_call*1e6:.1f} us/call, {gbs:.0f} GB/s page stream")
    print(json.dumps({"metric": f"paged kernel variants (B={B}, H={H}, ctx={args.ctx}, page={PS})",
                      "arms": out}))


if __name__ == "__main__":
    main()
