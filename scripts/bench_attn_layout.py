"""Decode-attention cache LAYOUT A/B on TPU (interleaved arms, slope method).

Hypothesis (round 4, ROADMAP open item 1): the strip cache's [B, S, H, D]
layout makes the decode attention read STRIDED — for a fixed (slot, head)
consecutive keys are H*D*2 = 8 KB apart with only D*2 = 256 B contiguous,
so the XLA attention fusion streams the cache at ~60% of the dense-matmul
rate (bench_e2e --budget: attention 4.37 ms vs a 2.6 ms bf16 read floor at
32L).  A head-major [B, H, S, D] layout gives each (slot, head) a
contiguous S*D*2 = 128 KB stream, which should close the gap with NO Pallas
kernel at all.

Arms (all same-run, interleaved, n-step chained scan, slope between n=4/12):
  dense      — bf16 matmul streaming the same bytes/layer as K+V: the
               same-run streaming-rate yardstick
  seqmajor   — shipping layout [B, S, H, D], full-cache masked softmax
  headmajor  — [B, H, S, D], same math (einsum indices moved)
  headmajor_i8 — [B, H, S, D] int8 cache + per-(h, s) scale folded outside
               the d-contraction (scores) / into probs (PV): half the bytes

Usage: python scripts/bench_attn_layout.py [--layers 8 --ctx 512]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pb_llm_tpu.utils.compile_cache import enable_compile_cache
from pb_llm_tpu.ops.decode_attention import decode_attention as DA

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head_dim", type=int, default=128)
    args = ap.parse_args()

    B, S, H, D, L = args.slots, args.ctx, args.heads, args.head_dim, args.layers
    key = jax.random.PRNGKey(0)
    scale = 1.0 / D ** 0.5
    lengths = jnp.full((B,), S - 1, jnp.int32)

    ks = jax.random.normal(key, (L, B, S, H, D), jnp.bfloat16)
    vs = jax.random.normal(key, (L, B, S, H, D), jnp.bfloat16)
    ks_hm = jnp.transpose(ks, (0, 1, 3, 2, 4))  # [L, B, H, S, D]
    vs_hm = jnp.transpose(vs, (0, 1, 3, 2, 4))
    # int8 head-major + per-(b, h, s) scale
    k_sc = jnp.maximum(jnp.max(jnp.abs(ks_hm.astype(jnp.float32)), -1), 1e-8) / 127.0
    v_sc = jnp.maximum(jnp.max(jnp.abs(vs_hm.astype(jnp.float32)), -1), 1e-8) / 127.0
    ks_i8 = jnp.clip(jnp.round(ks_hm.astype(jnp.float32) / k_sc[..., None]), -127, 127).astype(jnp.int8)
    vs_i8 = jnp.clip(jnp.round(vs_hm.astype(jnp.float32) / v_sc[..., None]), -127, 127).astype(jnp.int8)
    # dense arm: same bytes/layer as the bf16 K+V cache arms stream,
    # including the B slots factor -> [4096, 2*B*S*H*D/4096] bf16
    wd = jax.random.normal(key, (L, 4096, 2 * B * S * H * D // 4096), jnp.bfloat16)
    xd = jax.random.normal(key, (8, 4096), jnp.bfloat16)

    mask = (jnp.arange(S)[None, :] < (lengths[:, None] + 1))[:, None, :]  # [B,1,S]

    def attn_seq(q, k, v):  # q [B,H,D]; k,v [B,S,H,D]
        s = jnp.einsum("bhd,bshd->bhs", q * scale, k.astype(q.dtype))
        s = jnp.where(mask, s.astype(jnp.float32), -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhs,bshd->bhd", p, v.astype(q.dtype))

    def attn_hm(q, k, v):  # k,v [B,H,S,D]
        s = jnp.einsum("bhd,bhsd->bhs", q * scale, k.astype(q.dtype))
        s = jnp.where(mask, s.astype(jnp.float32), -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        return jnp.einsum("bhs,bhsd->bhd", p, v.astype(q.dtype))

    def attn_hm_i8(q, k, v, ksc, vsc):  # k,v int8 [B,H,S,D]; scales [B,H,S]
        s = jnp.einsum("bhd,bhsd->bhs", q * scale, k.astype(q.dtype))
        s = s * ksc.astype(q.dtype)  # per-token scale factors out of the d-dot
        s = jnp.where(mask, s.astype(jnp.float32), -jnp.inf)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        p = p * vsc.astype(q.dtype)  # fold v scale into the probs
        return jnp.einsum("bhs,bhsd->bhd", p, v.astype(q.dtype))

    def chain(step):
        # data rides as an explicit jit argument (closed-over device arrays
        # would be shipped as constants in the remote-compile payload)
        def run(data, q0, n):
            def body(q, _):
                out = step(data, q)
                return (out / (1.0 + jnp.max(jnp.abs(out)))).astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q0, None, length=n)
            return jnp.sum(q.astype(jnp.float32))
        return run

    q0 = jax.random.normal(key, (B, H, D), jnp.float32)
    x0 = jax.random.normal(key, (8, 4096), jnp.float32)

    def dense_step(data, x):
        y = jnp.einsum("mk,lkn->lmn", x.astype(jnp.bfloat16), data["w"]).astype(jnp.float32)
        return x * (1.0 + 1e-9 * jnp.tanh(jnp.sum(y)))  # chain dependence, keep shape

    def carry_run(d, q0, n):
        """Engine-shaped: caches are scan CARRIES, each step scatters one
        new token per slot then reads — isolates read-after-write /
        carry-copy cost vs the invariant-cache arms."""
        caches = [{"k": d["k"][i], "v": d["v"][i]} for i in range(L)]

        def body(carry, _):
            caches, q, l = carry
            out = q
            nc = []
            for c in caches:
                kn = (out[:, None] * 0.5).astype(c["k"].dtype)  # [B,1? ...]
                rows = jnp.arange(B)
                ck = c["k"].at[rows, l].set(kn.reshape(B, H, D))
                cv = c["v"].at[rows, l].set(kn.reshape(B, H, D))
                out = attn_seq(out, ck, cv)
                nc.append({"k": ck, "v": cv})
            out = (out / (1.0 + jnp.max(jnp.abs(out)))).astype(q.dtype)
            return (nc, out, l), ()

        (caches, q, _), _ = jax.lax.scan(body, (caches, q0, lengths), None, length=n)
        return jnp.sum(q.astype(jnp.float32))

    arms = {
        "dense": (chain(dense_step), {"w": wd}, x0),
        "seqmajor": (chain(lambda d, q: sum(
            attn_seq(q, d["k"][i], d["v"][i]) for i in range(L)) / L),
            {"k": ks, "v": vs}, q0),
        "carry_write": (carry_run, {"k": ks, "v": vs}, q0),
        "headmajor": (chain(lambda d, q: sum(
            attn_hm(q, d["k"][i], d["v"][i]) for i in range(L)) / L),
            {"k": ks_hm, "v": vs_hm}, q0),
        "headmajor_i8": (chain(lambda d, q: sum(
            attn_hm_i8(q, d["k"][i], d["v"][i], d["ks"][i], d["vs"][i])
            for i in range(L)) / L),
            {"k": ks_i8, "v": vs_i8, "ks": k_sc, "vs": v_sc}, q0),
        # NOTE: kernel operands must be PER-LAYER arrays — a slice of a
        # stacked [L, ...] array feeding a pallas call is materialized
        # (67 MB copy per layer; measured 3.6x slower, the round-3 lesson)
        "kernel": (chain(lambda d, q: sum(
            DA(q, lay["k"], lay["v"], lengths + 1, scale, s_used=S)
            for lay in d) / L),
            [{"k": ks[i], "v": vs[i]} for i in range(L)], q0),
        "kernel_i8": (chain(lambda d, q: sum(
            DA(q, lay["k"], lay["v"], lengths + 1, scale, s_used=S,
               k_scale=lay["ks"], v_scale=lay["vs"])
            for lay in d) / L),
            [{"k": jnp.transpose(ks_i8[i], (0, 2, 1, 3)),
              "v": jnp.transpose(vs_i8[i], (0, 2, 1, 3)),
              "ks": jnp.transpose(k_sc[i], (0, 2, 1))[..., None],
              "vs": jnp.transpose(v_sc[i], (0, 2, 1))[..., None]}
             for i in range(L)], q0),
    }
    fns, raw = {}, {}
    for name, (fn, data, a0) in arms.items():
        for n in (4, 12):
            f = jax.jit(lambda d, a, fn=fn, n=n: fn(d, a, n))
            t0 = time.time()
            float(f(data, a0))
            print(f"compiled {name} n={n} in {time.time()-t0:.0f}s", flush=True)
            fns[(name, n)] = (f, data, a0)
            raw[(name, n)] = []
    for rep in range(6):
        for name in arms:
            for n in (4, 12):
                f, data, a0 = fns[(name, n)]
                t0 = time.perf_counter()
                float(f(data, a0 + rep * 1e-3))
                raw[(name, n)].append(time.perf_counter() - t0)
    out, gbps = {}, {}
    bytes_per = {"dense": L * wd.shape[1] * wd.shape[2] * 2,
                 "seqmajor": L * 2 * B * S * H * D * 2,
                 "carry_write": L * 2 * B * S * H * D * 2,
                 "headmajor": L * 2 * B * S * H * D * 2,
                 "headmajor_i8": L * 2 * B * S * H * (D + 4),
                 "kernel": L * 2 * B * S * H * D * 2,
                 "kernel_i8": L * 2 * B * S * H * (D + 4)}
    for name in arms:
        ms = (min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3
        out[name] = round(ms, 3)
        gbps[name] = round(bytes_per[name] / (ms * 1e-3) / 1e9, 1)
        print(f"{name}: {out[name]} ms/step  {gbps[name]} GB/s", flush=True)
    print(json.dumps({"metric": f"decode attention layout A/B (B={B}, ctx={S}, {L}L)",
                      "ms": out, "gbps": gbps}))


if __name__ == "__main__":
    main()
