"""Multi-slot decode-attention kernel sweep (TPU, same-run interleaved arms).

Round-5 lever (VERDICT r4 item 2): ``decode_attention(block_b=K)`` rides K
slots per grid step — one K-times-larger cache DMA and K back-to-back dots
per step — to amortize the ~1 us per-grid-step fixed cost measured in
round 4 (16 grid steps/layer at B=8/ctx512 ≈ 16 us/layer of overhead at
the dense-rate floor).  Sweeps (block_b, block_s) for bf16 and int8 strip
caches against the same-bytes dense yardstick, slope-timed (n=4 vs 12
chained steps) with all arms interleaved in ONE process so tunnel drift
cancels in the ratios.

Usage: python scripts/bench_attn_multislot.py [--layers 8 --ctx 512]
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
    # v5e scoped VMEM is 16 MB: double-buffered k+v blocks cap bb*bs at
    # 256 cache rows for bf16 (bb*bs*H*D*2B*2ops*2buf) and 512 for int8
    ap.add_argument("--combos", type=str, default="1x256,2x128,4x64,8x32",
                    help="bf16 <block_b>x<block_s> list")
    ap.add_argument("--combos_i8", type=str, default="1x256,2x256,4x128,8x64",
                    help="int8 <block_b>x<block_s> list")
    args = ap.parse_args()

    B, S, H, D, L = args.slots, args.ctx, args.heads, args.head_dim, args.layers
    key = jax.random.PRNGKey(0)
    scale = 1.0 / D ** 0.5
    lengths = jnp.full((B,), S - 1, jnp.int32)

    ks = jax.random.normal(key, (L, B, S, H, D), jnp.bfloat16)
    vs = jax.random.normal(key, (L, B, S, H, D), jnp.bfloat16)
    k_sc = jnp.maximum(jnp.max(jnp.abs(ks.astype(jnp.float32)), -1), 1e-8) / 127.0
    v_sc = jnp.maximum(jnp.max(jnp.abs(vs.astype(jnp.float32)), -1), 1e-8) / 127.0
    ks_i8 = jnp.clip(jnp.round(ks.astype(jnp.float32) / k_sc[..., None]), -127, 127).astype(jnp.int8)
    vs_i8 = jnp.clip(jnp.round(vs.astype(jnp.float32) / v_sc[..., None]), -127, 127).astype(jnp.int8)
    # dense yardstick: same bytes/layer as the bf16 cache arms stream
    wd = jax.random.normal(key, (L, 4096, 2 * B * S * H * D // 4096), jnp.bfloat16)
    x0 = jax.random.normal(key, (8, 4096), jnp.float32)
    q0 = jax.random.normal(key, (B, H, D), jnp.float32)

    def chain(step):
        def run(data, a0, n):
            def body(a, _):
                out = step(data, a)
                return (out / (1.0 + jnp.max(jnp.abs(out)))).astype(a.dtype), ()
            a, _ = jax.lax.scan(body, a0, None, length=n)
            return jnp.sum(a.astype(jnp.float32))
        return run

    def dense_step(data, x):
        y = jnp.einsum("mk,lkn->lmn", x.astype(jnp.bfloat16), data["w"]).astype(jnp.float32)
        return x * (1.0 + 1e-9 * jnp.tanh(jnp.sum(y)))

    def parse(cs):
        return [tuple(int(x) for x in c.strip().split("x"))
                for c in cs.split(",") if c.strip()]

    arms = {"dense": (chain(dense_step), {"w": wd}, x0)}
    for bb, bs in parse(args.combos):
        arms[f"k_bf16_{bb}x{bs}"] = (chain(lambda d, q, bb=bb, bs=bs: sum(
            DA(q, lay["k"], lay["v"], lengths + 1, scale, s_used=S,
               block_s=bs, block_b=bb) for lay in d) / L),
            [{"k": ks[i], "v": vs[i]} for i in range(L)], q0)
    for bb, bs in parse(args.combos_i8):
        arms[f"k_i8_{bb}x{bs}"] = (chain(lambda d, q, bb=bb, bs=bs: sum(
            DA(q, lay["k"], lay["v"], lengths + 1, scale, s_used=S,
               block_s=bs, block_b=bb,
               k_scale=lay["ks"], v_scale=lay["vs"]) for lay in d) / L),
            [{"k": ks_i8[i], "v": vs_i8[i],
              "ks": k_sc[i][..., None], "vs": v_sc[i][..., None]}
             for i in range(L)], q0)
        arms[f"k_i8q_{bb}x{bs}"] = (chain(lambda d, q, bb=bb, bs=bs: sum(
            DA(q, lay["k"], lay["v"], lengths + 1, scale, s_used=S,
               block_s=bs, block_b=bb, q_int8=True,
               k_scale=lay["ks"], v_scale=lay["vs"]) for lay in d) / L),
            [{"k": ks_i8[i], "v": vs_i8[i],
              "ks": k_sc[i][..., None], "vs": v_sc[i][..., None]}
             for i in range(L)], q0)

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
    for name in arms:
        ms = (min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3
        nbytes = (L * wd.shape[1] * wd.shape[2] * 2 if name == "dense"
                  else L * 2 * B * S * H * (D + 4) if "_i8" in name
                  else L * 2 * B * S * H * D * 2)
        out[name] = round(ms, 3)
        gbps[name] = round(nbytes / (ms * 1e-3) / 1e9, 1)
        print(f"{name}: {out[name]} ms/step  {gbps[name]} GB/s", flush=True)
    print(json.dumps({"metric": f"multi-slot decode attention (B={B}, ctx={S}, {L}L)",
                      "ms": out, "gbps": gbps}))


if __name__ == "__main__":
    main()
