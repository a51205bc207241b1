"""A/B the round-4 decode-attention changes on TPU (interleaved arms).

Arms (8-layer llama-7b shape, B=8, ctx=512, bf16 strip caches):
  new      — shipping path: windowed lax.switch read + bf16-native dots
  nowin    — bf16-native dots, window switch disabled (full-cache read)
  upcast   — round-3 behavior: full read, cache upcast to f32, f32 dots

The bf16-native change assumed the f32 upcast materializes a 2x cache
copy; the window assumed most steps sit below max_seq.  Both are traced-in
behaviors, so the arms monkeypatch models.attention at TRACE time (same
trick as bench_e2e's noattn arm).

Usage: python scripts/bench_attn_ab.py [--layers 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pb_llm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--start_len", type=int, default=0,
                    help="slot lengths at measurement (default ctx/2); the "
                         "window only pays off when lengths sit well below "
                         "max_seq")
    args = ap.parse_args()

    from bench_e2e import build_packed_llama
    from pb_llm_tpu.models import attention as A
    from pb_llm_tpu.models.llama import LlamaConfig
    from pb_llm_tpu.models.registry import family_for
    import pb_llm_tpu.ops.binary_matmul  # noqa: F401

    cfg = LlamaConfig(num_hidden_layers=args.layers)
    fam = family_for("llama")
    params = build_packed_llama(cfg, jax.random.PRNGKey(0))
    B, S = args.slots, args.ctx
    caches = [
        {"k": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.bfloat16),
         "v": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.bfloat16)}
        for _ in range(args.layers)
    ]
    tokens0 = jnp.zeros((B,), jnp.int32)
    lengths0 = jnp.full((B,), args.start_len or S // 2, jnp.int32)

    def decode_scan(params, caches, tokens, lengths, n):
        def body(carry, _):
            c, t, l = carry
            logits, c = fam.forward(params, t[:, None], cfg, kv_caches=c, pos=l)
            return (c, jnp.argmax(logits[:, 0], -1).astype(jnp.int32), l + 1), ()
        (c, t, l), _ = jax.lax.scan(body, (caches, tokens, lengths), None, length=n)
        return jnp.sum(t)

    from pb_llm_tpu.models import llama as L

    # llama.py binds cached_attention into its own namespace at import —
    # patch THAT binding (attention-internal helpers patch on A)
    real_cached = L.cached_attention
    real_cache_kv = A.cache_kv
    real_msa = A.masked_softmax_attention

    def full_read_cached(kv, q, k, v, pos, scale):
        # bypass the window switch: full-cache masked softmax
        s = kv["k"].shape[1]
        p = jnp.asarray(pos)
        allowed = A.causal_allowed(pos, q.shape[1], s, p + q.shape[1])
        ck, cv = A.cache_kv(kv, q.dtype)
        return A.masked_softmax_attention(q, ck, cv, allowed, scale)

    def upcast_cache_kv(cache, dtype):
        return cache["k"].astype(dtype), cache["v"].astype(dtype)

    def upcast_msa(q, k, v, allowed, scale):
        hq, hkv = q.shape[2], k.shape[2]
        if hq != hkv:
            k = jnp.repeat(k, hq // hkv, axis=2)
            v = jnp.repeat(v, hq // hkv, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
        scores = jnp.where(allowed, scores.astype(jnp.float32), -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhts,bshd->bthd", probs, v)

    patches = {
        "new": {},
        "nowin": {"cached_attention": full_read_cached},
        "upcast": {"cached_attention": full_read_cached,
                   "cache_kv": upcast_cache_kv,
                   "masked_softmax_attention": upcast_msa},
    }
    fns, raw = {}, {}
    for name, pat in patches.items():
        for attr, fn in pat.items():
            if attr == "cached_attention":
                L.cached_attention = fn
            else:
                setattr(A, attr, fn)
        try:
            for n in (4, 12):
                f = jax.jit(lambda p, c, t, l, n=n: decode_scan(p, c, t, l, n))
                t0 = time.time()
                float(f(params, caches, tokens0, lengths0))
                print(f"compiled {name} n={n} in {time.time()-t0:.0f}s", flush=True)
                fns[(name, n)] = f
                raw[(name, n)] = []
        finally:
            L.cached_attention = real_cached
            A.cache_kv = real_cache_kv
            A.masked_softmax_attention = real_msa
    for rep in range(6):
        for name in patches:
            for n in (4, 12):
                t0 = time.perf_counter()
                float(fns[(name, n)](params, caches, tokens0 + rep, lengths0))
                raw[(name, n)].append(time.perf_counter() - t0)
    out = {}
    for name in patches:
        out[name] = round((min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3, 3)
        print(f"{name}: {out[name]} ms/step", flush=True)
    print(json.dumps({"metric": f"decode attention A/B (B={B}, ctx={S}, {args.layers}L)",
                      "ms": out}))


if __name__ == "__main__":
    main()
