"""End-to-end decode benchmark: llama-7b-shaped PBW model, tokens/s/chip.

Builds a random bit-packed llama-7b (planes generated on device — contents
don't affect speed), runs the batched decode step (B slots, vector
positions, KV caches) inside a `lax.scan`, and times it with the slope
method (see bench.py for why).

Usage: python bench_e2e.py [--layers 32] [--slots 8] [--ctx 512] [--sidecar_bits 4]
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def build_packed_llama(cfg, key, sidecar_bits=8, fmt="v2", low_frac=0.9):
    """Random PBW planes, generated on device per layer."""
    from pb_llm_tpu.core.packing import default_pack_block
    from pb_llm_tpu.core.pbw import PackedLinear, PackedLinearV2

    h, ffn = cfg.hidden_size, cfg.intermediate_size

    def packed(key, ic, oc):
        ks = jax.random.split(key, 4)
        pb = default_pack_block(ic)
        if fmt == "v2":
            # global column selection (n_rg=1): the flagship ~1.8 b/w layout
            k = int(round(ic * (1 - low_frac)))
            k_pad = max(32, -(-k // 32) * 32)
            idx = np.full((k_pad, 1), ic, np.int32)
            idx[:k, 0] = np.sort(np.random.default_rng(7 * ic + oc).choice(ic, k, replace=False))
            return PackedLinearV2(
                sign_packed=jax.random.bits(ks[0], (ic // 32, oc), jnp.uint32),
                side_val=jax.random.randint(ks[2], (k_pad, oc), 0, 255, jnp.int32).astype(jnp.uint8),
                side_idx=jnp.asarray(idx),
                low_scale=jnp.full((1, oc), 0.01, jnp.float32),
                low_mean=jnp.zeros((1, oc), jnp.float32),
                high_scale=jnp.full((oc,), 0.004, jnp.float32),
                high_zero=jnp.full((oc,), 128.0, jnp.float32),
                bias=None, ic=ic, oc=oc, col_tile=oc, pack_block=pb,
            )
        side_rows = ic // 2 if sidecar_bits == 4 else ic
        return PackedLinear(
            sign_packed=jax.random.bits(ks[0], (ic // 32, oc), jnp.uint32),
            mask_packed=jax.random.bits(ks[1], (ic // 32, oc), jnp.uint32),
            sidecar=jax.random.randint(ks[2], (side_rows, oc), 0, 255, jnp.int32).astype(jnp.uint8),
            low_scale=jnp.full((1, oc), 0.01, jnp.float32),
            low_mean=jnp.zeros((1, oc), jnp.float32),
            high_scale=jnp.full((oc,), 0.004, jnp.float32),
            high_zero=jnp.full((oc,), 128.0, jnp.float32),
            bias=None, ic=ic, oc=oc, groupsize=ic, pack_block=pb,
            sidecar_bits=sidecar_bits,
        )

    shapes = {
        "q_proj": (h, h), "k_proj": (h, cfg.kv_heads * cfg.head_dim),
        "v_proj": (h, cfg.kv_heads * cfg.head_dim), "o_proj": (h, h),
        "gate_proj": (h, ffn), "up_proj": (h, ffn), "down_proj": (ffn, h),
    }
    layers = []
    for li in range(cfg.num_hidden_layers):
        key, sub = jax.random.split(key)
        lp = {"input_layernorm": jnp.ones((h,)), "post_attention_layernorm": jnp.ones((h,))}
        for n, (ic, oc) in shapes.items():
            sub, k2 = jax.random.split(sub)
            lp[n] = packed(k2, ic, oc)
        layers.append(lp)
        log(f"built layer {li}")
    key, k1, k2 = jax.random.split(key, 3)
    return {
        "embed_tokens": jax.random.normal(k1, (cfg.vocab_size, h), jnp.bfloat16) * 0.02,
        "layers": layers,
        "norm": jnp.ones((h,)),
        "lm_head": {"w": jax.random.normal(k2, (h, cfg.vocab_size), jnp.bfloat16) * 0.02, "b": None},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=0,
                    help="override hidden size (0 = llama-7b dims); with "
                         "--ffn/--heads enables tiny CPU smoke runs")
    ap.add_argument("--ffn", type=int, default=0)
    ap.add_argument("--heads", type=int, default=0)
    ap.add_argument("--sidecar_bits", type=int, default=8, choices=[4, 8])
    ap.add_argument("--fmt", type=str, default="v2", choices=["v1", "v2"])
    ap.add_argument("--low_frac", type=float, default=0.9)
    ap.add_argument("--fuse", action="store_true",
                    help="fuse q/k/v and gate/up into single packed matmuls "
                         "(models.fusion): 4 kernel launches per block "
                         "instead of 7")
    ap.add_argument("--scan_layers", action="store_true",
                    help="lax.scan over stacked layers (one compiled body; "
                         "measures the compile-time win of models.stacking)")
    ap.add_argument("--kv_int8", action="store_true",
                    help="absmax int8 KV cache (halves the KV read per step)")
    ap.add_argument("--paged", type=int, default=0, metavar="PAGE",
                    help="paged KV cache with this page size (0 = strips); "
                         "measures the paged-attention decode cost")
    ap.add_argument("--prefill", action="store_true",
                    help="measure PREFILL throughput instead of decode: one "
                         "--ctx-token prompt per forward (hybrid v2 path at "
                         "m=ctx), no KV cache writes timed separately")
    ap.add_argument("--prefill_batches", type=str, default="",
                    help="with --prefill: comma list of batch sizes to "
                         "interleave in one process (e.g. 1,4)")
    ap.add_argument("--arms", type=str, default="",
                    help="comma list of cache arms to INTERLEAVE in one "
                         "process (the tunnel drifts 30%% between runs, so "
                         "only same-process ratios are trustworthy): "
                         "strips,strips_int8,paged,paged_int8 "
                         "(--paged gives the page size, default 64)")
    ap.add_argument("--spec_budget", action="store_true",
                    help="draft-model speculative decoding e2e economics "
                         "(VERDICT r3 #7): time the target plain step, the "
                         "gamma=3 verify step and a 160m-shape DRAFT decode "
                         "step interleaved, then report delivered tok/s vs "
                         "acceptance rate and the break-even acceptance")
    ap.add_argument("--budget", action="store_true",
                    help="decompose one decode step into component programs "
                         "(full step / packed matmuls only / attention+KV "
                         "only / lm_head+sample / dispatch floor), all timed "
                         "interleaved — the e2e step budget (VERDICT r2 #2)")
    args = ap.parse_args()

    import pb_llm_tpu.ops.binary_matmul  # noqa: F401
    from pb_llm_tpu.models.llama import LlamaConfig
    from pb_llm_tpu.models.registry import family_for

    kw = {}
    if args.hidden:
        kw = dict(hidden_size=args.hidden, intermediate_size=args.ffn or 2 * args.hidden,
                  num_attention_heads=args.heads or 4,
                  num_key_value_heads=args.heads or 4, vocab_size=512)
    cfg = LlamaConfig(num_hidden_layers=args.layers, **kw)  # llama-7b dims by default
    fam = family_for("llama")
    log(f"building packed llama ({args.layers} layers)...")
    params = build_packed_llama(cfg, jax.random.PRNGKey(0), args.sidecar_bits,
                                fmt=args.fmt, low_frac=args.low_frac)
    if args.fuse:
        from pb_llm_tpu.models.fusion import fuse_parallel_linears

        params = fuse_parallel_linears(params, "llama")
        log("fused q|k|v and gate|up (4 packed matmuls per block)")

    B, S = args.slots, args.ctx

    if args.prefill:
        # arm selection: typed KernelConfig (env vars remain call-time
        # overrides — PB_TPU_PREFILL_INT8/_BF16); we only report what's active
        from pb_llm_tpu.ops import kernel_config as _kc

        bf16 = _kc.current().prefill

        def prefill_scan(params, ids0, n_calls):
            def body(carry, _):
                ids = carry
                logits, _ = fam.forward(params, ids, cfg)
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return jnp.concatenate([ids[:, 1:], nxt], axis=1), ()
            ids, _ = jax.lax.scan(body, ids0, None, length=n_calls)
            return jnp.sum(ids)

        # batch sizes interleaved in ONE process (tunnel drift): K prompts
        # per forward = what Engine.prefill_batch runs (m = K*ctx per dot)
        ks = [int(k) for k in (args.prefill_batches.split(",") if args.prefill_batches else ["1"])]
        fns, raw = {}, {}
        for k in ks:
            ids0 = jnp.zeros((k, S), jnp.int32)
            for n in (2, 6):
                f = jax.jit(lambda p, i, n=n: prefill_scan(p, i, n))
                t0 = time.time()
                float(f(params, ids0))
                log(f"compiled prefill scan K={k} n={n} in {time.time()-t0:.0f}s")
                fns[(k, n)] = (f, ids0)
                raw[(k, n)] = []
        for rep in range(4):
            for k in ks:
                for n in (2, 6):
                    f, ids0 = fns[(k, n)]
                    t0 = time.perf_counter()
                    float(f(params, ids0 + rep))
                    raw[(k, n)].append(time.perf_counter() - t0)
        out = {}
        for k in ks:
            per_call = (min(raw[(k, 6)]) - min(raw[(k, 2)])) / 4
            out[f"K={k}"] = {"ms_per_call": round(per_call * 1e3, 1),
                             "tokens_per_s": round(k * S / per_call, 1)}
            log(f"K={k}: {per_call*1e3:.1f}ms/call, {k*S/per_call:.0f} tok/s (bf16={bf16})")
        if len(ks) == 1:
            k = ks[0]
            print(json.dumps({
                "metric": f"llama-7b-shape packed PREFILL throughput (ctx={S}, K={k}, {args.layers} layers, {args.fmt}, hybrid)",
                "value": out[f"K={k}"]["tokens_per_s"],
                "unit": "tokens/s/chip",
                "vs_baseline": None,
            }))
        else:
            print(json.dumps({"metric": f"prefill batch sweep (ctx={S}, {args.layers}L, bf16={bf16})",
                              "arms": out}))
        return

    def make_arm_caches(paged: int, int8: bool):
        if paged:
            # pages for the run's actual lengths (ctx/2 start + 12 decode
            # steps); entries past the owned pages point at the TRASH page
            # like the real engine's tables — consecutive same-index blocks
            # are DMA-elided by Mosaic, so paged attention reads bytes
            # proportional to length, not max_seq (its design promise)
            ps = paged
            maxp = S // ps
            n_pages = B * maxp
            used = min(maxp, -(-(S // 2 + 12) // ps))
            table = np.full((B, maxp), n_pages, dtype=np.int32)  # trash
            table[:, :used] = np.arange(B * used, dtype=np.int32).reshape(B, used)
            page_dtype = jnp.int8 if int8 else jnp.bfloat16
            caches = []
            for _ in range(cfg.num_hidden_layers):
                c = {"k_pages": jnp.zeros((n_pages + 1, cfg.kv_heads, ps, cfg.head_dim), page_dtype),
                     "v_pages": jnp.zeros((n_pages + 1, cfg.kv_heads, ps, cfg.head_dim), page_dtype),
                     "table": jnp.asarray(table)}
                if int8:
                    c["k_scale_pages"] = jnp.zeros((n_pages + 1, cfg.kv_heads, ps), jnp.float32)
                    c["v_scale_pages"] = jnp.zeros((n_pages + 1, cfg.kv_heads, ps), jnp.float32)
                caches.append(c)
            return caches
        if int8:
            return [
                {"k": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.int8),
                 "v": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.int8),
                 "k_scale": jnp.zeros((B, S, cfg.kv_heads, 1), jnp.float32),
                 "v_scale": jnp.zeros((B, S, cfg.kv_heads, 1), jnp.float32)}
                for _ in range(cfg.num_hidden_layers)
            ]
        return [
            {"k": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.bfloat16),
             "v": jnp.zeros((B, S, cfg.kv_heads, cfg.head_dim), jnp.bfloat16)}
            for _ in range(cfg.num_hidden_layers)
        ]

    caches = make_arm_caches(args.paged, args.kv_int8)

    def decode_scan(params, caches, tokens0, lengths0, n_steps):
        """tokens0 [B] = plain decode; [B, t] = speculative verify window
        (t tokens forwarded per step, greedy preds fed back as next window)."""
        multi = tokens0.ndim == 2
        t = tokens0.shape[1] if multi else 1

        def body(carry, _):
            caches, tokens, lengths = carry
            ids = tokens if multi else tokens[:, None]
            logits, caches = fam.forward(params, ids, cfg, kv_caches=caches, pos=lengths)
            preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tokens = preds if multi else preds[:, 0]
            return (caches, tokens, lengths + t), ()
        (caches, tokens, lengths), _ = jax.lax.scan(body, (caches, tokens0, lengths0), None, length=n_steps)
        return jnp.sum(tokens), caches

    if args.spec_budget:
        # ---- draft-model speculative decoding economics (VERDICT r3 #7) --
        # Three programs timed interleaved (slope method):
        #   plain  — the target's t=1 decode step
        #   verify — the target's t=gamma+1 verify step (gamma=3)
        #   draft  — ONE decode step of a 160m-shape dense bf16 draft
        #            (llama-160m dims: 12L, h=768, ffn=2048, 12 heads)
        # Delivered tok/s at acceptance a (per-token draft acceptance,
        # standard spec-decoding model): E[tokens/round] = (1-a^(g+1))/(1-a),
        # round cost = g*t_draft + t_verify.  Break-even vs plain solves
        # E[tokens]/round_cost = 1/t_plain.
        from pb_llm_tpu.models.llama import init_params as llama_init

        gamma = 3
        lengths0 = jnp.full((B,), S // 2, jnp.int32)
        if args.hidden:  # tiny CPU smoke: shrink the draft too
            dcfg = LlamaConfig(num_hidden_layers=1, hidden_size=args.hidden,
                               intermediate_size=args.ffn or 2 * args.hidden,
                               num_attention_heads=args.heads or 4,
                               num_key_value_heads=args.heads or 4,
                               vocab_size=cfg.vocab_size)
        else:
            dcfg = LlamaConfig(num_hidden_layers=12, hidden_size=768,
                               intermediate_size=2048, num_attention_heads=12,
                               num_key_value_heads=12, vocab_size=cfg.vocab_size)
        dparams = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            llama_init(dcfg, jax.random.PRNGKey(1)))
        dcaches = [
            {"k": jnp.zeros((B, S, dcfg.kv_heads, dcfg.head_dim), jnp.bfloat16),
             "v": jnp.zeros((B, S, dcfg.kv_heads, dcfg.head_dim), jnp.bfloat16)}
            for _ in range(dcfg.num_hidden_layers)
        ]

        def draft_scan(p, c, tokens, lengths, n):
            def body(carry, _):
                c, t, l = carry
                logits, c = fam.forward(p, t[:, None], dcfg, kv_caches=c, pos=l)
                return (c, jnp.argmax(logits[:, 0], -1).astype(jnp.int32), l + 1), ()
            (c, t, l), _ = jax.lax.scan(body, (c, tokens, lengths), None, length=n)
            return jnp.sum(t)

        tok1 = jnp.zeros((B,), jnp.int32)
        tokg = jnp.zeros((B, gamma + 1), jnp.int32)
        arms = {
            "plain": (lambda p, c, t, l, n: decode_scan(p, c, t, l, n)[0],
                      caches, tok1),
            "verify": (lambda p, c, t, l, n: decode_scan(p, c, t, l, n)[0],
                       make_arm_caches(0, False), tokg),
            "draft": (draft_scan, dcaches, tok1),
        }
        fns, raw = {}, {}
        for name, (fn, c0, t0_) in arms.items():
            p_ = dparams if name == "draft" else params
            for n in (4, 12):
                f = jax.jit(lambda p, c, t, l, fn=fn, n=n: fn(p, c, t, l, n))
                t0 = time.time()
                float(f(p_, c0, t0_, lengths0))
                log(f"compiled {name} n={n} in {time.time()-t0:.0f}s")
                fns[(name, n)] = (f, p_, c0, t0_)
                raw[(name, n)] = []
        for rep in range(5):
            for name in arms:
                for n in (4, 12):
                    f, p_, c0, t0_ = fns[(name, n)]
                    t0 = time.perf_counter()
                    float(f(p_, c0, t0_ + rep, lengths0))
                    raw[(name, n)].append(time.perf_counter() - t0)
        ms = {}
        for name in arms:
            ms[name] = (min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3
            log(f"{name}: {ms[name]:.3f} ms/step")
        round_ms = gamma * ms["draft"] + ms["verify"]
        plain_tps = B / ms["plain"] * 1e3
        curve = {}
        for a in (0.0, 0.3, 0.5, 0.7, 0.8, 0.9, 1.0):
            e_tok = gamma + 1 if a >= 1.0 else (1 - a ** (gamma + 1)) / (1 - a)
            curve[f"{a:.1f}"] = round(B * e_tok / round_ms * 1e3, 1)
        # break-even: smallest a with delivered >= plain
        be = None
        for a in [i / 100 for i in range(0, 101)]:
            e_tok = gamma + 1 if a >= 1.0 else (1 - a ** (gamma + 1)) / (1 - a)
            if B * e_tok / round_ms * 1e3 >= plain_tps:
                be = a
                break
        log(f"plain {plain_tps:.0f} tok/s; spec round {round_ms:.2f} ms; "
            f"break-even acceptance {be}")
        print(json.dumps({
            "metric": f"draft-model speculative decoding economics "
                      f"(B={B}, ctx={S}, {args.layers}L target, "
                      f"{dcfg.num_hidden_layers}L/{dcfg.hidden_size}h draft, gamma={gamma})",
            "ms": {k: round(v, 3) for k, v in ms.items()},
            "plain_tokens_per_s": round(plain_tps, 1),
            "delivered_tokens_per_s_vs_acceptance": curve,
            "break_even_acceptance": be,
        }))
        return

    if args.budget:
        # ---- e2e decode step budget (VERDICT r2 item 2) -------------------
        # Five programs timed interleaved with the slope method (slope
        # cancels dispatch/fetch):
        #   full   — the real decode step
        #   mmonly — ONLY the 7 packed matmuls per layer, chained
        #   nomm   — the step with every packed matmul replaced by one
        #            broadcast multiply (attention + KV + norms + rope +
        #            lm_head + scan overhead remain)
        #   noattn — the full step with cached_attention replaced by a
        #            passthrough (q + a one-element cache read, so the cache
        #            writes and the k/v projections feeding them stay LIVE —
        #            a bare q passthrough lets XLA DCE the scatter and two of
        #            the seven matmuls): matmuls + cache writes + norms +
        #            rope remain; full − noattn = the attention read plus
        #            the score/softmax compute it feeds
        #   head   — embed + final norm + lm_head + argmax only
        # Identity: full ≈ mmonly + (nomm − head) + head.
        from pb_llm_tpu.models.linear import apply_linear, linear_shape
        from pb_llm_tpu.models.llama import rms_norm

        def skip_lf(name, lin, h):
            if isinstance(lin, dict):
                return apply_linear(lin, h)
            oc = linear_shape(lin)[1]
            # runtime-dependent broadcast so XLA cannot fold the layer away
            return h[..., :1] * jnp.ones((oc,), h.dtype)

        def full_scan(p, c, t, l, n):
            return decode_scan(p, c, t, l, n)[0]

        def nomm_scan(p, c, tokens, lengths, n):
            def body(carry, _):
                c, t, l = carry
                logits, c = fam.forward(p, t[:, None], cfg, linear_fn=skip_lf,
                                        kv_caches=c, pos=l)
                return (c, jnp.argmax(logits[:, 0], -1).astype(jnp.int32), l + 1), ()
            (c, t, l), _ = jax.lax.scan(body, (c, tokens, lengths), None, length=n)
            return jnp.sum(t)

        def mm_scan(p, x0, n):
            def body(x, _):
                h = x
                for lp in p["layers"]:
                    a = (apply_linear(lp["q_proj"], h) + apply_linear(lp["k_proj"], h)
                         + apply_linear(lp["v_proj"], h))
                    o = apply_linear(lp["o_proj"], a)
                    g = apply_linear(lp["gate_proj"], h) + apply_linear(lp["up_proj"], h)
                    d = apply_linear(lp["down_proj"], g)
                    h = h + 1e-6 * (o + d)
                return h, ()
            x, _ = jax.lax.scan(body, x0, None, length=n)
            return jnp.sum(x)

        def head_scan(p, ids0, n):
            def body(ids, _):
                x = p["embed_tokens"][ids]
                x = rms_norm(x, p["norm"], cfg.rms_norm_eps)
                logits = apply_linear(p["lm_head"], x)
                return jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None], ()
            ids, _ = jax.lax.scan(body, ids0, None, length=n)
            return jnp.sum(ids)

        x0 = jnp.zeros((B, 1, cfg.hidden_size), jnp.float32)
        ids0 = jnp.zeros((B, 1), jnp.int32)
        tokens0 = jnp.zeros((B,), jnp.int32)
        lengths0 = jnp.full((B,), S // 2, jnp.int32)
        # caches/seeds ride as ARGUMENTS (closure capture would bake them
        # into the executable as constants — gigabytes of lowering)
        arms = {
            "full": (lambda p, c, s, n: full_scan(p, c, tokens0 + s, lengths0, n),
                     lambda: caches),
            "mmonly": (lambda p, c, s, n: mm_scan(p, c + s, n), lambda: x0),
            "nomm": (lambda p, c, s, n: nomm_scan(p, c, tokens0 + s, lengths0, n),
                     lambda: caches),
            "noattn": (lambda p, c, s, n: full_scan(p, c, tokens0 + s, lengths0, n),
                       lambda: caches),
            "head": (lambda p, c, s, n: head_scan(p, c + s, n), lambda: ids0),
        }
        from pb_llm_tpu.models import llama as _llama

        fns, raw = {}, {}
        for name, (fn, carg) in arms.items():
            if name == "noattn":
                # tracing-time patch: attention output := q plus a one-element
                # read of the just-updated cache (shape-compatible [B, t, Hq,
                # d]).  The read keeps the cache scatter — and transitively
                # the k/v projections and rope-on-k — in the measured program;
                # the dynamic write position stops XLA from eliding the
                # scatter down to the single element read.
                real_attn = _llama.cached_attention

                def _noattn(kv, q, k, v, pos, scale):
                    buf = kv["k_pages"] if "k_pages" in kv else kv["k"]
                    live = jnp.sum(buf[:1, :1].astype(jnp.float32))
                    return q + (1e-6 * live).astype(q.dtype)

                _llama.cached_attention = _noattn
            try:
                for n in (4, 12):
                    f = jax.jit(lambda p, c, s, fn=fn, n=n: fn(p, c, s, n))
                    t0 = time.time()
                    float(f(params, carg(), 0))
                    log(f"compiled {name} n={n} in {time.time()-t0:.0f}s")
                    fns[(name, n)] = (f, carg)
                    raw[(name, n)] = []
            finally:
                if name == "noattn":
                    _llama.cached_attention = real_attn
        for rep in range(5):
            for name in arms:
                for n in (4, 12):
                    f, carg = fns[(name, n)]
                    t0 = time.perf_counter()
                    float(f(params, carg(), rep))
                    raw[(name, n)].append(time.perf_counter() - t0)
        out = {}
        for name in arms:
            step_ms = (min(raw[(name, 12)]) - min(raw[(name, 4)])) / 8 * 1e3
            out[name] = round(step_ms, 3)
            log(f"{name}: {step_ms:.3f} ms/step")
        out["attn_kv_overhead"] = round(out["nomm"] - out["head"], 3)
        out["attn_read"] = round(out["full"] - out["noattn"], 3)
        out["write_norm_rope"] = round(
            out["noattn"] - out["mmonly"] - out["head"], 3)
        out["unattributed"] = round(
            out["full"] - out["mmonly"] - out["attn_kv_overhead"] - out["head"], 3)
        out["tokens_per_s"] = round(B / (out["full"] / 1e3), 1)
        print(json.dumps({"metric": f"decode step budget (B={B}, ctx={S}, {args.layers}L)",
                          "ms": out}))
        return

    if args.scan_layers:
        from pb_llm_tpu.models import stacking

        params = stacking.stack_layers(params)
        caches = stacking.stack_caches(caches)

    tokens0 = jnp.zeros((B,), jnp.int32)
    lengths0 = jnp.full((B,), S // 2, jnp.int32)

    if args.arms:
        # interleaved multi-arm mode: all arms timed round-robin in ONE
        # process so tunnel drift cancels in the ratios
        # spec arms ("specN"): verify windows of t = N+1 tokens per step over
        # strip caches — compare against the "strips" t=1 arm in one process
        # to price a speculative verify step
        def arm_base(name):
            # "_xattn" suffix: force decode_attention=xla for that arm (the
            # kernel-vs-XLA comparison rides one process, drift-free)
            return name[:-6] if name.endswith("_xattn") else name

        def arm_def(name):
            base = arm_base(name)
            if base.startswith("spec"):
                # specN / specN_int8: γ=N verify windows; int8 prices the
                # serving-default cache under the t>1 (XLA-window) read
                spec, _, cache = base.partition("_")
                return 0, cache == "int8", int(spec[4:]) + 1
            return {"strips": (0, False, 1), "strips_int8": (0, True, 1),
                    "fused": (0, False, 1),  # q|k|v + gate|up merged matmuls
                    "fused_int8": (0, True, 1),
                    "paged": (args.paged or 64, False, 1),
                    "paged_int8": (args.paged or 64, True, 1)}[base]

        fused_params = None
        names = [a.strip() for a in args.arms.split(",") if a.strip()]
        if any(arm_base(n).startswith("fused") for n in names):
            from pb_llm_tpu.models.fusion import fuse_parallel_linears

            fused_params = fuse_parallel_linears(params, "llama")
        fns, arm_caches, widths = {}, {}, {}
        for name in names:
            paged, int8, width = arm_def(name)
            arm_caches[name] = make_arm_caches(paged, int8)
            widths[name] = width
            arm_params = (fused_params if arm_base(name).startswith("fused")
                          else params)
            tok0 = tokens0 if width == 1 else jnp.zeros((B, width), jnp.int32)
            from pb_llm_tpu.ops import kernel_config as _kc

            acfg = (_kc.KernelConfig(decode_attention="xla")
                    if name.endswith("_xattn") else None)
            for n_steps in (4, 12):
                f = _kc.wrap_jit(lambda p, c, t, l, n=n_steps: decode_scan(p, c, t, l, n)[0], acfg)
                t0 = time.time()
                float(f(arm_params, arm_caches[name], tok0, lengths0))
                log(f"compiled {name} n={n_steps} in {time.time()-t0:.0f}s")
                fns[(name, n_steps)] = (f, tok0, arm_params)
        raw = {(name, n): [] for name in names for n in (4, 12)}
        for rep in range(7):
            for name in names:
                for n in (4, 12):
                    f, tok0, arm_params = fns[(name, n)]
                    t0 = time.perf_counter()
                    float(f(arm_params, arm_caches[name], tok0 + rep, lengths0))
                    raw[(name, n)].append(time.perf_counter() - t0)
        out = {}
        for name in names:
            # per-REP slopes (the n=4 and n=12 calls of one rep are
            # adjacent in time, so each slope sees one drift state); median
            # over positive slopes — min() paired slopes across reps, which
            # drift can make unphysical (round-5 lesson)
            slopes = [(raw[(name, 12)][i] - raw[(name, 4)][i]) / 8
                      for i in range(len(raw[(name, 4)]))]
            pos = [s for s in slopes if s > 0] or slopes
            step_s = float(np.median(pos))
            w = widths[name]
            out[name] = {"ms_per_step": round(step_s * 1e3, 2),
                         "tokens_per_s": round(B / step_s, 1)}
            if w > 1:
                # verify emits 1..w tokens/step; report the max and the
                # break-even acceptance vs the first (t=1) arm
                out[name]["tokens_per_s_max"] = round(B * w / step_s, 1)
            log(f"{name}: {step_s*1e3:.2f} ms/step (t={w}), {B/step_s:.1f}-{B*w/step_s:.1f} tok/s")
        base = names[0]
        for name in names[1:]:
            out[name]["vs_" + base] = round(
                out[base]["ms_per_step"] / out[name]["ms_per_step"], 3)
        print(json.dumps({"metric": f"decode arms interleaved (B={B}, ctx={S}, {args.layers}L)",
                          "arms": out}))
        return

    times = {}
    for n_steps in (4, 12):
        f = jax.jit(lambda p, c, t, l: decode_scan(p, c, t, l, n_steps)[0])
        log(f"compiling decode scan n={n_steps}...")
        t0 = time.time()
        float(f(params, caches, tokens0, lengths0))
        log(f"compiled+ran in {time.time()-t0:.0f}s")
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(f(params, caches, tokens0 + i, lengths0))
            ts.append(time.perf_counter() - t0)
        times[n_steps] = min(ts)
        log(f"n={n_steps}: {times[n_steps]*1e3:.1f}ms")

    step_s = (times[12] - times[4]) / 8
    toks = args.slots / step_s
    n_params = args.layers * (4 * cfg.hidden_size**2 + 3 * cfg.hidden_size * cfg.intermediate_size)
    bits_w = (1 + 8 * (1 - args.low_frac) if args.fmt == "v2" else 2 + args.sidecar_bits)
    stream_gb = n_params * bits_w / 8 / 1e9
    log(f"decode step: {step_s*1e3:.1f}ms, {toks:.1f} tokens/s/chip (B={B}), "
        f"weight stream {stream_gb/step_s:.0f} GB/s of {stream_gb:.1f} GB/step")
    print(json.dumps({
        "metric": f"llama-7b-shape packed decode throughput (B={B} slots, {args.layers} layers, {args.fmt}, ~{bits_w:.1f} bits/w)",
        "value": round(toks, 1),
        "unit": "tokens/s/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
