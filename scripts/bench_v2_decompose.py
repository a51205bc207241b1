"""TPU experiment: decompose the v2 decode kernel's 29 µs and test structures.

Where does the time go at llama-7b MLP decode shape (4096x11008, m=8,
low_frac=0.9, 10.2 MB packed stream, 12.5 µs DMA floor)?  Arms:

  full      — shipping f32 kernel (whole-oc resident tile)        [baseline]
  nox       — same dots, extraction replaced by a free bitcast    [DMA+MXU]
  nodot     — same extraction, 32 plane-sum adds + ONE dot/block  [DMA+VPU]
  pbN       — resident kernel, pack_block=N (4096 → 32 k=128 dots)
  streamN   — grid over pack blocks of size N, acc in VMEM scratch:
              Mosaic auto-double-buffers the s blocks, overlapping the
              plane DMA with the previous block's extraction+dots
  dense     — bf16 dense matmul

Same interleaved-arm slope methodology as bench.py.
Usage: python scripts/bench_v2_decompose.py [arm ...]
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pb_llm_tpu.core import packing
from pb_llm_tpu.ops import pallas_pb
from pb_llm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

M = int(os.environ.get("M", "8"))
IC, OC = 4096, 11008
K = 8
L_SHORT, L_LONG = 16, 272
FRAC_BINARY = 0.9
HBM_GBPS = 819e9
WORD_BITS = 32


def log(msg):
    print(msg, flush=True)


def make_planes(seed, pack_block):
    """bench.make_planes with a parametric pack_block."""
    r = np.random.default_rng(seed)
    w = r.standard_normal((OC, IC)).astype(np.float32)
    w *= (1.0 + 3.0 * (r.random(IC) < 0.1))[None, :]

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
    hs = ((xmax - xmin) / 255).astype(np.float32)
    hz = np.round(-xmin / hs).astype(np.float32)
    codes = np.clip(np.round(w / hs[:, None]) + hz[:, None], 0, 255).astype(np.uint8)
    side_val = np.zeros((k_pad, OC), np.uint8)
    side_val[:k] = codes[:, cols].T

    bits = (((w - mean[:, None]) >= 0).T) & ~salient.T
    return (
        packing.pack_bits_np(bits.astype(np.uint32), pack_block),
        side_val,
        side_idx,
        scale[None, :].astype(np.float32),
        mean[None, :].astype(np.float32),
        hs,
        hz,
    ), k_pad


# ---------------------------------------------------------------------------
# variant kernels (whole-oc tile, global column selection)
# ---------------------------------------------------------------------------


def _variant_kernel(x_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref, *, ic, oc,
                    pack_block, variant):
    xb = x_ref[:]
    mrows = xb.shape[0]
    acc_b = jnp.zeros((mrows, oc), jnp.float32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = s_ref[w_off : w_off + g, :]
        if variant == "nox":
            # free bitcast instead of shift+AND: same 32 dots, no extraction
            plane = jax.lax.bitcast_convert_type(ws, jnp.float32)
            for b in range(WORD_BITS):
                xs = xb[:, r_off + b * g : r_off + (b + 1) * g]
                acc_b += jnp.dot(xs, plane, preferred_element_type=jnp.float32)
        elif variant == "nodot":
            # full extraction, but planes are summed (VPU) and fed to ONE dot
            psum = jnp.zeros(ws.shape, jnp.float32)
            for b in range(WORD_BITS):
                psum += pallas_pb._bit_plane_two(ws, b)
            acc_b += jnp.dot(xb[:, r_off : r_off + g], psum,
                             preferred_element_type=jnp.float32)
        else:  # "full" clone
            for b in range(WORD_BITS):
                xs = xb[:, r_off + b * g : r_off + (b + 1) * g]
                acc_b += jnp.dot(xs, pallas_pb._bit_plane_two(ws, b),
                                 preferred_element_type=jnp.float32)
        w_off += g
        r_off += rows

    acc_v, rowsum_g = pallas_pb._v2_salient_terms(
        xg_ref, v_ref, mrows, oc, oc, 8, 1, jnp.float32)
    rowsum = jnp.sum(xb, axis=1, keepdims=True)
    o_ref[:] = (rowsum * coef_ref[1:2, :] + acc_b * coef_ref[0:1, :]
                + acc_v * coef_ref[3:4, :] + rowsum_g * coef_ref[2:3, :]
                + coef_ref[4:5, :])


def _int8_kernel(x8_ref, rs_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref, *, ic,
                 oc, pack_block):
    """TIMING PROBE for byte-lane int8 extraction: one shift+AND per FOUR
    bit-planes (bits b, b+8, b+16, b+24 land in the 4 byte lanes of each
    u32; bitcast u32 [g, oc] -> int8 [4g, oc]), int8 MXU dots.  x8 arrives
    pre-quantized to int8 in the matching byte-permuted column order;
    rowsum precomputed outside in f32."""
    x8 = x8_ref[:]
    mrows = x8.shape[0]
    acc_b = jnp.zeros((mrows, oc), jnp.int32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = s_ref[w_off : w_off + g, :]
        for b in range(8):
            e = pltpu.bitcast(
                jax.lax.shift_right_logical(ws, jnp.uint32(b))
                & jnp.uint32(0x01010101), jnp.int8)  # [4g, oc]
            xs = x8[:, r_off + b * 4 * g : r_off + (b + 1) * 4 * g]
            acc_b += jnp.dot(xs, e, preferred_element_type=jnp.int32)
        w_off += g
        r_off += rows

    acc_v, rowsum_g = pallas_pb._v2_salient_terms(
        xg_ref, v_ref, mrows, oc, oc, 8, 1, jnp.float32)
    sx = coef_ref[4:5, :]  # probe: abuse bias row as the x scale
    o_ref[:] = (rs_ref[:] * coef_ref[1:2, :]
                + acc_b.astype(jnp.float32) * sx * coef_ref[0:1, :]
                + acc_v * coef_ref[3:4, :] + rowsum_g * coef_ref[2:3, :])


def _stream_kernel(x_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref, acc_ref,
                   rs_ref, *, ic, oc, pack_block):
    """Grid over pack blocks; x/s blocks stream, acc persists in scratch."""
    bi = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(bi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rs_ref[:] = jnp.zeros_like(rs_ref)

    xb = x_ref[:]  # [m, pack_block] block for this step
    ws = s_ref[:]  # [g, oc] block
    g = pack_block // WORD_BITS
    acc = acc_ref[:]
    for b in range(WORD_BITS):
        xs = xb[:, b * g : (b + 1) * g]
        acc += jnp.dot(xs, pallas_pb._bit_plane_two(ws, b),
                       preferred_element_type=jnp.float32)
    acc_ref[:] = acc
    rs_ref[:] = rs_ref[:] + jnp.sum(xb, axis=1, keepdims=True)

    @pl.when(bi == nb - 1)
    def _():
        mrows = xb.shape[0]
        acc_v, rowsum_g = pallas_pb._v2_salient_terms(
            xg_ref, v_ref, mrows, oc, oc, 8, 1, jnp.float32)
        o_ref[:] = (rs_ref[:] * coef_ref[1:2, :] + acc_ref[:] * coef_ref[0:1, :]
                    + acc_v * coef_ref[3:4, :] + rowsum_g * coef_ref[2:3, :]
                    + coef_ref[4:5, :])


def _variant_call(x, planes, k_pad, pack_block, variant):
    s0, s1, s2, s3, s4, s5, s6 = planes
    m, ic = x.shape
    oc = OC
    m_pad = -(-max(m, 8) // 8) * 8
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x)

    # gather x at the salient columns (global selection)
    idx = s2[:, 0]
    xpad = jnp.concatenate([xp, jnp.zeros((m_pad, 1), jnp.float32)], axis=1)
    idxg = jnp.where(idx == ic, jnp.int32(ic), idx)
    xg = jnp.take(xpad, idxg, axis=1)[None]  # [1, m, k_pad]

    scale = s3[0]
    mean = s4[0]
    alpha = scale
    beta = mean - scale
    gamma = -s5 * s6 - beta
    coef = jnp.stack([alpha, beta, gamma, s5, jnp.zeros((oc,), jnp.float32)], axis=0)

    if variant.startswith("int8"):
        _, _, ot = variant.partition("@")  # int8@2752 → oc tiles of 2752
        oc_tile = int(ot) if ot else oc
        n_tiles = oc // oc_tile
        m_pad8 = 32  # int8 min sublane tile
        xpf = jnp.zeros((m_pad8, ic), jnp.float32).at[:m].set(x)
        sx = jnp.max(jnp.abs(xpf)) / 127.0
        xq = jnp.clip(jnp.round(xpf / sx), -127, 127).astype(jnp.int8)
        parts = []
        off = 0
        for rows in packing.block_sizes(ic, pack_block):
            g = rows // 32
            blk = xq[:, off : off + rows].reshape(m_pad8, 4, 8, g)  # (j, b, i)
            parts.append(jnp.transpose(blk, (0, 2, 3, 1)).reshape(m_pad8, rows))
            off += rows
        x8 = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        rs = jnp.sum(xpf, axis=1, keepdims=True)
        xpad8 = jnp.concatenate([xpf, jnp.zeros((m_pad8, 1), jnp.float32)], axis=1)
        xg8 = jnp.take(xpad8, idxg, axis=1)[None]
        coef8 = jnp.stack([alpha, beta, gamma, s5,
                           jnp.full((oc,), 1.0, jnp.float32) * sx], axis=0)
        out = pl.pallas_call(
            functools.partial(_int8_kernel, ic=ic, oc=oc_tile, pack_block=pack_block),
            out_shape=jax.ShapeDtypeStruct((m_pad8, oc), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((m_pad8, ic), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad8, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_pad8, k_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ic // 32, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((5, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad8, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * m_pad8 * ic * oc,
                bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad8 * (ic + oc) * 4,
                transcendentals=0,
            ),
        )(x8, rs, xg8, s0, s1, coef8)
        return out[:m]

    if variant.startswith("stream"):
        nb = ic // pack_block
        out = pl.pallas_call(
            functools.partial(_stream_kernel, ic=ic, oc=oc, pack_block=pack_block),
            out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((m_pad, pack_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_pad, k_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((pack_block // 32, oc), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((5, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((m_pad, oc), jnp.float32),
                pltpu.VMEM((m_pad, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * m_pad * ic * oc,
                bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad * (ic + oc) * 4,
                transcendentals=0,
            ),
        )(xp, xg, s0, s1, coef)
    else:
        out = pl.pallas_call(
            functools.partial(_variant_kernel, ic=ic, oc=oc,
                              pack_block=pack_block, variant=variant),
            out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
            grid=(1,),
            in_specs=[
                pl.BlockSpec((m_pad, ic), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_pad, k_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ic // 32, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((5, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * m_pad * ic * oc,
                bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad * (ic + oc) * 4,
                transcendentals=0,
            ),
        )(xp, xg, s0, s1, coef)
    return out[:m]


def mk_variant(variant, pack_block):
    planes = []
    k_pad = None
    for s in range(K):
        p, k_pad = make_planes(s, pack_block)
        planes.append(p)
    stk = tuple(jnp.asarray(np.stack([p[i] for p in planes])) for i in range(7))

    def mk(L):
        @jax.jit
        def loop(x, *s):
            def body(c, k):
                y = _variant_call(c, tuple(t[k] for t in s), k_pad, pack_block, variant)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return (mk, stk), k_pad


def mk_dense():
    W = jnp.asarray(np.random.default_rng(1).standard_normal((K, IC, OC)), jnp.bfloat16)

    def mk(L):
        @jax.jit
        def loop(x, W):
            def body(c, k):
                y = (c.astype(jnp.bfloat16) @ W[k]).astype(jnp.float32)
                return c + y[:, :IC] * 1e-8, ()
            c, _ = jax.lax.scan(body, x, jnp.tile(jnp.arange(K), L // K))
            return jnp.sum(c)
        return loop

    return mk, (W,)


def mk_variant_flat(variant, pack_block):
    """Like mk_variant but each of the K weights is a SEPARATE traced array
    (the scan body unrolls over all K) — how the serving engine actually
    invokes the kernel.  The stacked harness's in-scan dynamic slice forces
    XLA to MATERIALIZE ~10 MB of pallas operands per matmul (a pallas call
    cannot fuse a slice into its operand read the way a dense dot can),
    which is the ~40 µs plateau every kernel variant hits."""
    planes = []
    k_pad = None
    for s in range(K):
        p, k_pad = make_planes(s, pack_block)
        planes.append(p)
    flat = tuple(jnp.asarray(a) for p in planes for a in p)

    def mk(L):
        @jax.jit
        def loop(x, *flat):
            def body(c, _):
                for kk in range(K):
                    pk = flat[kk * 7 : (kk + 1) * 7]
                    if variant.startswith("ship"):
                        from pb_llm_tpu.core import pbw
                        p = pbw.PackedLinearV2(
                            sign_packed=pk[0], side_val=pk[1], side_idx=pk[2],
                            low_scale=pk[3], low_mean=pk[4], high_scale=pk[5],
                            high_zero=pk[6], bias=None, ic=IC, oc=OC,
                            col_tile=OC, pack_block=pack_block,
                            k_pad_shard=k_pad)
                        _, _, ot = variant.partition("@")
                        y = pallas_pb.pb_matmul_pallas_v2(
                            c, p, oc_tile=int(ot) if ot else None)
                    else:
                        y = _variant_call(c, pk, k_pad, pack_block, variant)
                    c = c + y[:, :IC] * 1e-8
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=L // K)
            return jnp.sum(c)
        return loop

    return (mk, flat), k_pad


def _fold_oc(y):
    """[m, OC] → [m, IC] consuming EVERY output column: a bare y[:, :IC]
    lets XLA dead-code the matmul down to W[:, :IC] when W is a static
    array (measured: "dense" 42.6 µs = 2.1 TB/s, impossible)."""
    m = y.shape[0]
    y1 = y[:, :IC] + y[:, IC : 2 * IC]
    rest = y[:, 2 * IC :]
    y2 = jnp.zeros((m, IC), y.dtype).at[:, : rest.shape[1]].set(rest)
    return y1 + y2


def mk_dense_flat():
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


def interleaved(arms, reps=6):
    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32))
          for i in range(reps + 2)]
    fns = {}
    for tag, (mk, args) in arms.items():
        fns[tag] = {}
        for L in (L_SHORT, L_LONG):
            f = mk(L)
            t0 = time.perf_counter()
            float(f(xs[0], *args))
            log(f"  [{tag}] L={L} compile+first: {time.perf_counter()-t0:.1f}s")
            fns[tag][L] = f
    times = {tag: {L: [] for L in (L_SHORT, L_LONG)} for tag in arms}
    for i in range(1, reps + 1):
        for tag, (mk, args) in arms.items():
            for L in (L_SHORT, L_LONG):
                t0 = time.perf_counter()
                float(fns[tag][L](xs[i], *args))
                times[tag][L].append(time.perf_counter() - t0)
    out = {}
    for tag in arms:
        med = {L: float(np.median(times[tag][L])) for L in (L_SHORT, L_LONG)}
        out[tag] = (med[L_LONG] - med[L_SHORT]) / (L_LONG - L_SHORT)
    return out


def main():
    log(f"backend: {jax.default_backend()}, M={M}")
    want = sys.argv[1:] or ["full", "nox", "nodot", "pb4096", "stream512", "stream1024"]
    arms = {}
    k_pad = 416
    for tag in want:
        if tag == "dense":
            arms[tag] = mk_dense()
            continue
        if tag == "ship":  # the shipping kernel as an in-run drift reference
            import importlib
            bench_arms = importlib.import_module("bench_v2_decode_arms")
            mk, stk, k_pad = bench_arms.mk_packed("f32")
            arms[tag] = (mk, stk)
            continue
        if tag == "dense_flat":
            arms[tag] = mk_dense_flat()
            continue
        if tag.endswith("_flat"):  # e.g. ship_flat, int8_flat, full_flat
            variant = tag[:-5]
            arms[tag], k_pad = mk_variant_flat(
                variant, packing.default_pack_block(IC))
            continue
        if tag.startswith("pb"):
            variant, pack_block = "full", int(tag[2:])
        elif tag.startswith("stream"):
            variant, pack_block = "stream", int(tag[6:])
        else:
            variant, pack_block = tag, packing.default_pack_block(IC)
        arms[tag], k_pad = mk_variant(variant, pack_block)
    slopes = interleaved(arms)
    pbits = IC * OC / 8 + k_pad * OC + k_pad * 4
    floor = pbits / HBM_GBPS
    for tag, t in slopes.items():
        if tag == "dense":
            log(f"dense bf16: {t*1e6:.1f} us ({IC*OC*2/t/1e9:.0f} GB/s weight stream)")
            continue
        log(f"{tag}: {t*1e6:.1f} us | packed stream {pbits/t/1e9:.0f} GB/s | "
            f"roofline {floor/t*100:.0f}%")
    print(json.dumps({t: round(s * 1e6, 2) for t, s in slopes.items()}))


if __name__ == "__main__":
    main()
