"""TPU experiment: close the int8 decode kernel's gap to the stream roofline.

Round-3 left the int8 byte-lane kernel at 17-28 µs against the 12.5 µs HBM
floor (llama-7b MLP decode shape), with extraction ruled out as the
bottleneck.  Remaining suspects, each isolated as an interleaved arm:

  * the SIDECAR dot runs f32: xg [32, 416] x codes [416, 11008] in f32 is
    an emulated multi-pass MXU dot (~15-20 TF/s effective) — several µs for
    0.29 GFLOP.  Fix candidate: ride the int8 MXU.  uint8 codes don't fit
    int8, but (codes - 128) does: XOR 0x80 + bitcast is offset-binary →
    int8, and the missing 128·Σxg term folds into the existing γ rowsum
    coefficient (γ' = γ + 128·hs) — EXACT at unit scale, like the main dot.
  * m_pad = 32 (int8 min sublane tile) quadruples the bit-plane MXU FLOPs
    at decode m=8: 32·4096·11008 int8 MACs ≈ 13 µs at ~220 TOP/s — possibly
    MXU-bound, not HBM-bound.  Arms force m_pad 16 / 8 to measure whether
    Mosaic's masked passes reclaim the waste.

Arms (flat harness — K separate traced weight sets, unrolled body):
  dense       bf16 dense matmul (drift reference)
  ship        shipping int8 kernel (pb_matmul_pallas_v2 decode_dot=int8)
  sc8         int8 kernel + int8 sidecar dot (offset-binary codes)
  sc8_m16     sc8 with m_pad forced to 16
  sc8_m8      sc8 with m_pad forced to 8
  scbf16      sidecar dot in bf16 (codes exact in bf16; x rounds)
  nosc        sidecar term dropped entirely (lower bound for the sidecar)

Usage: python scripts/bench_v2_sidecar.py [arm ...]
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pb_llm_tpu.core import packing, pbw
from pb_llm_tpu.ops import pallas_pb
from pb_llm_tpu.utils.compile_cache import enable_compile_cache
from bench_v2_decompose import make_planes, interleaved, mk_dense_flat, _fold_oc

enable_compile_cache()

M = int(os.environ.get("M", "8"))
IC, OC = 4096, 11008
K = 8
HBM_GBPS = 819e9
WORD_BITS = 32


def log(msg):
    print(msg, flush=True)


def _sc_kernel(x8_ref, sx_ref, rs_ref, xg8_ref, rsg_ref, s_ref, v_ref,
               coef_ref, o_ref, *, ic, oc, pack_block, sidecar):
    """int8 byte-lane kernel with a configurable sidecar path.

    sidecar = "int8": codes arrive uint8, XOR 0x80 → offset-binary int8;
    the +128 correction is pre-folded into coef row 2 (γ' = γ + 128·hs)
    against the EXACT f32 rowsum of the gathered x (rsg), so the only
    approximation remains x's int8 rounding."""
    x8 = x8_ref[:]
    mrows = x8.shape[0]
    acc_b = jnp.zeros((mrows, oc), jnp.int32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = s_ref[w_off : w_off + g, :]
        for b in range(8):
            xs = x8[:, r_off + b * 4 * g : r_off + (b + 1) * 4 * g]
            acc_b += jnp.dot(xs, pallas_pb._bit_plane_bytes_int8(ws, b),
                             preferred_element_type=jnp.int32)
        w_off += g
        r_off += rows

    sx = sx_ref[:]
    alpha2 = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gammap = coef_ref[2:3, :]  # γ' = γ + 128·hs for sidecar="int8"
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    y = rs_ref[:] * beta + (acc_b.astype(jnp.float32) * sx) * alpha2 + bias
    y += rsg_ref[:] * gammap
    if sidecar == "int8":
        v_i8 = pltpu.bitcast(v_ref[:] ^ jnp.uint8(0x80), jnp.int8)
        acc_v = jnp.dot(xg8_ref[:], v_i8, preferred_element_type=jnp.int32)
        y += (acc_v.astype(jnp.float32) * sx) * hs
    elif sidecar == "bf16":
        v_bf = v_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        acc_v = jnp.dot(xg8_ref[:].astype(jnp.bfloat16) , v_bf,
                        preferred_element_type=jnp.float32)
        y += (acc_v * sx) * hs
    # "none": drop the term (floor probe)
    o_ref[:] = y


def _sc_stream_kernel(x8_ref, sx_ref, rs_ref, xg8_ref, rsg_ref, s_ref, v_ref,
                      coef_ref, o_ref, acc_ref, *, blk, oc):
    """ic-streamed int8 kernel: grid over pack-block chunks, int32 acc in
    scratch — Mosaic double-buffers the per-chunk sign-plane DMA against the
    previous chunk's dots.  Sidecar (int8, offset-binary) + epilogue run on
    the last step; its v DMA overlaps the earlier chunks' compute."""
    bi = pl.program_id(0)
    nb = pl.num_programs(0)

    @pl.when(bi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x8 = x8_ref[:]  # [m, blk] permuted chunk
    ws = s_ref[:]   # [blk//32, oc] chunk
    g = blk // WORD_BITS
    acc = acc_ref[:]
    for b in range(8):
        xs = x8[:, b * 4 * g : (b + 1) * 4 * g]
        acc += jnp.dot(xs, pallas_pb._bit_plane_bytes_int8(ws, b),
                       preferred_element_type=jnp.int32)
    acc_ref[:] = acc

    @pl.when(bi == nb - 1)
    def _():
        sx = sx_ref[:]
        v_i8 = pltpu.bitcast(v_ref[:] ^ jnp.uint8(0x80), jnp.int8)
        acc_v = jnp.dot(xg8_ref[:], v_i8, preferred_element_type=jnp.int32)
        o_ref[:] = (rs_ref[:] * coef_ref[1:2, :]
                    + (acc_ref[:].astype(jnp.float32) * sx) * coef_ref[0:1, :]
                    + (acc_v.astype(jnp.float32) * sx) * coef_ref[3:4, :]
                    + rsg_ref[:] * coef_ref[2:3, :] + coef_ref[4:5, :])


def _dma_kernel(x8_ref, sx_ref, rs_ref, xg8_ref, rsg_ref, s_ref, v_ref,
                coef_ref, o_ref, *, ic, oc, pack_block, sidecar):
    """DMA floor probe: every operand block is fetched (BlockSpec granularity
    is the whole array) but compute is a trivial row read — what the HBM
    actually delivers for THIS operand set, shapes and dtypes."""
    del sidecar
    mrows = o_ref.shape[0]
    s_row = jax.lax.bitcast_convert_type(s_ref[0:1, :], jnp.float32)
    v_row = v_ref[0:1, :].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (jnp.broadcast_to(s_row + v_row, (mrows, oc))
                + x8_ref[:, 0:1].astype(jnp.float32) + rs_ref[:]
                + rsg_ref[:] + xg8_ref[:, 0:1].astype(jnp.float32)
                + sx_ref[:] + coef_ref[0:1, :])


def _fusedw_kernel(xcat_ref, scal_ref, w_ref, o_ref, *, ic, oc, pack_block,
                   k_pad, dma_only):
    """ONE-OPERAND weight side (round 5, VERDICT r4 item 4): the sign
    planes, the sidecar codes (pre-XOR'd offset-binary, bytes packed 4/u32
    row), and the 5 coefficient rows (f32 bitcast) ride a single u32 array
    [ic/32 + k_pad/4 + 5, oc] — one contiguous HBM stream instead of three
    mixed-dtype operands, attacking the floor itself.  x-side merged too:
    xcat = [byte-permuted x8 | gathered xg8] int8, scal = (sx, rs, rsg)
    lanes of one small f32 block."""
    nw = ic // WORD_BITS
    ns = k_pad // 4
    x8 = xcat_ref[:, :ic]
    mrows = x8.shape[0]
    if dma_only:  # floor probe: fetch everything, trivial compute
        w_row = jax.lax.bitcast_convert_type(w_ref[0:1, :], jnp.float32)
        o_ref[:] = (jnp.broadcast_to(w_row, (mrows, oc))
                    + xcat_ref[:, 0:1].astype(jnp.float32) + scal_ref[:, 0:1])
        return
    xg8 = xcat_ref[:, ic : ic + k_pad]
    sx = scal_ref[:, 0:1]
    rs = scal_ref[:, 1:2]
    rsg = scal_ref[:, 2:3]
    acc_b = jnp.zeros((mrows, oc), jnp.int32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = w_ref[w_off : w_off + g, :]
        for b in range(8):
            xs = x8[:, r_off + b * 4 * g : r_off + (b + 1) * 4 * g]
            acc_b += jnp.dot(xs, pallas_pb._bit_plane_bytes_int8(ws, b),
                             preferred_element_type=jnp.int32)
        w_off += g
        r_off += rows
    v_i8 = pltpu.bitcast(w_ref[nw : nw + ns, :], jnp.int8)  # offset-binary
    acc_v = jnp.dot(xg8, v_i8, preferred_element_type=jnp.int32)
    coef = jax.lax.bitcast_convert_type(w_ref[nw + ns : nw + ns + 5, :],
                                        jnp.float32)
    y = (rs * coef[1:2] + (acc_b.astype(jnp.float32) * sx) * coef[0:1]
         + (acc_v.astype(jnp.float32) * sx) * coef[3:4]
         + rsg * coef[2:3] + coef[4:5])
    o_ref[:] = y.astype(o_ref.dtype)


def build_fused_w(pk, k_pad):
    """Host-side fused weight plane from make_planes output (np arrays)."""
    s0, s1, s2, s3, s4, s5, s6 = [np.asarray(a) for a in pk]
    v = (s1 ^ np.uint8(0x80))                     # offset-binary pre-XOR
    side32 = (v[0::4].astype(np.uint32) | (v[1::4].astype(np.uint32) << 8)
              | (v[2::4].astype(np.uint32) << 16)
              | (v[3::4].astype(np.uint32) << 24))
    scale, mean = s3[0], s4[0]
    alpha2 = 2.0 * scale
    beta = mean - scale
    gammap = -s5 * s6 - beta + 128.0 * s5
    coef = np.stack([alpha2, beta, gammap, s5, np.zeros_like(s5)], 0).astype(np.float32)
    return np.concatenate([s0, side32, coef.view(np.uint32)], axis=0)


def _fusedw_call(x, wplane, pk, k_pad, pack_block, m_pad=16, out_dtype=jnp.float32,
                 dma_only=False, interpret=False):
    s2 = pk[2]
    m, ic = x.shape
    oc = OC
    xpf = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x)
    absmax = jnp.max(jnp.abs(xpf), axis=1, keepdims=True)
    sx = jnp.maximum(absmax, jnp.float32(1e-30)) / 127.0
    xq = jnp.clip(jnp.round(xpf / sx), -127, 127).astype(jnp.int8)
    x8 = pallas_pb.byte_permute_x(xq, ic, pack_block)
    rs = jnp.sum(xpf, axis=1, keepdims=True)
    idx = s2[:, 0]
    xpad = jnp.concatenate([xpf, jnp.zeros((m_pad, 1), jnp.float32)], axis=1)
    xg = jnp.take(xpad, jnp.where(idx == ic, jnp.int32(ic), idx), axis=1)
    rsg = jnp.sum(xg, axis=1, keepdims=True)
    xg8 = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)
    xcat = jnp.concatenate([x8, xg8], axis=1)            # [m_pad, ic+k_pad]
    scal = jnp.concatenate([sx, rs, rsg], axis=1)        # [m_pad, 3]
    n_wrows = wplane.shape[0]
    out = pl.pallas_call(
        functools.partial(_fusedw_kernel, ic=ic, oc=oc, pack_block=pack_block,
                          k_pad=k_pad, dma_only=dma_only),
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ic * oc,
            bytes_accessed=n_wrows * oc * 4 + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xcat, scal, wplane)
    return out[:m].astype(jnp.float32)


def mk_fusedw(out_dtype=jnp.float32, dma_only=False):
    planes, wps = [], []
    k_pad = None
    pack_block = packing.default_pack_block(IC)
    for s in range(K):
        p, k_pad = make_planes(s, pack_block)
        planes.append(p)
        wps.append(build_fused_w(p, k_pad))
    flat = tuple(jnp.asarray(a) for pr in zip(wps, [p[2] for p in planes])
                 for a in pr)
    kp = k_pad

    def mk(L):
        @jax.jit
        def loop(x, *flat):
            def body(c, _):
                for kk in range(K):
                    w, s2 = flat[kk * 2 : (kk + 1) * 2]
                    y = _fusedw_call(c, w, (None, None, s2), kp, pack_block,
                                     out_dtype=out_dtype, dma_only=dma_only)
                    c = c + _fold_oc(y) * 1e-8
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=L // K)
            return jnp.sum(c)
        return loop

    return (mk, flat), k_pad


def _sc_call(x, planes, k_pad, pack_block, sidecar, m_pad, oc_tile=None,
             stream_blk=0, kernel_fn=None):
    s0, s1, s2, s3, s4, s5, s6 = planes
    m, ic = x.shape
    oc = OC
    oc_tile = oc_tile or oc
    xpf = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x)
    absmax = jnp.max(jnp.abs(xpf), axis=1, keepdims=True)
    sx = jnp.maximum(absmax, jnp.float32(1e-30)) / 127.0
    xq = jnp.clip(jnp.round(xpf / sx), -127, 127).astype(jnp.int8)
    x8 = pallas_pb.byte_permute_x(xq, ic, pack_block)
    rs = jnp.sum(xpf, axis=1, keepdims=True)

    idx = s2[:, 0]
    xpad = jnp.concatenate([xpf, jnp.zeros((m_pad, 1), jnp.float32)], axis=1)
    idxg = jnp.where(idx == ic, jnp.int32(ic), idx)
    xg = jnp.take(xpad, idxg, axis=1)  # [m_pad, k_pad] f32 (exact)
    rsg = jnp.sum(xg, axis=1, keepdims=True)
    xg8 = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)

    scale = s3[0]
    mean = s4[0]
    alpha2 = 2.0 * scale
    beta = mean - scale
    gamma = -s5 * s6 - beta
    if sidecar == "int8":
        gamma = gamma + 128.0 * s5  # fold the offset-binary +128 into γ
    coef = jnp.stack([alpha2, beta, gamma, s5, jnp.zeros((oc,), jnp.float32)],
                     axis=0)

    if stream_blk:
        blk = stream_blk
        x8s = pallas_pb.byte_permute_x(xq, ic, blk)  # per-chunk permutation
        out = pl.pallas_call(
            functools.partial(_sc_stream_kernel, blk=blk, oc=oc),
            out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
            grid=(ic // blk,),
            in_specs=[
                pl.BlockSpec((m_pad, blk), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((blk // 32, oc), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((5, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, oc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m_pad, oc), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * m_pad * ic * oc,
                bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad * (ic + oc) * 4,
                transcendentals=0,
            ),
        )(x8s, sx, rs, xg8, rsg, s0, s1, coef)
        return out[:m]

    out = pl.pallas_call(
        functools.partial(kernel_fn or _sc_kernel, ic=ic, oc=oc_tile,
                          pack_block=pack_block, sidecar=sidecar),
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=(oc // oc_tile,),
        in_specs=[
            pl.BlockSpec((m_pad, ic), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ic // 32, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ic * oc,
            bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
    )(x8, sx, rs, xg8, rsg, s0, s1, coef)
    return out[:m]


def mk_prep_once():
    """sc8_m16 with the x-prep (quantize/byte-permute/gather/rowsums) HOISTED
    out of the unrolled loop: all 8 matmuls share one prepped x.  The delta
    vs sc8_m16 prices the per-matmul XLA prep chain (not realistic for
    serving — x changes per layer — but isolates the cost)."""
    planes = []
    k_pad = None
    pack_block = packing.default_pack_block(IC)
    for s in range(K):
        p, k_pad = make_planes(s, pack_block)
        planes.append(p)
    flat = tuple(jnp.asarray(a) for p in planes for a in p)
    kp = k_pad

    def mk(L):
        @jax.jit
        def loop(x, *flat):
            def body(carry, _):
                c, acc = carry
                for kk in range(K):
                    pk = flat[kk * 7 : (kk + 1) * 7]
                    y = _sc_call(c, pk, kp, pack_block, "int8", 16)
                    # accumulate into a SEPARATE carry so x (and its prep
                    # chain) stays loop-invariant: XLA hoists the prep out of
                    # the scan and the slope prices the 8 kernels alone
                    acc = acc + _fold_oc(y) * 1e-8
                return (c, acc), ()
            (_, acc), _ = jax.lax.scan(body, (x, jnp.zeros_like(x)), None,
                                       length=L // K)
            return jnp.sum(acc)
        return loop

    return (mk, flat), k_pad


def mk_flat(fn):
    """Flat harness: K separate traced weight sets, unrolled scan body."""
    planes = []
    k_pad = None
    pack_block = packing.default_pack_block(IC)
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
                    y = fn(c, pk, k_pad, pack_block)
                    c = c + _fold_oc(y) * 1e-8
                return c, ()
            c, _ = jax.lax.scan(body, x, None, length=L // K)
            return jnp.sum(c)
        return loop

    return (mk, flat), k_pad


def _ship(c, pk, k_pad, pack_block):
    p = pbw.PackedLinearV2(
        sign_packed=pk[0], side_val=pk[1], side_idx=pk[2],
        low_scale=pk[3], low_mean=pk[4], high_scale=pk[5],
        high_zero=pk[6], bias=None, ic=IC, oc=OC,
        col_tile=OC, pack_block=pack_block, k_pad_shard=k_pad)
    return pallas_pb.pb_matmul_pallas_v2(c, p, decode_dot="int8")


def interleaved_robust(arms, bytes_for, reps=14):
    """Per-REP slopes with a physicality filter (bench.py's method): the
    tunnel chip drifts so hard that 6-rep per-length medians can go
    NEGATIVE.  For each rep i the (L_LONG−L_SHORT) slope is computed from
    that rep's own pair of calls; a rep is PHYSICAL iff every arm's slope
    is positive and implies ≤ 1.02×819 GB/s for its byte count.  Report the
    physical rep minimizing the dense slope (all arms from that SAME rep),
    plus per-arm medians over physical reps."""
    import time as _t

    from bench_v2_decompose import L_SHORT, L_LONG

    xs = [jnp.asarray(np.random.default_rng(i).standard_normal((M, IC)).astype(np.float32))
          for i in range(reps + 2)]
    fns = {}
    for tag, (mk, args) in arms.items():
        fns[tag] = {}
        for L in (L_SHORT, L_LONG):
            f = mk(L)
            t0 = _t.perf_counter()
            float(f(xs[0], *args))
            log(f"  [{tag}] L={L} compile+first: {_t.perf_counter()-t0:.1f}s")
            fns[tag][L] = f
    per_rep = {tag: [] for tag in arms}
    for i in range(1, reps + 1):
        for tag in arms:
            pair = {}
            for L in (L_SHORT, L_LONG):
                t0 = _t.perf_counter()
                float(fns[tag][L](xs[i], *arms[tag][1]))
                pair[L] = _t.perf_counter() - t0
            per_rep[tag].append((pair[L_LONG] - pair[L_SHORT]) / (L_LONG - L_SHORT))

    def physical(i):
        for tag in arms:
            s = per_rep[tag][i]
            if s <= 0 or bytes_for(tag) / s > 819e9 * 1.05:
                return False
        return True

    ok = [i for i in range(reps) if physical(i)]
    log(f"physical reps: {len(ok)}/{reps}")
    if not ok:
        return None, None
    best_i = min(ok, key=lambda i: per_rep["dense"][i] if "dense" in arms
                 else per_rep[list(arms)[0]][i])
    best = {tag: per_rep[tag][best_i] for tag in arms}
    med = {tag: float(np.median([per_rep[tag][i] for i in ok])) for tag in arms}
    return best, med


def main():
    log(f"backend: {jax.default_backend()}, M={M}")
    want = sys.argv[1:] or ["dense", "ship", "sc8", "sc8_m16", "sc8_m8",
                            "scbf16", "nosc"]
    arms = {}
    k_pad = 416
    for tag in want:
        if tag == "dense":
            arms[tag] = mk_dense_flat()
            continue
        if tag == "ship":
            arms[tag], k_pad = mk_flat(_ship)
            continue
        if tag == "prep_once":
            arms[tag], k_pad = mk_prep_once()
            continue
        if tag == "fusedw":            # one-operand weight plane (r5)
            arms[tag], k_pad = mk_fusedw()
            continue
        if tag == "fusedw_bf16o":      # + bf16 output
            arms[tag], k_pad = mk_fusedw(out_dtype=jnp.bfloat16)
            continue
        if tag == "fusedw_dma":        # its DMA floor probe
            arms[tag], k_pad = mk_fusedw(dma_only=True)
            continue
        if tag.startswith("dmaonly"):  # dmaonly / dmaonly@5504
            _, _, ot = tag.partition("@")
            arms[tag], k_pad = mk_flat(
                lambda c, pk, kp, pb, ot_=(int(ot) if ot else None):
                _sc_call(c, pk, kp, pb, "int8", 16, ot_, kernel_fn=_dma_kernel))
            continue
        if tag.startswith("strm"):  # e.g. strm1024 / strm1024_m16
            blk = int(tag[4:].split("_")[0])
            m_pad = 16 if tag.endswith("_m16") else 32
            arms[tag], k_pad = mk_flat(
                lambda c, pk, kp, pb, b=blk, mp=m_pad:
                _sc_call(c, pk, kp, pb, "int8", mp, stream_blk=b))
            continue
        base, _, ot = tag.partition("@")  # e.g. sc8_m16@5504 → oc_tile=5504
        oc_tile = int(ot) if ot else None
        sidecar = {"sc8": "int8", "sc8_m16": "int8", "sc8_m8": "int8",
                   "scbf16": "bf16", "nosc": "none", "nosc_m16": "none"}[base]
        m_pad = {"sc8_m16": 16, "sc8_m8": 8, "nosc_m16": 16}.get(base, 32)
        arms[tag], k_pad = mk_flat(
            lambda c, pk, kp, pb, sc=sidecar, mp=m_pad, ot_=oc_tile:
            _sc_call(c, pk, kp, pb, sc, mp, ot_))
    pbits = IC * OC / 8 + k_pad * OC + k_pad * 4

    def bytes_for(tag):
        return IC * OC * 2 if tag == "dense" else pbits

    best, med = interleaved_robust(arms, bytes_for)
    if best is None:
        log("NO physical rep survived — hopelessly contended run; rerun")
        print(json.dumps({"contended": True}))
        return
    floor = pbits / HBM_GBPS
    for tag, t in best.items():
        m = med[tag]
        if tag == "dense":
            log(f"dense bf16: best {t*1e6:.1f} us ({IC*OC*2/t/1e9:.0f} GB/s), "
                f"median {m*1e6:.1f} us")
            continue
        log(f"{tag}: best {t*1e6:.1f} us | {pbits/t/1e9:.0f} GB/s | roofline "
            f"{floor/t*100:.0f}% | median {m*1e6:.1f} us ({floor/m*100:.0f}%)")
    print(json.dumps({t: [round(s * 1e6, 2), round(med[t] * 1e6, 2)]
                      for t, s in best.items()}))


if __name__ == "__main__":
    main()
