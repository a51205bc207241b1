"""Fused Pallas kernels for bit-packed partially-binarized matmuls.

Two kernels implement the same numerics contract (`core.pbw.dequantize`):

**Planar kernel (primary).**  Per-element reconstruct-then-select is
VPU-bound on TPU (≥11 ops/weight), and worse, merging unpacked bit rows into
sublanes forces a cross-vreg relayout that caps VPU utilization at ~25%.
The planar kernel avoids both with a linear decomposition (measured 3.2x
faster than reconstruct-select on v5e; sign-only path is 3.25x FASTER than
a dense bf16 matmul at decode batch):

    w = β + α·b′ + hs·v″ + γ·m          (per-oc constants)
    β = mean − scale,  α = 2·scale,  γ = −hs·hz − β
    b′ = sign bit, zeroed at salient (done at pack time)
    v″ = uint8 code, zeroed at non-salient (pack time)
    m  = salient mask bit
  ⇒ y = rowsum(x)·β + (x@B′)·α + (x@V″)·hs + (x@M)·γ

x@B′ / x@M are computed as 32 dots per pack block — bit ``b`` of the block's
words is a ready-made [G, oc] 0/1 matrix, and the block-strided layout makes
its matching x slice contiguous — so unpack is shift+and+convert straight
into the MXU with NO reshape.  Restricted to groupsize == -1 (whole-row
groups, the paper's main configuration): per-ic-group scales would break the
factoring of α/β out of the dots.

**Select kernel (general fallback).** Reconstructs w tiles elementwise
(mask ? dequant8 : mean±scale) and feeds one dot; supports arbitrary
ic-groupsizes.  Slower (VPU-bound) but fully general.

Constraints checked by `pallas_supported`; `ops.binary_matmul` falls back to
the XLA reference implementation otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import packing
from ..core.pbw import PackedLinear, PackedLinearV2, gather_x_v2

WORD_BITS = 32

def _bit_plane_two(ws: jnp.ndarray, b: int) -> jnp.ndarray:
    """{0.0, 2.0} f32 plane for bit ``b`` of uint32 words ws [g, oc_tile].

    f32 2.0 = 0x40000000 has a SINGLE bit set, so one shift + one AND + a
    free bitcast turn bit b of a packed word into the float 2.0 (or 0.0) —
    2 VPU ops per extracted element vs 3 for shift+and+int→float convert.
    (1.0 = 0x3F800000 needs 7 exponent bits and cannot be built with a
    single AND.)  Callers fold the 2x into their per-oc coefficients.
    Scalar constants are built in-trace: pallas rejects captured arrays."""
    exp_two = jnp.uint32(0x40000000)
    if b <= 30:
        shifted = jax.lax.shift_left(ws, jnp.uint32(30 - b))
    else:
        shifted = jax.lax.shift_right_logical(ws, jnp.uint32(b - 30))
    return jax.lax.bitcast_convert_type(shifted & exp_two, jnp.float32)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _bit_plane_pair_bf16(ws: jnp.ndarray, p: int) -> jnp.ndarray:
    """bf16 {0, 2.0} planes for bit PAIR (p, p+16) of uint32 words ws
    [g, oc_tile] → [2g, oc_tile].

    bf16 2.0 = 0x4000, so one shift lands bit p at position 14 (low u16
    half) and bit p+16 at position 30 (high half) simultaneously; one AND
    with 0x40004000 writes bf16 2.0 into both halves; the sublane bitcast
    (u32 → u16 → bf16) splits every u32 lane into two bf16 rows — row 2i is
    the LOW half (bit p of word i), row 2i+1 the high half (bit p+16).
    Net: 1 VPU op per extracted element, half the f32 single-bit path of
    `_bit_plane_two`, and the dots run at bf16 MXU rate with k doubled.
    Callers must feed x in the matching pair-permuted column order
    (`pair_permute_x`)."""
    # NOTE: shifts only legalize on 32-bit lanes (Mosaic rejects arith.shli
    # on i16 vectors), so the shift+AND run in u32 and the sublane split to
    # bf16 pairs is one bitcast chain per pair.
    pair = jnp.uint32(0x40004000)
    if p <= 14:
        shifted = jax.lax.shift_left(ws, jnp.uint32(14 - p))
    else:
        shifted = jax.lax.shift_right_logical(ws, jnp.uint32(p - 14))
    return pltpu.bitcast(pltpu.bitcast(shifted & pair, jnp.uint16), jnp.bfloat16)


def _bit_plane_bytes_int8(ws: jnp.ndarray, b: int) -> jnp.ndarray:
    """int8 {0,1} planes for bits (b, b+8, b+16, b+24) of uint32 words ws
    [g, oc_tile] → [4g, oc_tile]: one shift + one AND with 0x01010101 drops
    the four bits into the four byte lanes; the sublane bitcast (u32 → int8)
    splits every u32 lane into four int8 rows — row 4i+j is byte j (bit
    b+8j) of word i.  Net: 0.5 VPU ops per extracted weight (vs 2 for the
    f32 single-bit path), planes cost 1 byte/weight through VMEM (vs 4),
    and the dots run on the int8 MXU path (~2x bf16 FLOPs on v5e).
    Callers must feed x int8-quantized AND byte-permuted
    (`byte_permute_x`)."""
    one = jnp.uint32(0x01010101)
    shifted = jax.lax.shift_right_logical(ws, jnp.uint32(b)) if b else ws
    return pltpu.bitcast(shifted & one, jnp.int8)


def byte_permute_x(xq: jnp.ndarray, ic: int, pack_block: int) -> jnp.ndarray:
    """Static column permutation matching `_bit_plane_bytes_int8`'s row
    order: within each pack block (g = rows//32 words), old column
    (8j + b)·g + i moves to b·4g + 4i + j (b∈[0,8), j∈[0,4), i∈[0,g)).
    Rowsums are permutation-invariant, so the β·rowsum term needs no
    change.  Cost: one [m, ic] relayout per matmul — negligible at decode
    m.  Mapping pinned by tests/test_pallas_v2.py."""
    m = xq.shape[0]
    parts = []
    r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        blk = xq[:, r_off : r_off + rows].reshape(m, 4, 8, g)  # (j, b, i)
        parts.append(jnp.transpose(blk, (0, 2, 3, 1)).reshape(m, rows))
        r_off += rows
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def pair_permute_x(xp: jnp.ndarray, ic: int, pack_block: int) -> jnp.ndarray:
    """Static column permutation matching `_bit_plane_pair_bf16`'s row order:
    within each pack block (g = rows//32 words), old column b·g + i moves to
    p·2g + 2i + h where b = p + 16·h.  Rowsums are permutation-invariant, so
    the kernel's β·rowsum term needs no change.  Cost: one [m, ic] relayout
    per matmul — negligible at decode m."""
    m = xp.shape[0]
    parts = []
    r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        blk = xp[:, r_off : r_off + rows].reshape(m, 2, 16, g)  # (h, p, i)
        parts.append(jnp.transpose(blk, (0, 2, 3, 1)).reshape(m, rows))
        r_off += rows
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# planar kernel
# ---------------------------------------------------------------------------


def _planar_kernel(x_ref, s_ref, m_ref, v_ref, coef_ref, o_ref, *, ic: int, oc_tile: int, pack_block: int, sidecar_bits: int, low_bits: int, n_groups: int, groupsize: int):
    """Planar decomposition with per-GROUP binary coefficients: the block
    loop is statically unrolled, so the group index of each pack block is a
    Python int and coefficient rows are static slices.  n_groups == 1 is the
    whole-row (groupsize = -1) case; groupsize=128 runs the same kernel with
    per-block coefficient application (the reference's `--groupsize 128`
    ablation, `gptq_pb/low_quant.py:11-14`) — requires groupsize %
    pack_block == 0 so no pack block straddles a group boundary."""
    xb = x_ref[:]
    mrows = xb.shape[0]
    alpha = coef_ref[0:n_groups, :]
    beta = coef_ref[n_groups : 2 * n_groups, :]
    gamma = coef_ref[2 * n_groups : 3 * n_groups, :]
    hs = coef_ref[3 * n_groups : 3 * n_groups + 1, :]
    bias = coef_ref[3 * n_groups + 1 : 3 * n_groups + 2, :]
    total = jnp.zeros((mrows, oc_tile), jnp.float32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        gi = r_off // groupsize if n_groups > 1 else 0
        g = rows // WORD_BITS
        wm = m_ref[w_off : w_off + g, :]
        planes = [s_ref[j, w_off : w_off + g, :] for j in range(low_bits)]
        acc_b = jnp.zeros((mrows, oc_tile), jnp.float32)
        acc_m = jnp.zeros((mrows, oc_tile), jnp.float32)
        for b in range(WORD_BITS):
            xs = xb[:, r_off + b * g : r_off + (b + 1) * g]
            for j, ws in enumerate(planes):
                bits_s = _bit_plane_two(ws, b)  # {0, 2.0}; 2x folded into alpha
                acc_b += (2.0**j) * jnp.dot(xs, bits_s, preferred_element_type=jnp.float32)
            bits_m = _bit_plane_two(wm, b)  # {0, 2.0}; 2x folded into gamma
            acc_m += jnp.dot(xs, bits_m, preferred_element_type=jnp.float32)
        rs = jnp.sum(xb[:, r_off : r_off + rows], axis=1, keepdims=True)
        total += (rs * beta[gi : gi + 1, :]
                  + acc_b * alpha[gi : gi + 1, :]
                  + acc_m * gamma[gi : gi + 1, :])
        w_off += g
        r_off += rows
    if sidecar_bits == 4:
        # nibble-strided layout: two half-row dots per pack block
        acc_v = jnp.zeros((mrows, oc_tile), jnp.float32)
        v_off = r_off = 0
        for rows in packing.block_sizes(ic, pack_block):
            h = rows // 2
            vb = v_ref[v_off : v_off + h, :].astype(jnp.int32)
            lo = (vb & 0xF).astype(jnp.float32)
            hi = (vb >> 4).astype(jnp.float32)
            acc_v += jnp.dot(xb[:, r_off : r_off + h], lo, preferred_element_type=jnp.float32)
            acc_v += jnp.dot(xb[:, r_off + h : r_off + rows], hi, preferred_element_type=jnp.float32)
            v_off += h
            r_off += rows
    else:
        acc_v = jnp.dot(xb, v_ref[:].astype(jnp.int32).astype(jnp.float32), preferred_element_type=jnp.float32)
    o_ref[:] = total + acc_v * hs + bias


def _planar_call(x, p: PackedLinear, oc_tile: int, interpret: bool):
    m, ic = x.shape
    oc = p.oc_local
    m_pad = _round_up(max(m, 8), 8)
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))

    scale = p.low_scale.astype(jnp.float32)  # [G, oc]
    mean = p.low_mean.astype(jnp.float32)
    # kernel bit planes carry {0, 2.0} (see _bit_plane_two): alpha/gamma are
    # written pre-halved relative to the w = beta + alpha·bit decomposition
    if p.low_bits == 1:
        alpha = scale                  # w_bin = (2·scale)·bit + beta
        beta = mean - scale
    else:
        alpha = 0.5 * scale            # w_bin = scale·(code − zero); low_mean = zero
        beta = -scale * mean
    gamma = 0.5 * (-(p.high_scale * p.high_zero)[None, :] - beta)
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)
    n_groups = p.n_groups
    coef = jnp.concatenate(
        [alpha, beta, gamma, p.high_scale[None, :], bias[None, :]], axis=0
    )  # [3G+2, oc]

    kernel = functools.partial(
        _planar_kernel, ic=ic, oc_tile=oc_tile,
        pack_block=p.pack_block_local, sidecar_bits=p.sidecar_bits, low_bits=p.low_bits,
        n_groups=n_groups, groupsize=p.groupsize_local,
    )
    wpp = p.words_per_plane
    sign3 = p.sign_packed.reshape(p.low_bits, wpp, oc)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=(oc // oc_tile,),
        in_specs=[
            pl.BlockSpec((m_pad, ic), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.low_bits, wpp, oc_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ic // 32, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.sidecar.shape[0], oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_groups + 2, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * m_pad * ic * oc,
            bytes_accessed=ic * oc * (2 + p.sidecar_bits) // 8 + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, sign3, p.mask_packed, p.sidecar, coef)
    return out[:m]


# ---------------------------------------------------------------------------
# planar kernel, v2 column-structured format
# ---------------------------------------------------------------------------
#
# y = rowsum(x)·β + (x@B′)·α + (xg@V)·hs + rowsum(xg)·γ + bias
#
# where xg [m, k_pad] is the activation slice at this row group's salient
# columns (gathered OUTSIDE the kernel — tiny at decode batch) and V is the
# [k_pad, oc_tile] uint8 code plane.  Compared with v1 the dense 8-bit
# sidecar dot and the mask-plane bit dots disappear: the γ-term's
# Σ_{j∈salient} x_j is exactly rowsum(xg) because padded slots gather an
# appended zero column.  Streamed bits/weight: 1 (sign) + 8·salient_frac.


def _v2_salient_terms(xg_ref, v_ref, mrows: int, oc_tile: int, chunk: int,
                      side_bits: int, shards: int, dot_dtype):
    """(acc_v, rowsum_g) of the sidecar: per oc chunk, the gathered-x dot
    against the uint8 code plane plus the γ-term's Σ_{j∈salient} x_j."""
    n_chunks = oc_tile // chunk
    parts = []
    sums = []
    for j in range(n_chunks):
        xg = xg_ref[j]  # [m, k_pad]
        raw = v_ref[:, j * chunk : (j + 1) * chunk].astype(jnp.int32)
        if side_bits == 4:
            # block-paired nibbles per shard segment: concat lo/hi halves
            # (cheap sublane concat; see core.pbw.unpack_side_codes)
            kps_packed = raw.shape[0] // shards
            segs = []
            for s_ in range(shards):
                seg = raw[s_ * kps_packed : (s_ + 1) * kps_packed]
                segs += [seg & 0xF, seg >> 4]
            raw = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
        v = raw.astype(dot_dtype)  # codes ≤ 255: exact in bf16
        parts.append(jnp.dot(xg.astype(dot_dtype), v, preferred_element_type=jnp.float32))
        sums.append(jnp.broadcast_to(jnp.sum(xg, axis=1, keepdims=True), (mrows, chunk)))
    acc_v = jnp.concatenate(parts, axis=1) if n_chunks > 1 else parts[0]
    rowsum_g = jnp.concatenate(sums, axis=1) if n_chunks > 1 else sums[0]
    return acc_v, rowsum_g


def _planar_v2_kernel(x_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref, *, ic: int,
                      oc_tile: int, pack_block: int, chunk: int, dot_dtype,
                      side_bits: int = 8, shards: int = 1, low_bits: int = 1):
    """s_ref is PLANE-MAJOR [low_bits, ic//32, oc_tile]; low_bits >= 2 runs
    the reference's uniform 2/4-bit low ablations in the v2 format — the
    per-plane dots accumulate with 2^j weights and the caller supplies
    alpha = scale/2, beta = -scale*zero (code2 = 2*code planes)."""
    xb = x_ref[:]
    mrows = xb.shape[0]
    acc_b = jnp.zeros((mrows, oc_tile), jnp.float32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        planes = [s_ref[j, w_off : w_off + g, :] for j in range(low_bits)]
        for b in range(WORD_BITS):
            xs = xb[:, r_off + b * g : r_off + (b + 1) * g].astype(dot_dtype)
            for j, ws in enumerate(planes):
                bits_s = _bit_plane_two(ws, b)  # {0, 2.0}; 2x folded into alpha
                if dot_dtype != jnp.float32:
                    bits_s = bits_s.astype(dot_dtype)
                acc_b += (2.0 ** j) * jnp.dot(
                    xs, bits_s, preferred_element_type=jnp.float32)
        w_off += g
        r_off += rows

    acc_v, rowsum_g = _v2_salient_terms(
        xg_ref, v_ref, mrows, oc_tile, chunk, side_bits, shards, dot_dtype)

    rowsum = jnp.sum(xb, axis=1, keepdims=True)
    alpha = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    o_ref[:] = rowsum * beta + acc_b * alpha + acc_v * hs + rowsum_g * gamma + bias


def _planar_v2_pair_kernel(x_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref, *,
                           ic: int, oc_tile: int, pack_block: int, chunk: int,
                           side_bits: int = 8, shards: int = 1):
    """Paired bf16 bit-plane decode kernel: 16 dots of [m, 2g]x[2g, oc] per
    pack block instead of 32 f32 dots of [m, g]x[g, oc] — one VPU op per
    extracted weight (vs 2) and single-pass bf16 MXU dots (vs multi-pass
    f32).  x arrives PAIR-PERMUTED (`pair_permute_x`); xb stays f32 so the
    β·rowsum term keeps f32 accuracy, slices are cast to bf16 per dot (tiny
    at decode m).  Numerics: bit planes {0,2} and uint8 codes are exact in
    bf16; only x rounds to bf16 inside the dots — engine-grade (the
    reference itself runs fp16 torch, and the dense baseline is bf16)."""
    xb = x_ref[:]
    mrows = xb.shape[0]
    acc_b = jnp.zeros((mrows, oc_tile), jnp.float32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = s_ref[w_off : w_off + g, :]
        for p in range(16):
            xs = xb[:, r_off + p * 2 * g : r_off + (p + 1) * 2 * g].astype(jnp.bfloat16)
            acc_b += jnp.dot(xs, _bit_plane_pair_bf16(ws, p),
                             preferred_element_type=jnp.float32)
        w_off += g
        r_off += rows

    acc_v, rowsum_g = _v2_salient_terms(
        xg_ref, v_ref, mrows, oc_tile, chunk, side_bits, shards, jnp.bfloat16)

    rowsum = jnp.sum(xb, axis=1, keepdims=True)
    alpha = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    o_ref[:] = rowsum * beta + acc_b * alpha + acc_v * hs + rowsum_g * gamma + bias


def _v2_salient_dot_int8(xg8, v, side_bits: int, shards: int) -> jnp.ndarray:
    """int32 sidecar dot on the int8 MXU: xg8 [m, k_pad] int8 x codes
    (``v``: the uint8 code VALUES, already loaded from the ref).

    8-bit codes don't fit int8, but codes − 128 do: XOR 0x80 + bitcast is
    offset-binary → int8; the kernel adds the missing 128·Σ_j xg_j back as
    128·rsg INSIDE the hs product (integer-exact at unit scale — folding it
    into γ instead costs one extra f32 rounding and breaks the pinned
    bit-for-bit test).  4-bit codes (0..15) fit int8 directly; shard
    segments concat like the f32 path."""
    if side_bits == 4:
        kps_packed = v.shape[0] // shards
        segs = []
        for s_ in range(shards):
            seg = v[s_ * kps_packed : (s_ + 1) * kps_packed].astype(jnp.int32)
            segs += [(seg & 0xF).astype(jnp.int8), (seg >> 4).astype(jnp.int8)]
        v_i8 = jnp.concatenate(segs, axis=0) if len(segs) > 1 else segs[0]
    else:
        v_i8 = pltpu.bitcast(v ^ jnp.uint8(0x80), jnp.int8)
    return jnp.dot(xg8, v_i8, preferred_element_type=jnp.int32)


def _planar_v2_int8_kernel(x8_ref, sx_ref, rs_ref, xg8_ref, rsg_ref, s_ref,
                           v_ref, coef_ref, o_ref, *, ic: int, oc_tile: int,
                           pack_block: int, side_bits: int, shards: int,
                           chunk: int):
    """Int8 byte-lane decode kernel: 8 int8 dots of [m, 4g]x[4g, oc] per
    pack block (one shift+AND per FOUR bit-planes, `_bit_plane_bytes_int8`)
    instead of 32 f32 dots of [m, g]x[g, oc].  x arrives int8-quantized
    per ROW (absmax/127, scale sx) and byte-permuted; the int32 accumulator
    is exact (|Σ x_i8·bit| ≤ ic·127 ≪ 2³¹), so the ONLY approximation is
    x's int8 rounding — when every row of x is integer-valued with absmax
    exactly 127 (sx = 1) the result matches the f32 path to the last bit
    (pinned by tests/test_pbw_v2.py).  The SIDECAR dot rides the int8 MXU
    too (`_v2_salient_dot_int8`: offset-binary codes; the +128 correction is
    pre-folded into coef row 2 as γ' = γ + 128·hs against the EXACT f32
    rowsum rsg) — the f32 sidecar dot it replaces was the second-largest
    cost at decode m and ~30%% of fused-int8 prefill.  β·rowsum stays
    f32-exact (rs precomputed from the original x outside).
    Measured v5e (llama-7b MLP shape, m=8 → m_pad=16, flat harness,
    scripts/bench_v2_sidecar.py): 17.3-19.9 µs = 81%% of the same-run dense
    stream rate, vs 22.5-22.7 µs for the round-3 f32-sidecar/m_pad=32
    version; the operand-set DMA floor probe (`dmaonly` arm) sits at
    16.5 µs, so the kernel runs within ~1 µs of what HBM delivers for
    these operands."""
    x8 = x8_ref[:]
    mrows = x8.shape[0]
    acc_b = jnp.zeros((mrows, oc_tile), jnp.int32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = s_ref[w_off : w_off + g, :]
        for b in range(8):
            xs = x8[:, r_off + b * 4 * g : r_off + (b + 1) * 4 * g]
            acc_b += jnp.dot(xs, _bit_plane_bytes_int8(ws, b),
                             preferred_element_type=jnp.int32)
        w_off += g
        r_off += rows

    # sidecar terms per ROW GROUP: each chunk of `chunk` output columns has
    # its own salient column set (fused qkv / gate+up layers carry one group
    # per constituent matrix; plain layers have one global group)
    n_chunks = oc_tile // chunk
    sx = sx_ref[:]
    side_parts = []
    rsg_parts = []
    for j in range(n_chunks):
        acc_v = _v2_salient_dot_int8(
            xg8_ref[j], v_ref[:, j * chunk:(j + 1) * chunk], side_bits, shards)
        rsg_j = rsg_ref[j]  # [m, 1] exact f32 Σ_salient x for this group
        side_f = acc_v.astype(jnp.float32) * sx
        if side_bits == 8:
            side_f = side_f + 128.0 * rsg_j  # offset-binary correction
        side_parts.append(side_f)
        rsg_parts.append(jnp.broadcast_to(rsg_j, (side_f.shape[0], chunk)))
    side_f = jnp.concatenate(side_parts, axis=1) if n_chunks > 1 else side_parts[0]
    rsg = jnp.concatenate(rsg_parts, axis=1) if n_chunks > 1 else rsg_parts[0]

    alpha2 = coef_ref[0:1, :]  # 2·scale: planes here carry {0,1}, not {0,2}
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    y_bin = (acc_b.astype(jnp.float32) * sx) * alpha2
    o_ref[:] = rs_ref[:] * beta + y_bin + side_f * hs + rsg * gamma + bias


def _planar_v2_int8_call(x, p: PackedLinearV2, oc_tile: int, interpret: bool):
    """decode_dot="int8" / prefill_int8 entry: quantize x per row (absmax
    int8), byte-permute, and run the int8 byte-lane kernel.  Global-
    selection layouts (n_row_groups == 1); large m tiles over a 2-D grid
    (the SAME fused kernel serves decode and the fused int8 prefill — no
    90 MB w_bin round-trip like the hybrid path).

    Decode m_pad is 16, not 32: Mosaic accepts 16-sublane int8 operand
    blocks and the bit-plane MXU passes scale with the declared m —
    measured 2.6 µs faster at llama-7b MLP decode shape (m_pad=8 is SLOWER,
    23.9 vs 19.9 µs: sub-16 int8 tiles pessimize).  The gathered sidecar x
    rides int8 too (xg8, same per-row scale), with the exact f32 rowsum rsg
    carrying both the γ term and the offset-binary +128 correction."""
    m, ic = x.shape
    oc = p.oc_local
    m_pad = _round_up(max(m, 16), 16)  # 16-sublane int8 blocks lower fine
    m_tile = 512 if m_pad > 512 else m_pad
    m_pad = _round_up(m_pad, m_tile)
    n_m_tiles = m_pad // m_tile
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))

    absmax = jnp.max(jnp.abs(xp), axis=1, keepdims=True)
    sx = jnp.maximum(absmax, jnp.float32(1e-30)) / 127.0
    xq = jnp.clip(jnp.round(xp / sx), -127, 127).astype(jnp.int8)
    x8 = byte_permute_x(xq, ic, p.pack_block_local)
    rs = jnp.sum(xp, axis=1, keepdims=True)

    xg = jnp.transpose(gather_x_v2(xp, p), (2, 0, 1))  # [n_rg, m_pad, k_pad]
    rsg = jnp.sum(xg, axis=2, keepdims=True)           # [n_rg, m_pad, 1] exact
    xg8 = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)

    scale = p.low_scale[0].astype(jnp.float32)
    mean = p.low_mean[0].astype(jnp.float32)
    alpha2 = 2.0 * scale
    beta = mean - scale
    gamma = -p.high_scale * p.high_zero - beta
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)
    coef = jnp.stack([alpha2, beta, gamma, p.high_scale, bias], axis=0)

    # row groups (fused qkv / gate+up layers: one salient column set per
    # constituent matrix): chunk = columns sharing one group inside a tile
    chunk = min(oc_tile, p.col_tile)
    gpt = oc_tile // chunk
    kernel = functools.partial(
        _planar_v2_int8_kernel, ic=ic, oc_tile=oc_tile,
        pack_block=p.pack_block_local,
        side_bits=p.side_bits, shards=p.shards_local, chunk=chunk,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=(oc // oc_tile, n_m_tiles),
        in_specs=[
            pl.BlockSpec((m_tile, ic), lambda i, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 1), lambda i, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, 1), lambda i, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, m_tile, p.k_pad),
                         lambda i, mi, _gpt=gpt, _ot=oc_tile, _ct=p.col_tile:
                         (((i * _ot) // _ct) // _gpt, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, m_tile, 1),
                         lambda i, mi, _gpt=gpt, _ot=oc_tile, _ct=p.col_tile:
                         (((i * _ot) // _ct) // _gpt, mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ic // 32, oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.side_val.shape[0], oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, oc_tile), lambda i, mi: (mi, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # prefill m-tiles at whole-oc measured 65.4 MB scoped (512x11008
            # f32 out double-buffered + operands) — v5e has 128 MB VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ic * oc,
            bytes_accessed=ic * oc // 8 + p.k_pad * oc + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x8, sx, rs, xg8, rsg, p.sign_packed, p.side_val, coef)
    return out[:m]


def _planar_v2_call(x, p: PackedLinearV2, oc_tile: int, interpret: bool, dot_dtype=jnp.float32,
                    pair: bool = False):
    m, ic = x.shape
    oc = p.oc_local
    m_pad = _round_up(max(m, 8), 8)
    m_tile = 256 if m_pad > 256 else m_pad
    m_pad = _round_up(m_pad, m_tile)
    n_m_tiles = m_pad // m_tile
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))

    # chunk = columns sharing one row group inside a kernel invocation
    chunk = min(oc_tile, p.col_tile)
    gpt = oc_tile // chunk  # row groups spanned per oc tile

    xg = jnp.transpose(gather_x_v2(xp, p), (2, 0, 1))  # [n_rg, m_pad, k_pad]

    scale = p.low_scale[0].astype(jnp.float32)
    mean = p.low_mean[0].astype(jnp.float32)
    if p.low_bits == 1:
        alpha = scale  # w_bin = beta + 2·scale·bit; bit planes carry {0,2}
        beta = mean - scale
    else:
        alpha = 0.5 * scale  # w_bin = scale·(code − zero); low_mean = zero
        beta = -scale * mean
    gamma = -p.high_scale * p.high_zero - beta
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)
    coef = jnp.stack([alpha, beta, gamma, p.high_scale, bias], axis=0)

    if pair:
        kernel = functools.partial(
            _planar_v2_pair_kernel, ic=ic, oc_tile=oc_tile,
            pack_block=p.pack_block_local, chunk=chunk,
            side_bits=p.side_bits, shards=p.shards_local,
        )
        x_in = pair_permute_x(xp, ic, p.pack_block_local)
    else:
        kernel = functools.partial(
            _planar_v2_kernel, ic=ic, oc_tile=oc_tile,
            pack_block=p.pack_block_local, chunk=chunk, dot_dtype=dot_dtype,
            side_bits=p.side_bits, shards=p.shards_local, low_bits=p.low_bits,
        )
        x_in = xp
    wpp = p.words_per_plane
    sign_in = (p.sign_packed if pair
               else p.sign_packed.reshape(p.low_bits, wpp, oc))
    sign_spec = (
        pl.BlockSpec((ic // 32, oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM)
        if pair else
        pl.BlockSpec((p.low_bits, wpp, oc_tile), lambda i, mi: (0, 0, i),
                     memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=(oc // oc_tile, n_m_tiles),
        in_specs=[
            pl.BlockSpec((m_tile, ic), lambda i, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gpt, m_tile, p.k_pad),
                         lambda i, mi, _gpt=gpt, _ot=oc_tile, _ct=p.col_tile:
                         (((i * _ot) // _ct) // _gpt, mi, 0), memory_space=pltpu.VMEM),
            sign_spec,
            pl.BlockSpec((p.side_val.shape[0], oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, oc_tile), lambda i, mi: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, oc_tile), lambda i, mi: (mi, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # in larger programs XLA may pin the kernel OUTPUT in VMEM
            # (S(1)), pushing the whole-oc decode tile past the 16 MB scoped
            # default by <1 MB — give headroom (v5e: 128 MB VMEM).  64 MB:
            # a speculative-verify window (m = slots·(γ+1) rows) at the
            # whole-oc down_proj tile measured 42.2 MB against the previous
            # 40 MB limit (double-buffered operands exceed the naive sum)
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m_pad * ic * oc,
            bytes_accessed=ic * oc // 8 + p.k_pad * oc + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_in, xg, sign_in, p.side_val, coef)
    return out[:m]


def _v2_dequant_kernel(s_ref, coef_ref, w_ref, *, ic: int, oc_tile: int,
                       pack_block: int, low_bits: int = 1):
    """Binary-part dequant: w_bin = β + α·code2 written tile-by-tile (code2
    = Σ_j 2^j · bits2_j; one plane for the 1-bit methods).  Pure VPU + DMA
    (extraction ~40 µs for a full 4096x11008 layer; the 2-byte/w write
    dominates).  Salient rows still carry β here — the caller installs
    them with one XLA row scatter."""
    strips = []
    w_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        for b in range(WORD_BITS):
            acc = _bit_plane_two(s_ref[0, w_off : w_off + g, :], b)
            for j in range(1, low_bits):
                acc = acc + (2.0 ** j) * _bit_plane_two(
                    s_ref[j, w_off : w_off + g, :], b)
            strips.append(acc)  # rows land in natural order
        w_off += g
    code2 = jnp.concatenate(strips, axis=0)  # [ic, oc_tile]
    alpha = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    w_ref[:] = (beta + alpha * code2).astype(w_ref.dtype)


def _dequant_v2_binary(p: PackedLinearV2, dtype=jnp.bfloat16,
                       oc_tile: Optional[int] = None,
                       interpret: bool = False) -> jnp.ndarray:
    """Binary-part weight [ic, oc] (salient rows carry β; see callers)."""
    ic, oc = p.ic_local, p.oc_local
    if oc_tile is None:
        oc_tile = _default_oc_tile(oc)
    scale = p.low_scale[0].astype(jnp.float32)
    mean = p.low_mean[0].astype(jnp.float32)
    if p.low_bits == 1:
        alpha = scale  # bit planes carry {0,2}: w_bin = (mean-scale) + 2·scale·bit
        beta = mean - scale
    else:
        alpha = 0.5 * scale  # uniform code: scale·(code − zero)
        beta = -scale * mean
    coef = jnp.stack([alpha, beta], axis=0)

    wpp = p.words_per_plane
    kernel = functools.partial(
        _v2_dequant_kernel, ic=ic, oc_tile=oc_tile, pack_block=p.pack_block_local,
        low_bits=p.low_bits,
    )
    w_bin = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ic, oc), dtype),
        grid=(oc // oc_tile,),
        in_specs=[
            pl.BlockSpec((p.low_bits, wpp, oc_tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ic, oc_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # XLA may pin the kernel output in VMEM (S(1)) in big programs —
            # same headroom as the planar kernels (v5e: 128 MB VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * ic * oc,
            bytes_accessed=ic * oc // 8 + ic * oc * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(p.sign_packed.reshape(p.low_bits, wpp, oc), coef)
    return w_bin


def dequant_v2_binary_xla(p: PackedLinearV2, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Pure-XLA binary-part dequant: same output as `_dequant_v2_binary` but
    expressed as broadcast shift/AND on the uint32 planes, letting XLA fuse
    the whole extraction into one HBM pass with no Pallas kernel boundary.
    Prefill-variant experiment (docs/ROADMAP.md item 1c): whether XLA's
    fusion of extraction → bf16 write beats the Pallas dequant kernel is a
    measured question (`scripts/bench_v2_prefill.py` ARMS=extract)."""
    ic, oc = p.ic_local, p.oc_local
    scale = p.low_scale[0].astype(jnp.float32)
    mean = p.low_mean[0].astype(jnp.float32)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)[:, None, None]
    wpp = p.words_per_plane

    def plane(j):
        ws = p.sign_packed[j * wpp : (j + 1) * wpp]
        parts = []
        w_off = 0
        for rows in packing.block_sizes(ic, p.pack_block_local):
            g = rows // WORD_BITS
            blk = ws[w_off : w_off + g]
            bits = (blk[None, :, :] >> shifts) & jnp.uint32(1)  # [32, g, oc]
            parts.append(bits.reshape(rows, oc))
            w_off += g
        return jnp.concatenate(parts, axis=0).astype(jnp.float32)  # {0,1}

    if p.low_bits == 1:
        beta = mean - scale
        return (beta[None, :] + (2.0 * scale)[None, :] * plane(0)).astype(dtype)
    code = plane(0)
    for j in range(1, p.low_bits):
        code = code + (2.0 ** j) * plane(j)
    return ((code - mean[None, :]) * scale[None, :]).astype(dtype)


def dequant_v2_pallas(p: PackedLinearV2, dtype=jnp.bfloat16,
                      oc_tile: Optional[int] = None,
                      interpret: bool = False) -> jnp.ndarray:
    """Full dequantized weight [ic, oc] from v2 planes: Pallas extracts the
    binary part, then one XLA row-scatter installs the salient columns
    (global selection, n_row_groups == 1).  ~6x less HBM read than a dense
    checkpoint.  NOTE: the functional scatter copies the tensor (~220 µs at
    llama-7b MLP shape) — the prefill matmul path avoids it with a second
    correction dot (`_v2_prefill_call`); use this helper for export /
    materialization, not the hot path."""
    ic = p.ic_local
    w_bin = _dequant_v2_binary(p, dtype=dtype, oc_tile=oc_tile, interpret=interpret)

    # salient rows: hs·(code − hz); sentinel slots (local idx == shard
    # width) map out of range and drop
    kps = p.k_pad_shard_local
    ic_s = p.ic_shard_local
    idx_l = p.side_idx[:, 0]  # [k_pad] (global selection: one row group)
    shard_off = (jnp.arange(idx_l.shape[0], dtype=jnp.int32) // kps) * ic_s
    idx_g = jnp.where(idx_l == ic_s, jnp.int32(ic), idx_l + shard_off)
    from ..core.pbw import unpack_side_codes

    codes = unpack_side_codes(p.side_val, p.side_bits, p.shards_local)
    vals = (codes.astype(jnp.float32) - p.high_zero[None, :]) * p.high_scale[None, :]
    return w_bin.at[idx_g, :].set(vals.astype(dtype), mode="drop")


def _v2_prefill_call(x, p: PackedLinearV2, oc_tile: int, interpret: bool, dot_dtype,
                     gather: str = "take", extract: str = "pallas"):
    """Hybrid prefill: Pallas extracts the binary weight (cheap HBM stream),
    XLA runs the heavy dots at full MXU rate (Mosaic's large-m dot lowers
    ~2.5x below XLA's matmul — scripts/bench_pallas_matmul.py).

    Salient columns ride a SECOND small dot instead of a weight scatter
    (a functional `.at[rows].set` copies the whole 90 MB tensor — measured
    ~220 µs at llama-7b MLP shape):

        y = x @ w_bin + x[:, cols] @ (hs·(V − hz) − β) + bias

    w_bin rows at salient columns carry β (B′ is zeroed there), so the
    correction matrix subtracts β once.  Sentinel slots gather an appended
    zero column of x and vanish.  Falls back to the planar kernel for
    row-grouped layouts (n_row_groups > 1), where the salient set differs
    per oc group and no single correction dot exists."""
    if p.n_row_groups != 1:
        return _planar_v2_call(x, p, oc_tile, interpret, dot_dtype)
    m, ic = x.shape
    if extract == "xla":
        w_bin = dequant_v2_binary_xla(p, dtype=dot_dtype)
    else:
        w_bin = _dequant_v2_binary(p, dtype=dot_dtype, oc_tile=oc_tile, interpret=interpret)

    kps = p.k_pad_shard_local
    ic_s = p.ic_shard_local
    idx_l = p.side_idx[:, 0]  # [k_pad] shard-local, sentinel == ic_s
    shard_off = (jnp.arange(idx_l.shape[0], dtype=jnp.int32) // kps) * ic_s
    idx_g = jnp.where(idx_l == ic_s, jnp.int32(ic), idx_l + shard_off)

    xf = x.astype(jnp.float32)
    if gather == "dot":
        # XLA gathers are slow on TPU at large m — select the k_pad salient
        # columns with a one-hot MXU dot instead (sentinel slots match no
        # row → zero column).  HIGHEST precision: the multiplier is exactly
        # 1.0, so the bf16 passes reproduce x to f32-split accuracy.
        sel = (idx_g[None, :] == jnp.arange(ic, dtype=jnp.int32)[:, None])
        xg = jnp.dot(xf, sel.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    else:
        xpad = jnp.concatenate([xf, jnp.zeros((m, 1), jnp.float32)], axis=1)
        xg = jnp.take(xpad, idx_g, axis=1)  # [m, k_pad]; sentinels hit the zero col

    from ..core.pbw import unpack_side_codes

    codes = unpack_side_codes(p.side_val, p.side_bits, p.shards_local)
    if p.low_bits == 1:
        beta = p.low_mean[0].astype(jnp.float32) - p.low_scale[0].astype(jnp.float32)
    else:
        beta = -(p.low_scale[0] * p.low_mean[0]).astype(jnp.float32)
    corr = ((codes.astype(jnp.float32) - p.high_zero[None, :])
            * p.high_scale[None, :] - beta[None, :])

    def dot(a, b):
        a, b = a.astype(dot_dtype), b.astype(dot_dtype)
        if dot_dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
            # CPU XLA has no bf16xbf16→f32 dot; bf16-rounded inputs with f32
            # accumulation is numerically what the TPU MXU does anyway
            a, b = a.astype(jnp.float32), b.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    y = dot(x, w_bin) + dot(xg, corr)
    if p.bias is not None:
        y = y + p.bias
    return y


def _planar_v2_dma_kernel(x_ref, xg_ref, coef_ref, s_hbm, v_hbm, o_ref,
                          s_buf, v_buf, sems, *, ic: int, oc: int,
                          pack_block: int, side_bits: int, shards: int):
    """Planar v2 decode with MANUAL double-buffered DMA: the sign planes stay
    in HBM and stream per pack block into a 2-slot VMEM scratch while the
    previous block's 32 bit-plane dots run — with grid=1 (the whole-oc tile
    that measured fastest) Mosaic otherwise serializes the full operand DMA
    before any compute, leaving the ~12.5 µs stream (llama-7b MLP shape)
    un-overlapped under the ~23 µs VPU extraction.  The sidecar DMA is
    kicked off first and awaited only before the salient dot."""
    blocks = packing.block_sizes(ic, pack_block)
    gs = [r // WORD_BITS for r in blocks]
    w_offs = [0]
    r_offs = [0]
    for r, g in zip(blocks, gs):
        w_offs.append(w_offs[-1] + g)
        r_offs.append(r_offs[-1] + r)

    def s_copy(slot, bi):
        g = gs[bi]
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(w_offs[bi], g)],
            s_buf.at[slot, pl.ds(0, g)],
            sems.at[slot],
        )

    def v_copy():
        return pltpu.make_async_copy(v_hbm, v_buf, sems.at[2])

    v_copy().start()
    s_copy(0, 0).start()

    xb = x_ref[:]
    mrows = xb.shape[0]
    acc_b = jnp.zeros((mrows, oc), jnp.float32)
    for bi, rows in enumerate(blocks):
        g = gs[bi]
        slot = bi % 2
        if bi + 1 < len(blocks):
            s_copy((bi + 1) % 2, bi + 1).start()
        s_copy(slot, bi).wait()
        ws = s_buf[slot, 0:g, :]
        r_off = r_offs[bi]
        for b in range(WORD_BITS):
            xs = xb[:, r_off + b * g : r_off + (b + 1) * g]
            acc_b += jnp.dot(xs, _bit_plane_two(ws, b),
                             preferred_element_type=jnp.float32)

    v_copy().wait()
    acc_v, rowsum_g = _v2_salient_terms(
        xg_ref, v_buf, mrows, oc, oc, side_bits, shards, jnp.float32)

    rowsum = jnp.sum(xb, axis=1, keepdims=True)
    alpha = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    o_ref[:] = rowsum * beta + acc_b * alpha + acc_v * hs + rowsum_g * gamma + bias


def _planar_v2_dma_call(x, p: PackedLinearV2, interpret: bool):
    """Whole-oc planar v2 call with manual HBM→VMEM streaming (see kernel).
    Requires the global-selection layout (n_row_groups == 1)."""
    m, ic = x.shape
    oc = p.oc_local
    m_pad = _round_up(max(m, 8), 8)
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))
    xg = jnp.transpose(gather_x_v2(xp, p), (2, 0, 1))  # [1, m_pad, k_pad]

    scale = p.low_scale[0].astype(jnp.float32)
    mean = p.low_mean[0].astype(jnp.float32)
    alpha = scale
    beta = mean - scale
    gamma = -p.high_scale * p.high_zero - beta
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)
    coef = jnp.stack([alpha, beta, gamma, p.high_scale, bias], axis=0)

    pack_block = p.pack_block_local
    g_max = max(r // WORD_BITS for r in packing.block_sizes(ic, pack_block))
    kernel = functools.partial(
        _planar_v2_dma_kernel, ic=ic, oc=oc, pack_block=pack_block,
        side_bits=p.side_bits, shards=p.shards_local,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # xg
            pl.BlockSpec(memory_space=pltpu.VMEM),   # coef
            pl.BlockSpec(memory_space=pltpu.ANY),    # sign planes (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),    # sidecar codes (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, g_max, oc), jnp.uint32),
            pltpu.VMEM(p.side_val.shape, jnp.uint8),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * m_pad * ic * oc,
            bytes_accessed=ic * oc // 8 + p.k_pad * oc + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xg, coef, p.sign_packed, p.side_val)
    return out[:m]


# ---------------------------------------------------------------------------
# stacked-layer decode kernels (scan_layers serving path)
# ---------------------------------------------------------------------------
#
# Under `lax.scan` over stacked layers, slicing a layer's planes out of the
# [L, ...] arrays before a pallas call makes XLA MATERIALIZE the ~10 MB
# slice in HBM every matmul (a pallas operand read cannot fuse a dynamic
# slice the way a dense dot can) — the round-2 "scan_layers is 2.1x slower"
# decode penalty.  These kernels instead take the FULL stacked arrays plus
# the layer index as a scalar-prefetch argument: the BlockSpec index_map
# picks layer li's block straight out of HBM, so Mosaic pipelines exactly
# the per-layer bytes and nothing is materialized.


def _stacked_int8_kernel(li_ref, x8_ref, sx_ref, rs_ref, xg8_ref, rsg_ref,
                         s_ref, v_ref, coef_ref, o_ref, *, ic: int,
                         oc_tile: int, pack_block: int, side_bits: int):
    del li_ref  # consumed by the index maps
    x8 = x8_ref[:]
    mrows = x8.shape[0]
    ws_all = s_ref[0]
    acc_b = jnp.zeros((mrows, oc_tile), jnp.int32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = ws_all[w_off : w_off + g, :]
        for b in range(8):
            xs = x8[:, r_off + b * 4 * g : r_off + (b + 1) * 4 * g]
            acc_b += jnp.dot(xs, _bit_plane_bytes_int8(ws, b),
                             preferred_element_type=jnp.int32)
        w_off += g
        r_off += rows

    # sidecar on the int8 MXU: offset-binary codes with the +128 correction
    # added pre-hs against the exact f32 rowsum — ONE implementation shared
    # with the flat kernel (stacked layouts are un-sharded → shards=1)
    acc_v = _v2_salient_dot_int8(xg8_ref[:], v_ref[0], side_bits, 1)

    sx = sx_ref[:]
    rsg = rsg_ref[:]
    alpha2 = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    y_bin = (acc_b.astype(jnp.float32) * sx) * alpha2
    side_f = acc_v.astype(jnp.float32) * sx
    if side_bits == 8:
        side_f = side_f + 128.0 * rsg
    o_ref[:] = rs_ref[:] * beta + y_bin + side_f * hs + rsg * gamma + bias


def _stacked_f32_kernel(li_ref, x_ref, xg_ref, s_ref, v_ref, coef_ref, o_ref,
                        *, ic: int, oc_tile: int, pack_block: int,
                        side_bits: int):
    del li_ref
    xb = x_ref[:]
    mrows = xb.shape[0]
    ws_all = s_ref[0]
    acc_b = jnp.zeros((mrows, oc_tile), jnp.float32)
    w_off = r_off = 0
    for rows in packing.block_sizes(ic, pack_block):
        g = rows // WORD_BITS
        ws = ws_all[w_off : w_off + g, :]
        for b in range(WORD_BITS):
            xs = xb[:, r_off + b * g : r_off + (b + 1) * g]
            acc_b += jnp.dot(xs, _bit_plane_two(ws, b),
                             preferred_element_type=jnp.float32)
        w_off += g
        r_off += rows

    raw = v_ref[0].astype(jnp.int32)
    if side_bits == 4:
        raw = jnp.concatenate([raw & 0xF, raw >> 4], axis=0)
    xg = xg_ref[:]
    acc_v = jnp.dot(xg, raw.astype(jnp.float32), preferred_element_type=jnp.float32)
    rowsum_g = jnp.broadcast_to(jnp.sum(xg, axis=1, keepdims=True), (mrows, oc_tile))

    rowsum = jnp.sum(xb, axis=1, keepdims=True)
    alpha = coef_ref[0:1, :]
    beta = coef_ref[1:2, :]
    gamma = coef_ref[2:3, :]
    hs = coef_ref[3:4, :]
    bias = coef_ref[4:5, :]
    o_ref[:] = (rowsum * beta + acc_b * alpha + acc_v * hs
                + rowsum_g * gamma + bias)


def stacked_supported_v2(sp: PackedLinearV2) -> bool:
    """Stacked (scan_layers) kernel support: global column selection,
    un-sharded sidecar, lane/sublane-aligned dims."""
    L, wpp, oc = sp.sign_packed.shape
    ic = wpp * WORD_BITS
    if sp.side_idx.shape[2] != 1:  # n_row_groups
        return False
    if sp.low_bits != 1:  # multi-bit planes: per-layer fallback path
        return False
    if sp.k_pad_shard and sp.k_pad_shard != sp.side_val.shape[1] * (8 // sp.side_bits):
        return False  # sharded sidecar layouts take the fallback
    if oc % 128 or ic % 32:
        return False
    pb = min(sp.pack_block, ic)
    if ic > pb and ic % pb:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("interpret", "oc_tile", "decode_dot"))
def pb_matmul_pallas_v2_stacked(
    x: jnp.ndarray,
    sp: PackedLinearV2,
    li: jnp.ndarray,
    interpret: bool = False,
    oc_tile: int | None = None,
    decode_dot: str = "f32",
) -> jnp.ndarray:
    """y = x @ dequant_v2(layer li of sp) — sp's array fields carry a
    leading [L] layer axis (`models.stacking.stack_layers`), li is a traced
    scalar.  The big planes (sign bits, sidecar codes) ride scalar-prefetch
    BlockSpecs indexed by li; only the tiny per-layer scales/indices are
    sliced in XLA."""
    m, ic = x.shape
    L, wpp, oc = sp.sign_packed.shape
    assert ic == wpp * WORD_BITS, f"x ic {ic} != stacked packed ic {wpp * 32}"
    kp_rows = sp.side_val.shape[1]
    k_pad = kp_rows * (8 // sp.side_bits)
    pack_block = min(sp.pack_block, ic)
    if oc_tile is None:
        oc_tile = oc  # whole-oc measured fastest at decode m

    li_arr = jnp.asarray(li, jnp.int32).reshape(1)
    side_idx_l = sp.side_idx[li, :, 0]          # [k_pad]
    scale = sp.low_scale[li, 0].astype(jnp.float32)
    mean = sp.low_mean[li, 0].astype(jnp.float32)
    hs_l = sp.high_scale[li]
    hz_l = sp.high_zero[li]
    bias_l = sp.bias[li] if sp.bias is not None else jnp.zeros((oc,), jnp.float32)
    beta = mean - scale
    gamma = -hs_l * hz_l - beta

    m_pad = _round_up(max(m, 16), 16)  # 16-sublane int8 blocks (see flat call)
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))
    x_aug = jnp.concatenate([xp, jnp.zeros((m_pad, 1), jnp.float32)], axis=1)
    idx_g = jnp.where(side_idx_l == ic, jnp.int32(ic), side_idx_l)
    xg = jnp.take(x_aug, idx_g, axis=1)          # [m_pad, k_pad]

    common_params = dict(
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ic * oc,
            bytes_accessed=ic * oc // 8 + k_pad * oc + m_pad * (ic + oc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )
    if decode_dot == "int8":
        absmax = jnp.max(jnp.abs(xp), axis=1, keepdims=True)
        sx = jnp.maximum(absmax, jnp.float32(1e-30)) / 127.0
        xq = jnp.clip(jnp.round(xp / sx), -127, 127).astype(jnp.int8)
        x8 = byte_permute_x(xq, ic, pack_block)
        rs = jnp.sum(xp, axis=1, keepdims=True)
        rsg = jnp.sum(xg, axis=1, keepdims=True)  # exact f32 Σ_salient x
        xg8 = jnp.clip(jnp.round(xg / sx), -127, 127).astype(jnp.int8)
        coef = jnp.stack([2.0 * scale, beta, gamma, hs_l, bias_l], axis=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(oc // oc_tile,),
            in_specs=[
                pl.BlockSpec((m_pad, ic), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, k_pad), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((m_pad, 1), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, wpp, oc_tile), lambda i, li: (li[0], 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, kp_rows, oc_tile), lambda i, li: (li[0], 0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((5, oc_tile), lambda i, li: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, oc_tile), lambda i, li: (0, i), memory_space=pltpu.VMEM),
        )
        kernel = functools.partial(
            _stacked_int8_kernel, ic=ic, oc_tile=oc_tile,
            pack_block=pack_block, side_bits=sp.side_bits)
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
            grid_spec=grid_spec, **common_params,
        )(li_arr, x8, sx, rs, xg8, rsg, sp.sign_packed, sp.side_val, coef)
        return out[:m]

    coef = jnp.stack([scale, beta, gamma, hs_l, bias_l], axis=0)
    m_pad_f = _round_up(max(m, 8), 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(oc // oc_tile,),
        in_specs=[
            pl.BlockSpec((m_pad_f, ic), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad_f, k_pad), lambda i, li: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wpp, oc_tile), lambda i, li: (li[0], 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp_rows, oc_tile), lambda i, li: (li[0], 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((5, oc_tile), lambda i, li: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_pad_f, oc_tile), lambda i, li: (0, i), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _stacked_f32_kernel, ic=ic, oc_tile=oc_tile,
        pack_block=pack_block, side_bits=sp.side_bits)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((m_pad_f, oc), jnp.float32),
        grid_spec=grid_spec, **common_params,
    )(li_arr, xp[:m_pad_f], xg[:m_pad_f], sp.sign_packed, sp.side_val, coef)
    return out[:m]


# decode path stays planar below this m; prefill dequantizes + XLA-dots
_V2_PREFILL_M = 256


def _aligned_oc_tile_v2(p: PackedLinearV2) -> int:
    """oc tile respecting ROW-GROUP alignment: a tile must either span whole
    groups or sit inside one (the kernels' per-chunk sidecar loop assumes
    uniform chunks) — a tile straddling a group boundary would apply group
    0's gathered x to group 1's columns (silently wrong).  Returns 0 when
    no aligned tile exists (dispatch falls back to the XLA reference)."""
    oc, ct = p.oc_local, p.col_tile
    for cand in (512, 256, 128):
        if oc % cand == 0 and (ct >= oc or ct % cand == 0):
            return cand
    if ct >= oc or oc % ct == 0:
        return oc  # whole-oc tile: chunk loop walks the groups
    return 0


def _decode_oc_tile_v2(p: PackedLinearV2, m: int) -> int:
    """One whole-oc tile when the planes fit VMEM (measured 39.8 vs 51.8 µs
    at 4096×11008 m=8 on v5e — a 43-tile grid costs ~12 µs of overhead);
    otherwise the generic (group-aligned) tile."""
    oc = p.oc_local
    m_tile = min(_round_up(max(m, 8), 8), 256)
    vmem = ((p.ic_local // 32) * oc * 4 + p.side_val.shape[0] * oc
            + m_tile * (p.ic_local + oc) * 4 + 5 * oc * 4)
    if vmem < _PLANAR_VMEM_CAP and p.col_tile >= oc:
        return oc
    return _aligned_oc_tile_v2(p) or _default_oc_tile(oc)


def _decode_oc_tile_v2_int8(p: PackedLinearV2, m: int) -> int:
    """int8 decode tile: HALF-oc when it stays lane- and group-aligned —
    the 2-step grid overlaps tile 1's DMA with tile 0's dots (measured 17.3
    vs 17.8 µs whole-oc at llama-7b MLP shape, same-run arms; >2 tiles lose
    to per-tile overhead: 43 tiles measured 36.4 µs).  Fused (multi-group)
    layers tile on whole GROUPS: half-oc when it spans whole groups
    (gate|up: 2 groups → 1 group per tile), else one group per tile
    (qkv: 3 tiles) — a tile straddling a group boundary is wrong."""
    oc, ct = p.oc_local, p.col_tile
    if ct >= oc:
        if oc % 256 == 0:
            return oc // 2
        return _decode_oc_tile_v2(p, m)
    if oc % ct == 0:
        half = oc // 2
        if half % ct == 0 and half % 128 == 0:
            return half
        return ct
    return _decode_oc_tile_v2(p, m)


def pallas_supported_v2(p: PackedLinearV2) -> bool:
    ic, oc = p.ic_local, p.oc_local
    if oc % 128 != 0 or ic % 32 != 0:
        return False
    if ic > p.pack_block_local and ic % p.pack_block_local != 0:
        return False
    if p.col_tile < oc and oc % p.col_tile:
        return False  # per-chunk loops assume uniform row groups
    return _aligned_oc_tile_v2(p) != 0


@functools.partial(jax.jit, static_argnames=(
    "interpret", "oc_tile", "prefill_bf16", "prefill_gather", "prefill_extract",
    "decode_dot", "prefill_int8"))
def pb_matmul_pallas_v2(
    x: jnp.ndarray,
    p: PackedLinearV2,
    interpret: bool = False,
    oc_tile: int | None = None,
    prefill_bf16: bool = False,
    prefill_gather: str = "take",
    prefill_extract: str = "pallas",
    decode_dot: str = "f32",
    prefill_int8: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant_v2(p) (+ bias); x [m, ic] → y [m, oc] float32.

    ``decode_dot`` picks the small-m (decode) kernel's dot path:
      * ``"f32"``  — exact f32 bit-plane dots (parity default);
      * ``"int8"`` — byte-lane int8 extraction + int8 MXU dots, x quantized
        per row to absmax int8 (fastest measured: 18.9 vs 27.0 µs f32 at
        llama-7b MLP decode shape; exact whenever x is int8-representable);
      * ``"dma"``  — f32 dots with MANUAL double-buffered HBM streaming of
        the planes (exact; global-selection layouts, m ≤ 256);
      * ``"bf16"`` — operands cast to bf16 (3 VPU ops/bit);
      * ``"pair"`` — paired bf16 planes via one shift+AND per bit PAIR
        (k-doubled bf16 dots).
    bf16/pair round only x (planes/codes are bf16-exact); engine-grade."""
    m, ic = x.shape
    assert ic == p.ic_local, f"x ic {ic} != packed ic {p.ic_local}"
    if m >= _V2_PREFILL_M:
        if prefill_int8 and p.low_bits == 1:
            # fused int8 byte-lane kernel at large m: int8 MXU dots (~2x
            # bf16 FLOPs) and NO 90 MB w_bin round-trip; opt-in like
            # prefill_bf16 (x rounds to per-row absmax int8)
            return _planar_v2_int8_call(
                x, p,
                oc_tile if oc_tile is not None
                else (_aligned_oc_tile_v2(p) or _default_oc_tile(p.oc_local)),
                interpret)
        if oc_tile is None:
            # group-aligned tile (scratch [ic, oc_tile] caps it)
            oc_tile = _aligned_oc_tile_v2(p) or _default_oc_tile(p.oc_local)
        dot_dtype = jnp.bfloat16 if prefill_bf16 else jnp.float32
        return _v2_prefill_call(x, p, oc_tile, interpret, dot_dtype,
                                gather=prefill_gather, extract=prefill_extract)
    if decode_dot == "int8" and m <= 256 and p.low_bits == 1:
        return _planar_v2_int8_call(
            x, p,
            oc_tile if oc_tile is not None else _decode_oc_tile_v2_int8(p, m),
            interpret)
    if decode_dot == "dma" and p.n_row_groups == 1 and m <= 256 and p.low_bits == 1:
        return _planar_v2_dma_call(x, p, interpret)
    if oc_tile is None:
        oc_tile = _decode_oc_tile_v2(p, m)
    if decode_dot == "pair" and p.low_bits == 1:
        return _planar_v2_call(x, p, oc_tile, interpret, jnp.bfloat16, pair=True)
    dd = jnp.bfloat16 if decode_dot == "bf16" else jnp.float32
    return _planar_v2_call(x, p, oc_tile, interpret, dd)


# ---------------------------------------------------------------------------
# select kernel (general groupsize fallback)
# ---------------------------------------------------------------------------


def _unpack_tile(words, ic_tile: int, oc_tile: int, pack_block: int) -> jnp.ndarray:
    """uint32 [ic_tile//32, oc_tile] → {0,1} f32 [ic_tile, oc_tile] (tile must
    be a whole number of pack blocks, or a single short block)."""
    if ic_tile % pack_block == 0 and ic_tile >= pack_block:
        n_blk, g = ic_tile // pack_block, pack_block // WORD_BITS
    else:
        n_blk, g = 1, ic_tile // WORD_BITS
    w4 = words.reshape(n_blk, 1, g, oc_tile)
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (n_blk, WORD_BITS, g, oc_tile), 1)
    rows = (w4 >> shifts) & jnp.uint32(1)
    # Mosaic can't cast uint32→f32 directly; bounce through int32.
    return rows.reshape(ic_tile, oc_tile).astype(jnp.int32).astype(jnp.float32)


def _select_kernel(
    x_ref, sign_ref, mask_ref, side_ref, lscale_ref, lmean_ref, hscale_ref, hzero_ref, bias_ref,
    out_ref, w_scratch,
    *, ic_tile: int, oc_tile: int, n_ic_tiles: int, groupsize: int, pack_block: int, sidecar_bits: int, low_bits: int, dot_dtype,
):
    # grid (oc, ic, m): m innermost so the reconstructed weight tile is built
    # once per (oc, ic) tile and reused for every m tile from scratch
    j = pl.program_id(1)
    mi = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(mi == 0)
    def _():
        w_scratch[:] = _reconstruct_tile(
            sign_ref, mask_ref, side_ref, lscale_ref, lmean_ref, hscale_ref, hzero_ref,
            j=j, ic_tile=ic_tile, oc_tile=oc_tile, groupsize=groupsize,
            pack_block=pack_block, sidecar_bits=sidecar_bits, low_bits=low_bits,
        ).astype(dot_dtype)

    out_ref[:] += jnp.dot(
        x_ref[:].astype(dot_dtype), w_scratch[:], preferred_element_type=jnp.float32
    )

    @pl.when(j == n_ic_tiles - 1)
    def _():
        out_ref[:] += bias_ref[:]


def _reconstruct_tile(
    sign_ref, mask_ref, side_ref, lscale_ref, lmean_ref, hscale_ref, hzero_ref,
    *, j, ic_tile: int, oc_tile: int, groupsize: int, pack_block: int, sidecar_bits: int, low_bits: int,
):
    if low_bits == 1:
        code = _unpack_tile(sign_ref[0], ic_tile, oc_tile, pack_block)
    else:
        code = sum(
            (2.0**jj) * _unpack_tile(sign_ref[jj], ic_tile, oc_tile, pack_block)
            for jj in range(low_bits)
        )
    mbits = _unpack_tile(mask_ref[:], ic_tile, oc_tile, pack_block)

    def _bin(code_rows, sc, mu):
        if low_bits == 1:
            return mu + (2.0 * code_rows - 1.0) * sc
        return sc * (code_rows - mu)  # low_mean holds the zero point

    if groupsize >= ic_tile:
        g0 = (j * ic_tile) // groupsize
        scale = lscale_ref[pl.ds(g0, 1), :]
        mean = lmean_ref[pl.ds(g0, 1), :]
        w_bin = _bin(code, scale, mean)
    else:
        segs = ic_tile // groupsize
        parts = []
        for s in range(segs):
            gi = j * segs + s
            sc = lscale_ref[pl.ds(gi, 1), :]
            mu = lmean_ref[pl.ds(gi, 1), :]
            parts.append(_bin(code[s * groupsize : (s + 1) * groupsize, :], sc, mu))
        w_bin = jnp.concatenate(parts, axis=0)

    if sidecar_bits == 4:
        # nibble-strided within each pack block: rows [0:h)=low, [h:2h)=high —
        # natural order restored by a contiguous concat (no interleave)
        if ic_tile % pack_block == 0 and ic_tile > pack_block:
            parts = []
            for blk in range(ic_tile // pack_block):
                h = pack_block // 2
                vb = side_ref[blk * h : (blk + 1) * h, :].astype(jnp.int32)
                parts.append(jnp.concatenate([vb & 0xF, vb >> 4], axis=0))
            side = jnp.concatenate(parts, axis=0)
        else:
            vb = side_ref[:].astype(jnp.int32)
            side = jnp.concatenate([vb & 0xF, vb >> 4], axis=0)
        side_f = side.astype(jnp.float32)
    else:
        side_f = side_ref[:].astype(jnp.int32).astype(jnp.float32)
    w_hi = hscale_ref[:] * (side_f - hzero_ref[:])
    return w_bin + mbits * (w_hi - w_bin)


def _select_call(x, p: PackedLinear, oc_tile: int, interpret: bool, dot_dtype=jnp.float32):
    m, ic = x.shape
    oc = p.oc_local
    pack_block = p.pack_block_local
    ic_tile = pack_block if ic > pack_block else ic
    n_ic_tiles = ic // ic_tile
    # tile the batch dimension too — prefill m can be thousands and the x/out
    # blocks must fit VMEM alongside the reconstructed weight tile
    m_tile = 256 if m > 256 else _round_up(max(m, 8), 8)
    m_pad = _round_up(max(m, 8), m_tile)
    n_m_tiles = m_pad // m_tile
    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)
    wrows = ic_tile // WORD_BITS

    kernel = functools.partial(
        _select_kernel, ic_tile=ic_tile, oc_tile=oc_tile, n_ic_tiles=n_ic_tiles,
        groupsize=p.groupsize_local, pack_block=pack_block, sidecar_bits=p.sidecar_bits,
        low_bits=p.low_bits, dot_dtype=dot_dtype,
    )
    wpp = p.words_per_plane
    sign3 = p.sign_packed.reshape(p.low_bits, wpp, oc)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=(oc // oc_tile, n_ic_tiles, n_m_tiles),
        in_specs=[
            pl.BlockSpec((m_tile, ic_tile), lambda i, j, mi: (mi, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.low_bits, wrows, oc_tile), lambda i, j, mi: (0, j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((wrows, oc_tile), lambda i, j, mi: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ic_tile // (2 if p.sidecar_bits == 4 else 1), oc_tile), lambda i, j, mi: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.n_groups, oc_tile), lambda i, j, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((p.n_groups, oc_tile), lambda i, j, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_tile), lambda i, j, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_tile), lambda i, j, mi: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc_tile), lambda i, j, mi: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, oc_tile), lambda i, j, mi: (mi, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ic_tile, oc_tile), jnp.float32 if dot_dtype == jnp.float32 else jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(
        xp, sign3, p.mask_packed, p.sidecar,
        p.low_scale, p.low_mean,
        p.high_scale.reshape(1, -1), p.high_zero.reshape(1, -1), bias.reshape(1, -1),
    )
    return out[:m]


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

# VMEM budget for the planar kernel's resident x + per-tile planes (bytes)
_PLANAR_VMEM_CAP = 12 * 1024 * 1024


def _default_oc_tile(oc: int) -> int:
    # measured on v5e (4096x4096, m=8): 512 → 64.0 µs, 256 → 69.4, 128 → 73.5
    for cand in (512, 256, 128):
        if oc % cand == 0:
            return cand
    return oc


def _planar_ok(m: int, p: PackedLinear) -> bool:
    ic, oc = p.ic_local, p.oc_local
    gs = p.groupsize_local
    if gs < ic:
        # grouped scales run the per-block coefficient variant; every pack
        # block must sit inside one group and groups must tile ic exactly
        if ic % gs or gs % p.pack_block_local:
            return False
    m_pad = _round_up(max(m, 8), 8)
    oc_tile = _default_oc_tile(oc)
    vmem = m_pad * ic * 4 + ic * oc_tile + 2 * (ic // 32) * oc_tile * 4 + m_pad * oc_tile * 4
    return vmem < _PLANAR_VMEM_CAP


def pallas_supported(p: PackedLinear) -> bool:
    ic, oc = p.ic_local, p.oc_local
    pack_block = p.pack_block_local
    if oc % 128 != 0:
        return False
    if ic % 32 != 0:
        return False
    if ic > pack_block and ic % pack_block != 0:
        return False
    ic_tile = pack_block if ic > pack_block else ic
    gs = p.groupsize_local
    if gs < ic_tile and ic_tile % gs != 0:
        return False
    if gs > ic_tile and gs % ic_tile != 0:
        return False
    return True


@functools.partial(jax.jit, static_argnames=("interpret", "oc_tile", "prefill_bf16"))
def pb_matmul_pallas(
    x: jnp.ndarray,
    p: PackedLinear,
    interpret: bool = False,
    oc_tile: int | None = None,
    prefill_bf16: bool = False,
) -> jnp.ndarray:
    """y = x @ dequant(p) (+ bias); x [m, ic] → y [m, oc] float32.

    ``prefill_bf16``: run the large-m select path's dot in bf16 (single MXU
    pass instead of the ~6-pass f32 emulation). Engine-grade numerics (the
    reference itself runs fp16 torch); parity tests keep the f32 default.
    """
    m, ic = x.shape
    assert ic == p.ic_local, f"x ic {ic} != packed ic {p.ic_local}"
    if oc_tile is None:
        oc_tile = _default_oc_tile(p.oc_local)
    # planar runs 3 dots (B', M, V): ideal while memory/VPU-bound (decode),
    # 3x the MXU flops once compute-bound — large-m prefill reconstructs the
    # tile once and does a single dot instead (select kernel)
    if m < 256 and _planar_ok(m, p):
        return _planar_call(x, p, oc_tile, interpret)
    return _select_call(x, p, oc_tile, interpret, jnp.bfloat16 if prefill_bf16 else jnp.float32)
