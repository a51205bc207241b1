"""PBW — the partially-binarized-weights artifact format.

The reference has no packed format at all: GPTQ-PB writes reconstructed
fake-quant floats back into the dense layer (`gptq_pb/gptq.py:180-184`) and
inference is a dense fp matmul.  PBW is the TPU-native artifact this
framework is organized around; calibrator produces it, engine consumes it.

Per linear layer (logical weight ``W [oc, ic]``, stored transposed for the
``x @ W^T`` TPU matmul as planes over ``[ic, oc]``):

  sign_packed  uint32 [ic//32, oc]  sign bitplane of the binary side
                                    (bit=1 ⇔ sign=+1), strided layout
                                    (see core/packing.py)
  mask_packed  uint32 [ic//32, oc]  salient bitplane (bit=1 ⇔ 8-bit weight)
  sidecar      uint8  [ic, oc]      8-bit codes (value arbitrary = 0 where
                                    not salient)
  low_scale    f32 [n_groups, oc]   binary-side scale  (xnor: mean|w−mean|)
  low_mean     f32 [n_groups, oc]   binary-side mean added back after sign
  high_scale   f32 [oc]             8-bit side per-row scale
  high_zero    f32 [oc]             8-bit side per-row zero point
  bias         f32 [oc] | None

Dequantization (the numerics contract, = reference fake-quant values):
  w[i, o] = mask ? high_scale[o] * (sidecar[i,o] − high_zero[o])
                 : low_mean[g(i), o] + (2·bit − 1) · low_scale[g(i), o]

Binary methods whose value set is {0, s} (``sign``, ``rtn``, ``prune``;
`gptq_pb/low_quant.py:84-95`) are re-expressed at pack time in the same
two-point form via mean' = scale' = s/2, so one kernel serves all of them.
2-bit/4-bit low methods are not 1-bit representable and use the dense "sim"
format instead.

Effective bits/weight of this v1 ("bp2") layout = 1 (sign) + 1 (mask) + 8
(dense sidecar) = 10, vs 16 for bf16.  The mask is elementwise-exact, so
numerics match the reference bit-for-bit (up to the measure-zero
``sign(0)=0`` ternary case, which pack() reports as a diagnostic).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import packing


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinear:
    """One partially-binarized linear layer, bit-packed. All planes [*, oc]."""

    sign_packed: jnp.ndarray  # uint32 [ic//32, oc]
    mask_packed: jnp.ndarray  # uint32 [ic//32, oc]
    sidecar: jnp.ndarray      # uint8  [ic, oc]
    low_scale: jnp.ndarray    # f32 [n_groups, oc]
    low_mean: jnp.ndarray     # f32 [n_groups, oc]
    high_scale: jnp.ndarray   # f32 [oc]
    high_zero: jnp.ndarray    # f32 [oc]
    bias: Optional[jnp.ndarray]  # f32 [oc] or None
    ic: int = dataclasses.field(metadata=dict(static=True))
    oc: int = dataclasses.field(metadata=dict(static=True))
    groupsize: int = dataclasses.field(metadata=dict(static=True))
    # rows per independently-packed bitplane block (see core/packing.py);
    # the planar kernel's per-bit dot slices are contiguous within a block
    pack_block: int = dataclasses.field(metadata=dict(static=True), default=packing.PACK_BLOCK)
    # bits per sidecar code: 8 (dense uint8 plane) or 4 (nibble-packed,
    # --high_bit <= 4 configs; 6 bits/weight total)
    sidecar_bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    # bitplanes on the binary/low side: 1 (xnor/sign/rtn/prune) or 2/4
    # (uniform 2-bit/4-bit low methods); sign_packed stacks the planes
    # plane-major ([low_bits * ic/32, oc]). For low_bits >= 2, ``low_mean``
    # holds the uniform quantizer's zero point and the value is
    # low_scale * (code - low_mean).
    low_bits: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def n_groups(self) -> int:
        return self.low_scale.shape[0]

    # Local (possibly shard_map-sharded) dims — derived from plane shapes so
    # per-shard views inside shard_map keep working; the static ic/oc fields
    # describe the global logical layer.
    @property
    def ic_local(self) -> int:
        return self.sidecar.shape[0] * (2 if self.sidecar_bits == 4 else 1)

    @property
    def words_per_plane(self) -> int:
        return self.sign_packed.shape[0] // self.low_bits

    @property
    def oc_local(self) -> int:
        return self.sidecar.shape[1]

    @property
    def groupsize_local(self) -> int:
        return min(self.groupsize, self.ic_local)

    @property
    def pack_block_local(self) -> int:
        return min(self.pack_block, self.ic_local)

    def effective_bits(self) -> float:
        """HBM bits per logical weight of this layout."""
        n = self.ic * self.oc
        plane_bits = self.sign_packed.size * 32 + self.mask_packed.size * 32
        side_bits = self.sidecar.size * 8
        scales = (self.low_scale.size + self.low_mean.size + self.high_scale.size + self.high_zero.size) * 32
        return (plane_bits + side_bits + scales) / n


PACKABLE_METHODS = ("xnor", "sign", "rtn", "prune", "2bit", "4bit")
_LOW_BITS = {"xnor": 1, "sign": 1, "rtn": 1, "prune": 1, "2bit": 2, "4bit": 4}


def pack_linear(
    w_q: jnp.ndarray,
    mask: jnp.ndarray,
    low_state: Dict[str, jnp.ndarray],
    high_state: Dict[str, jnp.ndarray],
    method: str,
    groupsize: int = -1,
    bias: Optional[jnp.ndarray] = None,
    pack_block: Optional[int] = None,
) -> Tuple[PackedLinear, Dict[str, float]]:
    """Pack a solver output into PBW planes.

    ``w_q`` [oc, ic]: the fake-quantized weight (reference semantics — every
    entry equals either the low or the high quantizer's value).
    ``mask`` [oc, ic] bool: True ⇔ binarized (the GPTQ-PB convention,
    `gptq_pb/gptq.py:92`); the PBW salient plane stores the inverse.

    Returns the packed layer and diagnostics {pack_mismatch: fraction of
    entries whose dequantization differs from w_q}.
    """
    if method not in PACKABLE_METHODS:
        raise ValueError(f"method {method!r} is not 1-bit packable; use the 'sim' format")
    oc, ic = w_q.shape
    gs = ic if groupsize == -1 else groupsize
    if ic % 32:
        raise ValueError("pack_linear requires ic % 32 == 0 (pad upstream)")

    w_q = jnp.asarray(w_q, jnp.float32)
    mask = jnp.asarray(mask, bool)
    salient = ~mask

    low_bits = _LOW_BITS[method]
    if method == "xnor":
        low_mean = low_state["mean"].astype(jnp.float32)    # [n_groups, oc]
        low_scale = low_state["scale"].astype(jnp.float32)
    elif method in ("2bit", "4bit"):
        # uniform code c = round(q/scale + zero); value = scale*(c - zero)
        low_scale = low_state["scale"].astype(jnp.float32)
        low_mean = low_state["zero"].astype(jnp.float32)    # holds the zero point
    else:
        # {0, s} two-point value sets -> mean' = scale' = s/2 (prune: s=0).
        s = low_state["scale"].astype(jnp.float32)
        if method == "prune":
            s = jnp.zeros_like(s)
        low_mean = s / 2.0
        low_scale = s / 2.0

    # grouped layouts cap the pack block at the group size (and at a divisor
    # of it) so no bitplane block straddles a scale-group boundary — that is
    # what lets the planar decode kernel apply per-group coefficients as
    # static slices (`ops.pallas_pb._planar_kernel`)
    if pack_block is None:
        cap = gs if (gs < ic and ic % gs == 0 and gs % 32 == 0) else 2048
        pack_block = packing.default_pack_block(ic, cap=cap)
    if low_bits == 1:
        mean_rows = jnp.repeat(low_mean, gs, axis=0)[:ic]  # [ic, oc]
        # sign bit from the quantized value itself: q = mean + s*scale,
        # s = sign(q - mean); zeroed at salient positions (B' plane) so the
        # planar kernel's linear decomposition w = β + α·b′ + hs·v″ + γ·m
        # holds — the select path never reads the sign bit there
        bits = ((w_q.T - mean_rows) >= 0) & ~salient.T
        plane_list = [bits]
    else:
        scale_rows = jnp.maximum(jnp.repeat(low_scale, gs, axis=0)[:ic], 1e-20)
        zero_rows = jnp.repeat(low_mean, gs, axis=0)[:ic]
        codes_low = jnp.clip(jnp.round(w_q.T / scale_rows + zero_rows), 0, 2**low_bits - 1).astype(jnp.int32)
        codes_low = jnp.where(salient.T, 0, codes_low)  # zeroed at salient
        plane_list = [((codes_low >> j) & 1).astype(bool) for j in range(low_bits)]

    hs = high_state["scale"].astype(jnp.float32)
    hz = high_state["zero"].astype(jnp.float32)
    maxq = float(high_state.get("maxq", 255.0))
    sidecar_bits = 4 if maxq <= 15 and ic % 2 == 0 else 8
    codes = jnp.clip(jnp.round(w_q / hs[:, None] + hz[:, None]), 0, maxq)
    sidecar = jnp.where(salient, codes, 0).astype(jnp.uint8).T  # [ic, oc]
    if sidecar_bits == 4:
        sidecar = packing.pack_nibbles(sidecar, pack_block)

    packed = PackedLinear(
        sign_packed=jnp.concatenate(
            [packing.pack_bits(pl.astype(jnp.uint32), pack_block) for pl in plane_list], axis=0
        ),
        mask_packed=packing.pack_bits(salient.T.astype(jnp.uint32), pack_block),
        sidecar=sidecar,
        low_scale=low_scale,
        low_mean=low_mean,
        high_scale=hs,
        high_zero=hz,
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        ic=ic,
        oc=oc,
        groupsize=gs,
        pack_block=pack_block,
        sidecar_bits=sidecar_bits,
        low_bits=low_bits,
    )
    w_rt = dequantize(packed).T  # [oc, ic]
    diag = {"pack_mismatch": float(jnp.mean(jnp.abs(w_rt - w_q) > 1e-6))}
    return packed, diag


def dequantize(p: PackedLinear) -> jnp.ndarray:
    """Pure-XLA dequantization to dense f32 [ic, oc] (kernel oracle).

    Uses shard-local plane shapes so it works on shard_map-local views."""
    ic = p.ic_local
    m = packing.unpack_bits(p.mask_packed, ic, p.pack_block_local).astype(bool)
    mean_rows = jnp.repeat(p.low_mean, p.groupsize_local, axis=0)[:ic]
    scale_rows = jnp.repeat(p.low_scale, p.groupsize_local, axis=0)[:ic]
    wpp = p.words_per_plane
    if p.low_bits == 1:
        bits = packing.unpack_bits(p.sign_packed, ic, p.pack_block_local).astype(jnp.float32)
        w_bin = mean_rows + (2.0 * bits - 1.0) * scale_rows
    else:
        code = jnp.zeros((ic, p.oc_local), jnp.float32)
        for j in range(p.low_bits):
            bits_j = packing.unpack_bits(p.sign_packed[j * wpp : (j + 1) * wpp], ic, p.pack_block_local)
            code = code + (2.0**j) * bits_j.astype(jnp.float32)
        w_bin = scale_rows * (code - mean_rows)  # low_mean holds the zero point
    side = p.sidecar
    if p.sidecar_bits == 4:
        side = packing.unpack_nibbles(side, ic, p.pack_block_local)
    w_hi = p.high_scale[None, :] * (side.astype(jnp.float32) - p.high_zero[None, :])
    return jnp.where(m, w_hi, w_bin)


def matmul_reference(x: jnp.ndarray, p: PackedLinear) -> jnp.ndarray:
    """y = x @ W (+bias) via XLA dequant — the semantics the Pallas kernel must match."""
    y = x.astype(jnp.float32) @ dequantize(p)
    if p.bias is not None:
        y = y + p.bias
    return y


# ---------------------------------------------------------------------------
# PBW v2 — column-structured salient sidecar ("colside").
#
# Round-1 measurement: the v1 dense uint8 sidecar is 8 of the 10 bits/weight
# streamed and ~115 of 177 µs of the decode kernel (docs/DESIGN.md §2), while
# the information content at low_frac=0.9 is ~1.8 bits/weight.  Random
# elementwise scatter is incompressible on TPU (no cross-lane gather), but
# real salient masks are strongly *column*-structured: the reference's
# "hessian" metric W²/diag(Hinv)² shares its divisor per input channel
# (`gptq_pb/gptq.py:84-101`) and magnitude outliers in LLMs concentrate in
# input channels.  v2 makes that structure a format constraint:
#
#   saliency is chosen as whole input-channel columns per *row group* of
#   ``col_tile`` output channels — mask[o, j] = colmask[o // col_tile, j],
#   exactly k salient columns per (row-group, ic-group).
#
# Planes (bits/weight at salient fraction f, ic=4096, col_tile=256):
#   sign_packed  uint32 [ic/32, oc]    1      (B' convention, as v1)
#   side_val     uint8  [k_pad, oc]    f·8    row-group t's codes live in its
#                                             own oc columns; row k holds the
#                                             code for column side_idx[k, t]
#   side_idx     int32  [k_pad, n_rg]  ~0.01  (padding sentinel = ic)
#   (no mask plane: the γ-term uses rowsum of the gathered x — see kernel)
#
# ≈ 1.8 bits/weight at low_frac=0.9 vs v1's 10.  Numerics are elementwise
# EXACT w.r.t. the structured mask (same dequant contract as v1 with the
# expanded mask); the structured mask itself is a *selection* change vs the
# reference's elementwise quantile — GPTQ error feedback compensates, and
# the ppl/MSE delta is measured and reported (VERDICT round-1 item 1 allows
# exactly this trade when quantified).
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinearV2:
    """Column-structured partially-binarized linear (PBW v2).

    ``ic_shards > 1`` lays the sidecar out shard-major for row-parallel TP:
    the ic axis is split into contiguous shards, each with its own exactly-k
    column selection, **shard-local** indices (sentinel = shard width) and
    its own k_pad_shard slot rows — so `P("tp", None)` over sign/side_val/
    side_idx yields per-device local views that are ordinary single-shard v2
    layers and the kernel runs unmodified inside shard_map."""

    sign_packed: jnp.ndarray  # uint32 [ic//32, oc], zeroed at salient (B')
    side_val: jnp.ndarray     # uint8  [ic_shards * k_pad_shard, oc]
    side_idx: jnp.ndarray     # int32  [ic_shards * k_pad_shard, n_row_groups], pad = shard width
    low_scale: jnp.ndarray    # f32 [1, oc] (groupsize == -1 only)
    low_mean: jnp.ndarray     # f32 [1, oc]
    high_scale: jnp.ndarray   # f32 [oc]
    high_zero: jnp.ndarray    # f32 [oc]
    bias: Optional[jnp.ndarray]
    ic: int = dataclasses.field(metadata=dict(static=True))
    oc: int = dataclasses.field(metadata=dict(static=True))
    col_tile: int = dataclasses.field(metadata=dict(static=True))
    pack_block: int = dataclasses.field(metadata=dict(static=True), default=packing.PACK_BLOCK)
    k_pad_shard: int = dataclasses.field(metadata=dict(static=True), default=0)  # 0 → side_val.shape[0]
    # sidecar code width: 8 (one code per byte) or 4 (two codes per byte,
    # low nibble = even slot row).  high_bit <= 4 packs nibbles and halves
    # the sidecar stream (effective bits ~1.4 at low_frac=0.9).  All row
    # accounting (k_pad, k_pad_shard) stays in UNPACKED slot-row units.
    side_bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    # low-code width: 1 (xnor/sign/rtn/prune sign plane) or 2/4 (the
    # reference's 2bit/4bit ablations, `gptq_pb/low_quant.py:44-65`):
    # sign_packed is then PLANE-MAJOR [low_bits * ic/32, oc] and ``low_mean``
    # holds the uniform-code zero point (value = scale * (code - zero))
    low_bits: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def words_per_plane(self) -> int:
        return self.sign_packed.shape[0] // self.low_bits

    @property
    def ic_local(self) -> int:
        return self.words_per_plane * 32

    @property
    def oc_local(self) -> int:
        return self.sign_packed.shape[1]

    @property
    def k_pad(self) -> int:
        """Total sidecar slot rows in this (possibly shard-local) view."""
        return self.side_val.shape[0] * (8 // self.side_bits)

    @property
    def k_pad_shard_local(self) -> int:
        return self.k_pad_shard or self.k_pad

    @property
    def shards_local(self) -> int:
        """ic shards visible in this view (1 inside a shard_map local view)."""
        return self.k_pad // self.k_pad_shard_local

    @property
    def ic_shard_local(self) -> int:
        return self.ic_local // self.shards_local

    @property
    def n_row_groups(self) -> int:
        return self.side_idx.shape[1]

    @property
    def pack_block_local(self) -> int:
        return min(self.pack_block, self.ic_shard_local)

    def effective_bits(self) -> float:
        n = self.ic * self.oc
        bits = self.sign_packed.size * 32 + self.side_val.size * 8 + self.side_idx.size * 32
        bits += (self.low_scale.size + self.low_mean.size + self.high_scale.size + self.high_zero.size) * 32
        return bits / n


def unpack_side_codes(side_val: jnp.ndarray, side_bits: int, shards: int = 1) -> jnp.ndarray:
    """Sidecar codes as UNPACKED uint8 [k_pad, oc].  side_bits=4 stores two
    codes per byte with BLOCK pairing per shard segment: packed row r of a
    segment holds slot rows r (low nibble) and r + kps/2 (high nibble) —
    unpacking is then a concat, not an interleave (cheap in Pallas too)."""
    if side_bits == 8:
        return side_val
    if side_bits != 4:
        raise ValueError(f"side_bits must be 4 or 8, got {side_bits}")
    lo = side_val & jnp.uint8(0x0F)
    hi = side_val >> jnp.uint8(4)
    oc = side_val.shape[1]
    seg_lo = lo.reshape(shards, -1, oc)
    seg_hi = hi.reshape(shards, -1, oc)
    return jnp.concatenate([seg_lo, seg_hi], axis=1).reshape(-1, oc)


def column_structured_mask(metric: jnp.ndarray, low_frac: float, col_tile: int,
                           ic_shards: int = 1) -> jnp.ndarray:
    """Structured salient selection: per row group of ``col_tile`` output
    channels, the top round((1-low_frac)·ic) input-channel columns by the
    row-group-summed metric are salient.  Returns mask [oc, ic] bool with the
    GPTQ-PB convention (True ⇔ binarized), constant within each row group —
    the budget matches the reference's elementwise quantile
    (`gptq_pb/gptq.py:84-101`), only the selection is column-granular.

    ``ic_shards > 1``: selection is balanced per contiguous ic shard (exactly
    round(shard_width·(1-low_frac)) columns each) so the resulting layer
    packs into the row-parallel TP layout."""
    metric = jnp.asarray(metric, jnp.float32)
    oc, ic = metric.shape
    if col_tile <= 0 or col_tile > oc:
        col_tile = oc  # global selection: one shared column set (fastest kernel)
    if ic % ic_shards:
        raise ValueError(f"ic {ic} not divisible by ic_shards {ic_shards}")
    ic_s = ic // ic_shards
    n_groups = -(-oc // col_tile)
    k = int(round(ic_s * (1.0 - low_frac)))
    rows = []
    for t in range(n_groups):
        agg = jnp.sum(metric[t * col_tile : (t + 1) * col_tile], axis=0)  # [ic]
        salient_cols = jnp.zeros((ic,), bool)
        if k:
            for s in range(ic_shards):
                seg = agg[s * ic_s : (s + 1) * ic_s]
                order = jnp.argsort(-seg)
                salient_cols = salient_cols.at[s * ic_s + order[:k]].set(True)
        rows.append(jnp.broadcast_to(~salient_cols, (metric[t * col_tile : (t + 1) * col_tile].shape[0], ic)))
    return jnp.concatenate(rows, axis=0)


def pack_linear_v2(
    w_q: jnp.ndarray,
    mask: jnp.ndarray,
    low_state: Dict[str, jnp.ndarray],
    high_state: Dict[str, jnp.ndarray],
    method: str,
    col_tile: int = 0,
    bias: Optional[jnp.ndarray] = None,
    pack_block: Optional[int] = None,
    k_multiple: int = 32,
    ic_shards: int = 1,
) -> Tuple[PackedLinearV2, Dict[str, float]]:
    """Pack into the v2 column-structured layout.

    ``mask`` [oc, ic] (True ⇔ binarized) must be column-structured per
    ``col_tile`` row group (use :func:`column_structured_mask` during
    calibration); raises if it is not, so numerics stay exact.

    ``ic_shards``: shard-major sidecar layout for row-parallel TP (local
    column indices per contiguous ic shard; see PackedLinearV2)."""
    if method not in ("xnor", "sign", "rtn", "prune", "2bit", "4bit"):
        raise ValueError(f"v2 cannot pack method {method!r}")
    low_bits = {"2bit": 2, "4bit": 4}.get(method, 1)
    oc, ic = w_q.shape
    if col_tile <= 0 or col_tile > oc:
        col_tile = oc  # global selection sentinel (see column_structured_mask)
    if ic % 32:
        raise ValueError("pack_linear_v2 requires ic % 32 == 0")
    if ic % ic_shards:
        raise ValueError(f"ic {ic} not divisible by ic_shards {ic_shards}")
    if low_bits > 1 and ic_shards > 1:
        raise ValueError("multi-bit low planes are plane-major on axis 0 and "
                         "cannot use the shard-major (ic_shards) sidecar layout")
    ic_s = ic // ic_shards

    w_q = jnp.asarray(w_q, jnp.float32)
    salient = np.asarray(~jnp.asarray(mask, bool))  # [oc, ic]
    n_rg = -(-oc // col_tile)

    # validate column structure + gather per-(row-group, shard) column lists
    idx_cols: list = []  # [n_rg][ic_shards] -> local col indices
    for t in range(n_rg):
        blk = salient[t * col_tile : (t + 1) * col_tile]
        if not (blk == blk[0:1]).all():
            raise ValueError("mask is not column-structured within row groups; "
                             "calibrate with mask_structure='column'")
        idx_cols.append([np.nonzero(blk[0, s * ic_s : (s + 1) * ic_s])[0] for s in range(ic_shards)])
    k_max = max((len(c) for cols in idx_cols for c in cols), default=0)
    k_pad = max(k_multiple, -(-k_max // k_multiple) * k_multiple) if k_max else k_multiple

    side_idx = np.full((ic_shards * k_pad, n_rg), ic_s, np.int32)  # sentinel = shard width
    for t, cols in enumerate(idx_cols):
        for s, c in enumerate(cols):
            side_idx[s * k_pad : s * k_pad + len(c), t] = c

    if method == "xnor":
        low_mean = low_state["mean"].astype(jnp.float32)
        low_scale = low_state["scale"].astype(jnp.float32)
    elif method in ("2bit", "4bit"):
        # uniform code c = round(q/scale + zero); value = scale*(c - zero)
        low_scale = low_state["scale"].astype(jnp.float32)
        low_mean = low_state["zero"].astype(jnp.float32)  # holds the zero
    else:
        s = low_state["scale"].astype(jnp.float32)
        if method == "prune":
            s = jnp.zeros_like(s)
        low_mean = s / 2.0
        low_scale = s / 2.0
    if low_scale.shape[0] != 1:
        raise ValueError("v2 requires groupsize == -1 (whole-row low groups)")

    hs = high_state["scale"].astype(jnp.float32)
    hz = high_state["zero"].astype(jnp.float32)
    maxq = float(high_state.get("maxq", 255.0))
    codes = np.asarray(jnp.clip(jnp.round(w_q / hs[:, None] + hz[:, None]), 0, maxq)).astype(np.uint8)  # [oc, ic]

    side_val = np.zeros((ic_shards * k_pad, oc), np.uint8)
    for t, cols in enumerate(idx_cols):
        lo, hi = t * col_tile, min((t + 1) * col_tile, oc)
        for s, c in enumerate(cols):
            side_val[s * k_pad : s * k_pad + len(c), lo:hi] = codes[lo:hi, s * ic_s + c].T
    # high_bit <= 4: two codes per byte — halves the sidecar stream.  BLOCK
    # pairing per shard segment (row r pairs with r + k_pad/2) so unpacking
    # is a concat, not an interleave; k_pad is a multiple of 32, so halves
    # are exact and pairs never straddle a shard segment
    side_bits = 4 if maxq <= 15 else 8
    if side_bits == 4:
        seg = side_val.reshape(ic_shards, k_pad, oc)
        half = k_pad // 2
        side_val = (seg[:, :half] | (seg[:, half:] << 4)).reshape(ic_shards * half, oc).astype(np.uint8)

    if low_bits == 1:
        mean_rows = jnp.repeat(low_mean, ic, axis=0)[:ic]
        bits = ((w_q.T - mean_rows) >= 0) & ~jnp.asarray(salient.T)
        plane_list = [bits]
    else:
        scale_rows = jnp.maximum(jnp.repeat(low_scale, ic, axis=0)[:ic], 1e-20)
        zero_rows = jnp.repeat(low_mean, ic, axis=0)[:ic]
        codes_low = jnp.clip(jnp.round(w_q.T / scale_rows + zero_rows),
                             0, 2**low_bits - 1).astype(jnp.int32)
        codes_low = jnp.where(jnp.asarray(salient.T), 0, codes_low)
        plane_list = [((codes_low >> j) & 1).astype(bool) for j in range(low_bits)]
    pack_block = pack_block or packing.default_pack_block(ic_s)
    # shard-splittable sign plane: pack blocks must never straddle a shard
    # boundary (the bit layout is block-local)
    if ic_shards > 1 and ic_s % pack_block:
        raise ValueError(f"pack_block {pack_block} must divide the ic shard width {ic_s}")

    packed = PackedLinearV2(
        sign_packed=jnp.concatenate(
            [packing.pack_bits(pl.astype(jnp.uint32), pack_block)
             for pl in plane_list], axis=0),
        side_val=jnp.asarray(side_val),
        side_idx=jnp.asarray(side_idx),
        low_scale=low_scale,
        low_mean=low_mean,
        high_scale=hs,
        high_zero=hz,
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        ic=ic, oc=oc, col_tile=col_tile, pack_block=pack_block, k_pad_shard=k_pad,
        side_bits=side_bits, low_bits=low_bits,
    )
    w_rt = dequantize_v2(packed).T
    diag = {"pack_mismatch": float(jnp.mean(jnp.abs(w_rt - w_q) > 1e-6)),
            "salient_frac": float(salient.mean()),
            "effective_bits": packed.effective_bits()}
    return packed, diag


def dequantize_v2(p: PackedLinearV2) -> jnp.ndarray:
    """Pure-XLA dequantization to dense f32 [ic, oc] (kernel oracle).

    Works on shard-local views (shards_local == 1) and on global shard-major
    layouts alike — per shard, local indices scatter into that shard's ic
    range (sentinel rows land in a per-shard sink row)."""
    ic, oc = p.ic_local, p.oc_local
    shards, ic_s, kps = p.shards_local, p.ic_shard_local, p.k_pad_shard_local
    side_val = unpack_side_codes(p.side_val, p.side_bits, p.shards_local)
    wpp = p.words_per_plane
    if p.low_bits == 1:
        bits = packing.unpack_bits(p.sign_packed, ic, p.pack_block_local).astype(jnp.float32)
        w_bin = p.low_mean[0][None, :] + (2.0 * bits - 1.0) * p.low_scale[0][None, :]
    else:
        code = jnp.zeros((ic, oc), jnp.float32)
        for j in range(p.low_bits):
            bits_j = packing.unpack_bits(
                p.sign_packed[j * wpp : (j + 1) * wpp], ic, p.pack_block_local)
            code = code + (2.0 ** j) * bits_j.astype(jnp.float32)
        # uniform code: value = scale * (code - zero); low_mean holds the zero
        w_bin = p.low_scale[0][None, :] * (code - p.low_mean[0][None, :])

    codes = jnp.zeros((ic_s + 1, shards, oc), jnp.float32)  # row ic_s = sink
    m = jnp.zeros((ic_s + 1, shards, oc), jnp.float32)
    for t in range(p.n_row_groups):
        lo, hi = t * p.col_tile, min((t + 1) * p.col_tile, oc)
        for s in range(shards):
            idx = p.side_idx[s * kps : (s + 1) * kps, t]
            colsel = jnp.zeros((ic_s + 1,), jnp.float32).at[idx].set(1.0)
            vals = jnp.zeros((ic_s + 1, hi - lo), jnp.float32).at[idx].set(
                side_val[s * kps : (s + 1) * kps, lo:hi].astype(jnp.float32))
            codes = codes.at[:, s, lo:hi].set(vals)
            m = m.at[:, s, lo:hi].set(colsel[:, None])
    codes = codes[:ic_s].transpose(1, 0, 2).reshape(ic, oc)
    m = m[:ic_s].transpose(1, 0, 2).reshape(ic, oc)
    w_hi = p.high_scale[None, :] * (codes - p.high_zero[None, :])
    return jnp.where(m > 0, w_hi, w_bin)


def matmul_reference_v2(x: jnp.ndarray, p: PackedLinearV2) -> jnp.ndarray:
    y = x.astype(jnp.float32) @ dequantize_v2(p)
    if p.bias is not None:
        y = y + p.bias
    return y


def merge_packed_linears_v2(ps) -> PackedLinearV2:
    """Concatenate same-input PackedLinearV2 layers along oc into ONE layer
    with one ROW GROUP per constituent (col_tile = each part's oc,
    side_idx [k_pad, G]) — the fused-qkv / fused-gate+up serving layout.
    Dequantization is exactly the horizontal concat of the parts' dequants
    (each group keeps its own salient column set and scales), so fusing is
    quality-neutral; it exists to cut kernel launches and x-prep per layer
    (7 → 4 packed matmuls in a llama block).

    Requires: equal ic/oc/pack_block/side_bits/k_pad, global selection
    (n_row_groups == 1) and un-sharded sidecars per part, uniform bias-ness.
    """
    p0 = ps[0]
    for p in ps:
        if not isinstance(p, PackedLinearV2):
            raise ValueError("merge_packed_linears_v2 needs PackedLinearV2 parts")
        if p.n_row_groups != 1 or p.shards_local != 1:
            raise ValueError("parts must be global-selection, un-sharded")
        if (p.ic, p.oc, p.pack_block, p.side_bits, p.low_bits, p.k_pad) != (
                p0.ic, p0.oc, p0.pack_block, p0.side_bits, p0.low_bits, p0.k_pad):
            raise ValueError("parts must agree on ic/oc/pack_block/side_bits/low_bits/k_pad")
        if (p.bias is None) != (p0.bias is None):
            raise ValueError("parts must uniformly have or lack bias")
    cat1 = lambda f: jnp.concatenate([getattr(p, f) for p in ps], axis=1)
    cat0 = lambda f: jnp.concatenate([getattr(p, f) for p in ps], axis=0)
    return PackedLinearV2(
        sign_packed=cat1("sign_packed"),
        side_val=cat1("side_val"),
        side_idx=cat1("side_idx"),
        low_scale=cat1("low_scale"),
        low_mean=cat1("low_mean"),
        high_scale=cat0("high_scale"),
        high_zero=cat0("high_zero"),
        bias=None if p0.bias is None else cat0("bias"),
        ic=p0.ic, oc=sum(p.oc for p in ps), col_tile=p0.oc,
        pack_block=p0.pack_block, k_pad_shard=0, side_bits=p0.side_bits,
        low_bits=p0.low_bits,
    )


def gather_x_v2(x: jnp.ndarray, p: PackedLinearV2) -> jnp.ndarray:
    """Per-row-group activation gather feeding the v2 kernel's sidecar dot:
    [m, ic] → [m, total_k_pad, n_row_groups]; padding indices hit an appended
    zero column per shard, so padded slots contribute nothing to either the
    value dot or the γ·rowsum term."""
    shards, ic_s, kps = p.shards_local, p.ic_shard_local, p.k_pad_shard_local
    if shards == 1:
        x_aug = jnp.concatenate([x, jnp.zeros((x.shape[0], 1), x.dtype)], axis=1)
        return x_aug[:, p.side_idx]  # [m, k_pad, n_rg]
    m = x.shape[0]
    xs = x.reshape(m, shards, ic_s)
    x_aug = jnp.concatenate([xs, jnp.zeros((m, shards, 1), x.dtype)], axis=2)  # [m, S, ic_s+1]
    idx = p.side_idx.reshape(shards, kps, p.n_row_groups)
    gat = jnp.take_along_axis(x_aug[:, :, :, None], idx[None, :, :, :], axis=2)  # [m, S, kps, n_rg]
    return gat.reshape(m, shards * kps, p.n_row_groups)


# ---------------------------------------------------------------------------
# Serialization: one .npz of planes + a json manifest of static meta.
# (The reference's closest analogues are the mask pickles `gptq_pb/gptq.py:108-114`
# and the {meta.json, weights.pth} format of `utils.py:87-124`.)
# ---------------------------------------------------------------------------

_FIELDS = ("sign_packed", "mask_packed", "sidecar", "low_scale", "low_mean", "high_scale", "high_zero", "bias")
_FIELDS_V2 = ("sign_packed", "side_val", "side_idx", "low_scale", "low_mean", "high_scale", "high_zero", "bias")


def save_pbw(path: str, layers: Dict[str, PackedLinear], extra_meta: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays = {}
    meta = {"layers": {}, "extra": extra_meta or {}}
    for name, p in layers.items():
        if isinstance(p, PackedLinearV2):
            meta["layers"][name] = {
                "format": "v2", "ic": p.ic, "oc": p.oc, "col_tile": p.col_tile,
                "pack_block": p.pack_block, "k_pad_shard": p.k_pad_shard_local,
                "side_bits": p.side_bits, "low_bits": p.low_bits,
                "has_bias": p.bias is not None,
            }
            fields = _FIELDS_V2
        else:
            meta["layers"][name] = {
                "ic": p.ic, "oc": p.oc, "groupsize": p.groupsize,
                "pack_block": p.pack_block, "sidecar_bits": p.sidecar_bits,
                "low_bits": p.low_bits, "has_bias": p.bias is not None,
            }
            fields = _FIELDS
        for f in fields:
            v = getattr(p, f)
            if v is not None:
                arrays[f"{name}::{f}"] = np.asarray(v)
    np.savez(os.path.join(path, "planes.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump(meta, fh, indent=1)


class PBWShardWriter:
    """Incremental PBW writer: one npz per layer, appended as layers finish.

    The monolithic `save_pbw` materializes every packed layer before writing
    — fine up to host RAM, wrong for streamed >RAM conversion
    (`models.hf_stream`).  This writer flushes each layer to its own
    ``planes_XXXXX.npz`` the moment it is packed and frees it; ``finalize``
    writes the same manifest schema with a ``files`` map that `load_pbw`
    reads transparently."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._meta: Dict[str, dict] = {}
        self._files: Dict[str, str] = {}
        self._n = 0

    def add_layer(self, name: str, p: "PackedLinear") -> None:
        if isinstance(p, PackedLinearV2):
            self._meta[name] = {
                "format": "v2", "ic": p.ic, "oc": p.oc, "col_tile": p.col_tile,
                "pack_block": p.pack_block, "k_pad_shard": p.k_pad_shard_local,
                "side_bits": p.side_bits, "low_bits": p.low_bits,
                "has_bias": p.bias is not None,
            }
            fields = _FIELDS_V2
        else:
            self._meta[name] = {
                "ic": p.ic, "oc": p.oc, "groupsize": p.groupsize,
                "pack_block": p.pack_block, "sidecar_bits": p.sidecar_bits,
                "low_bits": p.low_bits, "has_bias": p.bias is not None,
            }
            fields = _FIELDS
        arrays = {f"{name}::{f}": np.asarray(getattr(p, f))
                  for f in fields if getattr(p, f) is not None}
        fname = f"planes_{self._n:05d}.npz"
        np.savez(os.path.join(self.path, fname), **arrays)
        self._files[name] = fname
        self._n += 1

    def finalize(self, extra_meta: Optional[dict] = None) -> None:
        meta = {"layers": self._meta, "files": self._files, "extra": extra_meta or {}}
        with open(os.path.join(self.path, "manifest.json"), "w") as fh:
            json.dump(meta, fh, indent=1)


def install_pbw(params: Dict, layers: Dict[str, "PackedLinear"]) -> Dict:
    """Install loaded PBW layers (keys "layer_{i}/{name}") into a model param
    tree, replacing the dense leaves. Non-mutating."""
    params = dict(params)
    new_layers = [dict(lp) for lp in params["layers"]]
    for key, packed in layers.items():
        prefix, name = key.split("/", 1)
        idx = int(prefix.split("_")[1])
        new_layers[idx][name] = packed
    params["layers"] = new_layers
    return params


class _ShardedNpz:
    """planes.npz-compatible view over per-layer shard files (PBWShardWriter).

    Files open lazily per access and close immediately — a 70B artifact has
    hundreds of shards, and holding every handle open for the view's
    lifetime would chew through the fd limit."""

    def __init__(self, path: str, files: Dict[str, str]):
        self._paths = {name: os.path.join(path, fname) for name, fname in files.items()}

    def __contains__(self, key: str) -> bool:
        name = key.split("::", 1)[0]
        if name not in self._paths:
            return False
        with np.load(self._paths[name]) as z:
            return key in z.files

    def __getitem__(self, key: str) -> np.ndarray:
        with np.load(self._paths[key.split("::", 1)[0]]) as z:
            return z[key]


def load_pbw(path: str) -> Tuple[Dict[str, PackedLinear], dict]:
    with open(os.path.join(path, "manifest.json")) as fh:
        meta = json.load(fh)
    if "files" in meta:  # sharded layout (PBWShardWriter)
        z = _ShardedNpz(path, meta["files"])
    else:
        z = np.load(os.path.join(path, "planes.npz"))
    layers = {}
    for name, lm in meta["layers"].items():
        if lm.get("format") == "v2":
            kw = {f: jnp.asarray(z[f"{name}::{f}"]) for f in _FIELDS_V2 if f"{name}::{f}" in z}
            if "bias" not in kw:
                kw["bias"] = None
            layers[name] = PackedLinearV2(
                ic=lm["ic"], oc=lm["oc"], col_tile=lm["col_tile"],
                pack_block=lm.get("pack_block", packing.PACK_BLOCK),
                k_pad_shard=lm.get("k_pad_shard", 0),
                side_bits=lm.get("side_bits", 8),
                low_bits=lm.get("low_bits", 1), **kw,
            )
            continue
        kw = {f: jnp.asarray(z[f"{name}::{f}"]) for f in _FIELDS if f"{name}::{f}" in z}
        if "bias" not in kw:
            kw["bias"] = None
        layers[name] = PackedLinear(
            ic=lm["ic"], oc=lm["oc"], groupsize=lm["groupsize"],
            pack_block=lm.get("pack_block", packing.PACK_BLOCK),
            sidecar_bits=lm.get("sidecar_bits", 8), low_bits=lm.get("low_bits", 1), **kw,
        )
    return layers, meta["extra"]
