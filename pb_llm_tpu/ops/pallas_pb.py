"""Fused Pallas kernel: unpack bitplanes + select salient + matmul, one pass.

This is the packed-inference engine the reference does not have (it runs
fake-quant dense fp matmuls everywhere, `quant/outlier_quantizer.py:105`,
`gptq_pb/gptq.py:180-184`).  The kernel streams PBW planes HBM→VMEM and
reconstructs each [IC_TILE, OC_TILE] weight tile on the fly:

    bit  = (sign_words >> b) & 1                 (block-local layout, pure
                                                  shift + row-major reshape)
    wbin = low_mean + (2·bit − 1) · low_scale    (xnor closed form,
                                                  low_quant.py:75-82)
    whi  = high_scale · (sidecar − high_zero)    (high_quant.py:6-8)
    w    = wbin + maskbit · (whi − wbin)         (gptq.py:155's select)
    acc += x_tile @ w                            (MXU, f32 accumulate)

HBM traffic: 1 (sign) + 1 (mask) + 8 (sidecar) = 10 bits/weight vs 16 for
bf16 — and 2 bits/weight in the pure-binary variant used when a layer has no
salient sidecar.  Numerics are exact vs `core.pbw.dequantize` (elementwise
mask, no tile over-coverage).

Constraints (checked by the wrapper, which falls back to the XLA reference
implementation otherwise): oc % 128 == 0; ic % 256 == 0 or ic <= 256;
groupsize -1 or a multiple of / divisor of the ic tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.pbw import PackedLinear

WORD_BITS = 32
PACK_BLOCK = 256


def _unpack_tile(words, ic_tile: int, oc_tile: int) -> jnp.ndarray:
    """uint32 [ic_tile//32, oc_tile] → {0,1} f32 [ic_tile, oc_tile]."""
    if ic_tile % PACK_BLOCK == 0:
        n_blk, g = ic_tile // PACK_BLOCK, PACK_BLOCK // WORD_BITS
    else:
        n_blk, g = 1, ic_tile // WORD_BITS
    w4 = words.reshape(n_blk, 1, g, oc_tile)
    shifts = jax.lax.broadcasted_iota(jnp.uint32, (n_blk, WORD_BITS, g, oc_tile), 1)
    rows = (w4 >> shifts) & jnp.uint32(1)
    # Mosaic can't cast uint32→f32 directly; bounce through int32.
    return rows.reshape(ic_tile, oc_tile).astype(jnp.int32).astype(jnp.float32)


def _pb_kernel(
    x_ref, sign_ref, mask_ref, side_ref, lscale_ref, lmean_ref, hscale_ref, hzero_ref, bias_ref,
    out_ref,
    *, ic_tile: int, oc_tile: int, n_ic_tiles: int, groupsize: int,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    sbits = _unpack_tile(sign_ref[:], ic_tile, oc_tile)
    mbits = _unpack_tile(mask_ref[:], ic_tile, oc_tile)

    # per-row group params, broadcast across the tile
    if groupsize >= ic_tile:
        g0 = (j * ic_tile) // groupsize
        scale = lscale_ref[pl.ds(g0, 1), :]   # [1, oc_tile]
        mean = lmean_ref[pl.ds(g0, 1), :]
        w_bin = mean + (2.0 * sbits - 1.0) * scale
    else:
        segs = ic_tile // groupsize
        parts = []
        for s in range(segs):
            gi = j * segs + s
            sc = lscale_ref[pl.ds(gi, 1), :]
            mu = lmean_ref[pl.ds(gi, 1), :]
            sb = sbits[s * groupsize : (s + 1) * groupsize, :]
            parts.append(mu + (2.0 * sb - 1.0) * sc)
        w_bin = jnp.concatenate(parts, axis=0)

    w_hi = hscale_ref[:] * (side_ref[:].astype(jnp.int32).astype(jnp.float32) - hzero_ref[:])
    w = w_bin + mbits * (w_hi - w_bin)

    acc = jnp.dot(x_ref[:].astype(jnp.float32), w, preferred_element_type=jnp.float32)
    out_ref[:] += acc

    @pl.when(j == n_ic_tiles - 1)
    def _():
        out_ref[:] += bias_ref[:]


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _pick_tiles(ic: int, oc: int, groupsize: int):
    """Tile-size heuristic: big enough to amortize per-grid-step overhead,
    small enough to fit VMEM (x + planes + w tile + out)."""
    oc_tile = oc
    for cand in (512, 256, 128):
        if oc % cand == 0:
            oc_tile = cand
            break
    ic_tile = ic if ic <= PACK_BLOCK else PACK_BLOCK
    for cand in (2048, 1024, 512, 256):
        if ic % cand == 0 and (groupsize % cand == 0 or cand % groupsize == 0):
            ic_tile = cand
            break
    return ic_tile, oc_tile


@functools.partial(jax.jit, static_argnames=("interpret", "ic_tile", "oc_tile"))
def pb_matmul_pallas(
    x: jnp.ndarray,
    p: PackedLinear,
    interpret: bool = False,
    ic_tile: int | None = None,
    oc_tile: int | None = None,
) -> jnp.ndarray:
    """y = x @ dequant(p) (+ bias); x [m, ic] → y [m, oc] float32."""
    m, ic = x.shape
    oc = p.oc
    assert ic == p.ic, f"x ic {ic} != packed ic {p.ic}"

    auto_ic, auto_oc = _pick_tiles(ic, oc, p.groupsize)
    oc_tile = oc_tile or auto_oc
    ic_tile = ic_tile or auto_ic
    gs = p.groupsize
    n_ic_tiles = ic // ic_tile
    m_pad = _round_up(max(m, 8), 8)

    xp = jnp.zeros((m_pad, ic), jnp.float32).at[:m].set(x.astype(jnp.float32))
    bias = p.bias if p.bias is not None else jnp.zeros((oc,), jnp.float32)

    grid = (oc // oc_tile, n_ic_tiles)
    wrows = ic_tile // WORD_BITS

    kernel = functools.partial(
        _pb_kernel, ic_tile=ic_tile, oc_tile=oc_tile, n_ic_tiles=n_ic_tiles, groupsize=gs,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m_pad, oc), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_pad, ic_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),   # x
            pl.BlockSpec((wrows, oc_tile), lambda i, j: (j, i), memory_space=pltpu.VMEM),   # sign
            pl.BlockSpec((wrows, oc_tile), lambda i, j: (j, i), memory_space=pltpu.VMEM),   # mask
            pl.BlockSpec((ic_tile, oc_tile), lambda i, j: (j, i), memory_space=pltpu.VMEM),  # sidecar
            pl.BlockSpec((p.n_groups, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),  # low_scale
            pl.BlockSpec((p.n_groups, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),  # low_mean
            pl.BlockSpec((1, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),        # high_scale
            pl.BlockSpec((1, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),        # high_zero
            pl.BlockSpec((1, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),        # bias
        ],
        out_specs=pl.BlockSpec((m_pad, oc_tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * ic * oc,
            bytes_accessed=ic * oc * 10 // 8 + m_pad * ic * 4 + m_pad * oc * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        xp,
        p.sign_packed,
        p.mask_packed,
        p.sidecar,
        p.low_scale,
        p.low_mean,
        p.high_scale.reshape(1, -1),
        p.high_zero.reshape(1, -1),
        bias.reshape(1, -1),
    )
    return out[:m]


def pallas_supported(p: PackedLinear) -> bool:
    ic, oc, gs = p.ic, p.oc, p.groupsize
    if oc % 128 != 0 and oc < 128:
        return False
    if oc % 128 != 0:
        return False
    if ic % PACK_BLOCK != 0 and ic > PACK_BLOCK:
        return False
    ic_tile = PACK_BLOCK if ic % PACK_BLOCK == 0 else ic
    if gs < ic_tile and ic_tile % gs != 0:
        return False
    if gs > ic_tile and gs % ic_tile != 0:
        return False
    return True
