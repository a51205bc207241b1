"""GPTQ-PB solver: Hessian-compensated partial binarization, in pure JAX.

Re-derivation of the reference's `LowHighGPT.fasterquant`
(`gptq_pb/gptq.py:54-187`) as a jittable function.  Every column of the
weight is quantized to *either* the low (binary) or the high (8-bit)
quantizer according to a salient mask, with GPTQ error feedback propagating
each column's quantization error into the not-yet-quantized columns.

Algorithm (numbered steps cite the reference lines being matched):
  1.  high-quantizer calibration on the full W        (gptq.py:62-63)
  2.  dead columns: diag(H)==0 → H[ii]=1, W[:,i]=0    (gptq.py:69-71)
  3.  damping: H += percdamp·mean(diag H)·I           (gptq.py:75-77)
  4.  Hinv = cholesky_upper(cholesky_inverse(chol(H))) (gptq.py:78-81)
  5.  per ic-group salient mask, by magnitude quantile or W²/diag(Hinv)²
      (note the reference's `H` at gptq.py:96 *is* Hinv after the line-78-81
      reassignments — the saliency denominator is the inverse-Cholesky
      diagonal, not the raw Hessian's)                (gptq.py:84-101)
      mask==True ⇔ binarized (low quantizer)
  6.  low-quantizer calibration on W·mask (zeros included in the mean —
      gptq.py:102-105)
  7.  blocked column loop (blocksize 128): per column
        q = q_high·(1−m) + q_low·m;  err = (w−q)/Hinv[i,i]
        W1[:, i:] −= err ⊗ Hinv1[i, i:]               (gptq.py:144-162)
      cross-block: W[:, ed:] −= Err1 @ Hinv[st:ed, ed:] (gptq.py:168)
  8.  RTN fallback (disable_gptq): same select, no feedback (gptq.py:119-127)
  9.  error = Σ (w−q)²/d²/2                            (gptq.py:158,166,187)

The sequential column recursion is expressed as `lax.fori_loop`s with
static-shape masked updates (suffix updates become full-width updates times a
column-index mask), so XLA compiles one program per (oc, ic) shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..quant.high_quant import high_calibrate, high_quantize
from ..quant.low_quant import low_calibrate, low_quantize_cols, n_groups_for


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    low_method: str = "xnor"         # xnor|sign|rtn|no|2bit|4bit|prune
    low_frac: float = 0.5            # fraction binarized
    high_bit: int = 8
    groupsize: int = -1              # ic-group size for the low quantizer
    salient_metric: str = "magnitude"  # magnitude|hessian
    blocksize: int = 128
    percdamp: float = 0.01
    disable_gptq: bool = False
    # HighQuantizer options the reference supports but hardcodes off in its
    # driver (run.py:132-137): symmetric range and MSE clip search
    high_sym: bool = False
    high_mse: bool = False
    # salient-mask structure: "element" = the reference's elementwise
    # quantile (gptq.py:84-101); "column" = whole input-channel columns per
    # col_tile output-row group (PBW v2's format constraint) with the same
    # budget — GPTQ error feedback compensates the coarser selection
    mask_structure: str = "element"
    # 0 = one global salient column set per layer (fastest v2 kernel layout;
    # measured quality-neutral vs 256 — scripts/mse_col_tile.py)
    col_tile: int = 0
    # balance column selection per contiguous ic shard (row-parallel TP
    # deployments pack with ic_shards = tp); 1 = unconstrained
    ic_shards: int = 1


def _block_size_for(ic: int, requested: int) -> int:
    b = min(requested, ic)
    while ic % b:
        b -= 1
    return b


def prepare_hinv(h: jnp.ndarray, w: jnp.ndarray, percdamp: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Steps 2-4: dead-column handling, damping, inverse-Cholesky factor.

    Returns (Hinv upper-triangular, W with dead columns zeroed)."""
    ic = h.shape[0]
    dead = jnp.diag(h) == 0
    h = h + jnp.diag(jnp.where(dead, 1.0, 0.0))
    w = jnp.where(dead[None, :], 0.0, w)

    damp = percdamp * jnp.mean(jnp.diag(h))
    h = h + damp * jnp.eye(ic, dtype=h.dtype)

    chol = jnp.linalg.cholesky(h)
    hinv_full = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(ic, dtype=h.dtype))
    hinv = jnp.linalg.cholesky(hinv_full).T  # upper factor: Hinvᵀ·Hinv? (U with UᵀU = H⁻¹)
    return hinv, w


def salient_masks(
    w: jnp.ndarray,
    hinv: jnp.ndarray,
    low_frac: float,
    groupsize: int,
    metric: str,
    structure: str = "element",
    col_tile: int = 256,
    ic_shards: int = 1,
) -> jnp.ndarray:
    """Step 5: per-ic-group mask [oc, ic]; True ⇔ binarized.

    ``structure="column"``: within each ic-group, select exactly
    round((1-low_frac)·cols) whole salient columns per ``col_tile``
    output-row group by the row-group-summed metric (PBW v2's constraint).
    ``col_tile=0`` (or ≥ oc) → one global column set for the whole layer —
    the fastest v2 kernel layout (no per-row-group activation gather), with
    measured-negligible output-MSE cost vs ct=256 (scripts/mse_col_tile.py)."""
    oc, ic = w.shape
    if col_tile <= 0 or col_tile > oc:
        col_tile = oc
    gs = ic if groupsize == -1 else groupsize
    cols = []
    diag = jnp.diag(hinv)
    for g in range(n_groups_for(ic, groupsize)):
        st, ed = g * gs, min((g + 1) * gs, ic)
        wg = w[:, st:ed]
        if metric == "magnitude":
            saliency = jnp.abs(wg)
        elif metric == "hessian":
            saliency = wg**2 / (diag[st:ed][None, :]) ** 2
        else:
            raise NotImplementedError(f"salient metric {metric}")
        if structure == "element":
            k = min(int(saliency.size * low_frac), saliency.size - 1)
            thresh = jnp.sort(saliency.reshape(-1))[k]
            cols.append(saliency <= thresh)
        elif structure == "column":
            # one selection rule for the whole v2 format: the packer's
            # structure validation and this calibration path must agree
            from ..core.pbw import column_structured_mask

            if (ed - st) % ic_shards:
                raise ValueError("ic_shards must divide the group width; use groupsize=-1")
            cols.append(column_structured_mask(saliency, low_frac, col_tile, ic_shards))
        else:
            raise NotImplementedError(f"mask structure {structure}")
    return jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("low_method", "low_frac", "high_bit", "groupsize", "salient_metric", "blocksize", "percdamp", "disable_gptq", "high_sym", "high_mse", "mask_structure", "col_tile", "ic_shards"),
)
def _solve(
    w0: jnp.ndarray,
    h: jnp.ndarray,
    *,
    low_method: str,
    low_frac: float,
    high_bit: int,
    groupsize: int,
    salient_metric: str,
    blocksize: int,
    percdamp: float,
    disable_gptq: bool,
    high_sym: bool,
    high_mse: bool,
    mask_structure: str = "element",
    col_tile: int = 256,
    ic_shards: int = 1,
):
    with jax.default_matmul_precision("float32"):
        oc, ic = w0.shape
        gs = ic if groupsize == -1 else groupsize
        w0 = w0.astype(jnp.float32)
        h = h.astype(jnp.float32)

        high_state = high_calibrate(w0, bits=high_bit, sym=high_sym, mse=high_mse)  # step 1 (pre-dead-zero)
        hinv, w = prepare_hinv(h, w0, percdamp)                 # steps 2-4
        mask = salient_masks(w, hinv, low_frac, groupsize, salient_metric,
                             mask_structure, col_tile, ic_shards)  # step 5
        low_state = low_calibrate(w * mask, low_method, groupsize)          # step 6

        bsz = _block_size_for(ic, blocksize)
        n_blocks = ic // bsz
        col_iota = jnp.arange(ic)
        blk_iota = jnp.arange(bsz)

        def quantize_cols(wc, mc, groupi):
            """q = q_high·(1−m) + q_low·m for columns wc [oc, k]."""
            q_high = high_quantize(wc, high_state)
            q_low = low_quantize_cols(wc, low_state, low_method, groupi)
            return jnp.where(mc, q_low, q_high)

        if disable_gptq:
            def rtn_block(blocki, carry):
                w, losses = carry
                st = blocki * bsz
                w1 = jax.lax.dynamic_slice(w, (0, st), (oc, bsz))
                m1 = jax.lax.dynamic_slice(mask, (0, st), (oc, bsz))
                d1 = jax.lax.dynamic_slice(jnp.diag(hinv), (st,), (bsz,))
                q1 = quantize_cols(w1, m1, st // gs)
                losses = losses + jnp.sum((w1 - q1) ** 2 / d1[None, :] ** 2, axis=1) / 2.0
                return jax.lax.dynamic_update_slice(w, q1, (0, st)), losses

            wq, losses = jax.lax.fori_loop(0, n_blocks, rtn_block, (w, jnp.zeros((oc,), jnp.float32)))
            # the reference's RTN path does not track Losses (gptq.py:119-127);
            # we report the same definition of error for observability.
            return wq, mask, low_state, high_state, jnp.sum(losses)

        def block_step(blocki, carry):
            w, losses = carry
            st = blocki * bsz
            w1 = jax.lax.dynamic_slice(w, (0, st), (oc, bsz))
            m1 = jax.lax.dynamic_slice(mask, (0, st), (oc, bsz))
            hinv1 = jax.lax.dynamic_slice(hinv, (st, st), (bsz, bsz))
            groupi = st // gs

            def col_step(i, inner):
                w1, q1, err1, losses1 = inner
                wcol = jax.lax.dynamic_slice(w1, (0, i), (oc, 1))
                mcol = jax.lax.dynamic_slice(m1, (0, i), (oc, 1))
                d = jax.lax.dynamic_slice(hinv1, (i, i), (1, 1))[0, 0]
                q = quantize_cols(wcol, mcol, groupi)
                err = (wcol - q) / d
                losses1 = losses1 + ((wcol - q) ** 2 / d**2)[:, 0]
                # W1[:, i:] -= err ⊗ Hinv1[i, i:]  (suffix update as masked full row)
                hrow = jax.lax.dynamic_slice(hinv1, (i, 0), (1, bsz))[0]
                hrow = jnp.where(blk_iota >= i, hrow, 0.0)
                w1 = w1 - err * hrow[None, :]
                q1 = jax.lax.dynamic_update_slice(q1, q, (0, i))
                err1 = jax.lax.dynamic_update_slice(err1, err, (0, i))
                return w1, q1, err1, losses1

            init = (w1, jnp.zeros_like(w1), jnp.zeros_like(w1), jnp.zeros((oc,), jnp.float32))
            _, q1, err1, losses1 = jax.lax.fori_loop(0, bsz, col_step, init)

            # cross-block propagation: W[:, ed:] -= Err1 @ Hinv[st:ed, ed:]
            hrows = jax.lax.dynamic_slice(hinv, (st, 0), (bsz, ic))
            hrows = jnp.where(col_iota[None, :] >= st + bsz, hrows, 0.0)
            w = w - err1 @ hrows
            w = jax.lax.dynamic_update_slice(w, q1, (0, st))
            return w, losses + losses1 / 2.0

        wq, losses = jax.lax.fori_loop(0, n_blocks, block_step, (w, jnp.zeros((oc,), jnp.float32)))
        return wq, mask, low_state, high_state, jnp.sum(losses)


def gptq_pb(w: jnp.ndarray, h: jnp.ndarray, cfg: SolverConfig) -> Dict[str, jnp.ndarray]:
    """Quantize one linear weight ``w [oc, ic]`` given its input Hessian ``h``.

    Returns {w_q, mask, low_state, high_state, error}; ``w_q`` holds the
    reference fake-quant values, ready for `core.pbw.pack_linear`.
    """
    wq, mask, low_state, high_state, error = _solve(
        w,
        h,
        low_method=cfg.low_method,
        low_frac=cfg.low_frac,
        high_bit=cfg.high_bit,
        groupsize=cfg.groupsize,
        salient_metric=cfg.salient_metric,
        blocksize=cfg.blocksize,
        percdamp=cfg.percdamp,
        disable_gptq=cfg.disable_gptq,
        high_sym=cfg.high_sym,
        high_mse=cfg.high_mse,
        mask_structure=cfg.mask_structure,
        col_tile=cfg.col_tile,
        ic_shards=cfg.ic_shards,
    )
    return {"w_q": wq, "mask": mask, "low_state": low_state, "high_state": high_state, "error": error}
