"""Low-bit ("binary side") quantizers — functional JAX.

Numerics-parity reimplementation of the reference LowQuantizer
(`gptq_pb/low_quant.py:6-96`), as pure functions over arrays so they can run
inside jitted calibration loops.  Weight orientation follows the reference:
``w`` is ``[oc, ic]`` and groups tile the **ic** axis (`low_quant.py:11-14`).

Methods (same closed forms as the reference):
  xnor   mean  = mean(w_group, axis=ic)                  (`low_quant.py:26-29`)
         scale = mean(|w_group - mean|, axis=ic)         (`low_quant.py:32`)
         q     = sign(w - mean) * scale + mean           (`low_quant.py:75-82`)
         NB the mean is added back: a binarized row-group takes the two
         values mean±scale, not ±scale.
  sign   scale = mean(relu(w), axis=ic)                  (`low_quant.py:37`)
         q     = (w > 0) * scale                         (`low_quant.py:84-86`)
  rtn    scale = mean(|w|, axis=ic) + 1e-5               (`low_quant.py:41`)
         q     = clamp(round(relu(w)/scale), 0, 1)*scale (`low_quant.py:87-90`)
  2bit/4bit  asymmetric uniform min/max per row-group    (`low_quant.py:44-65`)
         NB the reference computes `zero` with an indexing slip
         (`low_quant.py:65` uses scale[groupi] — a single row — for all rows);
         we use the correct per-row scale and document the deviation.
  no     identity; prune → 0.

Calibration is performed on **masked** weights (``w * binarized_mask``), with
the zeroed salient entries included in the mean/scale denominators — exactly
as the GPTQ-PB driver does (`gptq_pb/gptq.py:102-105`).
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

LOW_METHODS = ("xnor", "sign", "rtn", "no", "prune", "2bit", "4bit")


def n_groups_for(ic: int, groupsize: int) -> int:
    gs = ic if groupsize == -1 else groupsize
    return math.ceil(ic / gs)


def _group_bounds(ic: int, groupsize: int):
    gs = ic if groupsize == -1 else groupsize
    bounds = []
    for g in range(n_groups_for(ic, groupsize)):
        st = g * gs
        bounds.append((st, min(st + gs, ic)))
    return bounds


def low_calibrate_group(w_group: jnp.ndarray, method: str) -> Dict[str, jnp.ndarray]:
    """Calibrate one ic-group. ``w_group``: [oc, width] (already salient-masked).

    Returns per-row params {scale, mean, zero} each shaped [oc].
    """
    oc = w_group.shape[0]
    zeros = jnp.zeros((oc,), jnp.float32)
    w = w_group.astype(jnp.float32)
    if method == "xnor":
        mean = jnp.mean(w, axis=-1)
        scale = jnp.mean(jnp.abs(w - mean[:, None]), axis=-1)
        return {"scale": scale, "mean": mean, "zero": zeros}
    if method == "sign":
        scale = jnp.mean(jnp.maximum(w, 0.0), axis=-1)
        return {"scale": scale, "mean": zeros, "zero": zeros}
    if method == "rtn":
        scale = jnp.mean(jnp.abs(w), axis=-1) + 1e-5
        return {"scale": scale, "mean": zeros, "zero": zeros}
    if method in ("no", "prune"):
        return {"scale": zeros, "mean": zeros, "zero": zeros}
    if method in ("2bit", "4bit"):
        maxq = 3.0 if method == "2bit" else 7.0
        xmin = jnp.minimum(jnp.min(w, axis=-1), 0.0)
        xmax = jnp.maximum(jnp.max(w, axis=-1), 0.0)
        degenerate = (xmin == 0) & (xmax == 0)
        xmin = jnp.where(degenerate, -1.0, xmin)
        xmax = jnp.where(degenerate, 1.0, xmax)
        scale = (xmax - xmin) / maxq
        zero = jnp.round(-xmin / scale)
        return {"scale": scale, "mean": zeros, "zero": zero}
    raise NotImplementedError(f"low method {method}")


def low_calibrate(w: jnp.ndarray, method: str, groupsize: int = -1) -> Dict[str, jnp.ndarray]:
    """Calibrate all groups. ``w``: [oc, ic] (salient-masked).

    Returns {scale, mean, zero} each [n_groups, oc].
    """
    parts = [low_calibrate_group(w[:, st:ed], method) for st, ed in _group_bounds(w.shape[1], groupsize)]
    return {k: jnp.stack([p[k] for p in parts], axis=0) for k in ("scale", "mean", "zero")}


def low_maxq(method: str) -> float:
    return 3.0 if method == "2bit" else 7.0


def low_quantize_cols(w_cols: jnp.ndarray, state: Dict[str, jnp.ndarray], method: str, groupi) -> jnp.ndarray:
    """Fake-quantize columns ``w_cols`` [oc, k] using group ``groupi``'s params.

    ``groupi`` may be a traced scalar (used inside the GPTQ column loop).
    """
    w = w_cols.astype(jnp.float32)
    scale = jnp.take(state["scale"], groupi, axis=0)[:, None]
    if method == "xnor":
        mean = jnp.take(state["mean"], groupi, axis=0)[:, None]
        return jnp.sign(w - mean) * scale + mean
    if method == "sign":
        return (w > 0).astype(jnp.float32) * scale
    if method == "rtn":
        wr = jnp.maximum(w, 0.0)
        return jnp.clip(jnp.round(wr / scale), 0.0, 1.0) * scale
    if method in ("2bit", "4bit"):
        zero = jnp.take(state["zero"], groupi, axis=0)[:, None]
        q = jnp.clip(jnp.round(w / scale) + zero, 0.0, low_maxq(method))
        return scale * (q - zero)
    if method == "no":
        return w
    if method == "prune":
        return jnp.zeros_like(w)
    raise NotImplementedError(f"low method {method}")


def low_quantize(w: jnp.ndarray, state: Dict[str, jnp.ndarray], method: str, groupsize: int = -1) -> jnp.ndarray:
    """Fake-quantize the whole matrix [oc, ic] group by group."""
    cols = [
        low_quantize_cols(w[:, st:ed], state, method, g)
        for g, (st, ed) in enumerate(_group_bounds(w.shape[1], groupsize))
    ]
    return jnp.concatenate(cols, axis=1)
