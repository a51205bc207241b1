"""High-bit (8-bit salient side) quantizer — functional JAX.

Numerics-parity reimplementation of the reference HighQuantizer
(`gptq_pb/high_quant.py:10-122`) for the weight path used by GPTQ-PB:
per-output-channel (per row of [oc, ic]) asymmetric uniform quantization with
``maxq = 2**bits - 1``, instantiated by the driver as
``HighQuantizer(high_bit, perchannel=True, sym=False, mse=False)``
(`gptq_pb/run.py:132-137`), calibrated once on the whole weight before the
GPTQ column loop (`gptq_pb/gptq.py:62-63`).

Closed forms (`gptq_pb/high_quant.py:50-67`):
    xmin = min(row_min, 0); xmax = max(row_max, 0)
    both zero -> (-1, +1)
    sym: xmax = max(|xmin|, xmax); xmin = -xmax where xmin < 0;
         zero = (maxq + 1) / 2
    asym: zero = round(-xmin / scale)
    scale = (xmax - xmin) / maxq
    q(x) = scale * (clamp(round(x / scale) + zero, 0, maxq) - zero)

The optional MSE grid search over clip shrinkage (`high_quant.py:69-86`) is
implemented with a `lax.fori_loop`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def high_calibrate(
    w: jnp.ndarray,
    bits: int,
    sym: bool = False,
    mse: bool = False,
    norm: float = 2.4,
    grid: int = 100,
    maxshrink: float = 0.8,
) -> Dict[str, jnp.ndarray]:
    """Calibrate on the full weight [oc, ic]. Returns {scale, zero, maxq} with
    scale/zero shaped [oc]."""
    w = w.astype(jnp.float32)
    maxq = jnp.float32(2**bits - 1)
    xmin = jnp.minimum(jnp.min(w, axis=-1), 0.0)
    xmax = jnp.maximum(jnp.max(w, axis=-1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) / 2)
    else:
        zero = jnp.round(-xmin / scale)

    if mse:
        def body(i, carry):
            best, scale, zero = carry
            p = 1.0 - i.astype(jnp.float32) / grid
            xmin1 = p * xmin
            xmax1 = p * xmax
            scale1 = (xmax1 - xmin1) / maxq
            zero1 = zero if sym else jnp.round(-xmin1 / scale1)
            q = _quantize_rows(w, scale1, zero1, maxq)
            err = jnp.sum(jnp.abs(q - w) ** norm, axis=-1)
            better = err < best
            return (
                jnp.where(better, err, best),
                jnp.where(better, scale1, scale),
                jnp.where(better, zero1, zero),
            )

        best = jnp.full((w.shape[0],), jnp.inf, jnp.float32)
        _, scale, zero = jax.lax.fori_loop(0, int(maxshrink * grid), body, (best, scale, zero))

    return {"scale": scale, "zero": zero, "maxq": maxq}


def _quantize_rows(x, scale, zero, maxq):
    q = jnp.clip(jnp.round(x / scale[:, None]) + zero[:, None], 0.0, maxq)
    return scale[:, None] * (q - zero[:, None])


def high_quantize(x: jnp.ndarray, state: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Fake-quantize [oc, k] columns with the calibrated per-row params."""
    return _quantize_rows(x.astype(jnp.float32), state["scale"], state["zero"], state["maxq"])


def high_codes(x: jnp.ndarray, state: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Integer codes q = clamp(round(x/scale)+zero, 0, maxq) as uint8 (bits<=8)."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / state["scale"][:, None]) + state["zero"][:, None], 0.0, state["maxq"])
    return q.astype(jnp.uint8)


def high_dequant_codes(codes: jnp.ndarray, state: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Dequantize uint8 codes [oc, k] back to float."""
    return state["scale"][:, None] * (codes.astype(jnp.float32) - state["zero"][:, None])
