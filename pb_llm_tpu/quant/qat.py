"""QAT partially-binarized linear layers — functional JAX.

Re-derivation of the reference's QAT core
(`quant/outlier_quantizer.py:10-143`, `quant/quantizer.py:70-193`):

  * `weight_quant_8bit` — per-row asymmetric uint8 fake-quant with a
    *rounded* zero point (zp = round(row min); `outlier_quantizer.py:10-29`).
  * outlier mask — global (whole-matrix) two-sided magnitude thresholds at
    ``outlier_fraction`` via k-th order statistics
    (`outlier_quantizer.py:54-69`), or loaded from GPTQ-PB masks and
    inverted (`outlier_quantizer.py:126-143`: QAT's mask==True ⇔ *salient*,
    GPTQ's mask==True ⇔ *binarized*).
  * master weight frozen to simulated-8bit at mask time
    (`outlier_quantizer.py:75`).
  * forward — `where(outlier_mask, stop_grad(w·outlier_scale),
    ste_sign(w)·binary_scale)` with a **scalar** binary_scale
    = mean |non-outlier w| recomputed from the live weight
    (`outlier_quantizer.py:83-99`; the boolean-masked selection is 1-D so
    `.mean(-1)` collapses to one value — a layer-wide scalar, not per-row).
  * XNOR ablation layer — per-row mean-centering + scale
    (`quantizer.py:172-193`), and the IR-Net / FDA surrogate-gradient
    variants.

A QATLinear is a pytree leaf the model's `linear_fn` dispatches on, replacing
the reference's module surgery (`qat/run_qat.py:45-66`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ste import fda_sign, irnet_sign, ste_sign

QAT_METHODS = ("xnor_outlier", "xnor_outlier_hessian", "xnor", "plain", "irnet", "fda", "bireal")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QATLinear:
    """Partially-binarized linear under training. weight is [oc, ic] (the
    reference orientation) so the quantization math matches line for line."""

    weight: jnp.ndarray                 # [oc, ic] master (sim-8bit frozen at mask time)
    bias: Optional[jnp.ndarray]         # [oc]
    outlier_mask: jnp.ndarray           # bool [oc, ic]; True ⇔ salient (8-bit)
    method: str = dataclasses.field(metadata=dict(static=True), default="xnor_outlier")
    outlier_scale: float = dataclasses.field(metadata=dict(static=True), default=1.0)
    train_outlier: bool = dataclasses.field(metadata=dict(static=True), default=False)


def weight_quant_8bit(w: jnp.ndarray, wrap_compat: bool = False) -> jnp.ndarray:
    """Per-row asymmetric uint8 fake-quant, zp rounded to integer
    (`outlier_quantizer.py:10-29`).

    Default clamps the code to [0, 255] BEFORE the uint8 cast — the
    documented fix.  The reference casts the rounded float straight to
    uint8 first (`outlier_quantizer.py:18-20`), which two's-complement
    wraps negative codes mod 256; since zp = round(row min) collapses to 0
    whenever |min| < 0.5 (every real LLM weight matrix), the wrap fires on
    ALL negative weights in practice.  ``wrap_compat=True`` reproduces that
    wrap bit-exactly — used by the reference-differential tests
    (`tests/test_reference_diff.py`) and for replaying reference QAT runs.
    """
    w = w.astype(jnp.float32)
    w_range = jnp.max(w, axis=-1, keepdims=True) - jnp.min(w, axis=-1, keepdims=True)
    zp = jnp.round(jnp.min(w, axis=-1, keepdims=True))
    qf = jnp.round((w - zp) / w_range * 255.0)
    if wrap_compat:
        q = (qf.astype(jnp.int32) & 255).astype(jnp.float32)
    else:
        q = jnp.clip(qf, 0.0, 255.0)
    return q * (w_range / 255.0) + zp


def gen_outlier_mask(w: jnp.ndarray, outlier_fraction: float) -> jnp.ndarray:
    """Two-sided global magnitude thresholds via k-th smallest
    (`outlier_quantizer.py:57-69`; torch.kthvalue is 1-indexed)."""
    flat = jnp.sort(w.reshape(-1))
    n = flat.size
    k_lo = max(int(n * outlier_fraction / 2), 1)
    k_hi = max(int(n * (1 - outlier_fraction / 2)), 1)
    lower, upper = flat[k_lo - 1], flat[k_hi - 1]
    return (w < lower) | (w > upper)


def make_qat_linear(
    weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    outlier_fraction: float,
    method: str = "xnor_outlier",
    gptq_mask: Optional[np.ndarray] = None,
    freeze_8bit: bool = True,
    wrap_compat: bool = False,
) -> QATLinear:
    """Build a QATLinear from a dense [oc, ic] weight.

    ``gptq_mask``: a GPTQ-PB *binarized* mask for the hessian variant; it is
    inverted here (`outlier_quantizer.py:138`).  Falls back to magnitude when
    absent (`outlier_quantizer.py:131-133`).
    """
    w = jnp.asarray(weight, jnp.float32)
    if method == "xnor_outlier_hessian" and gptq_mask is not None:
        mask = ~jnp.asarray(gptq_mask, bool)
    else:
        mask = gen_outlier_mask(w, outlier_fraction)
    if freeze_8bit:
        w = weight_quant_8bit(w, wrap_compat)  # outlier_quantizer.py:75
    return QATLinear(
        weight=w,
        bias=None if bias is None else jnp.asarray(bias, jnp.float32),
        outlier_mask=mask,
        method=method,
    )


def binary_scale_of(q: QATLinear) -> jnp.ndarray:
    """Scalar mean |non-outlier weight| (`outlier_quantizer.py:72-74,90-93`)."""
    keep = ~q.outlier_mask
    return jax.lax.stop_gradient(
        jnp.sum(jnp.abs(q.weight) * keep) / jnp.maximum(jnp.sum(keep), 1)
    )


def quant_weight(q: QATLinear) -> jnp.ndarray:
    """The fake-quant weight used in the forward pass."""
    w = q.weight
    if q.method in ("xnor_outlier", "xnor_outlier_hessian"):
        scaled = w * q.outlier_scale
        if not q.train_outlier:
            scaled = jax.lax.stop_gradient(scaled)
        binary = ste_sign(w) * binary_scale_of(q)
        return jnp.where(q.outlier_mask, scaled, binary)
    if q.method == "xnor":  # XnorBinaryLinear (quantizer.py:172-193)
        centered = w - jnp.mean(w, axis=-1, keepdims=True)
        scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(centered), axis=-1, keepdims=True))
        return ste_sign(centered) * scale
    if q.method == "plain":  # BinaryLinear (quantizer.py:75-86)
        return ste_sign(w)
    if q.method == "irnet":  # IrBinaryLinear (quantizer.py:89-109)
        centered = w - jnp.mean(w, axis=-1, keepdims=True)
        scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(centered), axis=-1, keepdims=True))
        return irnet_sign(centered) * scale
    if q.method == "fda":  # FdaBinaryLinear (quantizer.py:112-128)
        return fda_sign(w)
    if q.method == "bireal":  # BiRealLinear weight path (quantizer.py:140-149)
        scale = jax.lax.stop_gradient(jnp.mean(jnp.abs(w), axis=-1, keepdims=True))
        clipped = jnp.clip(w, -1.0, 1.0)
        return jax.lax.stop_gradient(scale * jnp.sign(w) - clipped) + clipped
    raise NotImplementedError(f"qat method {q.method}")


def bireal_activation(x: jnp.ndarray) -> jnp.ndarray:
    """BiReal's input binarization: forward sign, backward the piecewise
    polynomial surrogate (`quant/quantizer.py:151-165`), via the
    subtract-detached-residual trick the reference uses."""
    out_forward = jnp.sign(x)
    m1 = (x < -1).astype(x.dtype)
    m2 = (x < 0).astype(x.dtype)
    m3 = (x < 1).astype(x.dtype)
    out1 = -1.0 * m1 + (x * x + 2 * x) * (1 - m1)
    out2 = out1 * m2 + (-x * x + 2 * x) * (1 - m2)
    out3 = out2 * m3 + 1.0 * (1 - m3)
    return jax.lax.stop_gradient(out_forward - out3) + out3


def apply_qat_linear(q: QATLinear, x: jnp.ndarray) -> jnp.ndarray:
    if q.method == "bireal":  # BiReal binarizes activations too (quantizer.py:151-168)
        x = bireal_activation(x)
    w = quant_weight(q)
    y = x @ w.T.astype(x.dtype)
    if q.bias is not None:
        y = y + q.bias.astype(x.dtype)
    return y


def to_dense(q: QATLinear) -> Dict[str, jnp.ndarray]:
    """Materialize the fake-quant weight as an [ic, oc] dense leaf
    (`outlier_quantizer.py:108-114` / `qat/run_qat.py:69-80`)."""
    return {"w": quant_weight(q).T, "b": q.bias}


def mean_effective_bits(q: QATLinear) -> float:
    """1 (sign) + CSR sidecar bits/weight (`qat/run_qat.py:101-110`,
    `outlier_quantizer.py:116-123`)."""
    from ..core.packing import csr_sidecar_bits

    return 1.0 + csr_sidecar_bits(np.asarray(q.outlier_mask))
