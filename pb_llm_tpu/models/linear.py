"""Linear-layer abstraction: dense or PBW-packed, one call site.

The reference swaps `nn.Linear` modules in and out of HF models
(`qat/run_qat.py:45-80`, `gptq_pb/run.py:119-144`).  Here a "linear" is just
a pytree leaf bundle — either

  dense:  {"w": [ic, oc] , "b": [oc] | None}
  packed: core.pbw.PackedLinear

and `apply_linear` dispatches on the type.  Model forwards thread a
``linear_fn(name, lin, x)`` callback so calibration can observe every
linear's input activations without PyTorch-style hooks (the functional
equivalent of `gptq_pb/run.py:146-158`'s forward hooks).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..core.pbw import PackedLinear, PackedLinearV2

# set by ops.binary_matmul at import time to avoid a circular import
_packed_matmul: Optional[Callable] = None
_stacked_packed_matmul: Optional[Callable] = None


def register_packed_matmul(fn: Callable) -> None:
    global _packed_matmul
    _packed_matmul = fn


def register_stacked_packed_matmul(fn: Callable) -> None:
    global _stacked_packed_matmul
    _stacked_packed_matmul = fn


def dense(w, b=None):
    return {"w": jnp.asarray(w), "b": None if b is None else jnp.asarray(b)}


def apply_linear(lin, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ W (+ b) for dense dicts, PackedLinear, or QATLinear. x: [..., ic]."""
    if type(lin).__name__ == "QATLinear":  # lazy to avoid a quant<->models cycle
        from ..quant.qat import apply_qat_linear

        return apply_qat_linear(lin, x)
    if type(lin).__name__ == "StackedPackedLinearV2":  # scan_layers marker
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if _stacked_packed_matmul is not None:
            y = _stacked_packed_matmul(x2, lin)
        else:
            from ..core.pbw import matmul_reference_v2
            y = matmul_reference_v2(x2, lin.layer())
        return y.reshape(*lead, -1).astype(x.dtype)
    if isinstance(lin, (PackedLinear, PackedLinearV2)):
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if _packed_matmul is None:
            from ..core.pbw import matmul_reference, matmul_reference_v2
            y = (matmul_reference_v2 if isinstance(lin, PackedLinearV2) else matmul_reference)(x2, lin)
        else:
            y = _packed_matmul(x2, lin)
        return y.reshape(*lead, -1).astype(x.dtype)
    y = x @ lin["w"].astype(x.dtype)
    if lin.get("b") is not None:
        y = y + lin["b"].astype(x.dtype)
    return y


def named_linear_fn(lin, x, name=None):  # pragma: no cover - convenience alias
    return apply_linear(lin, x)


def linear_shape(lin) -> tuple[int, int]:
    """(ic, oc) of either representation."""
    if type(lin).__name__ == "StackedPackedLinearV2":
        _, wpp, oc = lin.stacked.sign_packed.shape
        return wpp * 32, oc
    if isinstance(lin, (PackedLinear, PackedLinearV2)):
        return lin.ic_local, lin.oc_local
    return lin["w"].shape
