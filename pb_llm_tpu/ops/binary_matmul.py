"""Packed-matmul dispatch: Pallas kernel on TPU, XLA reference elsewhere.

Importing this module registers the dispatcher with `models.linear`, so any
model whose linears are `PackedLinear` leaves runs packed automatically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core.pbw import PackedLinear, matmul_reference
from ..models import linear as _linear
from . import pallas_pb

# "auto" (pallas on TPU), "pallas", "pallas_interpret", "xla"
_MODE = os.environ.get("PB_TPU_PACKED_BACKEND", "auto")
# engine-grade bf16 dots on the large-m (prefill) path
_PREFILL_BF16 = os.environ.get("PB_TPU_PREFILL_BF16", "0") == "1"


def set_backend(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "pallas", "pallas_interpret", "xla")
    _MODE = mode


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def pb_matmul(x: jnp.ndarray, p: PackedLinear) -> jnp.ndarray:
    """y = x @ dequant(p) (+ bias) with the best available backend."""
    mode = _MODE
    if mode == "auto":
        mode = "pallas" if (_on_tpu() and pallas_pb.pallas_supported(p)) else "xla"
    if mode == "pallas" and not pallas_pb.pallas_supported(p):
        mode = "xla"
    if mode == "pallas":
        return pallas_pb.pb_matmul_pallas(x, p, prefill_bf16=_PREFILL_BF16)
    if mode == "pallas_interpret":
        return pallas_pb.pb_matmul_pallas(x, p, interpret=True, prefill_bf16=_PREFILL_BF16)
    return matmul_reference(x, p)


_linear.register_packed_matmul(pb_matmul)
