"""Packed-matmul dispatch: Pallas kernel on TPU, XLA reference elsewhere.

Importing this module registers the dispatcher with `models.linear`, so any
model whose linears are `PackedLinear` leaves runs packed automatically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..core.pbw import PackedLinear, PackedLinearV2, matmul_reference, matmul_reference_v2
from ..models import linear as _linear
from . import pallas_pb

# "auto" (pallas on TPU), "pallas", "pallas_interpret", "xla"
_MODE = os.environ.get("PB_TPU_PACKED_BACKEND", "auto")
# engine-grade bf16 dots on the large-m (prefill) path
_PREFILL_BF16 = os.environ.get("PB_TPU_PREFILL_BF16", "0") == "1"
# fused int8 byte-lane kernel on the large-m path (x → per-row absmax int8;
# no w_bin round-trip) — opt-in, overrides the hybrid when set
_PREFILL_INT8 = os.environ.get("PB_TPU_PREFILL_INT8", "0") == "1"
# v2 prefill variants (scripts/bench_v2_prefill.py ARMS=variants):
#   gather: "take" (XLA column gather) | "dot" (one-hot MXU dot)
#   extract: "pallas" (dequant kernel) | "xla" (broadcast shift/AND)
_PREFILL_GATHER = os.environ.get("PB_TPU_PREFILL_GATHER", "take")
_PREFILL_EXTRACT = os.environ.get("PB_TPU_PREFILL_EXTRACT", "pallas")
# v2 decode dot path: "f32" | "int8" | "bf16" | "pair" | "dma".
# "auto" == int8: MEASURED (scripts/bench_v2_decompose.py, v5e, interleaved
# flat-harness arms at 4096x11008 m=8): int8 17.0-18.9 µs vs f32 17.4-27.0
# vs bf16 33.0 vs pair 37.9 — int8 byte-lane extraction won or tied every
# same-run comparison, at 66-74% of the packed-stream HBM roofline.  Its
# only approximation is x's per-row absmax int8 rounding (engine-grade,
# like the bf16 arm; teacher-forced decode NLL moves <2%,
# tests/test_pbw_v2.py::test_engine_decode_dot_int8_quality_bound).
# Set PB_TPU_DECODE_DOT=f32 for the exact arm.
_DECODE_DOT = os.environ.get("PB_TPU_DECODE_DOT", "auto")


def set_backend(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "pallas", "pallas_interpret", "xla")
    _MODE = mode


def set_decode_dot(mode: str) -> None:
    """Override the v2 decode dot path (tests / benches; serving reads the
    PB_TPU_DECODE_DOT env at import)."""
    global _DECODE_DOT
    assert mode in ("auto", "f32", "int8", "dma", "bf16", "pair")
    _DECODE_DOT = mode


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def pb_matmul(x: jnp.ndarray, p) -> jnp.ndarray:
    """y = x @ dequant(p) (+ bias) with the best available backend."""
    v2 = isinstance(p, PackedLinearV2)
    supported = pallas_pb.pallas_supported_v2(p) if v2 else pallas_pb.pallas_supported(p)
    mode = _MODE
    if mode == "auto":
        mode = "pallas" if (_on_tpu() and supported) else "xla"
    if mode == "pallas" and not supported:
        mode = "xla"
    v2_kw = dict(prefill_gather=_PREFILL_GATHER, prefill_extract=_PREFILL_EXTRACT,
                 prefill_int8=_PREFILL_INT8) if v2 else {}
    if v2:
        dd = _DECODE_DOT
        if dd == "auto":
            dd = "int8"  # measured fastest on v5e (see module comment);
            # falls back to f32 in-kernel for row-grouped layouts / m > 256
        v2_kw["decode_dot"] = dd
    if mode == "pallas":
        fn = pallas_pb.pb_matmul_pallas_v2 if v2 else pallas_pb.pb_matmul_pallas
        return fn(x, p, prefill_bf16=_PREFILL_BF16, **v2_kw)
    if mode == "pallas_interpret":
        fn = pallas_pb.pb_matmul_pallas_v2 if v2 else pallas_pb.pb_matmul_pallas
        return fn(x, p, interpret=True, prefill_bf16=_PREFILL_BF16, **v2_kw)
    return (matmul_reference_v2 if v2 else matmul_reference)(x, p)


def pb_matmul_stacked(x: jnp.ndarray, marker) -> jnp.ndarray:
    """y = x @ dequant_v2(layer marker.idx of marker.stacked): the
    scan_layers path.  Pallas runs the scalar-prefetch stacked kernel (no
    per-layer operand materialization); other modes materialize the layer
    slice and take the ordinary dispatch."""
    sp, idx = marker.stacked, marker.idx
    supported = pallas_pb.stacked_supported_v2(sp) and x.shape[0] <= 256
    mode = _MODE
    if mode == "auto":
        mode = "pallas" if (_on_tpu() and supported) else "xla"
    if mode in ("pallas", "pallas_interpret") and not supported:
        mode = "xla"
    if mode in ("pallas", "pallas_interpret"):
        dd = _DECODE_DOT
        if dd in ("auto",):
            dd = "int8"
        if dd not in ("int8", "f32"):
            dd = "f32"  # dma/bf16/pair arms have no stacked variant
        return pallas_pb.pb_matmul_pallas_v2_stacked(
            x, sp, idx, interpret=(mode == "pallas_interpret"), decode_dot=dd)
    return pb_matmul(x, jax.tree_util.tree_map(lambda a: a[idx], sp))


_linear.register_packed_matmul(pb_matmul)
_linear.register_stacked_packed_matmul(pb_matmul_stacked)
