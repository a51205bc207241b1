"""Packed-matmul dispatch: Pallas kernel on TPU, XLA reference elsewhere.

Importing this module registers the dispatcher with `models.linear`, so any
model whose linears are `PackedLinear` leaves runs packed automatically.

Arm selection is a typed `ops.kernel_config.KernelConfig` resolved at CALL
(trace) time — innermost `use_kernels` context > `set_default` > env-var
overrides (PB_TPU_PACKED_BACKEND / _DECODE_DOT / _PREFILL_INT8 /
_PREFILL_BF16 / _PREFILL_GATHER / _PREFILL_EXTRACT) > defaults.  Engines
pin their own config via `EngineConfig.kernels`; two engines with different
arms coexist in one process (VERDICT r3 #5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pbw import PackedLinear, PackedLinearV2, matmul_reference, matmul_reference_v2
from ..models import linear as _linear
from . import kernel_config as _kc
from . import pallas_pb


def set_backend(mode: str) -> None:
    """Process-default packed backend (tests/benches; per-FIELD override —
    other fields keep their env/default resolution)."""
    _kc.set_field_default(backend=mode)


def set_decode_dot(mode: str) -> None:
    """Process-default v2 decode dot path (tests / benches)."""
    _kc.set_field_default(decode_dot=mode)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _resolve_decode_dot(kcfg: _kc.KernelConfig) -> str:
    dd = kcfg.decode_dot
    if dd == "auto":
        # MEASURED (scripts/bench_v2_decompose.py + bench_v2_sidecar.py, v5e,
        # interleaved flat-harness arms at 4096x11008 m=8): the int8
        # byte-lane kernel (m_pad=16, int8 sidecar dot) runs at ~81% of the
        # same-run dense stream rate vs f32's ~55% — it won or tied every
        # same-run comparison.  Its only approximation is x's per-row absmax
        # int8 rounding (engine-grade; teacher-forced decode NLL moves <2%,
        # tests/test_pbw_v2.py::test_engine_decode_dot_int8_quality_bound).
        # Set decode_dot="f32" (or PB_TPU_DECODE_DOT=f32) for the exact arm.
        dd = "int8"
    return dd


def pb_matmul(x: jnp.ndarray, p) -> jnp.ndarray:
    """y = x @ dequant(p) (+ bias) with the configured backend/arms."""
    kcfg = _kc.current()
    v2 = isinstance(p, PackedLinearV2)
    supported = pallas_pb.pallas_supported_v2(p) if v2 else pallas_pb.pallas_supported(p)
    mode = kcfg.backend
    if mode == "auto":
        mode = "pallas" if (_on_tpu() and supported) else "xla"
    if mode == "pallas" and not supported:
        mode = "xla"
    prefill = kcfg.prefill
    if prefill == "auto":
        # fused int8 prefill measured ≥1.0x dense bf16 at m=2048 (the exact
        # hybrid is 0.6x); same engine-grade int8-x approximation as the
        # decode default, engine-level prefill NLL bound pinned in
        # tests/test_pbw_v2.py.  Parity CLIs (run_ptq/run_eval) pin
        # prefill="hybrid" for exact eval numbers.
        prefill = "int8" if _on_tpu() else "hybrid"
    v2_kw = dict(prefill_gather=kcfg.prefill_gather,
                 prefill_extract=kcfg.prefill_extract,
                 prefill_int8=prefill == "int8") if v2 else {}
    if v2:
        v2_kw["decode_dot"] = _resolve_decode_dot(kcfg)
    prefill_bf16 = prefill == "hybrid_bf16"
    if mode == "pallas":
        fn = pallas_pb.pb_matmul_pallas_v2 if v2 else pallas_pb.pb_matmul_pallas
        return fn(x, p, prefill_bf16=prefill_bf16, **v2_kw)
    if mode == "pallas_interpret":
        fn = pallas_pb.pb_matmul_pallas_v2 if v2 else pallas_pb.pb_matmul_pallas
        return fn(x, p, interpret=True, prefill_bf16=prefill_bf16, **v2_kw)
    return (matmul_reference_v2 if v2 else matmul_reference)(x, p)


def pb_matmul_stacked(x: jnp.ndarray, marker) -> jnp.ndarray:
    """y = x @ dequant_v2(layer marker.idx of marker.stacked): the
    scan_layers path.  Pallas runs the scalar-prefetch stacked kernel (no
    per-layer operand materialization); other modes materialize the layer
    slice and take the ordinary dispatch."""
    kcfg = _kc.current()
    sp, idx = marker.stacked, marker.idx
    supported = pallas_pb.stacked_supported_v2(sp) and x.shape[0] <= 256
    mode = kcfg.backend
    if mode == "auto":
        mode = "pallas" if (_on_tpu() and supported) else "xla"
    if mode in ("pallas", "pallas_interpret") and not supported:
        mode = "xla"
    if mode in ("pallas", "pallas_interpret"):
        dd = _resolve_decode_dot(kcfg)
        if dd not in ("int8", "f32"):
            dd = "f32"  # dma/bf16/pair arms have no stacked variant
        return pallas_pb.pb_matmul_pallas_v2_stacked(
            x, sp, idx, interpret=(mode == "pallas_interpret"), decode_dot=dd)
    return pb_matmul(x, jax.tree_util.tree_map(lambda a: a[idx], sp))


_linear.register_packed_matmul(pb_matmul)
_linear.register_stacked_packed_matmul(pb_matmul_stacked)
