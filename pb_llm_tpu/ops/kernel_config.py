"""Typed kernel-arm configuration (VERDICT r3 #5).

Rounds 1-3 selected kernel arms through seven environment variables read at
import time into module globals (`ops.binary_matmul`, `models.attention`) —
untestable per-engine and contradicting the repo's typed-config stance
(`core.config`).  This module replaces them:

  * `KernelConfig` — one frozen dataclass naming every arm switch;
  * `from_env()` — the env vars survive as OVERRIDES, read at CALL time
    (each trace), not import time;
  * `use_kernels(cfg)` — context manager scoping a config to a trace:
    `Engine` wraps each jitted program's invocation in it, so two engines
    in one process can run different arms (`EngineConfig.kernels`);
  * `set_default(cfg)` — process-wide default under the env overrides
    (what the CLIs call once at startup).

Resolution order at each kernel dispatch: innermost `use_kernels` context >
`set_default` value > environment variables > field defaults.
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Optional

_VALID = {
    "backend": ("auto", "pallas", "pallas_interpret", "xla"),
    "decode_dot": ("auto", "f32", "int8", "dma", "bf16", "pair"),
    "prefill": ("auto", "int8", "hybrid", "hybrid_bf16"),
    "prefill_gather": ("take", "dot"),
    "prefill_extract": ("pallas", "xla"),
    "attention": ("auto", "flash", "flash_interpret", "xla"),
    "decode_attention": ("auto", "pallas", "pallas_q8", "pallas_interpret", "xla"),
}


@dataclasses.dataclass(frozen=True)
class KernelConfig:
    """Which kernel arm each hot path takes.

    backend: packed-matmul backend ("auto" = Pallas on TPU, XLA reference
      elsewhere).
    decode_dot: small-m PBW-v2 dot path ("auto" = int8 byte-lane — fastest
      measured, <2% teacher-forced NLL shift; "f32" = exact).
    prefill: large-m PBW-v2 path ("auto" = fused int8 kernel on TPU
      [measured ≥1.0x dense bf16, same int8-rounding approximation as the
      decode default, engine NLL bound pinned in tests/test_pbw_v2.py],
      exact f32 hybrid elsewhere; "hybrid" = exact Pallas-dequant + XLA f32
      dots — what run_ptq/run_eval pin for parity; "hybrid_bf16" = hybrid
      with bf16 dots).
    prefill_gather / prefill_extract: hybrid-path variants (bench arms).
    attention: full-sequence attention impl ("auto" = Pallas flash ≥1024).
    decode_attention: batched strip-cache decode attention ("auto" =
      fused Pallas kernel on TPU [ops.decode_attention — measured at XLA
      parity on bf16 strips and 1.7x on int8 strips, where it folds the
      dequant scales outside the contractions], XLA masked softmax
      elsewhere; the kernel rounds q to bf16 in its MXU dots — the same
      precision class as XLA's default-precision f32 einsum on TPU).
      "pallas_q8" (int8 caches only): additionally int8-quantize q per
      (slot, head) so the scores dot rides the int8 MXU against the
      uncast key block — removes the per-block K cast at ~0.4% extra
      relative score rounding; bf16 caches fall back to "pallas".
    """

    backend: str = "auto"
    decode_dot: str = "auto"
    prefill: str = "auto"
    prefill_gather: str = "take"
    prefill_extract: str = "pallas"
    attention: str = "auto"
    decode_attention: str = "auto"

    def __post_init__(self):
        for f, valid in _VALID.items():
            v = getattr(self, f)
            if v not in valid:
                raise ValueError(f"KernelConfig.{f}={v!r} not in {valid}")


def from_env() -> KernelConfig:
    """Config from the legacy env vars (compat overrides; call-time read).

    PB_TPU_PREFILL_INT8=0 / PB_TPU_PREFILL_BF16=0 explicitly pin the exact
    hybrid; unset they leave the "auto" default (fused int8 on TPU)."""
    prefill = "auto"
    if os.environ.get("PB_TPU_PREFILL_INT8") == "1":
        prefill = "int8"
    elif os.environ.get("PB_TPU_PREFILL_BF16") == "1":
        prefill = "hybrid_bf16"
    elif (os.environ.get("PB_TPU_PREFILL_INT8") == "0"
          or os.environ.get("PB_TPU_PREFILL_BF16") == "0"):
        prefill = "hybrid"
    return KernelConfig(
        backend=os.environ.get("PB_TPU_PACKED_BACKEND", "auto"),
        decode_dot=os.environ.get("PB_TPU_DECODE_DOT", "auto"),
        prefill=prefill,
        prefill_gather=os.environ.get("PB_TPU_PREFILL_GATHER", "take"),
        prefill_extract=os.environ.get("PB_TPU_PREFILL_EXTRACT", "pallas"),
        attention=os.environ.get("PB_TPU_ATTENTION", "auto"),
        decode_attention=os.environ.get("PB_TPU_DECODE_ATTENTION", "auto"),
    )


_default: Optional[KernelConfig] = None
_field_overrides: dict = {}
_tls = threading.local()


def set_default(cfg: Optional[KernelConfig]) -> None:
    """Process-wide default (beneath any active `use_kernels` context).
    None restores the env-var/defaults resolution."""
    global _default
    _default = cfg


def set_field_default(**fields) -> None:
    """Per-FIELD process defaults (what the legacy setters set_backend /
    set_decode_dot / set_attention_impl use): layered over set_default /
    the env vars at RESOLVE time, so a setter pins only its own field —
    later env-var changes to other fields stay visible (building the
    default from `current()` instead froze the whole env snapshot)."""
    for f, v in fields.items():
        if f not in _VALID or v not in _VALID[f]:
            raise ValueError(f"KernelConfig.{f}={v!r} not in {_VALID.get(f)}")
    _field_overrides.update(fields)


def pin_exact_prefill() -> None:
    """Parity CLIs (run_ptq / run_eval): pin the EXACT hybrid prefill
    unless the env explicitly chose an arm — serving's fused-int8 default
    rounds x per row in every large-m matmul and would shift reported
    perplexities."""
    if from_env().prefill == "auto":
        set_field_default(prefill="hybrid")


class use_kernels:
    """Scope a KernelConfig to a with-block (per-trace arm selection).
    Re-entrant and thread-local; nesting restores the outer config."""

    def __init__(self, cfg: Optional[KernelConfig]):
        self.cfg = cfg

    def __enter__(self):
        stack = getattr(_tls, "stack", None)
        if stack is None:
            stack = _tls.stack = []
        stack.append(self.cfg)
        return self.cfg

    def __exit__(self, *exc):
        _tls.stack.pop()
        return False


def current() -> KernelConfig:
    """The active config at this call site: innermost `use_kernels` context
    > per-field setter overrides > `set_default` > env vars > defaults."""
    stack = getattr(_tls, "stack", None)
    if stack:
        for cfg in reversed(stack):
            if cfg is not None:
                return cfg
    base = _default if _default is not None else from_env()
    if _field_overrides:
        base = dataclasses.replace(base, **_field_overrides)
    return base


def wrap_jit(fn, cfg: Optional[KernelConfig], donate_argnums=()):
    """jit ``fn`` so its traces (first call and shape-driven retraces)
    happen under ``cfg`` — how Engine pins per-engine arms without
    threading the config through every forward.  ``donate_argnums`` passes
    through to jax.jit (the engine donates its KV-cache argument: without
    donation every out-of-scan decode/prefill call COPIES the full cache
    to preserve the input buffer — gigabytes per step at serving scale)."""
    import jax

    jf = jax.jit(fn, donate_argnums=donate_argnums)

    if cfg is None:
        return jf

    def call(*args, **kwargs):
        with use_kernels(cfg):
            return jf(*args, **kwargs)

    return call
