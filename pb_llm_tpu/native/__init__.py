"""ctypes bindings for the native PBW plane builder (pbpack.cpp).

Builds `libpbpack.so` on first use if a compiler is available; every entry
point has a numpy fallback (`core.packing`) so the framework works without
the native library — it's a host-throughput optimization for converting
large checkpoints, not a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libpbpack.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64
    lib.pbpack_pack_bits.argtypes = [u8p, i64, i64, i64, u32p, ctypes.c_int]
    lib.pbpack_pack_bits.restype = None
    lib.pbpack_build_planes.argtypes = [f32p, u8p, f32p, f32p, f32p, i64, i64, i64, u32p, u32p, u8p, ctypes.c_int]
    lib.pbpack_build_planes.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def pack_bits(bits: np.ndarray, pack_block: int, n_threads: int = 0) -> np.ndarray:
    """{0,1} [ic, oc] → uint32 [ic//32, oc]; native if possible, numpy otherwise."""
    ic, oc = bits.shape
    lib = _load()
    if lib is None:
        from ..core.packing import pack_bits_np

        return pack_bits_np(bits.astype(np.uint32), pack_block)
    b = np.ascontiguousarray(bits, np.uint8)
    out = np.empty((ic // 32, oc), np.uint32)
    lib.pbpack_pack_bits(_ptr(b, ctypes.c_uint8), ic, oc, pack_block, _ptr(out, ctypes.c_uint32), n_threads)
    return out


def build_planes(
    w_q: np.ndarray, mask: np.ndarray, mean: np.ndarray,
    hscale: np.ndarray, hzero: np.ndarray, pack_block: int, n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fused construction of (sign_packed, mask_packed, sidecar) from solver
    outputs (single whole-row group). Falls back to numpy."""
    oc, ic = w_q.shape
    lib = _load()
    if lib is None:
        salient = (~mask.astype(bool)).T
        sbits = (((w_q - mean[:, None]) >= 0).T) & ~salient
        from ..core.packing import pack_bits_np

        codes = np.clip(np.round(w_q / hscale[:, None] + hzero[:, None]), 0, 255)
        sidecar = np.where(salient, codes.T, 0).astype(np.uint8)
        return (
            pack_bits_np(sbits.astype(np.uint32), pack_block),
            pack_bits_np(salient.astype(np.uint32), pack_block),
            sidecar,
        )
    w = np.ascontiguousarray(w_q, np.float32)
    mk = np.ascontiguousarray(mask, np.uint8)
    mu = np.ascontiguousarray(mean, np.float32)
    hs = np.ascontiguousarray(hscale, np.float32)
    hz = np.ascontiguousarray(hzero, np.float32)
    sign_packed = np.empty((ic // 32, oc), np.uint32)
    mask_packed = np.empty((ic // 32, oc), np.uint32)
    sidecar = np.empty((ic, oc), np.uint8)
    lib.pbpack_build_planes(
        _ptr(w, ctypes.c_float), _ptr(mk, ctypes.c_uint8), _ptr(mu, ctypes.c_float),
        _ptr(hs, ctypes.c_float), _ptr(hz, ctypes.c_float),
        oc, ic, pack_block,
        _ptr(sign_packed, ctypes.c_uint32), _ptr(mask_packed, ctypes.c_uint32),
        _ptr(sidecar, ctypes.c_uint8), n_threads,
    )
    return sign_packed, mask_packed, sidecar
