"""Bitplane packing for PBW (partially-binarized weights).

The reference (hahnyuan/PB-LLM) never packs bits: it simulates quantization in
float (`gptq_pb/low_quant.py:71-96`) and runs dense fp matmuls. Here bits are
stored for real, in a layout chosen for the TPU unpack kernel:

**Bit-plane-major ("strided") layout.** A bit matrix ``bits[ic, oc]`` packs
along the *ic* (contraction) axis into ``words[G, oc]`` uint32 with
``G = ic // 32``, such that bit ``b`` of ``words[g, :]`` holds row
``b * G + g``.  Unpacking is then a pure broadcast + shift:

    rows = ((words[None, :, :] >> iota_b[:, None, None]) & 1)   # [32, G, oc]
    bits = rows.reshape(32 * G, oc)                             # natural order

i.e. the reshape that restores natural row order is a contiguous row-major
collapse — no interleaving gather, which matters inside a Pallas kernel where
lane-crossing shuffles are expensive.  The last axis (oc) stays on vector
lanes untouched.

ic must be a multiple of 32; callers pad (padded x-rows are zero so padded
weight rows never contribute to a matmul).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

WORD_BITS = 32


def _check_rows(ic: int) -> int:
    if ic % WORD_BITS != 0:
        raise ValueError(f"packing requires ic % 32 == 0, got ic={ic}")
    return ic // WORD_BITS


def pack_bits(bits) -> jnp.ndarray:
    """Pack a {0,1} matrix [ic, oc] into uint32 words [ic//32, oc] (strided layout)."""
    ic, oc = bits.shape
    g = _check_rows(ic)
    b3 = jnp.asarray(bits, jnp.uint32).reshape(WORD_BITS, g, oc)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32).reshape(WORD_BITS, 1, 1)
    return jnp.sum(b3 << shifts, axis=0, dtype=jnp.uint32)


def unpack_bits(words, ic: int) -> jnp.ndarray:
    """Inverse of :func:`pack_bits` → uint32 {0,1} matrix [ic, oc]."""
    g, oc = words.shape
    if g * WORD_BITS != ic:
        raise ValueError(f"word rows {g} inconsistent with ic={ic}")
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32).reshape(WORD_BITS, 1, 1)
    rows = (words[None, :, :] >> shifts) & jnp.uint32(1)
    return rows.reshape(ic, oc)


def pack_bits_np(bits: np.ndarray) -> np.ndarray:
    """Numpy twin of :func:`pack_bits` (host-side checkpoint conversion)."""
    ic, oc = bits.shape
    g = _check_rows(ic)
    b3 = bits.astype(np.uint32).reshape(WORD_BITS, g, oc)
    shifts = np.arange(WORD_BITS, dtype=np.uint32).reshape(WORD_BITS, 1, 1)
    return np.bitwise_or.reduce(b3 << shifts, axis=0).astype(np.uint32)


def unpack_bits_np(words: np.ndarray, ic: int) -> np.ndarray:
    g, oc = words.shape
    if g * WORD_BITS != ic:
        raise ValueError(f"word rows {g} inconsistent with ic={ic}")
    shifts = np.arange(WORD_BITS, dtype=np.uint32).reshape(WORD_BITS, 1, 1)
    rows = (words[None, :, :] >> shifts) & np.uint32(1)
    return rows.reshape(ic, oc)


def pad_rows(x, multiple: int):
    """Zero-pad axis 0 of ``x`` up to the next multiple. Returns (padded, orig_rows)."""
    rows = x.shape[0]
    target = -(-rows // multiple) * multiple
    if target == rows:
        return x, rows
    pad = [(0, target - rows)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad) if isinstance(x, jnp.ndarray) else np.pad(x, pad)
    return xp, rows


def csr_sidecar_bits(mask: np.ndarray, value_bits: int = 8, index_bits: int = 8) -> float:
    """Effective sidecar bits/weight under a CSR encoding.

    Mirrors the reference's memory accounting
    (`quant/outlier_quantizer.py:116-123`): col_indices + values + crow_indices,
    each at 8 bits, divided by numel.
    """
    n = mask.size
    nnz = int(np.asarray(mask).sum())
    rows = mask.shape[0]
    return (nnz * index_bits + nnz * value_bits + (rows + 1) * index_bits) / n
