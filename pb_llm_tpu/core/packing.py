"""Bitplane packing for PBW (partially-binarized weights).

The reference (hahnyuan/PB-LLM) never packs bits: it simulates quantization in
float (`gptq_pb/low_quant.py:71-96`) and runs dense fp matmuls. Here bits are
stored for real, in a layout chosen for the TPU unpack kernel:

**Block-local bit-plane-major layout.** Rows are grouped into *pack blocks*
of ``PACK_BLOCK = 256`` rows (the last block may be shorter, any multiple of
32).  Within a block of ``r`` rows (``g = r // 32`` words), bit ``b`` of
``words[gi, :]`` holds block-row ``b * g + gi``.  Unpacking a block is then a
pure broadcast + shift + row-major reshape:

    rows = ((words[None, :, :] >> iota_b[:, None, None]) & 1)   # [32, g, oc]
    bits = rows.reshape(32 * g, oc)                             # natural order

— no interleaving gather, which matters inside a Pallas kernel where
lane-crossing shuffles are expensive.  The block-local structure means a
kernel tile whose rows are a whole number of pack blocks can unpack
independently of the rest of the matrix.  The last axis (oc) stays on vector
lanes untouched.

ic must be a multiple of 32; callers pad (padded x-rows are zero so padded
weight rows never contribute to a matmul).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

WORD_BITS = 32
PACK_BLOCK = 256  # default rows per independently-packed block (8 words)


def _check_rows(ic: int) -> int:
    if ic % WORD_BITS != 0:
        raise ValueError(f"packing requires ic % 32 == 0, got ic={ic}")
    return ic // WORD_BITS


def block_sizes(ic: int, block_rows: int = PACK_BLOCK):
    """Row counts of each independently-packed block (last may be shorter)."""
    sizes = []
    while ic > 0:
        sizes.append(min(ic, block_rows))
        ic -= sizes[-1]
    return sizes


def default_pack_block(ic: int, cap: int = 2048) -> int:
    """Largest multiple-of-32 divisor of ic not exceeding ``cap`` — keeps the
    planar kernel's per-block bit-dots uniform (e.g. 11008 → 1376)."""
    best = 32
    for r in range(32, min(ic, cap) + 1, 32):
        if ic % r == 0:
            best = r
    return best


_block_sizes = block_sizes  # backwards-compat alias


def pack_bits(bits, block_rows: int = PACK_BLOCK) -> jnp.ndarray:
    """Pack a {0,1} matrix [ic, oc] into uint32 words [ic//32, oc] (block-local layout)."""
    ic, oc = bits.shape
    _check_rows(ic)
    bits = jnp.asarray(bits, jnp.uint32)
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        g = r // WORD_BITS
        b3 = bits[st : st + r].reshape(WORD_BITS, g, oc)
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32).reshape(WORD_BITS, 1, 1)
        chunks.append(jnp.sum(b3 << shifts, axis=0, dtype=jnp.uint32))
        st += r
    return jnp.concatenate(chunks, axis=0)


def unpack_bits(words, ic: int, block_rows: int = PACK_BLOCK) -> jnp.ndarray:
    """Inverse of :func:`pack_bits` → uint32 {0,1} matrix [ic, oc]."""
    gtot, oc = words.shape
    if gtot * WORD_BITS != ic:
        raise ValueError(f"word rows {gtot} inconsistent with ic={ic}")
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        g = r // WORD_BITS
        shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32).reshape(WORD_BITS, 1, 1)
        rows = (words[st : st + g][None, :, :] >> shifts) & jnp.uint32(1)
        chunks.append(rows.reshape(r, oc))
        st += g
    return jnp.concatenate(chunks, axis=0)


def pack_bits_np(bits: np.ndarray, block_rows: int = PACK_BLOCK) -> np.ndarray:
    """Numpy twin of :func:`pack_bits` (host-side checkpoint conversion)."""
    ic, oc = bits.shape
    _check_rows(ic)
    bits = bits.astype(np.uint32)
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        g = r // WORD_BITS
        b3 = bits[st : st + r].reshape(WORD_BITS, g, oc)
        shifts = np.arange(WORD_BITS, dtype=np.uint32).reshape(WORD_BITS, 1, 1)
        chunks.append(np.bitwise_or.reduce(b3 << shifts, axis=0).astype(np.uint32))
        st += r
    return np.concatenate(chunks, axis=0)


def unpack_bits_np(words: np.ndarray, ic: int, block_rows: int = PACK_BLOCK) -> np.ndarray:
    gtot, oc = words.shape
    if gtot * WORD_BITS != ic:
        raise ValueError(f"word rows {gtot} inconsistent with ic={ic}")
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        g = r // WORD_BITS
        shifts = np.arange(WORD_BITS, dtype=np.uint32).reshape(WORD_BITS, 1, 1)
        rows = (words[st : st + g][None, :, :] >> shifts) & np.uint32(1)
        chunks.append(rows.reshape(r, oc))
        st += g
    return np.concatenate(chunks, axis=0)


def pack_nibbles_np(codes: np.ndarray, block_rows: int = PACK_BLOCK) -> np.ndarray:
    """Pack 4-bit codes [ic, oc] (values 0..15) into bytes [ic//2, oc].

    Block-strided like the bitplanes: within a block of r rows (h = r//2
    byte-rows), nibble j (0=low, 1=high) of byte-row g holds row j*h + g —
    so each nibble's x-slice is contiguous for the planar kernel's two
    nibble-dots.  ic must be even (standard dims are).
    """
    ic, oc = codes.shape
    if ic % 2:
        raise ValueError("nibble packing requires even ic")
    codes = codes.astype(np.uint8)
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        h = r // 2
        blk = codes[st : st + r]
        chunks.append((blk[:h] | (blk[h:] << 4)).astype(np.uint8))
        st += r
    return np.concatenate(chunks, axis=0)


def unpack_nibbles_np(bytes_arr: np.ndarray, ic: int, block_rows: int = PACK_BLOCK) -> np.ndarray:
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        h = r // 2
        blk = bytes_arr[st : st + h]
        chunks.append(np.concatenate([blk & 0xF, blk >> 4], axis=0).astype(np.uint8))
        st += h
    return np.concatenate(chunks, axis=0)


def pack_nibbles(codes, block_rows: int = PACK_BLOCK) -> jnp.ndarray:
    ic, oc = codes.shape
    if ic % 2:
        raise ValueError("nibble packing requires even ic")
    codes = jnp.asarray(codes, jnp.uint8)
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        h = r // 2
        blk = codes[st : st + r]
        chunks.append(blk[:h] | (blk[h:] << 4))
        st += r
    return jnp.concatenate(chunks, axis=0)


def unpack_nibbles(bytes_arr, ic: int, block_rows: int = PACK_BLOCK) -> jnp.ndarray:
    chunks, st = [], 0
    for r in block_sizes(ic, block_rows):
        h = r // 2
        blk = bytes_arr[st : st + h]
        chunks.append(jnp.concatenate([blk & 0xF, blk >> 4], axis=0))
        st += h
    return jnp.concatenate(chunks, axis=0)


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
