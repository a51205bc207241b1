"""Bitplane packing round-trip properties."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from pb_llm_tpu.core import packing


def test_pack_unpack_roundtrip_jnp():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, size=(256, 40)).astype(np.uint32)
    words = packing.pack_bits(jnp.asarray(bits))
    assert words.dtype == jnp.uint32 and words.shape == (8, 40)
    out = packing.unpack_bits(words, 256)
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_pack_unpack_roundtrip_np_matches_jnp():
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, size=(96, 17)).astype(np.uint32)
    w_np = packing.pack_bits_np(bits)
    w_j = np.asarray(packing.pack_bits(jnp.asarray(bits)))
    np.testing.assert_array_equal(w_np, w_j)
    np.testing.assert_array_equal(packing.unpack_bits_np(w_np, 96), bits)


def test_strided_layout_definition():
    # within one pack block: bit b of word g holds row b*G + g
    ic, oc = 64, 3
    g_count = ic // 32
    bits = np.zeros((ic, oc), np.uint32)
    bits[1 * g_count + 1, 2] = 1  # b=1, g=1 -> word[1,2] bit 1
    words = np.asarray(packing.pack_bits(jnp.asarray(bits)))
    assert words[1, 2] == 2
    assert words.sum() == 2


def test_multiblock_roundtrip():
    # ic spanning several 256-row pack blocks plus a short tail block
    rng = np.random.default_rng(7)
    ic = 256 * 2 + 96
    bits = rng.integers(0, 2, size=(ic, 8)).astype(np.uint32)
    words = packing.pack_bits(jnp.asarray(bits))
    assert words.shape == (ic // 32, 8)
    np.testing.assert_array_equal(np.asarray(packing.unpack_bits(words, ic)), bits)
    np.testing.assert_array_equal(packing.pack_bits_np(bits), np.asarray(words))


def test_block_locality():
    # block k's words depend only on block k's rows
    rng = np.random.default_rng(8)
    bits = rng.integers(0, 2, size=(512, 4)).astype(np.uint32)
    w_all = np.asarray(packing.pack_bits(jnp.asarray(bits)))
    w_blk1 = np.asarray(packing.pack_bits(jnp.asarray(bits[256:])))
    np.testing.assert_array_equal(w_all[8:], w_blk1)


def test_pad_rows():
    x = np.ones((5, 3))
    xp, orig = packing.pad_rows(x, 32)
    assert xp.shape == (32, 3) and orig == 5
    assert xp[5:].sum() == 0


def test_csr_sidecar_bits_matches_reference_accounting():
    # reference: (col_idx*8 + values*8 + crow*8) / numel  (quant/outlier_quantizer.py:116-123)
    mask = np.zeros((4, 8), bool)
    mask[0, 1] = mask[2, 3] = mask[2, 4] = True
    got = packing.csr_sidecar_bits(mask)
    expected = (3 * 8 + 3 * 8 + 5 * 8) / 32
    assert got == expected


def test_pack_unpack_shape_sweep():
    """Round-trip across a sweep of (ic, oc, block) shapes incl. ragged blocks."""
    rng = np.random.default_rng(123)
    for ic in (32, 96, 256, 288, 1376, 544):
        for oc in (1, 7, 128):
            for blk in (32, 256, 1376, 2048):
                bits = rng.integers(0, 2, size=(ic, oc)).astype(np.uint32)
                w = packing.pack_bits_np(bits, blk)
                assert w.shape == (ic // 32, oc)
                np.testing.assert_array_equal(packing.unpack_bits_np(w, ic, blk), bits)


def test_nibble_shape_sweep():
    rng = np.random.default_rng(124)
    for ic in (64, 256, 544, 1376):
        for blk in (64, 256, 1376):
            codes = rng.integers(0, 16, size=(ic, 5)).astype(np.uint8)
            b = packing.pack_nibbles_np(codes, blk)
            np.testing.assert_array_equal(packing.unpack_nibbles_np(b, ic, blk), codes)
