"""Native pbpack library vs the numpy/jnp packing reference."""

import numpy as np
import pytest

from pb_llm_tpu import native
from pb_llm_tpu.core import packing


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_pack_bits_matches_numpy():
    rng = np.random.default_rng(0)
    for ic, oc, blk in [(256, 64, 256), (1024, 100, 256), (1376, 40, 1376), (608, 32, 512)]:
        bits = rng.integers(0, 2, size=(ic, oc)).astype(np.uint8)
        want = packing.pack_bits_np(bits.astype(np.uint32), blk)
        got = native.pack_bits(bits, blk)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_build_planes_matches_pack_linear():
    import jax.numpy as jnp

    from pb_llm_tpu.core import pbw
    from pb_llm_tpu.quant.high_quant import high_calibrate, high_quantize
    from pb_llm_tpu.quant.low_quant import low_calibrate, low_quantize

    rng = np.random.default_rng(1)
    oc, ic = 48, 256
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    mask = np.abs(w) <= np.quantile(np.abs(w), 0.8)
    low_state = low_calibrate(jnp.asarray(w * mask), "xnor")
    high_state = high_calibrate(jnp.asarray(w), bits=8)
    w_q = np.where(
        mask,
        np.asarray(low_quantize(jnp.asarray(w), low_state, "xnor")),
        np.asarray(high_quantize(jnp.asarray(w), high_state)),
    ).astype(np.float32)
    p, diag = pbw.pack_linear(jnp.asarray(w_q), jnp.asarray(mask), low_state, high_state, "xnor")
    assert diag["pack_mismatch"] == 0.0

    sp, mp, sc = native.build_planes(
        w_q, mask.astype(np.uint8),
        np.asarray(low_state["mean"])[0], np.asarray(high_state["scale"]), np.asarray(high_state["zero"]),
        p.pack_block,
    )
    np.testing.assert_array_equal(sp, np.asarray(p.sign_packed))
    np.testing.assert_array_equal(mp, np.asarray(p.mask_packed))
    np.testing.assert_array_equal(sc, np.asarray(p.sidecar))


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_is_fast_enough():
    import time

    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, size=(4096, 4096)).astype(np.uint8)
    native.pack_bits(bits, 2048)  # warm (thread pool spawn etc.)
    t0 = time.perf_counter()
    native.pack_bits(bits, 2048)
    dt = time.perf_counter() - t0
    assert dt < 2.0  # 16M weights well under 2s
