"""Flash attention kernel vs the XLA masked-softmax reference (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pb_llm_tpu.models.attention import causal_allowed, masked_softmax_attention
from pb_llm_tpu.ops.flash_attention import flash_attention


def _qkv(b, t, h, d, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, t, h, d)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("b,t,h,d,bq,bk", [
    (1, 128, 2, 32, 64, 64),    # multiple tiles
    (2, 100, 2, 16, 64, 64),    # ragged T (padding)
    (1, 256, 1, 64, 128, 64),   # uneven q/k tiles
])
def test_flash_matches_reference_causal(b, t, h, d, bq, bk):
    q, k, v = _qkv(b, t, h, d)
    scale = 1.0 / np.sqrt(d)
    want = masked_softmax_attention(q, k, v, causal_allowed(0, t, t, None), scale)
    got = flash_attention(q, k, v, scale, causal=True, block_q=bq, block_k=bk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_flash_non_causal():
    q, k, v = _qkv(1, 64, 2, 16, seed=1)
    scale = 0.25
    allowed = jnp.ones((1, 1, 64, 64), bool)
    want = masked_softmax_attention(q, k, v, allowed, scale)
    got = flash_attention(q, k, v, scale, causal=False, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_flash_residuals():
    """return_residuals: (m, l) reconstruct the softmax state — out·l equals
    the unnormalized accumulator, and exp(s−m) sums back to l."""
    q, k, v = _qkv(1, 96, 2, 32, seed=3)
    scale = 1.0 / np.sqrt(32)
    out, m, l = flash_attention(q, k, v, scale, causal=True, block_q=64,
                                block_k=64, interpret=True, return_residuals=True)
    assert m.shape == (1, 96, 2) and l.shape == (1, 96, 2)
    # recompute stats densely
    s = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
    qpos = jnp.arange(96)[:, None]
    kpos = jnp.arange(96)[None, :]
    s = jnp.where((kpos <= qpos)[None, :, None, :], s, -1e30)
    m_ref = jnp.max(s, axis=-1)
    l_ref = jnp.sum(jnp.exp(s - m_ref[..., None]), axis=-1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-4, rtol=1e-4)
    want = masked_softmax_attention(q, k, v, causal_allowed(0, 96, 96, None), scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-4, rtol=1e-4)
