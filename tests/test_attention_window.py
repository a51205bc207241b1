"""Windowed strip-cache decode attention: exactness across bucket edges.

The lax.switch window (models.attention.cached_attention) must match the
full-cache read for positions just below / at / above every bucket
boundary — an off-by-one there silently truncates a live row.  Tolerance is
f32-reduction-order only (excluded rows carry exactly zero probability, but
softmax/PV summation trees differ with the column count).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pb_llm_tpu.models.attention import (
    cache_update, cached_attention, causal_allowed, cache_kv,
    masked_softmax_attention)


def _mk_cache(b, s, h, d, dtype=jnp.float32, int8=False, seed=0):
    r = np.random.default_rng(seed)
    cache = {"k": jnp.asarray(r.standard_normal((b, s, h, d)).astype(np.float32)),
             "v": jnp.asarray(r.standard_normal((b, s, h, d)).astype(np.float32))}
    if int8:
        qk = {"k": jnp.zeros((b, s, h, d), jnp.int8),
              "v": jnp.zeros((b, s, h, d), jnp.int8),
              "k_scale": jnp.zeros((b, s, h, 1), jnp.float32),
              "v_scale": jnp.zeros((b, s, h, 1), jnp.float32)}
        qk = cache_update(qk, cache["k"], cache["v"], jnp.zeros((b,), jnp.int32))
        # cache_update writes at pos 0..; write whole strip in one go
        return qk
    return cache


@pytest.mark.parametrize("pos0", [254, 255, 256, 257, 510, 511, 515])
def test_windowed_decode_matches_full(pos0):
    b, s, h, d = 2, 520, 4, 16  # windows: 256, 512, 520
    cache = _mk_cache(b, s, h, d)
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    k_new = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    v_new = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    pos = jnp.asarray([pos0, max(pos0 - 37, 0)], jnp.int32)
    upd = cache_update(cache, k_new, v_new, pos)

    got = np.asarray(cached_attention(upd, q, k_new, v_new, pos, 0.25))

    ck, cv = cache_kv(upd, q.dtype)
    allowed = causal_allowed(pos, 1, s, pos + 1)
    want = np.asarray(masked_softmax_attention(q, ck, cv, allowed, 0.25))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_windowed_multitoken_spec_matches_full():
    """Spec-verify windows (t > 1) straddling a bucket edge."""
    b, s, h, d, t = 2, 520, 4, 16, 3
    cache = _mk_cache(b, s, h, d, seed=2)
    r = np.random.default_rng(3)
    q = jnp.asarray(r.standard_normal((b, t, h, d)).astype(np.float32))
    k_new = jnp.asarray(r.standard_normal((b, t, h, d)).astype(np.float32))
    v_new = jnp.asarray(r.standard_normal((b, t, h, d)).astype(np.float32))
    pos = jnp.asarray([254, 100], jnp.int32)  # 254 + 3 = 257 > 256 → W=512
    upd = cache_update(cache, k_new, v_new, pos)

    got = np.asarray(cached_attention(upd, q, k_new, v_new, pos, 0.25))
    ck, cv = cache_kv(upd, q.dtype)
    allowed = causal_allowed(pos, t, s, pos + t)
    want = np.asarray(masked_softmax_attention(q, ck, cv, allowed, 0.25))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_windowed_int8_cache_matches_full():
    b, s, h, d = 2, 520, 4, 16
    cache = _mk_cache(b, s, h, d, int8=True, seed=4)
    r = np.random.default_rng(5)
    q = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    k_new = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    v_new = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    pos = jnp.asarray([300, 40], jnp.int32)
    upd = cache_update(cache, k_new, v_new, pos)

    got = np.asarray(cached_attention(upd, q, k_new, v_new, pos, 0.25))
    ck, cv = cache_kv(upd, q.dtype)
    allowed = causal_allowed(pos, 1, s, pos + 1)
    want = np.asarray(masked_softmax_attention(q, ck, cv, allowed, 0.25))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)


def test_windowed_under_jit_static_branches():
    """The switch compiles inside one jitted step (no data-dependent python)."""
    b, s, h, d = 2, 520, 4, 16
    cache = _mk_cache(b, s, h, d, seed=6)
    r = np.random.default_rng(7)
    q = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    kn = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))
    vn = jnp.asarray(r.standard_normal((b, 1, h, d)).astype(np.float32))

    @jax.jit
    def step(cache, pos):
        upd = cache_update(cache, kn, vn, pos)
        return cached_attention(upd, q, kn, vn, pos, 0.25)

    for p0 in (10, 255, 256, 400, 515):
        pos = jnp.asarray([p0, p0 // 2], jnp.int32)
        got = np.asarray(step(cache, pos))
        upd = cache_update(cache, kn, vn, pos)
        ck, cv = cache_kv(upd, q.dtype)
        want = np.asarray(masked_softmax_attention(
            q, ck, cv, causal_allowed(pos, 1, s, pos + 1), 0.25))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
