"""Oracle tests for the fused strip decode-attention kernel
(`ops.decode_attention`, interpret mode on CPU) and its dispatch through
`models.attention.cached_attention`."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pb_llm_tpu.models.attention import (cache_update, cached_attention,
                                         causal_allowed,
                                         masked_softmax_attention)
from pb_llm_tpu.ops import kernel_config as kc
from pb_llm_tpu.ops.decode_attention import decode_attention


def _oracle(q, k, v, lengths, scale):
    allowed = causal_allowed(lengths - 1, 1, k.shape[1], lengths)
    return masked_softmax_attention(
        q[:, None], k.astype(jnp.float32), v.astype(jnp.float32),
        allowed, scale)[:, 0]


def _mk(B, S, Hq, Hkv, D, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Hq, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, Hkv, D), dtype)
    v = jax.random.normal(ks[2], (B, S, Hkv, D), dtype)
    return q, k, v


@pytest.mark.parametrize("Hq,Hkv", [(8, 8), (8, 2)])
def test_kernel_matches_oracle_f32(Hq, Hkv):
    B, S, D = 4, 128, 64
    q, k, v = _mk(B, S, Hq, Hkv, D, jnp.float32)
    lengths = jnp.array([1 + (37 * i) % S for i in range(B)], jnp.int32)
    out = decode_attention(q, k, v, lengths, 1.0 / np.sqrt(D),
                           s_used=S, block_s=32, interpret=True)
    ref = _oracle(q, k, v, lengths, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_kernel_matches_oracle_bf16():
    B, S, Hq, D = 3, 96, 4, 128
    q, k, v = _mk(B, S, Hq, Hq, D, jnp.bfloat16)
    lengths = jnp.array([5, 96, 33], jnp.int32)
    out = decode_attention(q, k, v, lengths, 0.1, s_used=S, block_s=32,
                           interpret=True)
    ref = _oracle(q, k, v, lengths, 0.1)
    # q rides the MXU in bf16 — same precision class as XLA's
    # default-precision f32 einsum on real TPU hardware
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_kernel_matches_oracle_int8():
    B, S, Hq, Hkv, D = 4, 128, 8, 4, 64
    q, k, v = _mk(B, S, Hq, Hkv, D, jnp.float32)
    ksc = jnp.maximum(jnp.max(jnp.abs(k), -1, keepdims=True) / 127.0, 1e-8)
    vsc = jnp.maximum(jnp.max(jnp.abs(v), -1, keepdims=True) / 127.0, 1e-8)
    ki = jnp.clip(jnp.round(k / ksc), -127, 127).astype(jnp.int8)
    vi = jnp.clip(jnp.round(v / vsc), -127, 127).astype(jnp.int8)
    lengths = jnp.array([1, 128, 65, 32], jnp.int32)
    out = decode_attention(q, ki, vi, lengths, 0.125, k_scale=ksc,
                           v_scale=vsc, s_used=S, block_s=32, interpret=True)
    # oracle over the DEQUANTIZED cache: the kernel's scale folding must be
    # numerically equivalent to dequantize-then-attend
    ref = _oracle(q, ki * ksc, vi * vsc, lengths, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_kernel_window_prefix_only():
    """s_used < S: rows past the window are never visited; result equals
    the oracle as long as lengths stay inside the window."""
    B, S, Hq, D = 2, 256, 4, 64
    q, k, v = _mk(B, S, Hq, Hq, D, jnp.float32)
    # poison the tail: it must not be read
    k = k.at[:, 128:].set(jnp.nan)
    v = v.at[:, 128:].set(jnp.nan)
    lengths = jnp.array([128, 77], jnp.int32)
    out = decode_attention(q, k, v, lengths, 0.2, s_used=128, block_s=64,
                           interpret=True)
    ref = _oracle(q, k[:, :128], v[:, :128], lengths, 0.2)
    assert not np.any(np.isnan(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_kernel_empty_slot_zero_output():
    B, S, Hq, D = 2, 64, 2, 64
    q, k, v = _mk(B, S, Hq, Hq, D, jnp.float32)
    lengths = jnp.array([0, 64], jnp.int32)
    out = decode_attention(q, k, v, lengths, 1.0, s_used=S, block_s=32,
                           interpret=True)
    assert np.all(np.asarray(out)[0] == 0.0)


def test_cached_attention_dispatches_kernel():
    """cached_attention with decode_attention=pallas_interpret matches the
    XLA path (strip cache, vector pos, t=1), bf16 and int8 caches."""
    B, S, H, D = 4, 512, 4, 64
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
    k_new = jax.random.normal(ks[1], (B, 1, H, D), jnp.float32)
    v_new = jax.random.normal(ks[2], (B, 1, H, D), jnp.float32)
    pos = jnp.array([0, 17, 400, 511], jnp.int32)
    for quant in (False, True):
        if quant:
            cache = {"k": jnp.zeros((B, S, H, D), jnp.int8),
                     "v": jnp.zeros((B, S, H, D), jnp.int8),
                     "k_scale": jnp.zeros((B, S, H, 1), jnp.float32),
                     "v_scale": jnp.zeros((B, S, H, 1), jnp.float32)}
        else:
            cache = {"k": jnp.zeros((B, S, H, D), jnp.float32),
                     "v": jnp.zeros((B, S, H, D), jnp.float32)}
        fill = jax.random.normal(ks[3], (B, S, H, D), jnp.float32) * 0.5
        for t0 in range(0, 512, 64):  # prefill some history
            cache = cache_update(cache, fill[:, t0:t0 + 64],
                                 fill[:, t0:t0 + 64], t0)
        cache = cache_update(cache, k_new, v_new, pos)
        with kc.use_kernels(kc.KernelConfig(decode_attention="xla")):
            ref = cached_attention(cache, q, k_new, v_new, pos, 0.125)
        with kc.use_kernels(kc.KernelConfig(decode_attention="pallas_interpret")):
            out = cached_attention(cache, q, k_new, v_new, pos, 0.125)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32), atol=2e-2)
        # tight slots (pos 511) read the full window; short ones the prefix
        assert out.shape == ref.shape == (B, 1, H, D)


@pytest.mark.tpu
def test_tpu_lowering_smoke_int8_gqa():
    """Mosaic TPU lowering smoke (interpret=False): the quantized + GQA
    variant exercises jnp.repeat on the lane axis and the [Hq, Hkv, D]
    reshapes that interpret-mode CI never lowers (ADVICE r4 item 4).
    Run: PB_TPU_TESTS=1 pytest -m tpu."""
    if jax.default_backend() == "cpu":
        pytest.skip("no TPU backend")
    B, S, Hq, Hkv, D = 4, 256, 32, 8, 128
    q, k, v = _mk(B, S, Hq, Hkv, D, jnp.float32)
    ksc = jnp.maximum(jnp.max(jnp.abs(k), -1, keepdims=True) / 127.0, 1e-8)
    vsc = jnp.maximum(jnp.max(jnp.abs(v), -1, keepdims=True) / 127.0, 1e-8)
    ki = jnp.clip(jnp.round(k / ksc), -127, 127).astype(jnp.int8)
    vi = jnp.clip(jnp.round(v / vsc), -127, 127).astype(jnp.int8)
    lengths = jnp.array([1, 256, 130, 32], jnp.int32)
    out = decode_attention(q, ki, vi, lengths, 1.0 / np.sqrt(D), k_scale=ksc,
                           v_scale=vsc, s_used=S, block_s=128)
    ref = _oracle(q, ki * ksc, vi * vsc, lengths, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)
    # bf16 + MHA shape lowers too
    qb, kb, vb = _mk(B, S, Hq, Hq, D, jnp.bfloat16, seed=1)
    out = decode_attention(qb, kb, vb, lengths, 1.0 / np.sqrt(D), s_used=S)
    ref = _oracle(qb, kb, vb, lengths, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)
    # q8 variant (int8 Qbd scratch + int8x int8 scores dot) + multi-slot
    out = decode_attention(q, ki, vi, lengths, 1.0 / np.sqrt(D), k_scale=ksc,
                           v_scale=vsc, s_used=S, block_s=128, block_b=2,
                           q_int8=True)
    ref = _oracle(q, ki * ksc, vi * vsc, lengths, 1.0 / np.sqrt(D))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_kernel_q_int8_matches_dequant_oracle():
    """pallas_q8 variant: int8-quantized q + int8 scores dot vs the
    dequantize-then-attend oracle (tolerance covers q's extra int8
    rounding on top of the cache's)."""
    B, S, Hq, Hkv, D = 4, 128, 8, 4, 64
    q, k, v = _mk(B, S, Hq, Hkv, D, jnp.float32)
    ksc = jnp.maximum(jnp.max(jnp.abs(k), -1, keepdims=True) / 127.0, 1e-8)
    vsc = jnp.maximum(jnp.max(jnp.abs(v), -1, keepdims=True) / 127.0, 1e-8)
    ki = jnp.clip(jnp.round(k / ksc), -127, 127).astype(jnp.int8)
    vi = jnp.clip(jnp.round(v / vsc), -127, 127).astype(jnp.int8)
    lengths = jnp.array([1, 128, 65, 32], jnp.int32)
    out = decode_attention(q, ki, vi, lengths, 0.125, k_scale=ksc,
                           v_scale=vsc, s_used=S, block_s=32, block_b=2,
                           q_int8=True, interpret=True)
    ref = _oracle(q, ki * ksc, vi * vsc, lengths, 0.125)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-2)


def test_cached_attention_pallas_q8_requires_int8_cache():
    """dispatch: pallas_q8 on a bf16 cache silently uses the plain kernel
    (q_int8 needs the scale planes); int8 cache engages the q8 path —
    both match the XLA reference within tolerance."""
    B, S, H, D = 4, 128, 4, 64
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    q = jax.random.normal(ks[0], (B, 1, H, D), jnp.float32)
    k_new = jax.random.normal(ks[1], (B, 1, H, D), jnp.float32)
    v_new = jax.random.normal(ks[2], (B, 1, H, D), jnp.float32)
    pos = jnp.array([0, 17, 100, 127], jnp.int32)
    for quant in (False, True):
        if quant:
            cache = {"k": jnp.zeros((B, S, H, D), jnp.int8),
                     "v": jnp.zeros((B, S, H, D), jnp.int8),
                     "k_scale": jnp.zeros((B, S, H, 1), jnp.float32),
                     "v_scale": jnp.zeros((B, S, H, 1), jnp.float32)}
        else:
            cache = {"k": jnp.zeros((B, S, H, D), jnp.float32),
                     "v": jnp.zeros((B, S, H, D), jnp.float32)}
        cache = cache_update(cache, k_new, v_new, pos)
        with kc.use_kernels(kc.KernelConfig(decode_attention="xla")):
            ref = cached_attention(cache, q, k_new, v_new, pos, 0.125)
        # q8 requested; interpret-mode forced via a nested pallas_interpret
        # trace is not expressible per-field, so call the kernel directly
        out = decode_attention(
            q[:, 0], cache["k"], cache["v"], pos + 1, 0.125,
            k_scale=cache.get("k_scale"), v_scale=cache.get("v_scale"),
            s_used=S, q_int8=quant, interpret=True)[:, None]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-2 if quant else 5e-6)
