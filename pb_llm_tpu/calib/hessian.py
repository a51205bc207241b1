"""Streaming Hessian accumulation for GPTQ-PB calibration.

Reference semantics (`gptq_pb/gptq.py:35-52`): for each calibration sample the
layer input activations ``x [tokens, ic]`` contribute ``x^T x``, with a
running rescale that makes the final matrix

    H = (2 / nsamples) * sum_s  X_s^T X_s          (X_s = tokens of sample s)

independent of accumulation order.  Here that is computed directly as a jitted
scan over samples, in float32 with full matmul precision (the reference
disables TF32 for the same reason, `gptq_pb/gptq.py:11-12`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def hessian_from_samples(xs: jnp.ndarray) -> jnp.ndarray:
    """``xs [nsamples, tokens, ic]`` → ``H [ic, ic]`` = (2/nsamples)·Σ_s X_sᵀX_s."""
    n = xs.shape[0]

    with jax.default_matmul_precision("float32"):
        def step(h, x):
            x = x.astype(jnp.float32)
            return h + x.T @ x, None

        h0 = jnp.zeros((xs.shape[-1], xs.shape[-1]), jnp.float32)
        h, _ = jax.lax.scan(step, h0, xs)
    return (2.0 / n) * h


def hessian_update(h: jnp.ndarray, nsamples: int, x: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Online variant: fold one sample ``x [tokens, ic]`` into a running ``H``.

    Maintains the reference's invariant ``H_k = (2/k)·Σ_{s≤k} X_sᵀX_s``
    (`gptq_pb/gptq.py:48-51`), so it can be interleaved with layer forwards.
    """
    with jax.default_matmul_precision("float32"):
        x = x.astype(jnp.float32)
        k = nsamples + 1
        h = h * (nsamples / k) + (2.0 / k) * (x.T @ x)
    return h, k
