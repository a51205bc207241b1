"""Straight-through estimators — `jax.custom_vjp` replacements for the
reference's `torch.autograd.Function` catalogue (`quant/quantizer.py:8-67`).

  ste_sign     fwd sign(x), bwd identity            (STEBinary, :18-25)
  irnet_sign   fwd sign(x), bwd k·t·(1−tanh²(t·x))  (IrNetBinary, :28-44)
  fda_sign     fwd sign(x), bwd Fourier-series surrogate zeroed outside
               [−1, 1]                              (FdaBinary, :47-67)
  ste_round_clamp  fwd round+clamp, bwd identity    (STERoundClamp, :8-15)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.custom_vjp
def ste_sign(x):
    return jnp.sign(x)


def _ste_sign_fwd(x):
    return jnp.sign(x), None


def _ste_sign_bwd(_, g):
    return (g,)


ste_sign.defvjp(_ste_sign_fwd, _ste_sign_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def irnet_sign(x, k=10.0, t=0.1):
    return jnp.sign(x)


def _irnet_fwd(x, k, t):
    return jnp.sign(x), x


def _irnet_bwd(k, t, x, g):
    grad = k * t * (1.0 - jnp.tanh(x * t) ** 2) * g
    return (grad,)


irnet_sign.defvjp(_irnet_fwd, _irnet_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def fda_sign(x, n=10):
    return jnp.sign(x)


def _fda_fwd(x, n):
    return jnp.sign(x), x


def _fda_bwd(n, x, g):
    omega = 0.1
    series = sum(jnp.cos((2 * i + 1) * omega * x) for i in range(n + 1))
    grad = 4 * omega / jnp.pi * series * g
    grad = jnp.where((x > 1) | (x < -1), 0.0, grad)
    return (grad,)


fda_sign.defvjp(_fda_fwd, _fda_bwd)


@jax.custom_vjp
def ste_round_clamp(x, lo, hi):
    return jnp.clip(jnp.round(x), lo, hi)


def _src_fwd(x, lo, hi):
    return jnp.clip(jnp.round(x), lo, hi), None


def _src_bwd(_, g):
    return (g, None, None)


ste_round_clamp.defvjp(_src_fwd, _src_bwd)
