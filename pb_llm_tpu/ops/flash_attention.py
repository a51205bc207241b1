"""Causal flash attention (Pallas, TPU) for prefill / full-window eval.

The reference evaluates 2048-token windows through stock HF full-sequence
attention (SURVEY.md §5.7) — an O(T²) scores matrix materialized in HBM.
This kernel tiles K/V with an online softmax so the scores tile lives only
in VMEM (the standard flash-attention recurrence: running max m, running
normalizer l, rescaled accumulator), with causal tile skipping.

Layout: q/k/v arrive as [B, T, H, D]; the kernel runs per (batch·head) on
[T, D] tiles.  GQA callers repeat K/V heads first (same as the XLA path in
`models.attention`).  All softmax statistics are float32.

Decode (t=1) stays on the XLA path — the flash structure has nothing to tile
there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, *refs, scale, block_q, block_k, kv_len, n_kv_tiles, causal, dot_dtype, residuals):
    if residuals:  # extra outputs: per-row softmax stats for state merging
        o_ref, mo_ref, lo_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # causal: skip KV tiles strictly above the diagonal
    run = True
    if causal:
        run = ki * block_k <= qi * block_q + (block_q - 1)

    @pl.when(run)
    def _():
        q = q_ref[0].astype(dot_dtype)  # [block_q, d]
        k = k_ref[0].astype(dot_dtype)  # [block_k, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k]

        qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        kpos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = kpos < kv_len
        if causal:
            mask = mask & (kpos <= qpos)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        m_ref[:] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_next, l_ref.shape)

        v = v_ref[0].astype(dot_dtype)  # [block_k, d]
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot(
            p.astype(dot_dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == n_kv_tiles - 1)
    def _():
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)
        if residuals:
            mo_ref[0] = m_ref[:]
            lo_ref[0] = l_ref[:]


def _round_up(v, m):
    return -(-v // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "causal", "block_q", "block_k", "dots_bf16", "interpret", "return_residuals"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 512,
    dots_bf16: bool = False,
    interpret: bool = False,
    return_residuals: bool = False,
):
    """q,k,v: [B, T, H, D] (equal head counts) → [B, T, H, D].

    ``dots_bf16`` runs the QKᵀ and PV dots in bfloat16 with float32
    accumulation/softmax statistics — the MXU's native rate (f32 dots issue
    at ~1/4 throughput on v5e).  The error matches what a bf16 model forward
    would make anyway; f32-strict callers (parity tests) leave it off.

    ``return_residuals``: additionally return the per-row softmax stats
    (running max m, normalizer l) as [B, T, H] f32 — the state a caller
    needs to MERGE this block's output with other blocks' (ring attention:
    `parallel.ring_attention` with inner="flash")."""
    b, t, h, d = q.shape
    s = k.shape[1]
    tp = _round_up(t, block_q)
    sp = _round_up(s, block_k)

    def to_bh(x, tpad):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, x.shape[1], d)
        return jnp.pad(x, ((0, 0), (0, tpad - x.shape[1]), (0, 0)))

    qb, kb, vb = to_bh(q, tp), to_bh(k, sp), to_bh(v, sp)
    n_kv_tiles = sp // block_k

    kernel = functools.partial(
        _kernel, scale=scale, block_q=block_q, block_k=block_k,
        kv_len=s, n_kv_tiles=n_kv_tiles, causal=causal,
        dot_dtype=jnp.bfloat16 if dots_bf16 else jnp.float32,
        residuals=return_residuals,
    )
    o_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b * h, tp, d), q.dtype)
    out_specs = o_spec
    if return_residuals:
        stat_spec = pl.BlockSpec((1, block_q, 128), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM)
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b * h, tp, 128), jnp.float32),
                     jax.ShapeDtypeStruct((b * h, tp, 128), jnp.float32)]
        out_specs = [o_spec, stat_spec, stat_spec]
    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(b * h, tp // block_q, n_kv_tiles),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qb, kb, vb)

    def from_bh(x):  # [b*h, tp, ...] -> [b, t, h, ...]
        x = x[:, :t].reshape(b, h, t, *x.shape[2:])
        return jnp.moveaxis(x, 1, 2)

    if return_residuals:
        out, m, l = res
        return from_bh(out), from_bh(m)[..., 0], from_bh(l)[..., 0]
    return from_bh(res)
