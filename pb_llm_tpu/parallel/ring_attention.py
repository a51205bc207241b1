"""Ring sequence-parallel causal attention over an ICI mesh axis.

The reference fixes seqlen at 2048 and runs full-sequence attention on one
device (`/root/reference/gptq_pb/run.py:30`, SURVEY.md §5.7) — there is no
sequence/context parallelism of any kind.  This module is the TPU-native
long-context answer: shard the sequence axis across an ``sp`` mesh axis and
rotate K/V blocks around the ring with `lax.ppermute` (one ICI hop per
step), merging per-block flash-style softmax states (running max m, running
normalizer l, rescaled accumulator) so no device ever materializes more
than a [T/sp, T/sp] scores block.

Causality is block-uniform: global positions make one mask formula cover
below-diagonal (all allowed), diagonal (triangular), and above-diagonal
(empty — the block contributes -inf rows that the running-max merge
ignores) cases, so the ring loop is a static `lax.fori_loop` with no
data-dependent control flow.

Layout: [B, T, H, D] with T sharded on ``sp``; GQA callers repeat K/V heads
first (same contract as `ops.flash_attention`).  All statistics f32.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

NEG_INF = -1e30


def make_sp_mesh(sp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    sp = sp or len(devs)
    return Mesh(np.array(devs[:sp]), ("sp",))


def _block_attend(q, k, v, qpos0, kpos0, scale):
    """One [B,Tl,H,D] q block vs one k/v block → (scores-max m, normalizer l,
    unnormalized acc), all f32, causally masked with GLOBAL positions."""
    s = jnp.einsum("bqhd,bkhd->bqhk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    qpos = qpos0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    kpos = kpos0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 3)
    s = jnp.where(kpos <= qpos, s, NEG_INF)
    m = jnp.max(s, axis=3, keepdims=True)  # [B,Tl,H,1]
    p = jnp.exp(s - m)
    p = jnp.where(kpos <= qpos, p, 0.0)  # kill exp(NEG_INF - NEG_INF) rows
    l = jnp.sum(p, axis=3, keepdims=True)
    acc = jnp.einsum("bqhk,bkhd->bqhd", p, v.astype(jnp.float32))
    return m, l, acc


def _flash_block(q, k, v, scale, causal: bool, interpret: bool):
    """Per-block (m, l, acc) via the Pallas flash kernel's residuals —
    the kernelized ring inner (O(Tl²) dots in VMEM tiles instead of an
    HBM-materialized XLA scores block)."""
    from ..ops.flash_attention import flash_attention

    tl = q.shape[1]
    blk = min(512, -(-tl // 128) * 128)
    out, m, l = flash_attention(q, k, v, scale, causal=causal,
                                block_q=blk, block_k=blk,
                                interpret=interpret, return_residuals=True)
    acc = out.astype(jnp.float32) * l[..., None]  # un-normalize for merging
    return m[..., None], l[..., None], acc


def _ring_body(q, k, v, scale: float, axis: str, inner: str):
    """Per-shard ring attention; call inside an existing shard_map.

    ``inner``: "xla" (masked-softmax block), "flash"/"flash_interpret" (the
    Pallas flash kernel with residual stats; the block kind — full, diagonal,
    empty — is a traced `lax.switch` on the ring offset, so each branch keeps
    a static causal flag)."""
    n = jax.lax.axis_size(axis)
    i = jax.lax.axis_index(axis)
    b, tl, h, d = q.shape
    qpos0 = i * tl

    # constants start axis-unvarying inside shard_map; mark them varying so
    # the fori_loop carry types stay fixed across iterations
    def varying(x):
        return jax.lax.pcast(x, (axis,), to="varying")

    m0 = varying(jnp.full((b, tl, h, 1), NEG_INF, jnp.float32))
    l0 = varying(jnp.zeros((b, tl, h, 1), jnp.float32))
    a0 = varying(jnp.zeros((b, tl, h, d), jnp.float32))
    perm = [(s, (s + 1) % n) for s in range(n)]

    def attend(j, kc, vc):
        if inner == "xla":
            return _block_attend(q, kc, vc, qpos0, j * tl, scale)
        interp = inner == "flash_interpret"

        def full_blk(kc, vc):
            return _flash_block(q, kc, vc, scale, causal=False, interpret=interp)

        def diag_blk(kc, vc):
            return _flash_block(q, kc, vc, scale, causal=True, interpret=interp)

        def skip_blk(kc, vc):
            return (jnp.full((b, tl, h, 1), NEG_INF, jnp.float32),
                    jnp.zeros((b, tl, h, 1), jnp.float32),
                    jnp.zeros((b, tl, h, d), jnp.float32))

        which = jnp.where(j < i, 0, jnp.where(j == i, 1, 2))
        return jax.lax.switch(which, (full_blk, diag_blk, skip_blk), kc, vc)

    def step(s, carry):
        m, l, acc, kc, vc = carry
        j = (i - s) % n  # origin block of the K/V currently held
        mb, lb, ab = attend(j, kc, vc)
        m_new = jnp.maximum(m, mb)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(mb - m_new)
        l = alpha * l + beta * lb
        acc = alpha * acc + beta * ab
        kc = jax.lax.ppermute(kc, axis, perm)
        vc = jax.lax.ppermute(vc, axis, perm)
        return m_new, l, acc, kc, vc

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, step, (m0, l0, a0, k, v))
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    return (acc * l_inv).astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mesh: Mesh,
    axis: str = "sp",
    inner: str = "auto",
) -> jnp.ndarray:
    """q,k,v: [B, T, H, D] global, T sharded on ``axis`` → [B, T, H, D].

    T must divide evenly by the axis size.  Equal Q/KV head counts (repeat
    GQA KV heads first).

    ``inner`` selects the per-block attention: "auto" uses the Pallas flash
    kernel on TPU when the local block is big enough to tile (same bar as
    `models.attention._flash_eligible`), XLA masked softmax otherwise;
    "flash"/"flash_interpret"/"xla" force a path."""
    b, t, h, d = q.shape
    n = mesh.shape[axis]
    if t % n:
        raise ValueError(f"T {t} not divisible by {axis}={n}")
    if inner == "auto":
        from ..models.attention import _flash_eligible

        inner = "flash" if _flash_eligible(t // n, d) else "xla"
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_ring_body, scale=scale, axis=axis, inner=inner),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        # pallas_call outputs carry no vma annotation (same opt-out as
        # runtime.tp_engine's shard_maps)
        check_vma=False,
    )
    return fn(q, k, v)
