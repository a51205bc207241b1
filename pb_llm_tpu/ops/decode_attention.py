"""Fused strip-cache decode-attention kernel (Pallas TPU).

Batched decode (one query token per slot) over the engine's strip KV cache
[B, S, H, D].  Round-4 measurements (scripts/bench_attn_layout.py) showed
the XLA attention einsum streams the cache near the dense rate in
ISOLATION (716 GB/s vs 811 dense, same run) — but in the full model the
attention step costs ~1.5x that (bench_e2e --budget: 4.37 ms at 32L vs a
2.9 ms isolated cost), and the int8-KV read collapses to ~480 GB/s because
XLA dequantizes per ELEMENT.  This kernel attacks both:

* one MXU dot per (slot, s-block) instead of per-head matvecs: the key
  block reshapes [S_blk, H, D] -> [S_blk, H*D] (free, contiguous) and
  multiplies a BLOCK-DIAGONAL query matrix Qbd [H*D, Hq] built in-kernel
  (Qbd[h*D+d, hq] = q[hq, d] iff h == hq // G), so scores for every head
  come out of a single [S_blk, H*D] x [H*D, Hq] MXU pass.  m=1-per-head
  batched dots (the paged kernel's shape) cannot hide under the block DMA;
  this one does (~0.3 us compute vs ~2.4 us DMA per 2 MB block).
* int8 KV dequant rides the contractions: the per-(token, head) K scale
  multiplies the SCORES (it factors out of the D-contraction) and the V
  scale folds into the probability weights before the PV dot — per-element
  dequant cost becomes per-(token, head), and the cache streams at half
  the bf16 bytes.
* the PV product is one dot too: P^T [Hq, S_blk] x V2 [S_blk, H*D] ->
  [Hq, H*D], from which the (hq, hq // G) diagonal D-slices are extracted
  by an eye-mask reduction (the 32x cross-term flop waste is free — the
  kernel is bandwidth-bound).
* ``block_b`` > 1 (round 5, VERDICT r4 item 2): K slots ride ONE grid
  step — their cache strips arrive in one K-times-larger DMA and their
  dots run back to back off a shared Qbd scratch, amortizing the ~1 us
  per-grid-step fixed cost (measured: 16 grid steps at B=8/ctx512 cost
  ~16 us/layer of pure overhead at the bf16 dense-rate floor).  Per-slot
  dots (not one K-wide block-diagonal dot) keep compute linear in K, so
  the kernel stays bandwidth-bound.

Softmax is the online/flash recurrence over s-blocks (same as
`ops.flash_attention`).  Length masking: decode reads rows < lengths[b]
(the just-written token included).  The caller's power-of-two window
switch composes WITHOUT slicing: each branch calls with a smaller
``s_used`` and the grid simply never visits blocks past the window — the
operands stay the full cache arrays (a sliced pallas operand would be
materialized, doubling traffic — the round-3 harness lesson).

Reference counterpart: none (the reference has no inference engine,
SURVEY.md §3.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _expand_groups(sc, n_groups):
    """[S_blk, Hkv] -> [S_blk, Hq=Hkv*G] with column c = sc[:, c // G].

    jnp.repeat on the lane axis does not lower on Mosaic for small Hkv
    (``tpu.reshape vector<SxHkvxG> -> vector<SxHq>`` is rejected); a dot
    against the constant group-expansion matrix E[kv, c] = (c // G == kv)
    always lowers and is MXU-trivial at these shapes.
    """
    if n_groups == 1:
        return sc
    hkv = sc.shape[1]
    hq = hkv * n_groups
    rows = jax.lax.broadcasted_iota(jnp.int32, (hkv, hq), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hkv, hq), 1) // n_groups
    e = (rows == cols).astype(sc.dtype)
    return jax.lax.dot_general(sc, e, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(len_ref, q_ref, k_ref, v_ref, *rest, block_b: int, block_s: int,
            n_blocks: int, n_groups: int, quantized: bool, q_int8: bool):
    if q_int8:
        ks_ref, vs_ref, qs_ref, o_ref, qbd_ref, m_ref, l_ref, acc_ref = rest
    elif quantized:
        ks_ref, vs_ref, o_ref, qbd_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, qbd_ref, m_ref, l_ref, acc_ref = rest
    i = pl.program_id(0)
    j = pl.program_id(1)
    bb, hq, d = q_ref.shape
    hkv = k_ref.shape[2]
    hd = hkv * d

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # Qbd [Hkv*D, bb*Hq]: all bb slots' block-diagonal query matrices
        # side by side; slot kb's dot slices columns [kb*Hq, (kb+1)*Hq).
        # Column c belongs to q head c % Hq, whose kv head is (c%Hq) // G.
        # q_int8: q arrives int8 (per-(slot, head) scale folded back into
        # the scores outside the dot) so Qbd is int8 and the scores dot
        # rides the int8 MXU against the UNCAST int8 key block — removing
        # the per-block K int8->bf16 cast (ROADMAP r5 item 8).
        acc_t = jnp.int32 if q_int8 else jnp.float32
        qt = q_ref[:].astype(acc_t).reshape(bb * hq, d).T  # [D, bb*Hq]
        tiled = jnp.broadcast_to(qt[None], (hkv, d, bb * hq)).reshape(hd, bb * hq)
        row_h = jax.lax.broadcasted_iota(jnp.int32, (hd, bb * hq), 0) // d
        col_h = (jax.lax.broadcasted_iota(jnp.int32, (hd, bb * hq), 1)
                 % hq) // n_groups
        qbd_ref[:] = jnp.where(row_h == col_h, tiled,
                               jnp.zeros((), acc_t)).astype(qbd_ref.dtype)

    start = j * block_s

    for kb in range(block_b):
        base = len_ref[i * block_b + kb]
        cs, ce = kb * hq, (kb + 1) * hq

        @pl.when(start < base)
        def _(kb=kb, base=base, cs=cs, ce=ce):
            k2 = k_ref[kb].reshape(block_s, hd)                # contiguous view
            if quantized and not q_int8:
                k2 = k2.astype(jnp.bfloat16)
            # HIGHEST keeps the f32-cache (CPU-test) path exact; bf16
            # operands multiply exactly on the MXU anyway, and Mosaic
            # rejects an fp32 contract precision on bf16 inputs.
            prec = (jax.lax.Precision.HIGHEST if k2.dtype == jnp.float32
                    else jax.lax.Precision.DEFAULT)
            s = jax.lax.dot_general(                           # [S_blk, Hq]
                k2, qbd_ref[:, cs:ce], (((1,), (0,)), ((), ())),
                precision=prec,
                preferred_element_type=jnp.int32 if q_int8 else jnp.float32)
            if q_int8:
                # int32-exact scores x (K scale ⊗ q scale); both factor out
                qrow = qs_ref[pl.dslice(i * block_b + kb, 1), :]  # [1, Hq]
                s = (s.astype(jnp.float32)
                     * _expand_groups(ks_ref[kb], n_groups)
                     * qrow)
            elif quantized:
                # per-(token, head) K scale factors out of the D-contraction
                ksc = ks_ref[kb]                               # [S_blk, Hkv]
                s = s * _expand_groups(ksc, n_groups)
            rows = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            allowed = rows < base
            s = jnp.where(allowed, s, NEG_INF)

            m_prev = m_ref[:, cs:ce]                           # [1, Hq]
            l_prev = l_ref[:, cs:ce]
            m_curr = jnp.max(s, axis=0, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp(m_prev - m_next)
            pw = jnp.exp(s - m_next)                           # [S_blk, Hq]
            pw = jnp.where(allowed, pw, 0.0)
            l_ref[:, cs:ce] = alpha * l_prev + jnp.sum(pw, axis=0, keepdims=True)
            m_ref[:, cs:ce] = m_next
            v2 = v_ref[kb].reshape(block_s, hd)
            if quantized:
                # V scale folds into the probability weights before the dot
                vsc = vs_ref[kb]
                pw = pw * _expand_groups(vsc, n_groups)
                v2 = v2.astype(jnp.bfloat16)
            pprec = (jax.lax.Precision.HIGHEST if v2.dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
            full = jax.lax.dot_general(                        # [Hq, Hkv*D]
                pw.astype(v2.dtype), v2, (((0,), (0,)), ((), ())),
                precision=pprec, preferred_element_type=jnp.float32)
            # extract the (hq, hq // G) diagonal D-slice per q head
            f3 = full.reshape(hq, hkv, d)
            qh = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv, 1), 0) // n_groups
            kh = jax.lax.broadcasted_iota(jnp.int32, (hq, hkv, 1), 1)
            pv = jnp.sum(jnp.where(qh == kh, f3, 0.0), axis=1)  # [Hq, D]
            acc_ref[cs:ce] = acc_ref[cs:ce] * alpha.reshape(hq, 1) + pv

    @pl.when(j == n_blocks - 1)
    def _():
        l = l_ref[:].reshape(bb * hq, 1)
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[:] = (acc_ref[:] * l_inv).reshape(bb, hq, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_used", "block_s", "block_b",
                                             "q_int8", "interpret"))
def decode_attention(q, k, v, lengths, scale, *, k_scale=None, v_scale=None,
                     s_used=None, block_s=256, block_b=1, q_int8=False,
                     interpret=False):
    """Batched single-token decode attention over a strip cache.

    q: [B, Hq, D] (f32 or bf16) — the current step's query, NOT pre-scaled.
    k, v: [B, S, H, D] bf16 (or int8 with k_scale/v_scale [B, S, H, 1] f32).
    lengths: [B] int32 — valid rows per slot INCLUDING the just-written
      token (row s attends iff s < lengths[b]).
    s_used: static window — only cache rows [0, s_used) are visited (the
      caller guarantees max(lengths) <= s_used); defaults to S.
    block_b: slots per grid step (amortizes per-step fixed cost; B must be
      divisible — callers use `slots_per_block(B)`); per-step VMEM block is
      block_b * block_s cache rows, so large block_b pairs with smaller
      block_s.
    q_int8 (int8 caches only): additionally absmax-quantize q per
      (slot, head) so the scores dot runs int8 x int8 on the MXU against
      the UNCAST key block — removes the per-block K int8->bf16 cast.
      Adds q's int8 rounding (~0.4% relative per element) on top of the
      cache's own; the V-side cast remains.
    Returns [B, Hq, D] float32.
    """
    b, hq, d = q.shape
    # fold the softmax scale into q outside the kernel (scale may be traced)
    q = q.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)
    s = k.shape[1]
    hkv = k.shape[2]
    n_groups = hq // hkv
    s_used = s if s_used is None else s_used
    block_s = min(block_s, s_used)
    n_blocks = (s_used + block_s - 1) // block_s
    quantized = k_scale is not None
    q_int8 = bool(q_int8 and quantized)
    if b % block_b:
        raise ValueError(f"block_b={block_b} must divide B={b}")
    if q_int8:
        qsc = jnp.maximum(jnp.max(jnp.abs(q), axis=-1), 1e-30) / 127.0  # [B, Hq]
        q = jnp.clip(jnp.round(q / qsc[..., None]), -127, 127).astype(jnp.int8)

    grid = (b // block_b, n_blocks)
    qspec = pl.BlockSpec((block_b, hq, d), lambda i, j, ln: (i, 0, 0))
    kvspec = pl.BlockSpec((block_b, block_s, hkv, d),
                          lambda i, j, ln: (i, j, 0, 0))
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if quantized:
        # squeeze the cache's [B, S, H, 1] scales to 3D: a trailing dim of 1
        # would be lane-padded to 128 in VMEM (128x the block footprint)
        scspec = pl.BlockSpec((block_b, block_s, hkv),
                              lambda i, j, ln: (i, j, 0))
        in_specs += [scspec, scspec]
        args += [k_scale.astype(jnp.float32).reshape(b, s, hkv),
                 v_scale.astype(jnp.float32).reshape(b, s, hkv)]
        if q_int8:
            # full-array block (trivial window): a (block_b, hq) block
            # violates the 8-sublane tiling rule for small block_b; the
            # kernel row-indexes dynamically instead
            in_specs.append(pl.BlockSpec((b, hq), lambda i, j, ln: (0, 0)))
            args.append(qsc.astype(jnp.float32))

    kern = functools.partial(
        _kernel, block_b=block_b, block_s=block_s, n_blocks=n_blocks,
        n_groups=n_groups, quantized=quantized, q_int8=q_int8)
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_b, hq, d),
                                   lambda i, j, ln: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hkv * d, block_b * hq),
                           jnp.int8 if q_int8 else
                           jnp.bfloat16 if quantized or k.dtype == jnp.bfloat16 else jnp.float32),
                pltpu.VMEM((1, block_b * hq), jnp.float32),
                pltpu.VMEM((1, block_b * hq), jnp.float32),
                pltpu.VMEM((block_b * hq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hq, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), *args)
    return out
