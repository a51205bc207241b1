"""Paged-attention decode kernel (Pallas TPU, scalar-prefetched page table).

KV lives in a global page pool ([n_pages, H, page_size, D] head-major per
layer — both grouped-dot operands then carry heads at batch-dim 0) instead
of per-slot max_seq strips; each slot owns a list of pages (`runtime.paged_kv`).
HBM per request is then proportional to its actual length, so a pool serves
far more concurrent requests than the fixed-strip layout when lengths vary —
the vLLM PagedAttention idea, built TPU-style: the page table rides the
grid's scalar-prefetch channel, so each (slot, page) grid step DMAs exactly
the page the table names (`pltpu.PrefetchScalarGridSpec`), and the softmax
runs online over pages (same recurrence as `ops.flash_attention`).

Decode-only (one query token per slot): prefill writes pages densely and has
no need for table-directed reads.  Equal Q/KV heads — GQA callers repeat KV
heads first (same contract as the flash kernel).  Prior art: jax ships
`pallas.ops.tpu.paged_attention`; this kernel is written for this repo's
layouts and tested against a NumPy oracle like the rest of `ops/`.

Reference counterpart: none (the reference has no serving path at all,
SURVEY.md §3.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(table_ref, len_ref, q_ref, k_ref, v_ref, *rest,
            page_size: int, n_pages_per_slot: int, n_groups: int,
            quantized: bool, q_len: int):
    """One (slot, page) grid step.  ``q_len`` > 1 is the speculative-verify
    window: q block [1, q_len, Hq, D], row (g, j) of the grouped scores may
    attend keys at positions <= base + j (base = keys valid BEFORE the
    window; the window's own rows are already written to pages)."""
    if quantized:  # int8 pages carry per-(token, head) f32 scale planes
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    base = len_ref[b]  # q_len == 1 decode: base = length - 1 (the caller maps)
    start = p * page_size

    @pl.when(start < base + q_len)
    def _():
        hq, d = q_ref.shape[2], q_ref.shape[3]
        hkv = hq // n_groups
        rows = n_groups * q_len
        # GQA grouped in-kernel: q heads [Hkv, G, D]; q head i reads kv head
        # i // G — same convention as jnp.repeat(k, G, axis=2) outside.
        # Pages are [Hkv, page, D] so BOTH dot operands carry the batch
        # (head) dim at index 0 — Mosaic requires equal batch dim positions.
        q = q_ref[0]  # [q_len, Hq, D], pre-scaled by the caller
        q = q.transpose(1, 0, 2).reshape(hkv, rows, d)  # row = g*q_len + j
        k = k_ref[0]  # [Hkv, page, D]
        v = v_ref[0]
        if quantized:
            k = k.astype(jnp.float32)
            v = v.astype(jnp.float32)
        # [Hkv, rows, page]: batch over kv heads, contract D
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        if quantized:
            # dequant K AFTER the dot: s[..., t] scales by k_scale[t] — exact
            # (per-token scale factors out of the contraction over D), and
            # [Hkv, rows, page] elements << [Hkv, page, D]
            s = s * ks_ref[0].reshape(hkv, 1, page_size)
        pos = start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        # per-row causal limit: row (g, j) sees keys < base + j + 1
        j_row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) % q_len
        allowed = pos < base + 1 + j_row
        s = jnp.where(allowed, s, NEG_INF)

        m_prev = m_ref[:, :1].reshape(hkv, rows, 1)
        l_prev = l_ref[:, :1].reshape(hkv, rows, 1)
        m_curr = jnp.max(s, axis=2, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        pw = jnp.exp(s - m_next)
        pw = jnp.where(allowed, pw, 0.0)
        l_next = alpha * l_prev + jnp.sum(pw, axis=2, keepdims=True)
        l_ref[:] = jnp.broadcast_to(l_next.reshape(hkv * rows, 1), l_ref.shape)
        m_ref[:] = jnp.broadcast_to(m_next.reshape(hkv * rows, 1), m_ref.shape)
        if quantized:
            # dequant V BEFORE its dot by folding the per-token scale into
            # the probability weights: sum_t pw[t]·scale[t]·v_q[t]
            pw = pw * vs_ref[0].reshape(hkv, 1, page_size)
        # [Hkv, rows, D]: batch over kv heads, contract page
        pv = jax.lax.dot_general(
            pw, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        acc_ref[:] = acc_ref[:] * alpha.reshape(hkv * rows, 1) + pv.reshape(hkv * rows, d)

    @pl.when(p == n_pages_per_slot - 1)
    def _():
        hq, d = q_ref.shape[2], q_ref.shape[3]
        hkv = hq // n_groups
        l = l_ref[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        out = acc_ref[:] * l_inv  # [Hkv*G*q_len, D]
        out = out.reshape(hkv, n_groups, q_len, d).transpose(2, 0, 1, 3)
        o_ref[0] = out.reshape(q_len, hq, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_attention(
    q: jnp.ndarray,            # [B, H, D] one query token per slot
    k_pages: jnp.ndarray,      # [P, H, page, D] (head-major pages; f32/bf16 or int8)
    v_pages: jnp.ndarray,      # [P, H, page, D]
    page_table: jnp.ndarray,   # [B, maxp] int32; entries past the length may be any valid index
    lengths: jnp.ndarray,      # [B] int32 valid KV length per slot
    scale,
    page_size: int,
    k_scale_pages: jnp.ndarray = None,  # [P, H, page] f32 — int8 pages only
    v_scale_pages: jnp.ndarray = None,
    interpret: bool = False,
) -> jnp.ndarray:
    b, hq, d = q.shape
    hkv = k_pages.shape[1]
    if hq % hkv:
        raise ValueError(f"q heads {hq} not a multiple of kv heads {hkv}")
    # t=1 decode: kernel convention wants base = keys valid BEFORE the
    # query token; the public convention here includes the just-written one
    out = _paged_call(q[:, None], k_pages, v_pages, page_table, lengths - 1,
                      scale, page_size, k_scale_pages, v_scale_pages, interpret)
    return out[:, 0]


@functools.partial(jax.jit, static_argnames=("page_size", "interpret"))
def paged_attention_multi(
    q: jnp.ndarray,            # [B, t, H, D] — a small causal window per slot
    k_pages: jnp.ndarray,
    v_pages: jnp.ndarray,
    page_table: jnp.ndarray,
    base_lengths: jnp.ndarray,  # [B] keys valid BEFORE this window
    scale,
    page_size: int,
    k_scale_pages: jnp.ndarray = None,
    v_scale_pages: jnp.ndarray = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-query paged decode (speculative verify): the window's own t
    rows must already be written to the pages; query j attends keys at
    positions <= base + j."""
    b, t, hq, d = q.shape
    hkv = k_pages.shape[1]
    if hq % hkv:
        raise ValueError(f"q heads {hq} not a multiple of kv heads {hkv}")
    return _paged_call(q, k_pages, v_pages, page_table, base_lengths, scale,
                       page_size, k_scale_pages, v_scale_pages, interpret)


def _paged_call(q, k_pages, v_pages, page_table, base_lengths, scale,
                page_size, k_scale_pages, v_scale_pages, interpret):
    b, q_len, hq, d = q.shape
    hkv = k_pages.shape[1]
    quantized = k_scale_pages is not None
    if quantized != (k_pages.dtype == jnp.int8):
        raise ValueError("int8 pages require k/v scale pages (and vice versa)")
    maxp = page_table.shape[1]
    # fold the softmax scale into q outside the kernel (scale may be traced)
    q = (q.astype(jnp.float32) * jnp.asarray(scale, jnp.float32)).astype(
        jnp.float32 if quantized else q.dtype)

    page_spec = pl.BlockSpec((1, hkv, page_size, d), lambda bi, p, tbl, ln: (tbl[bi, p], 0, 0, 0))
    in_specs = [
        pl.BlockSpec((1, q_len, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0, 0)),
        page_spec, page_spec,
    ]
    operands = [q, k_pages, v_pages]
    if quantized:
        scale_spec = pl.BlockSpec((1, hkv, page_size), lambda bi, p, tbl, ln: (tbl[bi, p], 0, 0))
        in_specs += [scale_spec, scale_spec]
        operands += [k_scale_pages, v_scale_pages]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, maxp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, q_len, hq, d), lambda bi, p, tbl, ln: (bi, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hq * q_len, 128), jnp.float32),  # running max
            pltpu.VMEM((hq * q_len, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((hq * q_len, d), jnp.float32),    # output accumulator
        ],
    )
    kernel = functools.partial(
        _kernel, page_size=page_size, n_pages_per_slot=maxp,
        n_groups=hq // hkv, quantized=quantized, q_len=q_len,
    )
    out_dtype = jnp.float32 if quantized else q.dtype
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, q_len, hq, d), out_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table.astype(jnp.int32), base_lengths.astype(jnp.int32), *operands)


def paged_attention_reference(q, k_pages, v_pages, page_table, lengths, scale,
                              page_size, k_scale_pages=None, v_scale_pages=None):
    """NumPy-style oracle: gather pages densely, full masked softmax.
    Pages are head-major [P, H, page, D]; handles GQA by repeating KV heads
    and int8 pages by dequantizing them up front."""
    if k_scale_pages is not None:
        k_pages = k_pages.astype(jnp.float32) * k_scale_pages[..., None]
        v_pages = v_pages.astype(jnp.float32) * v_scale_pages[..., None]
        q = q.astype(jnp.float32)
    b, h, d = q.shape
    hkv = k_pages.shape[1]
    if h != hkv:
        k_pages = jnp.repeat(k_pages, h // hkv, axis=1)
        v_pages = jnp.repeat(v_pages, h // hkv, axis=1)
    maxp = page_table.shape[1]
    # [B, maxp, H, page, D] -> [B, maxp, page, H, D] -> [B, S, H, D]
    k = jnp.swapaxes(k_pages[page_table], 2, 3).reshape(b, maxp * page_size, h, d)
    v = jnp.swapaxes(v_pages[page_table], 2, 3).reshape(b, maxp * page_size, h, d)
    s = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    pos = jnp.arange(maxp * page_size)[None, None, :]
    s = jnp.where(pos < lengths[:, None, None], s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", w, v.astype(jnp.float32)).astype(q.dtype)
