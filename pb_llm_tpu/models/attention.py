"""Shared attention helpers: causal masking and KV-cache updates that accept
a scalar position (prefill/eval) OR a per-batch position vector [B]
(continuous-batching decode, where every slot is at a different length).

The reference has no inference engine at all (SURVEY.md §3.5) — its "decode"
is a full dense forward.  These helpers are the building blocks of the
engine the TPU build adds.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import jax
import numpy as np
import jax.numpy as jnp

Pos = Union[int, jnp.ndarray]


def set_attention_impl(impl: str) -> None:
    """Process-default full-sequence attention impl ("auto" = Pallas flash
    on TPU for long windows, XLA masked softmax otherwise).  Per-FIELD
    override on `ops.kernel_config` — other fields keep their env/default
    resolution; per-engine arms via EngineConfig.kernels / `use_kernels`."""
    from ..ops import kernel_config as _kc

    _kc.set_field_default(attention=impl)


# sequence-parallel context: while set, the no-cache full-sequence attention
# runs as RING attention over the mesh's 'sp' axis (parallel.ring_attention)
# instead of letting GSPMD all-gather the sequence — the long-context eval
# path (reference fixes seqlen at 2048 on one device, SURVEY §5.7).
_SP_MESH = None


class sequence_parallel:
    """Context manager: `with sequence_parallel(mesh): fam.forward(...)`
    makes every full-sequence attention a ring attention over mesh['sp'].
    Affects tracing — enter it around the first (compiling) call."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        global _SP_MESH
        self._prev = _SP_MESH
        _SP_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _SP_MESH
        _SP_MESH = self._prev
        return False


def _flash_eligible(t: int, d: int) -> bool:
    # Measured (scripts/bench_flash.py, T=2048/4096, H=32, D=128): with
    # 512x512 blocks the flash kernel beats XLA's fused attention 2.4-2.5x
    # (2048: 1.08 vs 2.68 ms; 4096: 3.76 vs 9.20 ms, f32 dots).  Round 1's
    # 128x128 blocks were the problem (0.9x), not the kernel.  Auto uses
    # flash on TPU for windows >= 1024 where the big blocks fit without
    # mostly-padding; shorter windows stay on XLA.
    return t >= 1024 and d % 8 == 0 and jax.default_backend() == "tpu"


def full_causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale,
                          window: Optional[int] = None) -> jnp.ndarray:
    """Dispatch for the no-cache (prefill/eval) path. q,k,v: [B,T,H*,D].

    ``window``: sliding-window attention (Mistral) — runs the XLA masked
    path (the flash kernel and the SP ring assume dense causal; a windowed
    flash variant is a roadmap item, and the window rarely binds at eval
    seqlens anyway)."""
    b, t, hq, d = q.shape
    if window is not None:
        if _SP_MESH is not None:
            raise NotImplementedError(
                "sliding-window attention under sequence parallelism is "
                "unsupported — evaluate without --sp or with window=None")
        return masked_softmax_attention(
            q, k, v, causal_allowed(0, t, t, None, window), scale)
    if _SP_MESH is not None:
        from ..parallel.ring_attention import ring_attention

        hkv = k.shape[2]
        if hq != hkv:
            k = jnp.repeat(k, hq // hkv, axis=2)
            v = jnp.repeat(v, hq // hkv, axis=2)
        # scale may be traced (closed over model params): fold it into q so
        # the ring body's static args stay static
        q = q * jnp.asarray(scale, q.dtype)
        return ring_attention(q, k, v, 1.0, _SP_MESH).astype(q.dtype)
    from ..ops import kernel_config as _kc

    impl = _kc.current().attention
    if impl == "auto":
        impl = "flash" if _flash_eligible(t, d) else "xla"
    if impl in ("flash", "flash_interpret"):
        from ..ops.flash_attention import flash_attention

        hkv = k.shape[2]
        if hq != hkv:
            k = jnp.repeat(k, hq // hkv, axis=2)
            v = jnp.repeat(v, hq // hkv, axis=2)
        return flash_attention(q, k, v, float(scale), causal=True, interpret=impl == "flash_interpret")
    return masked_softmax_attention(q, k, v, causal_allowed(0, t, t, None), scale)


def causal_allowed(pos: Pos, t: int, s: int, kv_len_valid: Optional[Pos],
                   window: Optional[int] = None) -> jnp.ndarray:
    """Boolean [*, 1, t, s] mask of allowed attention (broadcasts over heads).

    Query i sits at absolute position pos(+i); keys are cache rows 0..s-1;
    rows at or before the query and inside the valid cache length attend.
    ``window``: sliding-window attention (Mistral) — additionally require
    the key within the last ``window`` positions (kpos > qpos - window;
    HF semantics: the query's own position plus window-1 before it).
    """
    p = jnp.asarray(pos)
    kpos = jnp.arange(s)
    if p.ndim == 0:
        qpos = p + jnp.arange(t)
        allowed = kpos[None, :] <= qpos[:, None]              # [t, s]
        if window is not None:
            allowed = allowed & (kpos[None, :] > qpos[:, None] - window)
        if kv_len_valid is not None:
            allowed = allowed & (kpos[None, :] < jnp.asarray(kv_len_valid))
        return allowed[None, None]                            # [1, 1, t, s]
    qpos = p[:, None] + jnp.arange(t)[None, :]                # [B, t]
    allowed = kpos[None, None, :] <= qpos[:, :, None]         # [B, t, s]
    if window is not None:
        allowed = allowed & (kpos[None, None, :] > qpos[:, :, None] - window)
    if kv_len_valid is not None:
        kl = jnp.asarray(kv_len_valid)
        allowed = allowed & (kpos[None, None, :] < kl[:, None, None])
    return allowed[:, None]                                   # [B, 1, t, s]


def masked_softmax_attention(q, k, v, allowed, scale) -> jnp.ndarray:
    """q:[B,t,Hq,d] k,v:[B,s,H,d] allowed:[*,1,t,s] → [B,t,Hq,d].

    Softmax in float32 (parity with the reference models' fp behavior).
    bf16 caches are upcast into the dots: a round-4 experiment dotted bf16
    natively on the hypothesis that the upcast materializes a 2x f32 cache
    copy — MEASURED WRONG (scripts/bench_attn_ab.py: upcast 2.563 vs
    bf16-native 2.668 ms/step, 8L B=8 ctx=512) — XLA fuses the convert into
    its attention fusion and the f32 matvecs lower better."""
    hq, hkv = q.shape[2], k.shape[2]
    if hq != hkv:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q * scale, k)
    scores = jnp.where(allowed, scores.astype(jnp.float32), -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def _scatter(buf: jnp.ndarray, val: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    if p.ndim == 0:
        return jax.lax.dynamic_update_slice(buf, val.astype(buf.dtype), (0, p) + (0,) * (buf.ndim - 2))
    b, t = val.shape[:2]
    rows = jnp.arange(b)[:, None]
    cols = p[:, None] + jnp.arange(t)[None, :]
    return buf.at[rows, cols].set(val.astype(buf.dtype))


def cache_update(cache: Dict[str, jnp.ndarray], k: jnp.ndarray, v: jnp.ndarray, pos: Pos) -> Dict[str, jnp.ndarray]:
    """Write k/v [B, t, H, d] into cache [B, S, H, d] at position(s) ``pos``.

    Quantized caches (int8 k/v + per-(token, head) float scales under
    "k_scale"/"v_scale") are detected by key; values are absmax-quantized on
    write and dequantized by `cache_kv` on read — the KV cache is the
    second-largest HBM consumer after the weights, and int8 halves it vs
    bf16 (4x vs f32).

    Paged caches ("k_pages"/"v_pages" + "table", see `runtime.paged_kv`)
    scatter into the global page pool instead: decode (t == 1, vector pos)
    writes one token per slot at the table-directed page, prefill (t > 1,
    single slot carrying "slot_pages") writes page-aligned blocks."""
    if "k_pages" in cache:
        from ..runtime import paged_kv

        out = dict(cache)
        page = cache["k_pages"].shape[2]  # head-major pages [P+1, H, page, D]

        def _q(val):  # absmax int8 per (token, head), like the strip cache
            scale = jnp.maximum(jnp.max(jnp.abs(val), axis=-1) / 127.0, 1e-8)
            return jnp.clip(jnp.round(val / scale[..., None]), -127, 127), scale

        if "slot_pages" in cache:  # prefill: pos == 0, t % page == 0
            sp = cache["slot_pages"]
            batched = sp.ndim == 2  # [K, maxp] batched prefill; else one slot
            write = paged_kv.write_prompts if batched else paged_kv.write_prompt
            for name, val in (("k", k if batched else k[0]),
                              ("v", v if batched else v[0])):
                if "k_scale_pages" in cache:
                    val, scale = _q(val)
                    out[f"{name}_scale_pages"] = write(
                        cache[f"{name}_scale_pages"], scale, sp)
                out[f"{name}_pages"] = write(cache[f"{name}_pages"], val, sp)
            return out
        p = jnp.asarray(pos)  # [B] per-slot positions
        t = k.shape[1]
        if t == 1:
            page_ids = jnp.take_along_axis(cache["table"], (p // page)[:, None], axis=1)[:, 0]
            for name, val in (("k", k[:, 0]), ("v", v[:, 0])):
                if "k_scale_pages" in cache:
                    val, scale = _q(val)
                    out[f"{name}_scale_pages"] = paged_kv.write_token(
                        cache[f"{name}_scale_pages"], scale, page_ids, p % page)
                out[f"{name}_pages"] = paged_kv.write_token(
                    cache[f"{name}_pages"], val, page_ids, p % page)
            return out
        # multi-token window (speculative verify): per-token table lookup —
        # a slot's window may span a page boundary.  Clamp to the final
        # position: INACTIVE slots are parked at max_seq-1 (see
        # Engine.start_chunked_prefill) and their window would otherwise
        # index past the table and alias a live page's early offsets.
        ptok = p[:, None] + jnp.arange(t)[None, :]          # [B, t]
        ptok = jnp.minimum(ptok, cache["table"].shape[1] * page - 1)
        page_ids = jnp.take_along_axis(cache["table"], ptok // page, axis=1)
        for name, val in (("k", k), ("v", v)):
            if "k_scale_pages" in cache:
                val, scale = _q(val)
                out[f"{name}_scale_pages"] = paged_kv.write_tokens(
                    cache[f"{name}_scale_pages"], scale, page_ids, ptok % page)
            out[f"{name}_pages"] = paged_kv.write_tokens(
                cache[f"{name}_pages"], val, page_ids, ptok % page)
        return out
    p = jnp.asarray(pos)
    out = dict(cache)
    if "k_scale" in cache:
        for name, val in (("k", k), ("v", v)):
            scale = jnp.max(jnp.abs(val), axis=-1, keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-8)
            q = jnp.clip(jnp.round(val / scale), -127, 127)
            out[name] = _scatter(cache[name], q, p)
            out[f"{name}_scale"] = _scatter(cache[f"{name}_scale"], scale, p)
        return out
    out["k"] = _scatter(cache["k"], k, p)
    out["v"] = _scatter(cache["v"], v, p)
    return out


def cached_attention(kv_cache: Dict[str, jnp.ndarray], q: jnp.ndarray,
                     k_new: jnp.ndarray, v_new: jnp.ndarray, pos: Pos,
                     scale, window: Optional[int] = None) -> jnp.ndarray:
    """Attention over an already-updated cache (strip or paged).

    q/k_new/v_new [B, t, H*, d]; returns [B, t, Hq, d].  Strip caches run
    the masked-softmax path; paged caches run the Pallas paged-attention
    decode kernel (t == 1) or plain causal attention over the fresh
    prompt K/V (prefill: the prompt's own keys are all it can see).
    ``window``: sliding-window attention (Mistral) — strip caches only
    (the XLA masked path handles the lower bound; the Pallas decode kernel
    and the paged pool assume a dense causal prefix)."""
    b, t, hq, d = q.shape
    if "k_pages" in kv_cache:
        if window is not None:
            raise NotImplementedError(
                "sliding-window attention requires strip caches — serve "
                "Mistral-family models without --page_size")
        from ..ops.paged_attention import paged_attention, paged_attention_multi

        kp, vp = kv_cache["k_pages"], kv_cache["v_pages"]
        interp = jax.default_backend() == "cpu"
        common = dict(page_size=kp.shape[2],
                      k_scale_pages=kv_cache.get("k_scale_pages"),
                      v_scale_pages=kv_cache.get("v_scale_pages"),
                      interpret=interp)
        if "chunk_table" in kv_cache:
            # chunked-prefill continuation: the chunk's rows are written to
            # pages already; attend the slot's whole history through its
            # (full) table row with base = the chunk's global offset
            out = paged_attention_multi(
                q, kp, vp, kv_cache["chunk_table"],
                jnp.asarray(pos)[None], scale, **common)
            return out.astype(q.dtype)
        if jnp.asarray(pos).ndim == 0:  # one-shot prefill: self-contained window
            return full_causal_attention(q, k_new, v_new, scale)
        if t == 1:
            lengths = jnp.asarray(pos) + 1  # includes the token just written
            table = kv_cache["table"]
            maxp = table.shape[1]
            if maxp > 4:
                # windowed page-table read (same idea as the strip window
                # below): a slot's live pages are a prefix of its table row,
                # so lax.switch over power-of-two table widths covering
                # max(lengths) trims the kernel's (slot, page) grid — the
                # paged kernel's cost is dominated by per-step fixed
                # overhead once trash-page DMA elision removes the dead
                # reads.  Exact: pages at or beyond a slot's length carried
                # zero probability (NEG_INF scores) either way.
                page = kp.shape[2]
                widths = []
                w = 4
                while w < maxp:
                    widths.append(w)
                    w *= 2
                widths.append(maxp)
                needed = (jnp.max(lengths) + page - 1) // page

                def _branch(wp):
                    out = paged_attention(q[:, 0], kp, vp, table[:, :wp],
                                          lengths, scale, **common)
                    return out[:, None].astype(q.dtype)

                idx = jnp.sum(jnp.asarray(
                    [needed > wp for wp in widths[:-1]]).astype(jnp.int32))
                return jax.lax.switch(
                    idx, [lambda wp=wp: _branch(wp) for wp in widths])
            out = paged_attention(q[:, 0], kp, vp, table, lengths,
                                  scale, **common)
            return out[:, None].astype(q.dtype)
        # multi-query window (speculative verify): rows already written
        out = paged_attention_multi(q, kp, vp, kv_cache["table"],
                                    jnp.asarray(pos), scale, **common)
        return out.astype(q.dtype)
    s = kv_cache["k"].shape[1]
    p = jnp.asarray(pos)
    if p.ndim == 1 and t == 1 and window is None:
        # batched single-token decode: the fused Pallas strip kernel
        # (ops.decode_attention) when enabled — XLA parity on bf16 strips,
        # 1.7x on int8 strips (dequant scales fold outside the
        # contractions; scripts/bench_attn_layout.py), and it composes
        # with the power-of-two window below WITHOUT slicing (the grid
        # just never visits blocks past s_used).
        from ..ops import kernel_config as _kc

        impl = _kc.current().decode_attention
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if impl in ("pallas", "pallas_q8", "pallas_interpret"):
            from ..ops.decode_attention import decode_attention

            def _kcall(w):
                out = decode_attention(
                    q[:, 0], kv_cache["k"], kv_cache["v"], p + 1, scale,
                    k_scale=kv_cache.get("k_scale"),
                    v_scale=kv_cache.get("v_scale"),
                    s_used=w,
                    q_int8=impl == "pallas_q8" and "k_scale" in kv_cache,
                    interpret=impl == "pallas_interpret")
                return out[:, None].astype(q.dtype)

            if s <= 256:
                return _kcall(s)
            widths = []
            w = 256
            while w < s:
                widths.append(w)
                w *= 2
            widths.append(s)
            needed = jnp.max(p) + 1
            idx = jnp.sum(jnp.asarray(
                [needed > w for w in widths[:-1]]).astype(jnp.int32))
            return jax.lax.switch(idx, [lambda w=w: _kcall(w) for w in widths])
    if p.ndim == 1 and s > 256:
        # batched decode / spec verify: WINDOWED cache read.  Every strip
        # slot's valid rows are the prefix [0, lengths_b + t), so one
        # lax.switch over power-of-two windows covering max(lengths) + t
        # reads only the live prefix of the cache instead of all max_seq
        # rows — the attention read was 49% of the 32-layer decode step
        # (bench_e2e --budget) and is HBM-bound, and most steps sit far
        # below max_seq.  Numerically equivalent: rows beyond the window
        # carried -inf scores (exactly zero probability) in the full read;
        # only the f32 softmax/PV reduction order changes with the column
        # count (tests pin a 2e-4 reduction-order tolerance).
        windows = []
        w = 256
        while w < s:
            windows.append(w)
            w *= 2
        windows.append(s)
        needed = jnp.max(p) + t

        def _branch(w):
            win = {k: v[:, :w] for k, v in kv_cache.items()}
            ck, cv = cache_kv(win, q.dtype)
            allowed = causal_allowed(pos, t, w, p + t, window)
            return masked_softmax_attention(q, ck, cv, allowed, scale)

        idx = jnp.sum(jnp.asarray([needed > w for w in windows[:-1]]).astype(jnp.int32))
        return jax.lax.switch(idx, [lambda w=w: _branch(w) for w in windows])
    allowed = causal_allowed(pos, t, s, p + t, window)
    ck, cv = cache_kv(kv_cache, q.dtype)
    return masked_softmax_attention(q, ck, cv, allowed, scale)


def cache_kv(cache: Dict[str, jnp.ndarray], dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Read (k, v) [B, S, H, d] in compute dtype, dequantizing if needed.
    (The upcast does NOT materialize a cache copy — XLA fuses it into the
    attention fusion; measured in scripts/bench_attn_ab.py.)"""
    if "k_scale" in cache:
        k = cache["k"].astype(dtype) * cache["k_scale"].astype(dtype)
        v = cache["v"].astype(dtype) * cache["v_scale"].astype(dtype)
        return k, v
    return cache["k"].astype(dtype), cache["v"].astype(dtype)
