"""Shared attention helpers: causal masking and KV-cache updates that accept
a scalar position (prefill/eval) OR a per-batch position vector [B]
(continuous-batching decode, where every slot is at a different length).

The reference has no inference engine at all (SURVEY.md §3.5) — its "decode"
is a full dense forward.  These helpers are the building blocks of the
engine the TPU build adds.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

Pos = Union[int, jnp.ndarray]

# full-sequence (no-cache) attention implementation: "auto" uses the Pallas
# flash kernel on TPU for long windows, XLA masked softmax otherwise
_ATTN_IMPL = os.environ.get("PB_TPU_ATTENTION", "auto")


def set_attention_impl(impl: str) -> None:
    global _ATTN_IMPL
    assert impl in ("auto", "flash", "flash_interpret", "xla")
    _ATTN_IMPL = impl


def _flash_eligible(t: int, d: int) -> bool:
    # Measured on v5e (T=2048, H=32, D=128): XLA's fused attention beats this
    # flash kernel 2.42 ms vs 3.64 ms, so "auto" stays on XLA; flash remains
    # opt-in (PB_TPU_ATTENTION=flash) pending block-size tuning. Its value is
    # O(T) memory for long windows, not speed at 2048.
    return False


def full_causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale) -> jnp.ndarray:
    """Dispatch for the no-cache (prefill/eval) path. q,k,v: [B,T,H*,D]."""
    b, t, hq, d = q.shape
    impl = _ATTN_IMPL
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


def causal_allowed(pos: Pos, t: int, s: int, kv_len_valid: Optional[Pos]) -> jnp.ndarray:
    """Boolean [*, 1, t, s] mask of allowed attention (broadcasts over heads).

    Query i sits at absolute position pos(+i); keys are cache rows 0..s-1;
    rows at or before the query and inside the valid cache length attend.
    """
    p = jnp.asarray(pos)
    kpos = jnp.arange(s)
    if p.ndim == 0:
        qpos = p + jnp.arange(t)
        allowed = kpos[None, :] <= qpos[:, None]              # [t, s]
        if kv_len_valid is not None:
            allowed = allowed & (kpos[None, :] < jnp.asarray(kv_len_valid))
        return allowed[None, None]                            # [1, 1, t, s]
    qpos = p[:, None] + jnp.arange(t)[None, :]                # [B, t]
    allowed = kpos[None, None, :] <= qpos[:, :, None]         # [B, t, s]
    if kv_len_valid is not None:
        kl = jnp.asarray(kv_len_valid)
        allowed = allowed & (kpos[None, None, :] < kl[:, None, None])
    return allowed[:, None]                                   # [B, 1, t, s]


def masked_softmax_attention(q, k, v, allowed, scale) -> jnp.ndarray:
    """q:[B,t,Hq,d] k,v:[B,s,H,d] allowed:[*,1,t,s] → [B,t,Hq,d].

    Softmax in float32 (parity with the reference models' fp behavior)."""
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
    bf16 (4x vs f32)."""
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


def cache_kv(cache: Dict[str, jnp.ndarray], dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Read (k, v) [B, S, H, d] in compute dtype, dequantizing if needed."""
    if "k_scale" in cache:
        k = cache["k"].astype(dtype) * cache["k_scale"].astype(dtype)
        v = cache["v"].astype(dtype) * cache["v_scale"].astype(dtype)
        return k, v
    return cache["k"].astype(dtype), cache["v"].astype(dtype)
