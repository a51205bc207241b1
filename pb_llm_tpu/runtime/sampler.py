"""Token samplers for the decode loop (greedy / temperature / top-k / top-p).

The reference has no generation engine (its only sampling is
`model.generate` in a demo helper, `utils.py:127-137`); these are the
engine's jit-compatible samplers.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0   # 0 → greedy
    top_k: int = 0             # 0 → disabled
    top_p: float = 1.0         # 1 → disabled


def filter_logits_vec(
    logits: jnp.ndarray,       # [N, V] float32
    temperature: jnp.ndarray,  # [N] f32; 0 → passthrough (greedy rows)
    top_k: jnp.ndarray,        # [N] i32; 0 → disabled
    top_p: jnp.ndarray,        # [N] f32; 1 → disabled
) -> jnp.ndarray:
    """Temperature-scaled, top-k/top-p-filtered logits per row — the
    request's actual sampling distribution is softmax of this.  Shared by
    `sample_vec` and the speculative rejection sampler."""
    v = logits.shape[-1]
    safe_t = jnp.where(temperature > 0.0, temperature, 1.0)
    x = logits / safe_t[:, None]
    xs = jnp.sort(x, axis=-1)  # ascending
    # top-k: mask below the k-th largest (index V-k ascending); k=0 keeps all
    kth_idx = jnp.where(top_k > 0, jnp.maximum(v - top_k, 0), 0)
    kth = jnp.take_along_axis(xs, kth_idx[:, None], axis=-1)
    x = jnp.where(x < kth, -jnp.inf, x)
    # top-p over the top-k-FILTERED distribution (matches `sample`, which
    # chains the filters): smallest descending-prob set with cumulative
    # >= top_p, at least 1 token
    sorted_desc = jnp.sort(x, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < jnp.clip(top_p, 0.0, 1.0)[:, None], axis=-1)
    cutoff_idx = jnp.where(top_p < 1.0, jnp.minimum(cutoff_idx, v - 1), v - 1)
    cutoff = jnp.take_along_axis(sorted_desc, cutoff_idx[:, None], axis=-1)
    return jnp.where(x < cutoff, -jnp.inf, x)


def sample_vec(
    logits: jnp.ndarray,       # [B, V]
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] f32; 0 → greedy row
    top_k: jnp.ndarray,        # [B] i32; 0 → disabled
    top_p: jnp.ndarray,        # [B] f32; 1 → disabled
) -> jnp.ndarray:
    """Per-ROW sampling params (the serving engine's per-request path);
    row-wise equal to `sample` with the matching scalar params."""
    lf = logits.astype(jnp.float32)
    greedy = jnp.argmax(lf, axis=-1)
    x = filter_logits_vec(lf, temperature, top_k, top_p)
    sampled = jax.random.categorical(key, x, axis=-1)
    return jnp.where(temperature > 0.0, sampled, greedy)


def spec_verify_sample(
    logits: jnp.ndarray,       # [B, t, V] target logits over [last, d_1..d_γ]
    drafts: jnp.ndarray,       # [B, γ] int32 proposed tokens (t = γ+1)
    key: jax.Array,
    temperature: jnp.ndarray,  # [B]
    top_k: jnp.ndarray,        # [B]
    top_p: jnp.ndarray,        # [B]
):
    """Rejection-sampling speculative verify for DETERMINISTIC proposals.

    Accept draft d_j with probability p_j(d_j) under the request's
    sampling-adjusted target distribution p_j; on rejection emit a sample of
    the residual — p_j with d_j masked out, which is exactly
    normalize(max(p_j − δ_{d_j}, 0)); when all γ drafts are accepted the
    bonus token samples p_γ unmasked.  This δ-proposal scheme is exact for
    ANY draft source (even a stochastic one): marginalizing over the
    realized draft, P(emit x) = E_d[p(d)·1{x=d} + (1−p(d))·p(x)·1{x≠d} /
    (1−p(d))] = p(x) — the emitted stream is distribution-equal to plain
    per-token sampling.  Greedy rows (temperature == 0) reduce to exact
    token-match acceptance with argmax corrections, i.e. the greedy verify.

    Returns (accept [B, γ] bool, corr [B, t] i32, lp_draft [B, γ],
    lp_corr [B, t]); logprobs are raw log-softmax values of the respective
    tokens (what `_chosen_logprob` reports on the plain decode paths)."""
    b, t, v = logits.shape
    gamma = t - 1
    lf = logits.reshape(b * t, v).astype(jnp.float32)
    tempr = jnp.repeat(temperature, t)
    x = filter_logits_vec(lf, tempr, jnp.repeat(top_k, t), jnp.repeat(top_p, t))
    greedy = jnp.argmax(lf, axis=-1)
    dpad = jnp.concatenate([drafts.astype(jnp.int32), jnp.zeros((b, 1), jnp.int32)], axis=1)
    dflat = dpad.reshape(b * t)
    lpx = jax.nn.log_softmax(x, axis=-1)
    pd = jnp.exp(jnp.take_along_axis(lpx, dflat[:, None], axis=1)[:, 0])
    k_u, k_c = jax.random.split(key)
    u = jax.random.uniform(k_u, (b * t,))
    accept = jnp.where(tempr > 0.0, u < pd, dflat == greedy)
    # residual: mask the rejected draft out of the support at positions < γ
    pos = jnp.tile(jnp.arange(t), b)  # row r = slot·t + j  →  pos[r] = j
    is_draft_tok = (jnp.arange(v)[None, :] == dflat[:, None]) & (pos[:, None] < gamma)
    xm = jnp.where(is_draft_tok, -jnp.inf, x)
    corr_s = jax.random.categorical(k_c, xm, axis=-1)
    corr = jnp.where(tempr > 0.0, corr_s, greedy)
    lp_raw = jax.nn.log_softmax(lf, axis=-1)
    lp_d = jnp.take_along_axis(lp_raw, dflat[:, None], axis=1)[:, 0]
    lp_c = jnp.take_along_axis(lp_raw, corr[:, None], axis=1)[:, 0]
    return (accept.reshape(b, t)[:, :gamma], corr.reshape(b, t).astype(jnp.int32),
            lp_d.reshape(b, t)[:, :gamma], lp_c.reshape(b, t))


def sample(logits: jnp.ndarray, key: jax.Array, params: SamplingParams) -> jnp.ndarray:
    """logits [B, V] → token ids [B]."""
    if params.temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / params.temperature
    if params.top_k > 0:
        k = min(params.top_k, logits.shape[-1])
        kth = jnp.sort(logits, axis=-1)[:, -k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if params.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # smallest set with cumulative prob >= top_p; keep at least 1
        cutoff_idx = jnp.sum(cum < params.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)
