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


def sample_vec(
    logits: jnp.ndarray,       # [B, V]
    key: jax.Array,
    temperature: jnp.ndarray,  # [B] f32; 0 → greedy row
    top_k: jnp.ndarray,        # [B] i32; 0 → disabled
    top_p: jnp.ndarray,        # [B] f32; 1 → disabled
) -> jnp.ndarray:
    """Per-ROW sampling params (the serving engine's per-request path);
    row-wise equal to `sample` with the matching scalar params."""
    b, v = logits.shape
    lf = logits.astype(jnp.float32)
    greedy = jnp.argmax(lf, axis=-1)

    safe_t = jnp.where(temperature > 0.0, temperature, 1.0)
    x = lf / safe_t[:, None]
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
    x = jnp.where(x < cutoff, -jnp.inf, x)

    sampled = jax.random.categorical(key, x, axis=-1)
    return jnp.where(temperature > 0.0, sampled, greedy)


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
