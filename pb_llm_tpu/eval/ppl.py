"""Windowed perplexity — the reference's exact evaluation protocol.

Parity contract (`gptq_pb/eval_ppl_utils.py:8-88`):
  * nsamples = total_tokens // seqlen non-overlapping windows (tail dropped)
  * per window: forward, shift-by-one cross-entropy (mean over seqlen-1
    positions, float32), nll = loss * seqlen
  * ppl = exp(Σ nll / (nsamples * seqlen))

The reference streams one decoder layer at a time through the GPU to bound
memory (`eval_ppl_utils.py:55-64`); on TPU the whole (packed) model resides
on device and we jit one window forward, looping windows on host.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy_shifted(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean CE of logits[:, :-1] predicting targets[:, 1:], in float32."""
    lg = logits[:, :-1, :].astype(jnp.float32)
    tg = targets[:, 1:]
    logz = jax.scipy.special.logsumexp(lg, axis=-1)
    gold = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - gold)


def perplexity(
    params: Dict[str, Any],
    cfg: Any,
    forward: Callable,
    token_ids: np.ndarray,
    seqlen: Optional[int] = None,
    window_limit: Optional[int] = None,
) -> float:
    """``token_ids``: [1, N] or [N] int array of the joined eval text."""
    seqlen = seqlen or cfg.seqlen
    ids = np.asarray(token_ids).reshape(-1)
    nsamples = ids.size // seqlen
    if window_limit is not None:
        nsamples = min(nsamples, window_limit)
    if nsamples == 0:
        raise ValueError(f"eval text shorter than one {seqlen}-token window")

    @jax.jit
    def window_nll(window):
        logits, _ = forward(params, window[None, :], cfg)
        return cross_entropy_shifted(logits, window[None, :]) * seqlen

    total = 0.0
    for i in range(nsamples):
        w = jnp.asarray(ids[i * seqlen : (i + 1) * seqlen])
        total += float(window_nll(w))
    return float(np.exp(total / (nsamples * seqlen)))


def perplexity_sp(
    params: Dict[str, Any],
    cfg: Any,
    forward: Callable,
    token_ids: np.ndarray,
    mesh,
    seqlen: Optional[int] = None,
    window_limit: Optional[int] = None,
) -> float:
    """Sequence-parallel perplexity: identical protocol, but each window's
    forward runs with the sequence sharded over ``mesh``'s 'sp' axis and
    attention as a ring (`parallel.ring_attention`) — windows longer than
    one chip's memory evaluate across the slice.  seqlen must be divisible
    by the sp axis size.  Numerics match `perplexity` (tests)."""
    from ..models.attention import sequence_parallel

    with sequence_parallel(mesh):
        return perplexity(params, cfg, forward, token_ids,
                          seqlen=seqlen, window_limit=window_limit)
