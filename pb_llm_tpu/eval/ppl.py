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
    window_batch: int = 1,
) -> float:
    """``token_ids``: [1, N] or [N] int array of the joined eval text.

    ``window_batch`` > 1 runs that many windows per forward (the protocol is
    a sum of per-window NLLs, so batching changes throughput, not the
    number): the forward is weight-stream-bound at batch 1, so this is ~B×
    eval throughput.  The tail short-batch pads by repeating window 0 and
    masks the padding out of the sum."""
    seqlen = seqlen or cfg.seqlen
    ids = np.asarray(token_ids).reshape(-1)
    nsamples = ids.size // seqlen
    if window_limit is not None:
        nsamples = min(nsamples, window_limit)
    if nsamples == 0:
        raise ValueError(f"eval text shorter than one {seqlen}-token window")
    wb = max(1, min(window_batch, nsamples))

    @jax.jit
    def batch_nll(windows, valid):
        # windows [B, seqlen]; valid [B] masks tail padding
        logits, _ = forward(params, windows, cfg)
        lg = logits[:, :-1, :].astype(jnp.float32)
        tg = windows[:, 1:]
        logz = jax.scipy.special.logsumexp(lg, axis=-1)
        gold = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
        per_window = jnp.mean(logz - gold, axis=1) * seqlen
        return jnp.sum(jnp.where(valid, per_window, 0.0))

    total = 0.0
    for lo in range(0, nsamples, wb):
        n = min(wb, nsamples - lo)
        rows = [ids[(lo + i) * seqlen : (lo + i + 1) * seqlen] for i in range(n)]
        rows += [rows[0]] * (wb - n)
        valid = np.zeros(wb, bool)
        valid[:n] = True
        total += float(batch_nll(jnp.asarray(np.stack(rows)), jnp.asarray(valid)))
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
