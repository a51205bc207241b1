"""Pipeline parallelism: GPipe-style microbatched forward over a ``pp`` axis.

The reference has no pipeline parallelism — its "layer streaming" moves one
layer at a time onto a single GPU as a memory trick
(`/root/reference/gptq_pb/run.py:116-178`, SURVEY.md §2.3 PP row).  This is
the real thing, TPU-style: the stacked decoder stack (`models.stacking`) is
sharded on its leading layer axis across a ``pp`` mesh axis, microbatches
flow stage→stage over ICI with `lax.ppermute`, and the whole schedule is one
static `lax.fori_loop` inside `shard_map` (no data-dependent control flow —
bubble steps compute masked garbage that never lands).

Scope: batch/eval forward (prefill & windowed-ppl scoring) — the
high-throughput regimes where PP pays.  Decode serving composes better with
TP (`runtime.tp_engine`); PP decode would serialize on pipeline latency.

Schedule: ``n_micro + pp − 1`` steps.  At step t, stage s runs microbatch
``t − s`` (when in range): stage 0 embeds a fresh microbatch each step, every
stage applies its local layer scan, `ppermute` rotates activations forward,
and the last stage writes norm+lm_head logits into its output buffer.  The
buffer is psum'd at the end (all other stages contribute zeros), so the
result is replicated — callers slice or reshard as needed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..models import llama as mllama


def make_pp_mesh(pp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    pp = pp or len(devs)
    return Mesh(np.array(devs[:pp]), ("pp",))


def _stage_body(stacked, x, cfg, cos, sin):
    """Scan this stage's local layer slice over the activation."""
    def body(h, lp):
        h, _ = mllama.decoder_layer(lp, h, cfg, cos, sin, None, None, 0)
        return h, None
    x, _ = jax.lax.scan(body, x, stacked)
    return x


def pipeline_forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    cfg,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pp",
) -> jnp.ndarray:
    """input_ids [B, T] → logits [B, T, V], layers pipelined over ``axis``.

    Requires stacked params (`models.stacking.stack_layers`), B divisible by
    ``n_micro`` and num layers divisible by the axis size."""
    if "layers_stacked" not in params:
        raise ValueError("pipeline_forward needs stacked params (stack_layers)")
    n_stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(params["layers_stacked"])[0].shape[0]
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {axis}={n_stages}")
    b, t = input_ids.shape
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    mb = input_ids.reshape(n_micro, b // n_micro, t)

    positions = jnp.arange(t)
    cos, sin = mllama.rope_tables(cfg, positions)

    stacked_spec = jax.tree_util.tree_map(
        lambda l: P(axis, *([None] * (l.ndim - 1))), params["layers_stacked"]
    )

    fn = shard_map(
        functools.partial(_pp_body, cfg=cfg, axis=axis, n_micro=n_micro),
        mesh=mesh,
        in_specs=(stacked_spec, P(), P(), P(), P(), P(), P()),
        out_specs=P(),
    )
    logits = fn(params["layers_stacked"], params["embed_tokens"],
                params["norm"], params["lm_head"]["w"],
                mb, cos.astype(jnp.float32), sin.astype(jnp.float32))
    return logits.reshape(b, t, -1)


def _pp_body(stacked, embed, norm_w, head_w, mb, cos, sin, *, cfg, axis, n_micro):
    n_stages = jax.lax.axis_size(axis)
    stage = jax.lax.axis_index(axis)
    n_mb, bm, t = mb.shape
    hidden = embed.shape[1]
    vocab = head_w.shape[1]

    def varying(x):
        return jax.lax.pcast(x, (axis,), to="varying")

    act0 = varying(jnp.zeros((bm, t, hidden), embed.dtype))
    outs0 = varying(jnp.zeros((n_mb, bm, t, vocab), jnp.float32))
    perm = [(s, (s + 1) % n_stages) for s in range(n_stages)]
    cos_l, sin_l = cos.astype(embed.dtype), sin.astype(embed.dtype)

    def step(s, carry):
        act, outs = carry
        # stage 0 injects a fresh microbatch (clamped index; bubble steps
        # re-embed the last microbatch and the result is masked out below)
        ids = jax.lax.dynamic_index_in_dim(mb, jnp.clip(s, 0, n_mb - 1), 0, keepdims=False)
        fresh = embed[ids]
        x_in = jnp.where(stage == 0, fresh, act)
        h = _stage_body(stacked, x_in, cfg, cos_l, sin_l)

        # last stage: finish and record microbatch s - (n_stages - 1)
        idx = s - (n_stages - 1)
        valid = (stage == n_stages - 1) & (idx >= 0) & (idx < n_mb)
        xf = mllama.rms_norm(h, norm_w, cfg.rms_norm_eps)
        logits = (xf @ head_w).astype(jnp.float32)
        ci = jnp.clip(idx, 0, n_mb - 1)
        cur = jax.lax.dynamic_index_in_dim(outs, ci, 0, keepdims=True)
        upd = jnp.where(valid, logits[None], cur)
        outs = jax.lax.dynamic_update_index_in_dim(outs, upd[0], ci, 0)

        act = jax.lax.ppermute(h, axis, perm)
        return act, outs

    _, outs = jax.lax.fori_loop(0, n_micro + n_stages - 1, step, (act0, outs0))
    # only the last stage holds real logits; psum replicates them
    return jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)), axis
    )
