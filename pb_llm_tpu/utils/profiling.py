"""Timing + roofline accounting for the packed kernels.

The reference only prints wall-clock deltas (`gptq_pb/gptq.py:176-177`).
Here:
  * `sync_time` — robust wall timing that forces completion by fetching a
    scalar to host (on the axon tunnel `block_until_ready` does not actually
    block, and dispatch latency is ~ms; for micro-kernels use
    slope-of-two-lengths timing as in bench.py);
  * `pb_roofline` — bytes/FLOPs model for a PBW matmul so measured times can
    be reported as a fraction of the weight-streaming roofline
    (BASELINE.json north-star metric);
  * `trace` — `jax.profiler` context for real traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable

import jax
import jax.numpy as jnp


def sync_time(fn: Callable, *args) -> tuple[float, object]:
    """Wall time of fn(*args), synced by a host fetch of a scalar reduction."""
    t0 = time.perf_counter()
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))
    return time.perf_counter() - t0, out


@dataclasses.dataclass(frozen=True)
class Roofline:
    bytes_weights: float
    bytes_activations: float
    flops: float
    vpu_ops: float

    def time_bound_s(self, hbm_gbps: float = 819.0, mxu_tflops: float = 197.0, vpu_tops: float = 4.0) -> float:
        return max(
            (self.bytes_weights + self.bytes_activations) / (hbm_gbps * 1e9),
            self.flops / (mxu_tflops * 1e12),
            self.vpu_ops / (vpu_tops * 1e12),
        )


def pb_roofline(m: int, ic: int, oc: int, sidecar_bits: int = 8, planes: int = 2, ops_per_elem: float = 7.0) -> Roofline:
    """Roofline model of the fused PB matmul (bp2 layout: sign+mask planes +
    dense uint8 sidecar)."""
    n = ic * oc
    return Roofline(
        bytes_weights=n * (planes * 1 + sidecar_bits) / 8,
        bytes_activations=(m * ic + m * oc) * 4.0,
        flops=2.0 * m * n * (3 if planes == 2 else 1),  # planar decomposition: B', M, V dots
        vpu_ops=n * ops_per_elem,
    )


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
