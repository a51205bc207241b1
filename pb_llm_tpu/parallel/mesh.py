"""Device mesh construction — the communication layer the reference lacks.

The reference is strictly single-process/single-GPU (no `torch.distributed`
anywhere; SURVEY.md §2.3).  Here scaling is mesh-first: a
`jax.sharding.Mesh` with axes

  dp — data parallel (batch), rides DCN across hosts
  tp — tensor parallel (weights/KV heads), rides ICI within a slice

Weights get `NamedSharding`s from `parallel.sharding`; XLA inserts the
collectives (psum for row-parallel partials, all-gathers for replication)
when the model is jitted over sharded arrays.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. tp defaults to all remaining devices."""
    devs = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devs) // dp
    n = dp * tp
    if n > len(devs):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devs)}")
    arr = np.array(devs[:n]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def multihost_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` wrapper for N-host pod slices.

    On TPU pods with default env discovery, call with no args.  Safe to call
    once per process before any jax computation.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))
