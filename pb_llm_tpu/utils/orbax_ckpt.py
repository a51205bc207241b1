"""Orbax-backed sharded checkpointing for pod-scale param trees.

The flat-npz format (`utils.checkpoint`, `core.pbw`) is single-host: every
array materializes on host 0.  For pod slices the artifact must be written
and read *sharded* — each process stores only its shards, and restore places
shards directly onto the mesh without a host-RAM bounce.  Orbax's
TensorStore-backed PyTree checkpointer does exactly this; this module wraps
it so packed trees (PackedLinear / PackedLinearV2 dataclass leaves with
static metadata) round-trip losslessly.

SURVEY.md §5.4 calls for "orbax-style sharded save/load" on top of the one
PBW format family; reference counterpart: none (four ad-hoc single-GPU
formats, `/root/reference/qat/utils.py:87-124`).

Restore needs a template tree (same structure, abstract or concrete leaves)
— standard orbax practice; build it from `models.*.init_params` + the same
quantize/pack path, or keep the npz manifest alongside for structure.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp
from jax.sharding import Mesh, NamedSharding


def save_sharded(path: str, tree: Any) -> None:
    """Write ``tree`` (jax arrays, possibly sharded; packed leaves fine) to
    an orbax checkpoint directory.  Multi-process safe: call from every
    process with the same global tree."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)
        ckptr.wait_until_finished()


def restore_sharded(path: str, template: Any, mesh: Optional[Mesh] = None,
                    shardings: Optional[Any] = None) -> Any:
    """Restore a tree saved with :func:`save_sharded`.

    ``template`` supplies structure/dtypes (concrete arrays or ShapeDtypeStructs).
    With ``mesh`` + ``shardings`` (a PartitionSpec tree, e.g. from
    `parallel.sharding.param_specs`), leaves restore directly onto devices in
    their target placement; otherwise they restore as host-local arrays."""
    path = os.path.abspath(path)

    def to_abstract(leaf, spec=None):
        if leaf is None:
            return None
        arr = jax.eval_shape(lambda: leaf) if not hasattr(leaf, "shape") else leaf
        sharding = NamedSharding(mesh, spec) if (mesh is not None and spec is not None) else None
        return jax.ShapeDtypeStruct(np.shape(arr), arr.dtype, sharding=sharding)

    if shardings is not None:
        abstract = jax.tree_util.tree_map(
            to_abstract, template, shardings,
            is_leaf=lambda x: x is None,
        )
    else:
        abstract = jax.tree_util.tree_map(to_abstract, template,
                                          is_leaf=lambda x: x is None)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)
