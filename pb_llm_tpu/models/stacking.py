"""Layer stacking: list-of-layer params → one stacked pytree for `lax.scan`.

The reference iterates decoder layers in Python (`gptq_pb/run.py:116-178`),
which in XLA terms unrolls all 32 layers into one giant program — fine on
eager torch, but on TPU it multiplies compile time by the layer count
(ROADMAP item 15; llama-7b decode programs took minutes to compile in
round 1).  Since every decoder layer has identical leaf shapes — including
PackedLinear/PackedLinearV2 planes, whose static metadata (ic/oc/pack_block/
col_tile/k_pad) the calibrator keeps uniform per linear name — the layer
list stacks into a single pytree with a leading [L] axis and the layer loop
becomes one `lax.scan` body compiled once.

The unrolled path remains for calibration (the `linear_fn` capture callback
needs Python-level layer identity) and QAT (per-layer `jax.checkpoint`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..core.pbw import PackedLinear, PackedLinearV2


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StackedPackedLinearV2:
    """A PackedLinearV2 whose array fields carry a leading [L] layer axis,
    plus the traced layer index of a `lax.scan` step.  `apply_linear`
    dispatches it to the scalar-prefetch stacked kernel
    (`ops.pallas_pb.pb_matmul_pallas_v2_stacked`) so the scan body streams
    each layer's planes straight from the stacked HBM arrays — slicing them
    in XLA before a pallas call would MATERIALIZE ~10 MB per matmul (the
    round-2 "scan_layers decodes 2.1x slower" penalty).  Off the pallas
    path the fallback materializes the layer slice and runs the ordinary
    packed matmul (numerics identical)."""

    stacked: PackedLinearV2  # [L]-leading array fields
    idx: jnp.ndarray         # scalar int32 layer index

    def layer(self) -> PackedLinearV2:
        """Materialized per-layer view (the non-pallas fallback)."""
        return jax.tree_util.tree_map(lambda a: a[self.idx], self.stacked)


def stack_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return params with ``layers`` replaced by a ``layers_stacked`` pytree
    (leaves gain a leading [num_layers] axis). Non-mutating."""
    layers: List[Any] = params["layers"]
    if not layers:
        raise ValueError("no layers to stack")
    treedefs = {jax.tree_util.tree_structure(lp) for lp in layers}
    if len(treedefs) != 1:
        raise ValueError("layers have differing pytree structures; cannot scan "
                         "(mixed formats across layers — quantize uniformly or keep unrolled)")
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *layers)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers_stacked"] = stacked
    out["num_layers"] = len(layers)
    return out


def unstack_layers(params: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`stack_layers`."""
    stacked = params["layers_stacked"]
    n = params["num_layers"]
    layers = [jax.tree_util.tree_map(lambda x: x[i], stacked) for i in range(n)]
    out = {k: v for k, v in params.items() if k not in ("layers_stacked", "num_layers")}
    out["layers"] = layers
    return out


def is_stacked(params: Dict[str, Any]) -> bool:
    return "layers_stacked" in params


def stack_caches(caches: List[Dict[str, jnp.ndarray]]) -> Dict[str, jnp.ndarray]:
    """List of per-layer KV-cache dicts → one dict with a leading [L] axis."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *caches)


def unstack_caches(caches: Dict[str, jnp.ndarray], n: int) -> List[Dict[str, jnp.ndarray]]:
    return [jax.tree_util.tree_map(lambda x: x[i], caches) for i in range(n)]
