"""Checkpoint save/load for dense / QAT / packed param trees.

Replaces the reference's four ad-hoc formats (SURVEY.md §5.4: HF
save_pretrained dirs, mask pickles, {meta.json, weights.pth}, dataset
caches) with one flat-key npz + JSON manifest per tree.  PBW packed layers
have their own serializer in `core.pbw`; this module handles dense and mixed
trees (engine can load either).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.pbw import PackedLinear, _FIELDS as _PBW_FIELDS
from ..core import packing


def _flatten(tree: Any, prefix: str, arrays: Dict[str, np.ndarray], meta: Dict[str, Any]) -> None:
    if tree is None:
        meta[prefix] = {"kind": "none"}
    elif isinstance(tree, PackedLinear):
        meta[prefix] = {
            "kind": "packed", "ic": tree.ic, "oc": tree.oc,
            "groupsize": tree.groupsize, "pack_block": tree.pack_block,
            "sidecar_bits": tree.sidecar_bits, "low_bits": tree.low_bits,
        }
        for f in _PBW_FIELDS:
            v = getattr(tree, f)
            if v is not None:
                arrays[f"{prefix}::{f}"] = np.asarray(v)
    elif isinstance(tree, dict):
        meta[prefix] = {"kind": "dict", "keys": sorted(tree.keys())}
        for k, v in tree.items():
            _flatten(v, f"{prefix}/{k}", arrays, meta)
    elif isinstance(tree, list):
        meta[prefix] = {"kind": "list", "n": len(tree)}
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}/{i}", arrays, meta)
    else:
        meta[prefix] = {"kind": "array"}
        arrays[prefix] = np.asarray(tree)


def _unflatten(prefix: str, z, meta: Dict[str, Any]):
    m = meta[prefix]
    kind = m["kind"]
    if kind == "none":
        return None
    if kind == "array":
        return jnp.asarray(z[prefix])
    if kind == "dict":
        return {k: _unflatten(f"{prefix}/{k}", z, meta) for k in m["keys"]}
    if kind == "list":
        return [_unflatten(f"{prefix}/{i}", z, meta) for i in range(m["n"])]
    if kind == "packed":
        kw = {f: jnp.asarray(z[f"{prefix}::{f}"]) for f in _PBW_FIELDS if f"{prefix}::{f}" in z}
        if "bias" not in kw:
            kw["bias"] = None
        return PackedLinear(
            ic=m["ic"], oc=m["oc"], groupsize=m["groupsize"],
            pack_block=m.get("pack_block", packing.PACK_BLOCK),
            sidecar_bits=m.get("sidecar_bits", 8), low_bits=m.get("low_bits", 1), **kw,
        )
    raise ValueError(kind)


def save_dense_checkpoint(path: str, params: Any, extra: Optional[dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {}
    _flatten(params, "params", arrays, meta)
    np.savez(os.path.join(path, "weights.npz"), **arrays)
    with open(os.path.join(path, "manifest.json"), "w") as fh:
        json.dump({"tree": meta, "extra": extra or {}}, fh)


def load_dense_checkpoint(path: str) -> Tuple[Any, dict]:
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    z = np.load(os.path.join(path, "weights.npz"))
    params = _unflatten("params", z, manifest["tree"])
    return params, manifest["extra"]
