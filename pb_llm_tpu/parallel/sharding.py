"""NamedSharding rules for model parameter trees (dense, packed, QAT).

Megatron-style tensor parallelism over the ``tp`` mesh axis:

  column-parallel (shard oc):  q/k/v (heads), gate/up, fc1, lm_head
  row-parallel   (shard ic):  o_proj/out_proj, down_proj, fc2

so each decoder block needs exactly two psums (after attention output and
after the MLP down-projection), which XLA inserts automatically when the
jitted forward consumes these shardings.  LayerNorms / RMSNorms and the
row-parallel group scales are replicated (tiny).

PackedLinear planes shard on their oc axis (column) or word-row axis (row);
pack-block alignment (256 rows ≡ 8 uint32 word-rows per shard) is preserved
as long as ic/tp is a multiple of 256, which holds for the standard model
dims (4096/8 = 512, 11008/8 = 1376 ✗ of 256 — 1376 = 5.375·256, so for
row-parallel down_proj with tp=8 the Pallas kernel falls back to a short
final pack block per shard; pack blocks are per-shard after re-packing, see
`shard_packed_linear`).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.pbw import PackedLinear
from ..quant.qat import QATLinear

# which linears shard which way, per family
COL_PARALLEL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "fc1", "lm_head"}
ROW_PARALLEL = {"o_proj", "out_proj", "down_proj", "fc2"}


def _dense_spec(name: str) -> Dict[str, P]:
    if name in COL_PARALLEL:
        return {"w": P(None, "tp"), "b": P("tp")}
    if name in ROW_PARALLEL:
        return {"w": P("tp", None), "b": P()}
    return {"w": P(), "b": P()}


def _packed_spec(name: str) -> PackedLinear:
    if name in COL_PARALLEL:
        return PackedLinear(
            sign_packed=P(None, "tp"), mask_packed=P(None, "tp"), sidecar=P(None, "tp"),
            low_scale=P(None, "tp"), low_mean=P(None, "tp"),
            high_scale=P("tp"), high_zero=P("tp"), bias=P("tp"),
            ic=0, oc=0, groupsize=0,
        )
    if name in ROW_PARALLEL:
        # group scales stay replicated: with groupsize=-1 they are [1, oc]
        # (indivisible), and they are tiny either way
        return PackedLinear(
            sign_packed=P("tp", None), mask_packed=P("tp", None), sidecar=P("tp", None),
            low_scale=P(), low_mean=P(),
            high_scale=P(), high_zero=P(), bias=P(),
            ic=0, oc=0, groupsize=0,
        )
    raise ValueError(name)


def _qat_spec(name: str) -> QATLinear:
    # QAT weight is [oc, ic]: column-parallel shards axis 0, row-parallel axis 1
    if name in COL_PARALLEL:
        return QATLinear(weight=P("tp", None), bias=P("tp"), outlier_mask=P("tp", None))
    if name in ROW_PARALLEL:
        return QATLinear(weight=P(None, "tp"), bias=P(), outlier_mask=P(None, "tp"))
    return QATLinear(weight=P(), bias=P(), outlier_mask=P())


def _leaf_spec(name: str, leaf: Any) -> Any:
    import dataclasses

    if isinstance(leaf, PackedLinear):
        spec = _packed_spec(name)
        return dataclasses.replace(
            spec,
            bias=None if leaf.bias is None else spec.bias,
            ic=leaf.ic, oc=leaf.oc, groupsize=leaf.groupsize, pack_block=leaf.pack_block,
            sidecar_bits=leaf.sidecar_bits, low_bits=leaf.low_bits,
        )
    if isinstance(leaf, QATLinear):
        spec = _qat_spec(name)
        return dataclasses.replace(
            spec,
            bias=None if leaf.bias is None else spec.bias,
            method=leaf.method, outlier_scale=leaf.outlier_scale,
            train_outlier=leaf.train_outlier,
        )
    if isinstance(leaf, dict) and "w" in leaf:
        d = _dense_spec(name)
        if leaf.get("b") is None:
            d = {"w": d["w"], "b": None}
        return d
    return None


def param_specs(params: Dict[str, Any], family_name: str, mesh: Optional[Mesh] = None) -> Dict[str, Any]:
    """PartitionSpec tree matching the model param tree.

    With ``mesh`` given, any leaf whose sharded dimension is not divisible by
    the mesh axis falls back to replication (e.g. odd vocab sizes under
    vocab-parallel lm_head) — placement and shard_map in_specs must use the
    SAME sanitized tree."""
    specs: Dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            specs["layers"] = []
            for lp in val:
                lspec = {}
                for n, leaf in lp.items():
                    s = _leaf_spec(n, leaf)
                    if s is None:  # layernorm vectors / dicts
                        s = jax.tree_util.tree_map(lambda _: P(), leaf)
                    lspec[n] = s
                specs["layers"].append(lspec)
        elif key == "lm_head":
            specs[key] = _leaf_spec(key, val) or jax.tree_util.tree_map(lambda _: P(), val)
        elif key in ("embed_tokens", "embed_positions"):
            specs[key] = P()  # replicated; vocab sharding is a later optimization
        else:
            specs[key] = None if val is None else jax.tree_util.tree_map(lambda _: P(), val)

    if mesh is not None:
        sizes = dict(mesh.shape)

        def _san(leaf, spec):
            if leaf is None or spec is None:
                return spec
            for d, ax in enumerate(spec):
                if ax is None:
                    continue
                n = 1
                for a in (ax if isinstance(ax, tuple) else (ax,)):
                    n *= sizes.get(a, 1)
                if d >= getattr(leaf, "ndim", 0) or leaf.shape[d] % n:
                    return P()
            return spec

        specs = jax.tree_util.tree_map(_san, params, specs, is_leaf=lambda x: x is None)
    return specs


def shard_params(params: Dict[str, Any], mesh: Mesh, family_name: str) -> Dict[str, Any]:
    """device_put the tree with the TP/DP NamedShardings."""
    specs = param_specs(params, family_name, mesh)

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, params, specs, is_leaf=lambda x: x is None
    )


def kv_cache_spec() -> P:
    """[B, T, heads, head_dim]: batch over dp, heads over tp."""
    return P("dp", None, "tp", None)
