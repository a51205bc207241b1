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

from ..core.pbw import PackedLinear, PackedLinearV2
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


def _packed_v2_spec(name: str, n_row_groups: int = 0) -> PackedLinearV2:
    if name in COL_PARALLEL:
        # oc axis shards every plane; side_idx row groups shard with oc —
        # requires (oc/tp) % col_tile == 0, checked by the mesh sanitizer.
        # Global column selection (n_row_groups == 1) shares ONE column set
        # across all oc shards: side_idx replicates.
        return PackedLinearV2(
            sign_packed=P(None, "tp"), side_val=P(None, "tp"),
            side_idx=P() if n_row_groups == 1 else P(None, "tp"),
            low_scale=P(None, "tp"), low_mean=P(None, "tp"),
            high_scale=P("tp"), high_zero=P("tp"), bias=P("tp"),
            ic=0, oc=0, col_tile=0,
        )
    if name in ROW_PARALLEL:
        # shard-major sidecar (pack with ic_shards=tp): axis 0 of
        # side_val/side_idx splits into per-shard [k_pad_shard, ·] views with
        # local indices; sign word-rows split on shard boundaries
        return PackedLinearV2(
            sign_packed=P("tp", None), side_val=P("tp", None), side_idx=P("tp", None),
            low_scale=P(), low_mean=P(),
            high_scale=P(), high_zero=P(), bias=P(),
            ic=0, oc=0, col_tile=0,
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

    if isinstance(leaf, PackedLinearV2):
        spec = _packed_v2_spec(name, leaf.n_row_groups)
        if leaf.low_bits > 1 and name in ROW_PARALLEL:
            # plane-major sign axis 0 cannot split over tp without mixing
            # planes — replicate multi-bit row-parallel layers (the 2/4-bit
            # ablation formats; the flagship 1-bit layout shards fully)
            spec = dataclasses.replace(
                spec, sign_packed=P(), side_val=P(), side_idx=P())
        return dataclasses.replace(
            spec,
            bias=None if leaf.bias is None else spec.bias,
            ic=leaf.ic, oc=leaf.oc, col_tile=leaf.col_tile,
            pack_block=leaf.pack_block, k_pad_shard=leaf.k_pad_shard,
        )
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


def _add_fsdp(spec: Any, leaf: Any, dp: int) -> Any:
    """Add 'dp' to the first free DIVISIBLE dim of a >=2-D array spec
    (FSDP/ZeRO-3 storage sharding: XLA all-gathers the leaf at each use,
    the optimizer update stays sharded).  Specs already using dp, scalars
    and vectors are untouched.  Divisibility is checked HERE, per dim —
    handing sanitize_specs a bad dim would make it replicate the whole
    leaf, dropping its existing tp sharding (worse memory than no fsdp)."""
    if not isinstance(spec, P) or getattr(leaf, "ndim", 0) < 2 or dp <= 1:
        return spec
    used = set()
    for ax in spec:
        for a in (ax if isinstance(ax, tuple) else (ax,)):
            if a is not None:
                used.add(a)
    if "dp" in used:
        return spec
    dims = list(spec) + [None] * (leaf.ndim - len(spec))
    for d in range(leaf.ndim):
        if dims[d] is None and leaf.shape[d] % dp == 0:
            dims[d] = "dp"
            return P(*dims)
    return spec


def _fsdp_leaf(spec: Any, leaf: Any, dp: int) -> Any:
    """FSDP-ify one leaf spec: QATLinear weight+outlier_mask, dense dict w,
    plain arrays.  Packed (inference) formats are skipped — their plane
    layout invariants are all-or-nothing (see sanitize_specs)."""
    import dataclasses

    if isinstance(spec, QATLinear):
        return dataclasses.replace(
            spec,
            weight=_add_fsdp(spec.weight, leaf.weight, dp),
            outlier_mask=_add_fsdp(spec.outlier_mask, leaf.outlier_mask, dp),
        )
    if isinstance(spec, dict) and "w" in spec:
        return dict(spec, w=_add_fsdp(spec["w"], leaf.get("w"), dp))
    if isinstance(spec, P):
        return _add_fsdp(spec, leaf, dp)
    return spec


def _prepend_layer_axis(spec: Any) -> Any:
    """[L]-stacked leaves (models.stacking) keep their per-layer sharding
    with the leading layer axis unsharded: P(a, b) → P(None, a, b)."""
    import dataclasses

    if isinstance(spec, P):
        return P(None, *spec)
    if dataclasses.is_dataclass(spec):
        repl = {f.name: P(None, *getattr(spec, f.name))
                for f in dataclasses.fields(spec)
                if isinstance(getattr(spec, f.name), P)}
        return dataclasses.replace(spec, **repl)
    if isinstance(spec, dict):
        return {k: (P(None, *v) if isinstance(v, P) else v)
                for k, v in spec.items()}
    return spec


def param_specs(params: Dict[str, Any], family_name: str, mesh: Optional[Mesh] = None,
                fsdp: bool = False) -> Dict[str, Any]:
    """PartitionSpec tree matching the model param tree.

    With ``mesh`` given, any leaf whose sharded dimension is not divisible by
    the mesh axis falls back to replication (e.g. odd vocab sizes under
    vocab-parallel lm_head) — placement and shard_map in_specs must use the
    SAME sanitized tree.

    ``fsdp=True`` additionally shards every >=2-D trainable leaf's first
    free dimension over the ``dp`` axis (ZeRO-3-style parameter/optimizer
    sharding; the QAT frozen sim-8bit masters are the memory hog at 7B+).
    GSPMD inserts the per-use all-gathers; numerics are unchanged
    (tests/test_sharding.py)."""
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
        elif key == "layers_stacked":
            # scan_layers: same per-name sharding with the [L] axis prepended.
            # Stacked PackedLinearV2 leaves carry [L]-leading side_idx, so
            # n_row_groups reads shape[-1] (the property assumes 2-D).
            import dataclasses as _dc

            lspec = {}
            for n, leaf in val.items():
                if isinstance(leaf, PackedLinearV2):
                    s = _packed_v2_spec(n, leaf.side_idx.shape[-1])
                    if leaf.low_bits > 1 and n in ROW_PARALLEL:
                        # same guard as _leaf_spec: plane-major sign axis 0
                        # cannot split over tp without mixing planes
                        s = _dc.replace(
                            s, sign_packed=P(), side_val=P(), side_idx=P())
                    s = _dc.replace(
                        s, bias=None if leaf.bias is None else s.bias,
                        ic=leaf.ic, oc=leaf.oc, col_tile=leaf.col_tile,
                        pack_block=leaf.pack_block, k_pad_shard=leaf.k_pad_shard)
                else:
                    s = _leaf_spec(n, leaf)
                if s is None:
                    s = jax.tree_util.tree_map(lambda _: P(), leaf)
                lspec[n] = _prepend_layer_axis(s)
            specs[key] = lspec
        elif key == "num_layers":
            specs[key] = P()  # python int metadata; shard_params passes it through
        elif key == "lm_head":
            specs[key] = _leaf_spec(key, val) or jax.tree_util.tree_map(lambda _: P(), val)
        elif key in ("embed_tokens", "embed_positions"):
            specs[key] = P()  # replicated; vocab sharding is a later optimization
        else:
            specs[key] = None if val is None else jax.tree_util.tree_map(lambda _: P(), val)

    if fsdp:
        dp = mesh.shape.get("dp", 1) if mesh is not None else 1
        for key, spec in specs.items():
            if key == "layers":
                specs[key] = [
                    {n: _fsdp_leaf(s, lp[n], dp) for n, s in lspec.items()}
                    for lp, lspec in zip(params["layers"], spec)
                ]
            elif spec is not None:
                specs[key] = _fsdp_leaf(spec, params.get(key), dp)

    if mesh is not None:
        specs = sanitize_specs(params, specs, mesh)
    return specs


def sanitize_specs(params: Dict[str, Any], specs: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Replicate any leaf whose sharded dims don't divide the mesh axes.

    Structured leaves (PackedLinear/PackedLinearV2/QATLinear/dense dicts) are
    sanitized ALL-OR-NOTHING: a partially-replicated packed layer would have
    inconsistent local plane shapes inside shard_map."""
    import dataclasses

    sizes = dict(mesh.shape)

    def _arr_ok(arr, spec) -> bool:
        if arr is None or spec is None or not isinstance(spec, P):
            return True
        for d, ax in enumerate(spec):
            if ax is None:
                continue
            n = 1
            for a in (ax if isinstance(ax, tuple) else (ax,)):
                n *= sizes.get(a, 1)
            if d >= getattr(arr, "ndim", 0) or arr.shape[d] % n:
                return False
        return True

    def _replicate_like(spec):
        if spec is None:
            return None
        if isinstance(spec, P):
            return P()
        if dataclasses.is_dataclass(spec):
            repl = {f.name: P() for f in dataclasses.fields(spec)
                    if isinstance(getattr(spec, f.name), P)}
            return dataclasses.replace(spec, **repl)
        if isinstance(spec, dict):
            return {k: (P() if isinstance(v, P) else v) for k, v in spec.items()}
        return spec

    def _san(leaf, spec):
        if leaf is None or spec is None:
            return spec
        if dataclasses.is_dataclass(spec):
            pairs = [(getattr(leaf, f.name, None), getattr(spec, f.name))
                     for f in dataclasses.fields(spec)]
            if all(_arr_ok(a, s) for a, s in pairs):
                return spec
            return _replicate_like(spec)
        if isinstance(spec, dict):
            if all(_arr_ok(leaf.get(k), v) for k, v in spec.items()):
                return spec
            return _replicate_like(spec)
        return spec if _arr_ok(leaf, spec) else P()

    out: Dict[str, Any] = {}
    for key, spec in specs.items():
        if key == "layers":
            out["layers"] = [
                {n: _san(lp[n], s) for n, s in lspec.items()}
                for lp, lspec in zip(params["layers"], spec)
            ]
        elif key == "layers_stacked":
            out[key] = {n: _san(params[key][n], s) for n, s in spec.items()}
        else:
            out[key] = _san(params.get(key), spec)
    return out


def shard_params(params: Dict[str, Any], mesh: Mesh, family_name: str,
                 fsdp: bool = False) -> Dict[str, Any]:
    """device_put the tree with the TP/DP NamedShardings."""
    specs = param_specs(params, family_name, mesh, fsdp=fsdp)

    def put(leaf, spec):
        if leaf is None:
            return None
        if not hasattr(leaf, "shape"):  # python metadata (e.g. num_layers)
            return leaf
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, params, specs, is_leaf=lambda x: x is None
    )


def kv_cache_spec() -> P:
    """[B, T, heads, head_dim]: batch over dp, heads over tp."""
    return P("dp", None, "tp", None)
