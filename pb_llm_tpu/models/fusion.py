"""Parallel-linear fusion: q/k/v and gate/up share their input activation,
so at serving time each set runs as ONE packed matmul (q|k|v → "qkv_proj",
gate|up → "gateup_proj") — 7 → 4 kernel launches + x-preps per llama block,
5 → 3 per OPT block.  The merged `PackedLinearV2` carries one ROW GROUP per
constituent (`core.pbw.merge_packed_linears_v2`), so every matrix keeps its
own salient column set and scales: dequantization — and therefore quality —
is bit-identical to the unfused layers.

Serving-only (EngineConfig.fuse_linears): calibration/QAT keep per-name
linears, and the TP engine shards by per-name Megatron rules (fusion under
TP would shard across group boundaries — unsupported, guarded).
"""

from __future__ import annotations

from typing import Any, Dict

from ..core.pbw import PackedLinearV2, merge_packed_linears_v2

# fusable sets per family: tuples of (fused name, member names, split point
# computed from config at apply time)
FUSED = {
    "llama": (("qkv_proj", ("q_proj", "k_proj", "v_proj")),
              ("gateup_proj", ("gate_proj", "up_proj"))),
    "opt": (("qkv_proj", ("q_proj", "k_proj", "v_proj")),),
}


def _fusable(lp: Dict[str, Any], names) -> bool:
    parts = [lp.get(n) for n in names]
    if not all(isinstance(p, PackedLinearV2) for p in parts):
        return False
    p0 = parts[0]
    return all(
        p.n_row_groups == 1 and p.shards_local == 1
        and (p.ic, p.oc, p.pack_block, p.side_bits, p.low_bits, p.k_pad)
        == (p0.ic, p0.oc, p0.pack_block, p0.side_bits, p0.low_bits, p0.k_pad)
        and (p.bias is None) == (p0.bias is None)
        for p in parts
    )


def fuse_parallel_linears(params: Dict[str, Any], family_name: str) -> Dict[str, Any]:
    """Return params with each layer's fusable sets merged (non-mutating).
    Sets that don't qualify (non-v2 leaves, GQA's narrower k/v, sharded or
    row-grouped layouts) are left as-is — the model forward handles fused
    and unfused layers interchangeably per layer."""
    groups = FUSED.get(family_name, ())
    out = dict(params)
    new_layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for fused_name, names in groups:
            if _fusable(lp, names):
                lp[fused_name] = merge_packed_linears_v2([lp[n] for n in names])
                for n in names:
                    del lp[n]
        new_layers.append(lp)
    out["layers"] = new_layers
    return out
