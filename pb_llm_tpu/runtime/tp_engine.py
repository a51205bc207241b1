"""Tensor-parallel packed decode: one shard_map around the whole model step.

The GSPMD path covers dense/sim trees, but the Pallas packed kernel is
written per-shard, so the multi-chip packed engine wraps the full forward in
`shard_map` with Megatron-style math (BASELINE.json configs[4]):

  * q/k/v, gate/up, fc1: column-parallel (oc = heads/ffn sharded over tp) —
    no collective; attention runs on the local head slice;
  * o_proj/out_proj, down_proj, fc2: row-parallel — partial sums psum'd over
    tp (two collectives per decoder block), bias added after the psum;
  * lm_head: column-parallel over vocab, all-gathered for sampling;
  * KV caches: head-sharded [slots, seq, kv_heads/tp, head_dim];
  * activations replicated inside the tp group; batch (slots) can ride dp.

`shard_packed_params` prepares a param tree (packed or dense leaves) with
these shardings; `make_tp_step` returns the jitted decode/prefill step.
For row-parallel packed layers the bitplane pack_block must divide ic/tp —
pack with `pack_linear(..., pack_block=ic // tp)` (see
`parallel.collectives.row_parallel_pb_matmul`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.linear import apply_linear
from ..models.registry import Family
from ..parallel.sharding import ROW_PARALLEL, param_specs

CACHE_SPEC = P(None, None, "tp", None)


def _local_cfg(cfg, fam: Family, tp: int):
    hd = cfg.head_dim
    if fam.name == "llama":
        return dataclasses.replace(
            cfg,
            num_attention_heads=cfg.num_attention_heads // tp,
            num_key_value_heads=cfg.kv_heads // tp,
            head_dim_override=hd,
        )
    return dataclasses.replace(
        cfg, num_attention_heads=cfg.num_attention_heads // tp, head_dim_override=hd
    )


def _tp_linear_fn(name, lin, x):
    """Row-parallel linears: matmul partials → psum → bias once."""
    if name in ROW_PARALLEL:
        from ..core.pbw import PackedLinear

        if isinstance(lin, PackedLinear):
            bias = lin.bias
            lin = dataclasses.replace(lin, bias=None)
        else:
            bias = lin.get("b")
            lin = {"w": lin["w"], "b": None}
        y = apply_linear(lin, x)
        y = jax.lax.psum(y, "tp")
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y
    return apply_linear(lin, x)


def make_tp_step(cfg, fam: Family, mesh: Mesh, params_tree) -> Callable:
    """Jitted TP decode step over sharded params + caches.

    step(params, caches, last_tokens [S], lengths [S]) → (caches, logits [S, V])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name)
    n_layers = len(params_tree["layers"])
    cache_specs = [{"k": CACHE_SPEC, "v": CACHE_SPEC} for _ in range(n_layers)]

    def local_step(params, caches, last_tokens, lengths):
        logits, caches = fam.forward(
            params, last_tokens[:, None], lcfg,
            linear_fn=_tp_linear_fn, kv_caches=caches, pos=lengths,
        )
        # lm_head (llama) / tied embedding (opt) are replicated or vocab-
        # sharded; gather the vocab axis if sharded
        if logits.shape[-1] != cfg.vocab_size:
            logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
        return caches, logits[:, 0, :]

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_tp_prefill(cfg, fam: Family, mesh: Mesh, params_tree, bucket: int) -> Callable:
    """Jitted TP prefill for one slot over a padded prompt bucket.

    prefill(params, caches, ids_padded [bucket], slot, true_len)
      → (caches, next_logits [V])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name)
    n_layers = len(params_tree["layers"])
    cache_specs = [{"k": CACHE_SPEC, "v": CACHE_SPEC} for _ in range(n_layers)]

    def local_prefill(params, caches, ids_padded, slot, true_len):
        slot_caches = [
            {"k": jax.lax.dynamic_slice_in_dim(c["k"], slot, 1, 0),
             "v": jax.lax.dynamic_slice_in_dim(c["v"], slot, 1, 0)}
            for c in caches
        ]
        logits, new_slot = fam.forward(
            params, ids_padded[None, :], lcfg,
            linear_fn=_tp_linear_fn, kv_caches=slot_caches, pos=0,
        )
        caches = [
            {"k": jax.lax.dynamic_update_slice_in_dim(c["k"], nc["k"], slot, 0),
             "v": jax.lax.dynamic_update_slice_in_dim(c["v"], nc["v"], slot, 0)}
            for c, nc in zip(caches, new_slot)
        ]
        next_logits = logits[0, true_len - 1]
        if next_logits.shape[-1] != cfg.vocab_size:
            next_logits = jax.lax.all_gather(next_logits, "tp", axis=-1, tiled=True)
        return caches, next_logits

    fn = shard_map(
        local_prefill,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )
    return jax.jit(fn)


def make_caches_tp(cfg, fam: Family, mesh: Mesh, n_slots: int, max_seq: int, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    from jax.sharding import NamedSharding

    from . import kv_cache as kvmod

    n_layers, kv_heads, head_dim = kvmod.cache_spec_for(cfg, fam.name)
    sharding = NamedSharding(mesh, CACHE_SPEC)
    return [
        {
            "k": jax.device_put(jnp.zeros((n_slots, max_seq, kv_heads, head_dim), dtype), sharding),
            "v": jax.device_put(jnp.zeros((n_slots, max_seq, kv_heads, head_dim), dtype), sharding),
        }
        for _ in range(n_layers)
    ]
