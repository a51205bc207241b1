"""Explicit shard_map collectives for the packed-inference engine.

The dense/sim paths rely on GSPMD (jit + NamedSharding) to insert
collectives.  The Pallas packed kernel, however, is written per-shard, so the
engine wraps it in `shard_map` and issues the Megatron pair explicitly:

  column-parallel: x replicated → y sharded on oc (no collective)
  row-parallel:    x sharded on ic → partial y → psum over tp

These helpers are also the unit-testable contract of the TP math
(sharded == unsharded), exercised on the CPU 8-device mesh in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.pbw import PackedLinear
from ..ops.binary_matmul import pb_matmul


def _local_meta(p: PackedLinear, col: bool, tp: int) -> PackedLinear:
    """Adjust static meta for the per-shard view inside shard_map."""
    if col:
        return dataclasses.replace(p, oc=p.oc // tp)
    ic_l = p.ic // tp
    return dataclasses.replace(p, ic=ic_l, groupsize=min(p.groupsize, ic_l))


def column_parallel_pb_matmul(x: jnp.ndarray, p: PackedLinear, mesh: Mesh, gather: bool = False) -> jnp.ndarray:
    """x replicated [m, ic]; planes oc-sharded; y oc-sharded (or gathered)."""
    tp = mesh.shape["tp"]
    pspec = jax.tree_util.tree_map(lambda _: P(None, "tp"), p)
    pspec = dataclasses.replace(
        pspec,
        high_scale=P("tp"), high_zero=P("tp"),
        bias=None if p.bias is None else P("tp"),
    )

    def f(x_l, p_l):
        return pb_matmul(x_l, _local_meta(p_l, col=True, tp=tp))

    y = shard_map(
        f, mesh=mesh, in_specs=(P(), pspec), out_specs=P(None, "tp"), check_vma=False,
    )(x, p)
    if gather:
        y = jax.lax.with_sharding_constraint(y, NamedSharding(mesh, P()))
    return y


def row_parallel_pb_matmul(x: jnp.ndarray, p: PackedLinear, mesh: Mesh) -> jnp.ndarray:
    """x ic-sharded [m, ic]; planes ic-sharded; y replicated after psum.

    The bitplane's pack blocks must tile each shard (pack_block | ic/tp) or
    sharded word-rows would interleave rows across shards — pack for the
    target tp (`pack_linear(..., pack_block=ic//tp)` or smaller divisor).
    """
    tp = mesh.shape["tp"]
    if (p.ic // tp) % p.pack_block != 0:
        raise ValueError(
            f"row-parallel over tp={tp} needs pack_block | ic/tp "
            f"(ic={p.ic}, pack_block={p.pack_block}); repack with a smaller pack_block"
        )
    # group params shard with the rows only when groups split evenly;
    # with groupsize=-1 (one whole-row group) they are replicated and every
    # local row indexes group 0 (local groupsize = local ic in _local_meta)
    gspec = P("tp", None) if p.n_groups % tp == 0 else P()
    pspec = jax.tree_util.tree_map(lambda _: P("tp", None), p)
    pspec = dataclasses.replace(
        pspec,
        low_scale=gspec, low_mean=gspec,
        high_scale=P(), high_zero=P(),
        bias=None if p.bias is None else P(),
    )

    def f(x_l, p_l):
        p_l = _local_meta(p_l, col=False, tp=tp)
        bias = p_l.bias
        p_l = dataclasses.replace(p_l, bias=None)  # add bias once, after psum
        y = pb_matmul(x_l, p_l)
        y = jax.lax.psum(y, "tp")
        if bias is not None:
            y = y + bias
        return y

    return shard_map(
        f, mesh=mesh, in_specs=(P(None, "tp"), pspec), out_specs=P(), check_vma=False,
    )(x, p)
