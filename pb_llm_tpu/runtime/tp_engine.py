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
import functools
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
        from ..core.pbw import PackedLinear, PackedLinearV2
        from ..models.stacking import StackedPackedLinearV2

        if isinstance(lin, StackedPackedLinearV2):
            # scan_layers: strip the stacked bias so it isn't added per
            # shard pre-psum; re-add this layer's row after the psum
            bias = None if lin.stacked.bias is None else lin.stacked.bias[lin.idx]
            lin = StackedPackedLinearV2(
                dataclasses.replace(lin.stacked, bias=None), lin.idx)
        elif isinstance(lin, (PackedLinear, PackedLinearV2)):
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


# stateless per call: safe inside the stacked-layer scan body (the model
# forwards reject unmarked linear_fns there — capture callbacks are not)
_tp_linear_fn.scan_safe = True


def _cache_spec_for_key(k: str):
    """Strip caches carry heads on axis 2 (k/v and int8 scale planes alike);
    paged pools carry heads on axis 1 ([P+1, H, page, D]) and the page table
    is tiny replicated int32."""
    if k in ("k_pages", "v_pages"):
        return P(None, "tp", None, None)
    if k in ("k_scale_pages", "v_scale_pages"):
        return P(None, "tp", None)
    if k == "table":
        return P()
    return CACHE_SPEC


def _cache_specs_like(caches):
    if isinstance(caches, dict):  # scan-stacked: leading [L] axis unsharded
        return {k: P(*((None,) + tuple(_cache_spec_for_key(k))))
                for k in caches}
    return [{k: _cache_spec_for_key(k) for k in c} for c in caches]


def _slice_slot(caches, slot):
    """One slot's cache rows (batch axis 1 for stacked dicts, 0 otherwise)."""
    if isinstance(caches, dict):
        return jax.tree_util.tree_map(
            lambda c: jax.lax.dynamic_slice_in_dim(c, slot, 1, 1), caches)
    return [
        {k: jax.lax.dynamic_slice_in_dim(v, slot, 1, 0) for k, v in c.items()}
        for c in caches
    ]


def _update_slot(caches, new, slot):
    if isinstance(caches, dict):
        return jax.tree_util.tree_map(
            lambda c, nc: jax.lax.dynamic_update_slice_in_dim(c, nc, slot, 1),
            caches, new)
    return [
        {k: jax.lax.dynamic_update_slice_in_dim(c[k], nc[k], slot, 0) for k in c}
        for c, nc in zip(caches, new)
    ]


def _index_slots(caches, slots):
    if isinstance(caches, dict):
        return jax.tree_util.tree_map(lambda c: c[:, slots], caches)
    return [{k: v[slots] for k, v in c.items()} for c in caches]


def _set_slots(caches, new, slots):
    if isinstance(caches, dict):
        return jax.tree_util.tree_map(
            lambda c, nc: c.at[:, slots].set(nc), caches, new)
    return [
        {k: c[k].at[slots].set(nc[k]) for k in c}
        for c, nc in zip(caches, new)
    ]


def make_tp_step(cfg, fam: Family, mesh: Mesh, params_tree, caches_tree=None) -> Callable:
    """Jitted TP decode step over sharded params + caches.

    step(params, caches, last_tokens [S], lengths [S]) → (caches, logits [S, V])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    if caches_tree is not None:
        cache_specs = _cache_specs_like(caches_tree)
    else:
        cache_specs = [{"k": CACHE_SPEC, "v": CACHE_SPEC}
                       for _ in range(len(params_tree["layers"]))]

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
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_tp_prefill(cfg, fam: Family, mesh: Mesh, params_tree, bucket: int, caches_tree=None) -> Callable:
    """Jitted TP prefill for one slot over a padded prompt bucket.

    prefill(params, caches, ids_padded [bucket], slot, true_len)
      → (caches, next_logits [V])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    if caches_tree is not None:
        cache_specs = _cache_specs_like(caches_tree)
    else:
        cache_specs = [{"k": CACHE_SPEC, "v": CACHE_SPEC}
                       for _ in range(len(params_tree["layers"]))]

    def local_prefill(params, caches, ids_padded, slot, true_len):
        slot_caches = _slice_slot(caches, slot)
        logits, new_slot = fam.forward(
            params, ids_padded[None, :], lcfg,
            linear_fn=_tp_linear_fn, kv_caches=slot_caches, pos=0,
        )
        caches = _update_slot(caches, new_slot, slot)
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
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_tp_prefill_paged(cfg, fam: Family, mesh: Mesh, params_tree, bucket: int, caches_tree) -> Callable:
    """Jitted TP prefill into a PAGED pool (runtime.paged_kv): the whole page
    pool rides along head-sharded; the slot's page list (replicated int32)
    directs the writes exactly as in `Engine._make_prefill_paged`.

    prefill(params, caches, ids_padded [bucket], slot_pages [maxp], true_len)
      → (caches, next_logits [V])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    cache_specs = _cache_specs_like(caches_tree)

    from .engine import _cache_strip_extras, _cache_with_extras

    def local_prefill(params, caches, ids_padded, slot_pages, true_len):
        pcaches = _cache_with_extras(caches, slot_pages=slot_pages)
        logits, new = fam.forward(
            params, ids_padded[None, :], lcfg,
            linear_fn=_tp_linear_fn, kv_caches=pcaches, pos=0,
        )
        new = _cache_strip_extras(new)
        next_logits = logits[0, true_len - 1]
        if next_logits.shape[-1] != cfg.vocab_size:
            next_logits = jax.lax.all_gather(next_logits, "tp", axis=-1, tiled=True)
        return new, next_logits

    fn = shard_map(
        local_prefill,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_tp_spec(cfg, fam: Family, mesh: Mesh, params_tree, caches_tree) -> Callable:
    """Jitted TP speculative-verify step (see `Engine.spec_decode_step`):
    t = γ+1 inputs per slot through one shard_map; greedy predictions
    all-gathered when the vocab is sharded."""
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    cache_specs = _cache_specs_like(caches_tree)

    def local_step(params, caches, inputs, lengths):
        logits, caches = fam.forward(
            params, inputs, lcfg,
            linear_fn=_tp_linear_fn, kv_caches=caches, pos=lengths,
        )
        if logits.shape[-1] != cfg.vocab_size:
            logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lps = jnp.take_along_axis(lp, preds[..., None], axis=-1)[..., 0]
        return caches, preds, lps

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P()),
        out_specs=(cache_specs, P(), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_tp_spec_logits(cfg, fam: Family, mesh: Mesh, params_tree, caches_tree) -> Callable:
    """TP verify forward returning the FULL gathered logits [B, t, V] — the
    rejection-sampling verify (`sampler.spec_verify_sample`) rides them
    outside shard_map, like the per-request decode sampler."""
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    cache_specs = _cache_specs_like(caches_tree)

    def local_step(params, caches, inputs, lengths):
        logits, caches = fam.forward(
            params, inputs, lcfg,
            linear_fn=_tp_linear_fn, kv_caches=caches, pos=lengths,
        )
        if logits.shape[-1] != cfg.vocab_size:
            logits = jax.lax.all_gather(logits, "tp", axis=-1, tiled=True)
        return caches, logits

    return shard_map(
        local_step,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )


def make_tp_prefill_chunk(cfg, fam: Family, mesh: Mesh, params_tree, chunk: int, caches_tree, paged: bool) -> Callable:
    """Jitted TP chunked-prefill step (see `Engine.prefill_chunk_step`).

    strips: prefill(params, caches, ids_chunk [C], slot, offset, n_valid)
    paged:  prefill(params, caches, ids_chunk [C], chunk_pages, table_row, offset, n_valid)
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    cache_specs = _cache_specs_like(caches_tree)

    if paged:
        from .engine import _cache_strip_extras, _cache_with_extras

        def local_chunk(params, caches, ids_chunk, chunk_pages, table_row, offset, n_valid):
            pcaches = _cache_with_extras(caches, slot_pages=chunk_pages,
                                         chunk_table=table_row)
            logits, new = fam.forward(params, ids_chunk[None, :], lcfg,
                                      linear_fn=_tp_linear_fn, kv_caches=pcaches, pos=offset)
            new = _cache_strip_extras(new)
            nl = logits[0, n_valid - 1]
            if nl.shape[-1] != cfg.vocab_size:
                nl = jax.lax.all_gather(nl, "tp", axis=-1, tiled=True)
            return new, nl

        in_specs = (pspecs, cache_specs, P(), P(), P(), P(), P())
    else:
        def local_chunk(params, caches, ids_chunk, slot, offset, n_valid):
            slot_caches = _slice_slot(caches, slot)
            logits, new = fam.forward(params, ids_chunk[None, :], lcfg,
                                      linear_fn=_tp_linear_fn, kv_caches=slot_caches, pos=offset)
            caches = _update_slot(caches, new, slot)
            nl = logits[0, n_valid - 1]
            if nl.shape[-1] != cfg.vocab_size:
                nl = jax.lax.all_gather(nl, "tp", axis=-1, tiled=True)
            return caches, nl

        in_specs = (pspecs, cache_specs, P(), P(), P(), P())

    fn = shard_map(
        local_chunk, mesh=mesh, in_specs=in_specs,
        out_specs=(cache_specs, P()), check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_tp_prefill_batch(cfg, fam: Family, mesh: Mesh, params_tree, bucket: int, caches_tree, paged: bool) -> Callable:
    """Jitted TP BATCHED prefill (see `Engine.prefill_batch`): K same-bucket
    prompts in one shard_map program; the per-layer packed-weight dequant of
    the hybrid prefill path amortizes K-fold per shard.

    strips: prefill(params, caches, ids [K, bucket], slots [K], true_lens [K])
    paged:  prefill(params, caches, ids [K, bucket], slot_pages [K, maxp], true_lens [K])
    """
    tp = mesh.shape["tp"]
    lcfg = _local_cfg(cfg, fam, tp)
    pspecs = param_specs(params_tree, fam.name, mesh)
    cache_specs = _cache_specs_like(caches_tree)

    def _next_logits(logits, true_lens):
        nl = jnp.take_along_axis(logits, (true_lens - 1)[:, None, None], axis=1)[:, 0]
        if nl.shape[-1] != cfg.vocab_size:
            nl = jax.lax.all_gather(nl, "tp", axis=-1, tiled=True)
        return nl

    if paged:
        from .engine import _cache_strip_extras, _cache_with_extras

        def local_prefill(params, caches, ids_padded, slot_pages, true_lens):
            pcaches = _cache_with_extras(caches, slot_pages=slot_pages)
            logits, new = fam.forward(
                params, ids_padded, lcfg,
                linear_fn=_tp_linear_fn, kv_caches=pcaches, pos=0,
            )
            new = _cache_strip_extras(new)
            return new, _next_logits(logits, true_lens)
    else:
        def local_prefill(params, caches, ids_padded, slots, true_lens):
            slot_caches = _index_slots(caches, slots)
            logits, new = fam.forward(
                params, ids_padded, lcfg,
                linear_fn=_tp_linear_fn, kv_caches=slot_caches, pos=0,
            )
            caches = _set_slots(caches, new, slots)
            return caches, _next_logits(logits, true_lens)

    fn = shard_map(
        local_prefill,
        mesh=mesh,
        in_specs=(pspecs, cache_specs, P(), P(), P()),
        out_specs=(cache_specs, P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(1,))  # caches donated (see Engine._jit)


def make_caches_tp(cfg, fam: Family, mesh: Mesh, n_slots: int, max_seq: int, dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
    from jax.sharding import NamedSharding

    from . import kv_cache as kvmod

    n_layers, kv_heads, head_dim = kvmod.cache_spec_for(cfg, fam.name)
    caches = kvmod.make_caches(cfg, n_slots, max_seq, n_layers, kv_heads, head_dim, dtype)
    sharding = NamedSharding(mesh, CACHE_SPEC)
    return [{k: jax.device_put(v, sharding) for k, v in c.items()} for c in caches]


# ---------------------------------------------------------------------------
# Engine-compatible TP wrapper — the "one serving program": TP-sharded packed
# weights + slot-pool continuous batching + (multi-host) scheduling all
# compose, because TPEngine only swaps the two jitted programs the base
# Engine builds for shard_map'd ones; ContinuousBatcher/MultiHostBatcher see
# the identical slot/step interface.
# ---------------------------------------------------------------------------


class TPEngine:
    """Drop-in Engine over a tp mesh (usable by runtime.batching schedulers).

    Construct with an UNSHARDED param tree (packed v1 leaves must be packed
    with pack_block | ic/tp for the row-parallel layers); weights are placed
    with Megatron shardings, caches head-sharded, and every program is one
    shard_map over the mesh."""

    def __init__(self, params, cfg, fam: Family, ecfg, mesh: Mesh, sampling=None, shard: bool = True):
        from ..parallel.sharding import shard_params
        from .engine import Engine
        from .sampler import SamplingParams

        if getattr(ecfg, "fuse_linears", False):
            raise NotImplementedError(
                "fuse_linears under TP is unsupported: the Megatron shardings "
                "are per-name and a fused layer's oc shards would cross row-"
                "group boundaries — use per-name layers with --tp")
        if getattr(ecfg, "scan_layers", False) and "layers_stacked" not in params:
            # stack BEFORE sharding: param_specs places stacked leaves with
            # the [L] axis prepended; the scan body then runs the scalar-
            # prefetch stacked kernel per shard inside the shard_map step
            from ..models import stacking

            params = stacking.stack_layers(params)
        tp = mesh.shape["tp"]
        kvh = cfg.kv_heads if fam.name == "llama" else cfg.num_attention_heads
        if cfg.num_attention_heads % tp or kvh % tp:
            raise ValueError(f"tp={tp} must divide attention heads "
                             f"({cfg.num_attention_heads} q / {kvh} kv)")
        self.mesh = mesh
        params_sh = shard_params(params, mesh, fam.name) if shard else params
        self._base = Engine(params_sh, cfg, fam, ecfg, sampling or SamplingParams())
        base = self._base
        from jax.sharding import NamedSharding

        if isinstance(base.caches, dict):
            # scan-stacked cache dict: per-key spec with the [L] axis leading
            cspecs = _cache_specs_like(base.caches)
            base.caches = {
                k: jax.device_put(v, NamedSharding(mesh, cspecs[k]))
                for k, v in base.caches.items()
            }
        elif base.pool is not None:
            # paged pool: pages head-sharded over tp, table replicated
            base.caches = [
                {k: jax.device_put(v, NamedSharding(mesh, _cache_spec_for_key(k)))
                 for k, v in c.items()}
                for c in base.caches
            ]
        else:
            base.caches = make_caches_tp(cfg, fam, mesh, ecfg.n_slots, ecfg.max_seq, base.cache_dtype)

        def make_prefill(bucket):
            return make_tp_prefill(cfg, fam, mesh, params_sh, bucket, caches_tree=base.caches)

        def make_prefill_paged(bucket):
            return make_tp_prefill_paged(cfg, fam, mesh, params_sh, bucket, caches_tree=base.caches)

        def make_prefill_batch(bucket):
            return make_tp_prefill_batch(cfg, fam, mesh, params_sh, bucket,
                                         caches_tree=base.caches, paged=False)

        def make_prefill_paged_batch(bucket):
            return make_tp_prefill_batch(cfg, fam, mesh, params_sh, bucket,
                                         caches_tree=base.caches, paged=True)

        def make_decode():
            import functools

            from .sampler import sample

            step = make_tp_step(cfg, fam, mesh, params_sh, caches_tree=base.caches)
            sampling_ = base.sampling

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode(params, caches, last_tokens, lengths, active, key):
                caches, logits = step(params, caches, last_tokens, lengths)
                toks = sample(logits, key, sampling_)
                toks = jnp.where(active, toks, 0)
                from .engine import _chosen_logprob

                lps = _chosen_logprob(logits, toks)
                lengths = jnp.where(active, lengths + 1, lengths)
                return caches, toks, lengths, lps

            return decode

        def make_decode_vec():
            # per-request sampling: the tp forward is the shard_map; sampling
            # happens on the gathered logits in plain jit land, so the
            # vectorized sampler slots straight in (same contract as
            # Engine._make_decode_vec)
            from .sampler import sample_vec

            step = make_tp_step(cfg, fam, mesh, params_sh, caches_tree=base.caches)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def decode(params, caches, last_tokens, lengths, active, key, temp, tk, tp):
                caches, logits = step(params, caches, last_tokens, lengths)
                toks = sample_vec(logits, key, temp, tk, tp)
                toks = jnp.where(active, toks, 0)
                from .engine import _chosen_logprob

                lps = _chosen_logprob(logits, toks)
                lengths = jnp.where(active, lengths + 1, lengths)
                return caches, toks, lengths, lps

            return decode

        def _wrap(factory):
            """Scope every TP program's traces to this engine's KernelConfig
            (EngineConfig.kernels), like Engine._jit does single-device."""
            kc = ecfg.kernels
            if kc is None:
                return factory

            from ..ops.kernel_config import use_kernels

            def make(*a, **k):
                prog = factory(*a, **k)

                def call(*args, **kwargs):
                    with use_kernels(kc):
                        return prog(*args, **kwargs)

                return call

            return make

        base._make_prefill = _wrap(make_prefill)
        base._make_prefill_paged = _wrap(make_prefill_paged)
        base._make_prefill_batch = _wrap(make_prefill_batch)
        base._make_prefill_paged_batch = _wrap(make_prefill_paged_batch)
        base._make_decode = _wrap(make_decode)
        base._make_decode_vec = _wrap(make_decode_vec)
        base._make_spec = _wrap(lambda gamma: make_tp_spec(
            cfg, fam, mesh, params_sh, caches_tree=base.caches))

        def make_spec_sampled(gamma):
            from .sampler import spec_verify_sample

            step = make_tp_spec_logits(cfg, fam, mesh, params_sh,
                                       caches_tree=base.caches)

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, caches, inputs, lengths, key, temp, tk, tp_, drafts):
                caches, logits = step(params, caches, inputs, lengths)
                acc, corr, lp_d, lp_c = spec_verify_sample(
                    logits, drafts, key, temp, tk, tp_)
                return caches, acc, corr, lp_d, lp_c

            return run

        base._make_spec_sampled = _wrap(make_spec_sampled)
        base._make_prefill_chunk = _wrap(lambda chunk: make_tp_prefill_chunk(
            cfg, fam, mesh, params_sh, chunk, caches_tree=base.caches, paged=False))
        base._make_prefill_chunk_paged = _wrap(lambda chunk: make_tp_prefill_chunk(
            cfg, fam, mesh, params_sh, chunk, caches_tree=base.caches, paged=True))

    def __getattr__(self, name):
        return getattr(self._base, name)
