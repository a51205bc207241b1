"""Paged KV-cache pool: global page arrays + host-side page tables.

Replaces the fixed [n_slots, max_seq] strip layout (`runtime.kv_cache`) with
a pool of fixed-size pages shared by all slots: HBM per request is
ceil(len/page)·page instead of max_seq, so the same memory serves many more
concurrent requests under length variance.  Device side stays fully static
(jit-friendly): pages live in [n_pages, page, H, D] arrays per layer, slots
reference them through an int32 page table that rides the decode kernel's
scalar-prefetch channel (`ops.paged_attention`).

Allocation is host-side and incremental: `ensure(slot, length)` grows the
slot's page list from a free list; `release(slot)` returns pages.  Table
rows always contain VALID page indices (freed/unused entries keep index 0)
because the kernel masks by length, not by table sentinel.

**Prefix caching** (``prefix_cache=True``): full prompt pages are indexed by
a rolling chain hash over their token ids (page i's key covers tokens
[0, (i+1)·page) — exactly the causal dependency of its K/V rows), so a new
request whose prompt shares a page-aligned prefix with any earlier prompt
ATTACHES the cached pages (refcount++) instead of recomputing them; only the
suffix runs prefill compute (`Engine._prefill_suffix`).  Shared full pages
are read-only by construction — writes only ever land at positions >= the
writing slot's length, which lies past every full shared page — so no
copy-on-write is needed.  Released pages whose refcount hits 0 stay cached
in an LRU (`evictable`) and are reclaimed only when allocation would
otherwise fail, vLLM-style.  All bookkeeping is deterministic host Python
(int/tuple hashes are not seed-randomized), so multi-host replicas that see
the same admission order keep identical tables.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_CHAIN_SEED = 0x9E3779B9  # fixed root of the page-chain hash


class PagePool:
    def __init__(self, n_pages: int, page_size: int, n_slots: int, max_seq: int,
                 prefix_cache: bool = False):
        """Host-side page bookkeeping; the page ARRAYS live in the engine's
        per-layer cache dicts (jit-functional), only the table/free-list are
        mutable host state.

        One extra TRASH page (index ``n_pages``) absorbs writes from
        inactive slots: their table rows point at it, so the batched decode
        write (which scatters for every slot, active or not) can never
        corrupt a live page.  Reads from it are masked by length."""
        if max_seq % page_size:
            raise ValueError(f"max_seq {max_seq} not divisible by page_size {page_size}")
        self.page_size = page_size
        self.n_pages = n_pages
        self.trash_page = n_pages  # arrays are sized n_pages + 1
        self.max_pages_per_slot = max_seq // page_size
        self.n_slots = n_slots
        self.table = np.full((n_slots, self.max_pages_per_slot), self.trash_page, np.int32)
        self.owned: List[List[int]] = [[] for _ in range(n_slots)]
        self.free_list: List[int] = list(range(n_pages - 1, -1, -1))
        # prefix cache state (all host-side, deterministic)
        self.prefix_cache = prefix_cache
        self.ref = np.zeros(n_pages, np.int32)       # owners per page
        self.hash_page: Dict[int, int] = {}          # chain hash -> page id
        self.page_hash: Dict[int, int] = {}          # page id -> chain hash
        self.evictable: "OrderedDict[int, None]" = OrderedDict()  # ref==0, cached (LRU)
        self.prefix_queries = 0
        self.prefix_hit_pages = 0

    # -- host-side bookkeeping ----------------------------------------------

    def pages_needed(self, length: int) -> int:
        return -(-length // self.page_size)

    def can_admit(self, length: int) -> bool:
        return self.free_pages >= self.pages_needed(length)

    def _alloc_page(self) -> int:
        if self.free_list:
            pg = self.free_list.pop()
        elif self.evictable:
            # reclaim the least-recently-released cached page
            pg, _ = self.evictable.popitem(last=False)
            h = self.page_hash.pop(pg)
            self.hash_page.pop(h, None)
        else:
            raise RuntimeError("page pool exhausted")
        self.ref[pg] = 1
        return pg

    def ensure(self, slot: int, length: int) -> None:
        """Grow slot's page list to cover ``length`` tokens."""
        need = self.pages_needed(length)
        if need > self.max_pages_per_slot:
            raise ValueError(f"length {length} exceeds max_seq")
        while len(self.owned[slot]) < need:
            pg = self._alloc_page()
            self.table[slot, len(self.owned[slot])] = pg
            self.owned[slot].append(pg)

    def release(self, slot: int) -> None:
        for pg in reversed(self.owned[slot]):
            self.ref[pg] -= 1
            if self.ref[pg] == 0:
                if pg in self.page_hash:  # stays cached, reclaimable (LRU)
                    self.evictable[pg] = None
                else:
                    self.free_list.append(pg)
        self.owned[slot] = []
        self.table[slot, :] = self.trash_page

    @property
    def free_pages(self) -> int:
        """Allocatable pages: truly free + cached-but-unreferenced."""
        return len(self.free_list) + len(self.evictable)

    # -- prefix cache --------------------------------------------------------

    def _chain_hashes(self, tokens: Sequence[int], n_full: int) -> List[int]:
        """Rolling hashes h_i over tokens[0:(i+1)·page] for i < n_full."""
        ps = self.page_size
        out, h = [], _CHAIN_SEED
        for i in range(n_full):
            h = hash((h, tuple(tokens[i * ps : (i + 1) * ps])))
            out.append(h)
        return out

    def match_prefix(self, tokens: Sequence[int], max_pages: int) -> Tuple[int, List[int]]:
        """Longest cached page chain covering tokens' page-aligned prefix,
        capped at ``max_pages`` (callers cap at (len-1)//page so at least one
        token always runs prefill compute).  Returns (n_pages, page_ids) —
        the pages are NOT attached yet (`attach` does the refcounting)."""
        if not self.prefix_cache or max_pages <= 0:
            return 0, []
        self.prefix_queries += 1
        pages: List[int] = []
        for h in self._chain_hashes(tokens, max_pages):
            pg = self.hash_page.get(h)
            if pg is None:
                break
            pages.append(pg)
        return len(pages), pages

    def attach(self, slot: int, pages: Sequence[int]) -> None:
        """Adopt cached pages as the slot's leading table entries (ref++).
        `prefix_hit_pages` counts here — pages actually adopted — not in
        `match_prefix`, whose matches the chunked path may align away."""
        if self.owned[slot]:
            raise RuntimeError(f"attach on non-empty slot {slot}")
        for i, pg in enumerate(pages):
            if self.ref[pg] == 0:
                self.evictable.pop(pg, None)
            self.ref[pg] += 1
            self.table[slot, i] = pg
            self.owned[slot].append(pg)
        self.prefix_hit_pages += len(pages)

    def register_chain(self, slot: int, tokens: Sequence[int]) -> None:
        """Index the slot's full prompt pages by chain hash (first writer
        wins; pages already cached under the same chain re-register as a
        no-op).  Call AFTER the prompt's K/V rows are written."""
        if not self.prefix_cache:
            return
        n_full = min(len(tokens) // self.page_size, len(self.owned[slot]))
        for i, h in enumerate(self._chain_hashes(tokens, n_full)):
            pg = self.owned[slot][i]
            if h not in self.hash_page and pg not in self.page_hash:
                self.hash_page[h] = pg
                self.page_hash[pg] = h

    def table_device(self) -> jnp.ndarray:
        return jnp.asarray(self.table)

    def make_layer_cache(self, n_layers: int, kv_heads: int, head_dim: int,
                         dtype=jnp.float32) -> List[Dict[str, jnp.ndarray]]:
        """Per-layer paged cache dicts (the shape `models.attention` expects).
        Pages are head-major [P+1, H, page, D] (the +1 is the trash page);
        the page table is replicated into each dict (tiny int32) so the
        whole cache rides `fam.forward(kv_caches=...)` unchanged.

        int8 pages (the capacity lever: 2x pages per HBM byte vs bf16, 4x vs
        f32) carry per-(token, head) f32 absmax scales in [P+1, H, page]
        sidecar planes — same scheme as the int8 strip cache
        (`models.attention.cache_update`), dequantized in-kernel."""
        shape = (self.n_pages + 1, kv_heads, self.page_size, head_dim)

        def layer():
            # DISTINCT buffers per layer: the engine DONATES its cache
            # argument, and a buffer aliased across layers would be donated
            # twice in one call (XLA rejects it).  Content is identical;
            # only aliasing must be broken.
            cache = {
                "k_pages": jnp.zeros(shape, dtype),
                "v_pages": jnp.zeros(shape, dtype),
                "table": jnp.asarray(self.table),
            }
            if dtype == jnp.int8:
                cache["k_scale_pages"] = jnp.zeros(shape[:3], jnp.float32)
                cache["v_scale_pages"] = jnp.zeros(shape[:3], jnp.float32)
            return cache

        return [layer() for _ in range(n_layers)]


# -- device-side writes (functional; per-layer arrays; call under jit) ------


def write_token(pages: jnp.ndarray, new: jnp.ndarray, page_ids: jnp.ndarray,
                offsets: jnp.ndarray) -> jnp.ndarray:
    """Scatter one new KV token per slot: pages [P+1, H, page, D] head-major
    (or [P+1, H, page] scale planes), new [B, H, D] (or [B, H]),
    page_ids/offsets [B] int32 (inactive slots' table rows point at the
    trash page).

    One batched XLA scatter (not a per-slot scan): active slots hit unique
    (page, offset) pairs; inactive slots all collide on the trash page,
    where write order is irrelevant."""
    return pages.at[page_ids, :, offsets].set(new.astype(pages.dtype))


def write_tokens(pages: jnp.ndarray, new: jnp.ndarray, page_ids: jnp.ndarray,
                 offsets: jnp.ndarray) -> jnp.ndarray:
    """Multi-token decode write (speculative verify): new [B, t, H, D] (or
    [B, t, H] scale planes), page_ids/offsets [B, t] — one flattened batched
    scatter; a slot's t tokens may span a page boundary (the table lookup is
    per token).  Inactive slots' rows all land in the trash page."""
    b, t = page_ids.shape
    flat = new.reshape(b * t, *new.shape[2:])
    return pages.at[page_ids.reshape(-1), :, offsets.reshape(-1)].set(
        flat.astype(pages.dtype))


def write_prompt(pages: jnp.ndarray, seq: jnp.ndarray, slot_pages: jnp.ndarray) -> jnp.ndarray:
    """Write a whole (padded) prompt into one slot's pages: pages
    [P+1, H, page, D] head-major (or [P+1, H, page] scale planes), seq
    [T_pad, H, D] (or [T_pad, H]) with T_pad % page == 0, slot_pages
    [>= T_pad/page] int32.  Positions past the true length land in their
    page too — masked by `lengths` at read time and overwritten by decode."""
    page = pages.shape[2]
    n = seq.shape[0] // page
    # [n, page, H, ...] -> [n, H, page, ...]
    blocks = jnp.swapaxes(seq.reshape(n, page, *seq.shape[1:]), 1, 2).astype(pages.dtype)

    def per_page(pages, xs):
        pg, blk = xs
        return jax.lax.dynamic_update_slice(pages, blk[None], (pg,) + (0,) * (pages.ndim - 1)), None

    pages, _ = jax.lax.scan(per_page, pages, (slot_pages[:n], blocks))
    return pages


def write_prompts(pages: jnp.ndarray, seqs: jnp.ndarray, slot_pages: jnp.ndarray) -> jnp.ndarray:
    """Batched-prefill variant of `write_prompt`: seqs [K, T_pad, H, ...],
    slot_pages [K, >= T_pad/page].  Slots write sequentially (lax.scan
    carrying the pool), so duplicate rows — batched prefill pads by
    repeating a row — deterministically rewrite the same data."""

    def per_slot(pages, xs):
        sp, seq = xs
        return write_prompt(pages, seq, sp), None

    pages, _ = jax.lax.scan(per_slot, pages, (slot_pages, seqs))
    return pages
