"""Slot-based KV-cache pool: static shapes, per-slot lengths.

[n_slots, max_seq, kv_heads, head_dim] per decoder layer — the jit-friendly
TPU layout (static shapes, per-slot positions handled by vector scatter in
`models.attention.cache_update`).  Slots are the unit of continuous
batching: a finished request frees its slot, a new one claims it; the decode
step always runs the full pool with inactive slots masked.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp


def make_caches(
    cfg: Any, n_slots: int, max_seq: int, n_layers: int, kv_heads: int, head_dim: int,
    dtype=jnp.float32,
) -> List[Dict[str, jnp.ndarray]]:
    """dtype jnp.int8 → absmax-quantized cache with per-(token, head) scales
    (see models.attention.cache_update); halves HBM vs bf16."""
    if dtype == jnp.int8:
        return [
            {
                "k": jnp.zeros((n_slots, max_seq, kv_heads, head_dim), jnp.int8),
                "v": jnp.zeros((n_slots, max_seq, kv_heads, head_dim), jnp.int8),
                "k_scale": jnp.zeros((n_slots, max_seq, kv_heads, 1), jnp.float32),
                "v_scale": jnp.zeros((n_slots, max_seq, kv_heads, 1), jnp.float32),
            }
            for _ in range(n_layers)
        ]
    return [
        {
            "k": jnp.zeros((n_slots, max_seq, kv_heads, head_dim), dtype),
            "v": jnp.zeros((n_slots, max_seq, kv_heads, head_dim), dtype),
        }
        for _ in range(n_layers)
    ]


def cache_spec_for(cfg: Any, family_name: str):
    if family_name == "llama":
        return cfg.num_hidden_layers, cfg.kv_heads, cfg.head_dim
    if family_name == "opt":
        return cfg.num_hidden_layers, cfg.num_attention_heads, cfg.head_dim
    raise NotImplementedError(family_name)


def bytes_per_slot(cfg: Any, family_name: str, max_seq: int, dtype_bytes: int = 4) -> int:
    n_layers, kv_heads, head_dim = cache_spec_for(cfg, family_name)
    return 2 * n_layers * max_seq * kv_heads * head_dim * dtype_bytes
