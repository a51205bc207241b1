"""Parameter-tree reporting helpers — parity with `utils.py`'s prints.

  count_parameters / print_trainable_parameters  (`utils.py:14-26`)
  device_memory_report                           (`utils.py:9-11`)
  zero_fraction_report — the post-quantization sanity print of
                         `gptq_pb/run.py:293-296`
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.pbw import PackedLinear
from ..quant.qat import QATLinear


def count_parameters(params: Any) -> Tuple[int, int]:
    """(trainable, total). QATLinear weight/bias count as trainable; dense
    leaves and packed planes count as frozen (matching the QAT setup where
    the base model is frozen, `utils.py:29-50`)."""
    trainable = total = 0

    def visit(node):
        nonlocal trainable, total
        if isinstance(node, QATLinear):
            n = node.weight.size + (node.bias.size if node.bias is not None else 0)
            trainable += n
            total += n
        elif isinstance(node, PackedLinear):
            total += node.ic * node.oc
        elif isinstance(node, dict):
            for v in node.values():
                visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)
        elif node is not None and hasattr(node, "size"):
            total += node.size

    visit(params)
    return trainable, total


def print_trainable_parameters(params: Any) -> str:
    t, a = count_parameters(params)
    msg = f"trainable params: {t} || all params: {a} || trainable%: {100 * t / max(a, 1)}"
    print(msg)
    return msg


def device_memory_report() -> Dict[str, float]:
    """Per-device bytes-in-use (replaces torch.cuda.memory_allocated prints)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats() or {}
            out[str(d)] = stats.get("bytes_in_use", float("nan")) / 1e6
        except Exception:
            out[str(d)] = float("nan")
    return out


def zero_fraction_report(params: Any, limit_substr: str = "fc2") -> Dict[str, float]:
    """Mean zero-fraction per dense leaf until `limit_substr` is hit
    (`gptq_pb/run.py:293-296` prints p==0 means and breaks at 'fc2')."""
    report: Dict[str, float] = {}

    def visit(node, prefix):
        if isinstance(node, dict):
            if "w" in node and node["w"] is not None and hasattr(node["w"], "dtype"):
                report[prefix] = float(jnp.mean((node["w"] == 0).astype(jnp.float32)))
                return limit_substr in prefix
            for k, v in node.items():
                if visit(v, f"{prefix}.{k}" if prefix else k):
                    return True
        elif isinstance(node, list):
            for i, v in enumerate(node):
                if visit(v, f"{prefix}.{i}"):
                    return True
        return False

    visit(params, "")
    return report
