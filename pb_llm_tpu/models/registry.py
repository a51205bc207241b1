"""Model-family registry: one place that knows forward/config/linears per family.

The reference dispatches on substrings of the model name throughout
(`gptq_pb/run.py:21-30,44-64`, `eval_ppl_utils.py` has one function per
family); here each family registers its functional pieces once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

from . import llama as _llama
from . import opt as _opt


@dataclasses.dataclass(frozen=True)
class Family:
    name: str
    forward: Callable  # (params, ids, cfg, linear_fn=None, kv_caches=None, pos=0) -> (logits, caches)
    embed: Callable    # (params, ids, cfg) -> layer-0 input hidden states
    decoder_layer: Callable
    head: Callable     # (params, hidden, cfg) -> logits
    linear_names: Tuple[str, ...]
    config_cls: type


def _llama_embed(params, ids, cfg, pos=0):
    return _llama.hidden_states_prefix(params, ids, cfg)


def _llama_layer(lp, x, cfg, linear_fn=None, kv_cache=None, pos=0):
    import jax.numpy as jnp

    p = jnp.asarray(pos)
    positions = (p[..., None] if p.ndim else p) + jnp.arange(x.shape[1])
    cos, sin = _llama.rope_tables(cfg, positions)
    return _llama.decoder_layer(lp, x, cfg, cos.astype(x.dtype), sin.astype(x.dtype), linear_fn, kv_cache, pos)


FAMILIES = {
    "llama": Family(
        name="llama",
        forward=_llama.forward,
        embed=_llama_embed,
        decoder_layer=_llama_layer,
        head=lambda params, x, cfg: _llama.final_logits(params, x, cfg),
        linear_names=_llama.LINEAR_NAMES,
        config_cls=_llama.LlamaConfig,
    ),
    "opt": Family(
        name="opt",
        forward=_opt.forward,
        embed=_opt.embed,
        decoder_layer=_opt.decoder_layer,
        head=_opt.head,
        linear_names=_opt.LINEAR_NAMES,
        config_cls=_opt.OPTConfig,
    ),
}


def family_for(model_name: str) -> Family:
    """Substring dispatch, same convention as `gptq_pb/run.py:21-30`."""
    lowered = model_name.lower()
    if "opt" in lowered:
        return FAMILIES["opt"]
    if "llama" in lowered or "mistral" in lowered:
        # mistral rides the llama family (models/hf_import.py) — identical
        # linears/layout; sliding window comes from the config
        return FAMILIES["llama"]
    raise NotImplementedError(f"unknown model family for {model_name!r}")
