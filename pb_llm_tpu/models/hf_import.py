"""HF (PyTorch) checkpoint import → functional JAX param trees.

Replaces the reference's direct use of `OPTForCausalLM.from_pretrained` /
`LlamaForCausalLM.from_pretrained` (`gptq_pb/run.py:12-31`): weights are read
from a torch state dict (numpy-converted on host), transposed to the
``[ic, oc]`` kernel convention, and assembled into the pytrees that
`models.opt` / `models.llama` consume.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from .linear import dense
from .llama import LlamaConfig
from .opt import OPTConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().to("cpu").float().numpy()
    return np.asarray(t, np.float32)


def _lin(sd: Dict[str, Any], prefix: str, dtype) -> Dict[str, jnp.ndarray]:
    w = jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype)  # [oc, ic] -> [ic, oc]
    b = sd.get(prefix + ".bias")
    return dense(w, None if b is None else jnp.asarray(_np(b), dtype))


def _ln(sd: Dict[str, Any], prefix: str, dtype) -> Dict[str, jnp.ndarray]:
    return {"w": jnp.asarray(_np(sd[prefix + ".weight"]), dtype), "b": jnp.asarray(_np(sd[prefix + ".bias"]), dtype)}


def llama_layer_from_sd(sd: Dict[str, Any], i: int, dtype=jnp.float32) -> Dict[str, Any]:
    """One decoder layer's param dict from (a subset of) a state dict —
    the streamed calibration path loads exactly this slice at a time."""
    p = f"model.layers.{i}."
    lp = {
        "input_layernorm": jnp.asarray(_np(sd[p + "input_layernorm.weight"]), dtype),
        "post_attention_layernorm": jnp.asarray(_np(sd[p + "post_attention_layernorm.weight"]), dtype),
    }
    for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
        lp[n] = _lin(sd, p + "self_attn." + n, dtype)
    for n in ("gate_proj", "up_proj", "down_proj"):
        lp[n] = _lin(sd, p + "mlp." + n, dtype)
    return lp


def llama_nonlayer_from_sd(sd: Dict[str, Any], cfg: LlamaConfig, dtype=jnp.float32) -> Dict[str, Any]:
    return {
        "embed_tokens": jnp.asarray(_np(sd["model.embed_tokens.weight"]), dtype),
        "norm": jnp.asarray(_np(sd["model.norm.weight"]), dtype),
        "lm_head": (_lin(sd, "lm_head", dtype) if "lm_head.weight" in sd
                    else dense(jnp.asarray(_np(sd["model.embed_tokens.weight"]).T, dtype), None)),
    }


def llama_from_state_dict(sd: Dict[str, Any], cfg: LlamaConfig, dtype=jnp.float32) -> Dict[str, Any]:
    out = llama_nonlayer_from_sd(sd, cfg, dtype)
    out["layers"] = [llama_layer_from_sd(sd, i, dtype) for i in range(cfg.num_hidden_layers)]
    return out


def opt_layer_from_sd(sd: Dict[str, Any], i: int, dtype=jnp.float32) -> Dict[str, Any]:
    p = f"model.decoder.layers.{i}."
    lp = {
        "self_attn_layer_norm": _ln(sd, p + "self_attn_layer_norm", dtype),
        "final_layer_norm": _ln(sd, p + "final_layer_norm", dtype),
        "fc1": _lin(sd, p + "fc1", dtype),
        "fc2": _lin(sd, p + "fc2", dtype),
    }
    for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
        lp[n] = _lin(sd, p + "self_attn." + n, dtype)
    return lp


def opt_nonlayer_from_sd(sd: Dict[str, Any], cfg: OPTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    dec = "model.decoder."
    return {
        "embed_tokens": jnp.asarray(_np(sd[dec + "embed_tokens.weight"]), dtype),
        "embed_positions": jnp.asarray(_np(sd[dec + "embed_positions.weight"]), dtype),
        "final_layer_norm": _ln(sd, dec + "final_layer_norm", dtype) if dec + "final_layer_norm.weight" in sd else None,
        "project_in": _lin(sd, dec + "project_in", dtype) if dec + "project_in.weight" in sd else None,
        "project_out": _lin(sd, dec + "project_out", dtype) if dec + "project_out.weight" in sd else None,
    }


def opt_from_state_dict(sd: Dict[str, Any], cfg: OPTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    params = opt_nonlayer_from_sd(sd, cfg, dtype)
    params["layers"] = [opt_layer_from_sd(sd, i, dtype) for i in range(cfg.num_hidden_layers)]
    return params


def from_torch_model(model, dtype=jnp.float32) -> Tuple[Dict[str, Any], Any, str]:
    """(params, config, family) from an instantiated HF torch model."""
    sd = model.state_dict()
    name = type(model).__name__.lower()
    if "llama" in name or "mistral" in name:
        # Mistral rides the llama family: identical state-dict layout, GQA,
        # RoPE, SiLU MLP; the one architectural delta (sliding-window
        # attention) arrives via LlamaConfig.sliding_window
        cfg = LlamaConfig.from_hf(model.config)
        return llama_from_state_dict(sd, cfg, dtype), cfg, "llama"
    if "opt" in name:
        cfg = OPTConfig.from_hf(model.config)
        return opt_from_state_dict(sd, cfg, dtype), cfg, "opt"
    raise NotImplementedError(f"unsupported model class {type(model).__name__}")


def from_pretrained(path_or_repo: str, dtype=jnp.float32) -> Tuple[Dict[str, Any], Any, str]:
    """Load an HF checkpoint (local path in offline environments) and convert.

    Mirrors `gptq_pb/run.py:12-31`'s dispatch: "opt" → OPT family, otherwise
    LLaMA.
    """
    import transformers

    # Prefer the checkpoint's own model_type (exported dirs may have any
    # path); fall back to the reference's name heuristic for bare repo ids.
    try:
        model_type = transformers.AutoConfig.from_pretrained(path_or_repo).model_type
    except Exception:
        model_type = None
    if model_type is None:
        model_type = "opt" if "opt" in path_or_repo.lower() else "llama"
    if model_type == "opt":
        model = transformers.OPTForCausalLM.from_pretrained(path_or_repo, torch_dtype="auto")
    elif model_type == "mistral":
        model = transformers.MistralForCausalLM.from_pretrained(path_or_repo, torch_dtype="auto")
    else:
        model = transformers.LlamaForCausalLM.from_pretrained(path_or_repo, torch_dtype="auto")
    return from_torch_model(model, dtype)
