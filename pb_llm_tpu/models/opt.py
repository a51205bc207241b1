"""OPT in pure functional JAX.

Matches HF `OPTForCausalLM` numerics (the second model family the reference
quantizes, `gptq_pb/run.py:21-25`): learned positional embeddings with the
+2 offset, pre-LayerNorm blocks, ReLU MLP, q-scaling attention, optional
project_in/project_out (opt-350m), tied lm_head, and the top-level
final_layer_norm that the streamed evaluator applies before the head
(`gptq_pb/eval_ppl_utils.py:156-169`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .linear import apply_linear


@dataclasses.dataclass(frozen=True)
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 768
    ffn_dim: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 2048
    word_embed_proj_dim: Optional[int] = None
    do_layer_norm_before: bool = True
    layer_norm_eps: float = 1e-5
    # set when a shard-local view uses fewer heads than hidden_size implies
    head_dim_override: Optional[int] = None

    @property
    def embed_dim(self) -> int:
        return self.word_embed_proj_dim or self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_attention_heads

    @property
    def seqlen(self) -> int:
        # reference: model.seqlen = max_position_embeddings (gptq_pb/run.py:25)
        return self.max_position_embeddings

    @classmethod
    def from_hf(cls, hf) -> "OPTConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            ffn_dim=hf.ffn_dim,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            max_position_embeddings=hf.max_position_embeddings,
            word_embed_proj_dim=getattr(hf, "word_embed_proj_dim", None),
            do_layer_norm_before=hf.do_layer_norm_before,
        )


LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2")
POS_OFFSET = 2  # OPTLearnedPositionalEmbedding offset


def init_params(cfg: OPTConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    k = iter(jax.random.split(key, 8 + cfg.num_hidden_layers * 8))

    def lin(ic, oc, bias=True):
        return {
            "w": jax.random.normal(next(k), (ic, oc), dtype) * 0.02,
            "b": jnp.zeros((oc,), dtype) if bias else None,
        }

    def ln(dim):
        return {"w": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}

    h, ffn = cfg.hidden_size, cfg.ffn_dim
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "self_attn_layer_norm": ln(h),
                "q_proj": lin(h, h),
                "k_proj": lin(h, h),
                "v_proj": lin(h, h),
                "out_proj": lin(h, h),
                "final_layer_norm": ln(h),
                "fc1": lin(h, ffn),
                "fc2": lin(ffn, h),
            }
        )
    params = {
        "embed_tokens": jax.random.normal(next(k), (cfg.vocab_size, cfg.embed_dim), dtype) * 0.02,
        "embed_positions": jax.random.normal(next(k), (cfg.max_position_embeddings + POS_OFFSET, h), dtype) * 0.02,
        "layers": layers,
        "final_layer_norm": ln(h) if cfg.do_layer_norm_before else None,
        "project_in": None,
        "project_out": None,
    }
    if cfg.embed_dim != h:
        params["project_in"] = lin(cfg.embed_dim, h, bias=False)
        params["project_out"] = lin(h, cfg.embed_dim, bias=False)
    return params


def layer_norm(x: jnp.ndarray, p: Dict[str, jnp.ndarray], eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype) * p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


from .attention import cache_update, cached_attention, full_causal_attention  # noqa: E402


def decoder_layer(
    lp: Dict[str, Any],
    x: jnp.ndarray,
    cfg: OPTConfig,
    linear_fn: Callable = None,
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    pos: int | jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    lf = linear_fn or (lambda name, lin, h: apply_linear(lin, h))
    b, t, hsz = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim

    residual = x
    h = layer_norm(x, lp["self_attn_layer_norm"], cfg.layer_norm_eps) if cfg.do_layer_norm_before else x
    if "qkv_proj" in lp:  # fused serving layout (models.fusion)
        w = nh * hd
        qkv = lf("qkv_proj", lp["qkv_proj"], h)
        q = qkv[..., :w].reshape(b, t, nh, hd)
        k = qkv[..., w : 2 * w].reshape(b, t, nh, hd)
        v = qkv[..., 2 * w :].reshape(b, t, nh, hd)
    else:
        q = lf("q_proj", lp["q_proj"], h).reshape(b, t, nh, hd)
        k = lf("k_proj", lp["k_proj"], h).reshape(b, t, nh, hd)
        v = lf("v_proj", lp["v_proj"], h).reshape(b, t, nh, hd)
    scale = jnp.asarray(hd**-0.5, x.dtype)
    if kv_cache is not None:
        kv_cache = cache_update(kv_cache, k, v, pos)
        attn = cached_attention(kv_cache, q, k, v, pos, scale)
    else:
        attn = full_causal_attention(q, k, v, scale)
    attn = attn.reshape(b, t, nh * hd)  # == hsz globally; smaller on TP-local views
    x = residual + lf("out_proj", lp["out_proj"], attn)
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, lp["self_attn_layer_norm"], cfg.layer_norm_eps)

    residual = x
    h = layer_norm(x, lp["final_layer_norm"], cfg.layer_norm_eps) if cfg.do_layer_norm_before else x
    h = lf("fc2", lp["fc2"], jax.nn.relu(lf("fc1", lp["fc1"], h)))
    x = residual + h
    if not cfg.do_layer_norm_before:
        x = layer_norm(x, lp["final_layer_norm"], cfg.layer_norm_eps)
    return x, kv_cache


def embed(params: Dict[str, Any], input_ids: jnp.ndarray, cfg: OPTConfig, pos: int | jnp.ndarray = 0) -> jnp.ndarray:
    """Token + positional embedding (+ project_in) — layer 0's input."""
    x = params["embed_tokens"][input_ids]
    if params.get("project_in") is not None:
        x = apply_linear(params["project_in"], x)
    p = jnp.asarray(pos)
    positions = (p[..., None] if p.ndim else p) + jnp.arange(input_ids.shape[1]) + POS_OFFSET
    pe = params["embed_positions"][positions]
    return x + (pe if pe.ndim == 3 else pe[None, :, :])


def head(params: Dict[str, Any], x: jnp.ndarray, cfg: OPTConfig) -> jnp.ndarray:
    """final_layer_norm → project_out → tied lm_head
    (order matches `gptq_pb/eval_ppl_utils.py:156-170`)."""
    if params.get("final_layer_norm") is not None:
        x = layer_norm(x, params["final_layer_norm"], cfg.layer_norm_eps)
    if params.get("project_out") is not None:
        x = apply_linear(params["project_out"], x)
    return x @ params["embed_tokens"].astype(x.dtype).T


def forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    cfg: OPTConfig,
    linear_fn: Callable = None,
    kv_caches: Optional[List[Dict[str, jnp.ndarray]]] = None,
    pos: int | jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, Optional[List[Dict[str, jnp.ndarray]]]]:
    x = embed(params, input_ids, cfg, pos)
    if "layers_stacked" in params:
        # linear_fn passes through for TP's row-parallel psum wrapper;
        # calibration capture still requires the unrolled path (see llama)
        from ..core.pbw import PackedLinearV2
        from . import stacking as _stacking

        if linear_fn is not None and not getattr(linear_fn, "scan_safe", False):
            raise ValueError(
                "linear_fn over stacked layers: a capture-style callback "
                "would see ONE traced call per linear NAME instead of one "
                "per layer (silently wrong statistics) — run calibration "
                "on unrolled layers, or mark a per-call-stateless wrapper "
                "with fn.scan_safe = True (like runtime.tp_engine's psum "
                "wrapper)")
        stacked = params["layers_stacked"]
        # keep PackedLinearV2 leaves out of the scan xs (see models.llama:
        # sliced pallas operands materialize); markers carry stacked planes
        packed_names = [k for k, v in stacked.items()
                        if isinstance(v, PackedLinearV2)]
        rest = {k: v for k, v in stacked.items() if k not in packed_names}
        n_layers = jax.tree_util.tree_leaves(rest)[0].shape[0] if rest else \
            stacked[packed_names[0]].sign_packed.shape[0]
        idxs = jnp.arange(n_layers, dtype=jnp.int32)

        def body(h, xs):
            idx, lp_rest, cache = xs
            lp = dict(lp_rest)
            for k in packed_names:
                lp[k] = _stacking.StackedPackedLinearV2(stacked[k], idx)
            h, cache = decoder_layer(lp, h, cfg, linear_fn, cache, pos)
            return h, cache

        if kv_caches is not None:
            x, new_caches = jax.lax.scan(body, x, (idxs, rest, kv_caches))
        else:
            x, _ = jax.lax.scan(lambda h, xs: body(h, (xs[0], xs[1], None)),
                                x, (idxs, rest))
            new_caches = None
        return head(params, x, cfg), new_caches
    new_caches = [] if kv_caches is not None else None
    for i, lp in enumerate(params["layers"]):
        cache_i = kv_caches[i] if kv_caches is not None else None
        x, cache_i = decoder_layer(lp, x, cfg, linear_fn, cache_i, pos)
        if new_caches is not None:
            new_caches.append(cache_i)
    return head(params, x, cfg), new_caches
