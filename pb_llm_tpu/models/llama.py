"""LLaMA in pure functional JAX.

Matches HF `LlamaForCausalLM` numerics (the model family the reference
quantizes, `gptq_pb/run.py:26-30`): RMSNorm in float32, rotary embeddings
with HF's rotate-half convention, optional GQA, SwiGLU MLP, untied lm_head.

Params are plain pytrees; every linear is a `models.linear` leaf (dense dict
or PackedLinear), so the same forward serves fp, fake-quant ("sim") and
bit-packed checkpoints.  A `linear_fn(name, lin, x)` callback makes layer
inputs observable for GPTQ-PB calibration — the functional replacement for
the reference's forward hooks + Catcher modules (`gptq_pb/run.py:72-89`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .linear import apply_linear


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    # sliding-window attention width (Mistral family; None = dense causal).
    # The llama module serves mistral unchanged otherwise: same state-dict
    # layout, GQA, RoPE, SiLU MLP.
    sliding_window: Optional[int] = None
    seqlen: int = 2048  # reference pins llama eval windows to 2048 (gptq_pb/run.py:30)
    # set when a shard-local view uses fewer heads than hidden_size implies
    head_dim_override: Optional[int] = None

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, hf) -> "LlamaConfig":
        return cls(
            vocab_size=hf.vocab_size,
            hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_hidden_layers=hf.num_hidden_layers,
            num_attention_heads=hf.num_attention_heads,
            num_key_value_heads=getattr(hf, "num_key_value_heads", None),
            max_position_embeddings=hf.max_position_embeddings,
            rms_norm_eps=hf.rms_norm_eps,
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            sliding_window=getattr(hf, "sliding_window", None),
            # some configs (mistral v0.3+, llama3) carry an explicit
            # head_dim; honor it when it differs from hidden/heads
            head_dim_override=(
                getattr(hf, "head_dim", None)
                if getattr(hf, "head_dim", None) not in
                (None, hf.hidden_size // hf.num_attention_heads) else None),
        )


LINEAR_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def init_params(cfg: LlamaConfig, key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Random-init params (tests / QAT-from-scratch); shapes mirror HF."""
    k = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * 8))

    def lin(ic, oc):
        return {"w": (jax.random.normal(next(k), (ic, oc), dtype) * 0.02), "b": None}

    h, ffn, hd = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": jnp.ones((h,), dtype),
                "post_attention_layernorm": jnp.ones((h,), dtype),
                "q_proj": lin(h, cfg.num_attention_heads * hd),
                "k_proj": lin(h, cfg.kv_heads * hd),
                "v_proj": lin(h, cfg.kv_heads * hd),
                "o_proj": lin(cfg.num_attention_heads * hd, h),
                "gate_proj": lin(h, ffn),
                "up_proj": lin(h, ffn),
                "down_proj": lin(ffn, h),
            }
        )
    return {
        "embed_tokens": jax.random.normal(next(k), (cfg.vocab_size, h), dtype) * 0.02,
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        "lm_head": lin(h, cfg.vocab_size),
    }


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def rope_tables(cfg: LlamaConfig, positions: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [*, head_dim] at the given positions (HF half-rotation layout)."""
    d = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [*, d/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, heads, d]; cos/sin: [T, d] or [B, T, d]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    cos, sin = cos[..., None, :], sin[..., None, :]  # [*, T, 1, d] broadcasts over heads
    return x * cos + rotated * sin


from .attention import cache_update, cached_attention, full_causal_attention  # noqa: E402


def decoder_layer(
    lp: Dict[str, Any],
    x: jnp.ndarray,
    cfg: LlamaConfig,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    linear_fn: Callable = None,
    kv_cache: Optional[Dict[str, jnp.ndarray]] = None,
    pos: int | jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """One decoder block. Returns (hidden, updated kv_cache)."""
    lf = linear_fn or (lambda name, lin, h: apply_linear(lin, h))
    b, t, hsz = x.shape
    hd = cfg.head_dim

    h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    if "qkv_proj" in lp:  # fused serving layout (models.fusion)
        wq = cfg.num_attention_heads * hd
        wkv = cfg.kv_heads * hd
        qkv = lf("qkv_proj", lp["qkv_proj"], h)
        q = qkv[..., :wq].reshape(b, t, cfg.num_attention_heads, hd)
        k = qkv[..., wq : wq + wkv].reshape(b, t, cfg.kv_heads, hd)
        v = qkv[..., wq + wkv :].reshape(b, t, cfg.kv_heads, hd)
    else:
        q = lf("q_proj", lp["q_proj"], h).reshape(b, t, cfg.num_attention_heads, hd)
        k = lf("k_proj", lp["k_proj"], h).reshape(b, t, cfg.kv_heads, hd)
        v = lf("v_proj", lp["v_proj"], h).reshape(b, t, cfg.kv_heads, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    scale = jnp.asarray(1.0 / jnp.sqrt(jnp.float32(hd)), x.dtype)
    win = cfg.sliding_window
    if kv_cache is not None:
        kv_cache = cache_update(kv_cache, k, v, pos)
        attn = cached_attention(kv_cache, q, k, v, pos, scale, window=win)
    else:
        attn = full_causal_attention(q, k, v, scale, window=win)
    attn = attn.reshape(b, t, cfg.num_attention_heads * hd)
    x = x + lf("o_proj", lp["o_proj"], attn)

    h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    if "gateup_proj" in lp:  # fused serving layout (models.fusion)
        gu = lf("gateup_proj", lp["gateup_proj"], h)
        ffn = gu.shape[-1] // 2
        gate, up = gu[..., :ffn], gu[..., ffn:]
    else:
        gate = lf("gate_proj", lp["gate_proj"], h)
        up = lf("up_proj", lp["up_proj"], h)
    x = x + lf("down_proj", lp["down_proj"], jax.nn.silu(gate) * up)
    return x, kv_cache


def forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    cfg: LlamaConfig,
    linear_fn: Callable = None,
    kv_caches: Optional[List[Dict[str, jnp.ndarray]]] = None,
    pos: int | jnp.ndarray = 0,
) -> Tuple[jnp.ndarray, Optional[List[Dict[str, jnp.ndarray]]]]:
    """input_ids [B, T] → logits [B, T, V] (and updated caches if given)."""
    x = params["embed_tokens"][input_ids]
    p = jnp.asarray(pos)
    positions = (p[..., None] if p.ndim else p) + jnp.arange(input_ids.shape[1])
    cos, sin = rope_tables(cfg, positions)
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    if "layers_stacked" in params:
        # one scan body compiled once instead of num_layers unrolled copies
        # (stack with models.stacking.stack_layers).  linear_fn passes
        # through for TP's row-parallel psum wrapper — but calibration
        # CAPTURE still needs the unrolled path (a capture callback would
        # see one traced call per linear name, not one per layer).
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
        # PackedLinearV2 leaves stay OUT of the scan xs: scan would slice
        # their big planes per step and XLA materializes sliced pallas
        # operands (~10 MB/matmul).  A StackedPackedLinearV2 marker carries
        # the whole stacked arrays + the layer index into `apply_linear`,
        # which runs the scalar-prefetch stacked kernel.
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
            h, cache = decoder_layer(lp, h, cfg, cos, sin, linear_fn, cache, pos)
            return h, cache

        if kv_caches is not None:
            x, new_caches = jax.lax.scan(body, x, (idxs, rest, kv_caches))
        else:
            x, _ = jax.lax.scan(lambda h, xs: body(h, (xs[0], xs[1], None)),
                                x, (idxs, rest))
            new_caches = None
        x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
        return apply_linear(params["lm_head"], x), new_caches
    new_caches = [] if kv_caches is not None else None
    for i, lp in enumerate(params["layers"]):
        cache_i = kv_caches[i] if kv_caches is not None else None
        x, cache_i = decoder_layer(lp, x, cfg, cos, sin, linear_fn, cache_i, pos)
        if new_caches is not None:
            new_caches.append(cache_i)
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = apply_linear(params["lm_head"], x)
    return logits, new_caches


def hidden_states_prefix(params, input_ids, cfg) -> jnp.ndarray:
    """Embedding output — layer 0's input, the calibration entry point
    (functional analogue of the reference Catcher, `gptq_pb/run.py:72-89`)."""
    return params["embed_tokens"][input_ids]


def final_logits(params, x, cfg) -> jnp.ndarray:
    """final norm + lm_head, matching `eval_ppl_utils.py:66-68`."""
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return apply_linear(params["lm_head"], x)
