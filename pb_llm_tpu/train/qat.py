"""QAT fine-tuning loop — optax counterpart of the reference's HF Trainer run
(`qat/run_qat.py:83-148`).

Reference training recipe being reproduced:
  * replace every linear with a partially-binarized STE layer, masks fixed
    before training, master weights frozen to sim-8bit
    (`qat/run_qat.py:99-110`)
  * only the fresh q-linear params train; the base model (embeddings,
    layernorms) is frozen (`utils.py:29-50` freezes, then `replace_with_qlinear`
    adds fresh trainable params)
  * AdamW, lr 1e-4, cosine schedule, 5% warmup, causal-LM loss
    (`qat/run_qat.py:113-125`)
  * gradient checkpointing (`utils.py:49`) → `jax.checkpoint` per layer

All functional: `replace_linears` swaps dense leaves for QATLinear pytree
leaves; `make_train_step` returns a jittable (and pjit-shardable) step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.linear import apply_linear
from ..models.registry import Family
from ..quant import qat as qat_layers
from ..quant.qat import QATLinear, apply_qat_linear


@dataclasses.dataclass(frozen=True)
class QATConfig:
    binarization_method: str = "xnor_outlier"     # reference choices (run_qat.py:168-176)
    outlier_fraction: float = 0.1
    train_steps: int = 1000
    learning_rate: float = 1e-4
    warmup_frac: float = 0.05
    weight_decay: float = 0.0
    grad_accum: int = 1
    remat: bool = True
    # reproduce the reference's uint8 WRAP when freezing the sim-8bit
    # master (quant/qat.weight_quant_8bit wrap_compat — fires on all
    # negative weights at real LLM scales); default keeps the documented
    # clamp fix.  For replaying reference QAT runs bit-for-bit.
    wrap_compat_8bit: bool = False


def replace_linears(
    params: Dict[str, Any],
    fam: Family,
    qcfg: QATConfig,
    gptq_masks: Optional[Dict[str, np.ndarray]] = None,
) -> Dict[str, Any]:
    """Swap every decoder linear for a QATLinear (≡ `replace_with_qlinear`,
    `qat/run_qat.py:45-66`). Masks are generated eagerly (the reference does
    so before training to print mean bits, `run_qat.py:101-110`).
    Non-mutating: returns a new tree sharing unchanged leaves."""
    params = dict(params)
    new_layers = []
    for i, lp in enumerate(params["layers"]):
        lp = dict(lp)
        for n in fam.linear_names:
            lin = lp[n]
            gm = (gptq_masks or {}).get(f"layer_{i}/{n}")
            lp[n] = qat_layers.make_qat_linear(
                lin["w"].T, lin.get("b"), qcfg.outlier_fraction,
                method=qcfg.binarization_method, gptq_mask=gm,
                wrap_compat=qcfg.wrap_compat_8bit,
            )
        new_layers.append(lp)
    params["layers"] = new_layers
    return params


def mean_bits_report(params: Dict[str, Any], fam: Family) -> float:
    """Mean effective bit-width over all QAT linears (`run_qat.py:101-110`)."""
    tot_bits, tot_params = 0.0, 0
    for lp in params["layers"]:
        for n in fam.linear_names:
            q = lp[n]
            if isinstance(q, QATLinear):
                tot_bits += qat_layers.mean_effective_bits(q) * q.weight.size
                tot_params += q.weight.size
    return tot_bits / max(tot_params, 1)


def qat_linear_fn(name, lin, x):
    if isinstance(lin, QATLinear):
        return apply_qat_linear(lin, x)
    return apply_linear(lin, x)


def causal_lm_loss(logits: jnp.ndarray, input_ids: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """HF `DataCollatorForLanguageModeling(mlm=False)` semantics: labels are
    the inputs, shifted inside the model's loss; pad positions ignored."""
    lg = logits[:, :-1].astype(jnp.float32)
    tg = input_ids[:, 1:]
    logz = jax.scipy.special.logsumexp(lg, axis=-1)
    gold = jnp.take_along_axis(lg, tg[..., None], axis=-1)[..., 0]
    nll = logz - gold
    if pad_mask is not None:
        m = pad_mask[:, 1:].astype(jnp.float32)
        return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(nll)


def _forward_remat(params, ids, cfg, fam: Family, remat: bool):
    x = fam.embed(params, ids, cfg)
    layer = fam.decoder_layer
    if remat:
        layer = jax.checkpoint(lambda lp, x: fam.decoder_layer(lp, x, cfg, linear_fn=qat_linear_fn)[0])
        for lp in params["layers"]:
            x = layer(lp, x)
    else:
        for lp in params["layers"]:
            x, _ = fam.decoder_layer(lp, x, cfg, linear_fn=qat_linear_fn)
    return fam.head(params, x, cfg)


def trainable_labels(params: Dict[str, Any]) -> Any:
    """'train' for QATLinear weight/bias leaves, 'freeze' elsewhere — the
    frozen base-model semantics of `utils.py:29-50` + fresh-qlinear training."""

    def walk(node):
        if isinstance(node, QATLinear):
            return QATLinear(
                weight="train", bias=None if node.bias is None else "train",
                outlier_mask="freeze", method=node.method,
                outlier_scale=node.outlier_scale, train_outlier=node.train_outlier,
            )
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return "freeze"

    return walk(params)


def make_optimizer(qcfg: QATConfig, params: Dict[str, Any]) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=qcfg.learning_rate,
        warmup_steps=max(int(qcfg.train_steps * qcfg.warmup_frac), 1),
        decay_steps=qcfg.train_steps,
    )
    opt = optax.adamw(schedule, weight_decay=qcfg.weight_decay)
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()}, trainable_labels(params)
    )


def make_train_step(cfg, fam: Family, qcfg: QATConfig, optimizer) -> Callable:
    """Returns jittable `step(params, opt_state, batch) -> (params, opt_state, loss)`.

    ``batch``: {"input_ids": [B, T], optional "attention_mask": [B, T]}.
    """

    def loss_fn(params, batch):
        logits = _forward_remat(params, batch["input_ids"], cfg, fam, qcfg.remat)
        return causal_lm_loss(logits, batch["input_ids"], batch.get("attention_mask"))

    def grads_of(params, batch):
        # allow_int: the tree carries bool masks / int ids; they get float0
        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params, batch)
        # int/bool leaves (masks, embeds ids) get float0 tangents; zero them
        grads = jax.tree.map(
            lambda g, p: jnp.zeros_like(p) if g.dtype == jax.dtypes.float0 else g,
            grads, params,
        )
        return loss, grads

    def step(params, opt_state, batch):
        if qcfg.grad_accum > 1:
            # reference recipe: per-device batch 2 × grad-accum 4
            # (qat/run_qat.py:114-115); batch leading dim splits into chunks
            def _f(a):  # int/bool leaves (frozen masks) stay untouched
                return jnp.issubdtype(a.dtype, jnp.inexact)

            def acc_step(carry, micro):
                loss_sum, gacc = carry
                loss, grads = grads_of(params, micro)
                gacc = jax.tree.map(lambda a, g: a + g if _f(a) else a, gacc, grads)
                return (loss_sum + loss, gacc), ()

            micro = jax.tree.map(
                lambda v: v.reshape(qcfg.grad_accum, v.shape[0] // qcfg.grad_accum, *v.shape[1:]),
                batch,
            )
            zeros = jax.tree.map(jnp.zeros_like, params)
            (loss, grads), _ = jax.lax.scan(acc_step, (0.0, zeros), micro)
            loss = loss / qcfg.grad_accum
            grads = jax.tree.map(lambda g: g / qcfg.grad_accum if _f(g) else g, grads)
        else:
            loss, grads = grads_of(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def export_dense(params: Dict[str, Any], fam: Family) -> Dict[str, Any]:
    """Materialize all QAT layers back to dense leaves (≡ `to_regular_linear`,
    `qat/run_qat.py:69-80`) for `save_pretrained`-style export. Non-mutating."""
    params = dict(params)
    new_layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        for n in fam.linear_names:
            if isinstance(lp[n], QATLinear):
                lp[n] = qat_layers.to_dense(lp[n])
        new_layers.append(lp)
    params["layers"] = new_layers
    return params


def train(
    params: Dict[str, Any],
    cfg,
    fam: Family,
    qcfg: QATConfig,
    batches,                       # iterable of {"input_ids": np[B,T], ...}
    log: Optional[Callable[[int, float], None]] = None,
) -> Tuple[Dict[str, Any], list]:
    """Run the QAT loop for qcfg.train_steps steps over ``batches``."""
    optimizer = make_optimizer(qcfg, params)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(cfg, fam, qcfg, optimizer))
    losses = []
    it = iter(batches)
    for i in range(qcfg.train_steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
        if log:
            log(i, losses[-1])
    return params, losses
