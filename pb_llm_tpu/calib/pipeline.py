"""Layer-by-layer PTQ driver: calibrate → GPTQ-PB → write back → propagate.

Functional re-architecture of the reference's `quant_sequential`
(`gptq_pb/run.py:34-189`):

  1. embed all calibration sequences → layer-0 inputs (the reference does
     this with a Catcher module that aborts the forward, `run.py:72-89`;
     here the model is functional so the embedding is just called directly)
  2. per decoder layer:
     a. one capture pass per sample with the layer's *original* weights,
        accumulating each linear's input Hessian H = (2/n)·Σ XᵀX
        (`gptq.py:35-52` via forward hooks; here a jitted capture forward)
     b. per linear: GPTQ-PB solve → fake-quant weight + salient mask +
        quantizer states (`run.py:160-168`)
     c. write back as "sim" (dense fake-quant floats — the reference's only
        mode) or "packed" (real PBW bitplanes)
     d. recompute the layer's outputs with the quantized weights → next
        layer's inputs (`run.py:170-178`)

Masks are collected per linear for the QAT-Hessian handoff (the reference's
mask pickles, `gptq.py:108-114`).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pbw
from ..models.linear import apply_linear, linear_shape
from ..models.registry import Family
from .hessian import fold_coefficients, hessian_fold_chunk
from .solver import SolverConfig, gptq_pb


@dataclasses.dataclass
class PTQReport:
    errors: Dict[str, float]          # per "layer_i/name" GPTQ reconstruction error
    masks: Dict[str, np.ndarray]      # per "layer_i/name" binarized-mask (True ⇔ binary)
    seconds: float
    format: str
    # per "layer_i" mean squared distance between the quantized layer's
    # outputs and the original-weight outputs on the calibration set — the
    # reference's DEBUG sanity check (gptq_pb/gptq.py:170-174) as a
    # first-class metric
    layer_output_mse: Dict[str, float] = dataclasses.field(default_factory=dict)


def _capture_fold_forward(fam: Family, cfg, names):
    """Jitted layer forward over a CHUNK of samples that folds each linear's
    input activations into its running Hessian in the same program — ONE
    dispatch per chunk instead of the reference's per-sample forward hooks
    plus per-linear eager updates (`gptq_pb/run.py:146-158`).  The fold runs
    per sample inside a lax.scan with host-computed rescale scalars, so the
    resulting H is bit-identical to the sequential protocol.  Linears that
    share an input (q/k/v, gate/up) fold ONE XᵀX: their Hessians are
    provably identical, so the scan runs once per distinct captured tensor."""

    def run(lp, xs, hs, coef_a, coef_b):
        captured = {}

        def lf(name, lin, h):
            if name in names:
                captured[name] = h.astype(jnp.float32)
            return apply_linear(lin, h)

        ys, _ = fam.decoder_layer(lp, xs, cfg, linear_fn=lf)
        new_hs = dict(hs)
        groups: Dict[int, List[str]] = {}
        for n in hs:
            groups.setdefault(id(captured[n]), []).append(n)
        for members in groups.values():
            x = captured[members[0]]
            xb = x.reshape(xs.shape[0], -1, x.shape[-1])
            h = hessian_fold_chunk(hs[members[0]], xb, coef_a, coef_b)
            for n in members:
                new_hs[n] = h
        return ys, new_hs

    return jax.jit(run)


def _quant_forward(fam: Family, cfg):
    def run(lp, x):
        y, _ = fam.decoder_layer(lp, x, cfg)
        return y

    return jax.jit(run)


def _solve_layer_linears(lp, hs, i, solver_cfg, fmt, pack_block, errors, masks, log):
    """GPTQ-PB solve + write-back for every captured linear of layer ``i``
    (shared by the resident and streamed pipelines)."""
    for n in sorted(hs):
        lin = lp[n]
        w = lin["w"].T.astype(jnp.float32)  # [ic, oc] -> reference [oc, ic]
        out = gptq_pb(w, hs[n], solver_cfg)
        key = f"layer_{i}/{n}"
        errors[key] = float(out["error"])
        masks[key] = np.asarray(out["mask"])
        if log:
            log(f"{key}: error {errors[key]:.4f}")
        if fmt == "packed":
            packed, diag = pbw.pack_linear(
                out["w_q"], out["mask"], out["low_state"], out["high_state"],
                solver_cfg.low_method, solver_cfg.groupsize,
                bias=lin.get("b"), pack_block=pack_block,
            )
            if diag["pack_mismatch"] > 0 and log:
                log(f"{key}: pack mismatch fraction {diag['pack_mismatch']:.2e}")
            lp[n] = packed
        elif fmt == "packed_v2":
            packed, diag = pbw.pack_linear_v2(
                out["w_q"], out["mask"], out["low_state"], out["high_state"],
                solver_cfg.low_method, col_tile=solver_cfg.col_tile,
                bias=lin.get("b"), pack_block=pack_block,
                ic_shards=solver_cfg.ic_shards,
            )
            if diag["pack_mismatch"] > 0 and log:
                log(f"{key}: pack mismatch fraction {diag['pack_mismatch']:.2e}")
            lp[n] = packed
        else:
            lp[n] = {"w": out["w_q"].T.astype(lin["w"].dtype), "b": lin.get("b")}
        del out


def quantize_model_ptq(
    params: Dict[str, Any],
    cfg: Any,
    fam: Family,
    calib_ids: np.ndarray,           # [nsamples, seqlen] int
    solver_cfg: SolverConfig,
    fmt: str = "sim",                # "sim" | "packed" | "packed_v2"
    minlayer: int = -1,
    maxlayer: int = 100000,
    quant_only: str = "",
    invert: bool = False,
    log: Optional[Callable[[str], None]] = print,
    resume_dir: Optional[str] = None,
    pack_block: Optional[int] = None,
    capture_batch: int = 8,
) -> tuple[Dict[str, Any], PTQReport]:
    """Quantize every decoder linear in place (functionally). Returns (params, report).

    ``resume_dir``: when set, each finished layer's quantized leaves (plus
    errors/masks) are checkpointed there, and a rerun skips solving those
    layers — per-layer jobs become idempotent and a crashed calibration
    resumes mid-model (the reference only survives crashes through dataset
    caches and mask pickles, SURVEY.md §5.3).

    ``capture_batch``: calibration windows per capture/propagate dispatch.
    The Hessian protocol is sample-sequential either way (`hessian_fold_chunk`
    replays the per-sample rescale inside the program), so this only divides
    the host↔device round-trips — 128 batch-1 dispatches per layer were
    minutes of pure latency through a remote-TPU tunnel (VERDICT r2 item 5).
    Memory is O(capture_batch · seqlen · hidden) activations per linear.
    """
    if fmt == "packed_v2" and solver_cfg.mask_structure != "column":
        raise ValueError("fmt='packed_v2' requires SolverConfig(mask_structure='column') "
                         "so the salient mask satisfies the v2 format constraint")
    t0 = time.time()
    calib_ids = np.asarray(calib_ids)
    nsamples = calib_ids.shape[0]
    names = fam.linear_names
    cb = max(1, min(capture_batch, nsamples))

    embed = jax.jit(lambda ids: fam.embed(params, ids, cfg))
    inps = [np.asarray(embed(jnp.asarray(calib_ids[j : j + cb])))
            for j in range(0, nsamples, cb)]

    capture = _capture_fold_forward(fam, cfg, names)
    qforward = _quant_forward(fam, cfg)

    errors: Dict[str, float] = {}
    masks: Dict[str, np.ndarray] = {}
    layer_mse: Dict[str, float] = {}
    layers: List[Dict[str, Any]] = params["layers"]

    for i, lp in enumerate(layers):
        # selection semantics match `gptq_pb/run.py:122-125`
        selected = {n for n in names if (minlayer <= i < maxlayer and quant_only in n) != invert}
        if not selected:
            for j in range(len(inps)):
                inps[j] = np.asarray(qforward(lp, jnp.asarray(inps[j])))
            continue

        if resume_dir and _load_layer_ckpt(resume_dir, i, lp, errors, masks):
            if log:
                log(f"layer_{i}: resumed from checkpoint")
            for j in range(len(inps)):
                inps[j] = np.asarray(qforward(lp, jnp.asarray(inps[j])))
            continue

        hs = {n: jnp.zeros((linear_shape(lp[n])[0],) * 2, jnp.float32) for n in selected}
        orig_outs = []
        start = 0
        for x in inps:
            a, b = fold_coefficients(start, x.shape[0])
            y, hs = capture(lp, jnp.asarray(x), hs, jnp.asarray(a), jnp.asarray(b))
            orig_outs.append(np.asarray(y))
            start += x.shape[0]

        _solve_layer_linears(lp, hs, i, solver_cfg, fmt, pack_block, errors, masks, log)

        if resume_dir:
            _save_layer_ckpt(resume_dir, i, lp, names, errors, masks)

        mse_acc, mse_n = 0.0, 0
        for j in range(len(inps)):
            out_j = np.asarray(qforward(lp, jnp.asarray(inps[j])))
            for r in range(out_j.shape[0]):
                mse_acc += float(np.mean((out_j[r] - orig_outs[j][r]) ** 2))
                mse_n += 1
            inps[j] = out_j
        layer_mse[f"layer_{i}"] = mse_acc / mse_n
        if log:
            log(f"layer_{i}: output mse vs original weights {layer_mse[f'layer_{i}']:.3e}")

    report = PTQReport(errors=errors, masks=masks, seconds=time.time() - t0, format=fmt,
                       layer_output_mse=layer_mse)
    return params, report


def quantize_model_ptq_streamed(
    loader,                          # models.hf_stream.StreamedLayerLoader
    cfg: Any,
    fam: Family,
    calib_ids: np.ndarray,
    solver_cfg: SolverConfig,
    out_dir: str,
    fmt: str = "packed_v2",
    log: Optional[Callable[[str], None]] = print,
    capture_batch: int = 8,
    pack_block: Optional[int] = None,
) -> PTQReport:
    """GPTQ-PB calibration with ONE decoder layer resident at a time
    (VERDICT r2 item 6): weights stream from sharded safetensors through
    `StreamedLayerLoader`, each layer is captured → solved → packed →
    flushed through `PBWShardWriter` → freed, so llama-70B-class checkpoints
    calibrate on a host whose RAM holds one layer + the calibration
    activations — not the model.  The reference's layer-streaming memory
    trick (`gptq_pb/run.py:116-178`) moves layers host↔GPU but still keeps
    the WHOLE model in host RAM; this keeps only the checkpoint on disk.

    Protocol-identical to `quantize_model_ptq` (same capture fold, same
    solver): masks/errors match the resident pipeline bit-for-bit.  The
    artifact holds the packed linears; embeddings/norms stay in the source
    checkpoint (`cli.serve --pbw` installs packed leaves over them).
    """
    if fmt not in ("packed", "packed_v2"):
        raise ValueError("streamed calibration writes packed formats only")
    if fmt == "packed_v2" and solver_cfg.mask_structure != "column":
        raise ValueError("fmt='packed_v2' requires SolverConfig(mask_structure='column')")
    t0 = time.time()
    calib_ids = np.asarray(calib_ids)
    nsamples = calib_ids.shape[0]
    cb = max(1, min(capture_batch, nsamples))
    names = fam.linear_names

    head = loader.non_layer_params(cfg)
    head["layers"] = []
    embed = jax.jit(lambda ids: fam.embed(head, ids, cfg))
    inps = [np.asarray(embed(jnp.asarray(calib_ids[j : j + cb])))
            for j in range(0, nsamples, cb)]

    capture = _capture_fold_forward(fam, cfg, names)
    qforward = _quant_forward(fam, cfg)
    writer = pbw.PBWShardWriter(out_dir)

    errors: Dict[str, float] = {}
    masks: Dict[str, np.ndarray] = {}
    layer_mse: Dict[str, float] = {}
    n_layers = loader.n_layers()
    for i in range(n_layers):
        lp = loader.layer_params(i)
        hs = {n: jnp.zeros((linear_shape(lp[n])[0],) * 2, jnp.float32) for n in names}
        orig_outs = []
        start = 0
        for x in inps:
            a, b = fold_coefficients(start, x.shape[0])
            y, hs = capture(lp, jnp.asarray(x), hs, jnp.asarray(a), jnp.asarray(b))
            orig_outs.append(np.asarray(y))
            start += x.shape[0]
        _solve_layer_linears(lp, hs, i, solver_cfg, fmt, pack_block, errors, masks, log)
        for n in names:
            writer.add_layer(f"layer_{i}/{n}", lp[n])
        mse_acc, mse_n = 0.0, 0
        for j in range(len(inps)):
            out_j = np.asarray(qforward(lp, jnp.asarray(inps[j])))
            for r in range(out_j.shape[0]):
                mse_acc += float(np.mean((out_j[r] - orig_outs[j][r]) ** 2))
                mse_n += 1
            inps[j] = out_j
        layer_mse[f"layer_{i}"] = mse_acc / mse_n
        if log:
            log(f"layer_{i}: output mse vs original weights {layer_mse[f'layer_{i}']:.3e}")
        loader.release(i)
        del lp, hs

    writer.finalize({"source": loader.model_dir, "family": loader.family,
                     "gptq": True, "low_frac": solver_cfg.low_frac})
    return PTQReport(errors=errors, masks=masks, seconds=time.time() - t0,
                     format=fmt, layer_output_mse=layer_mse)


def _save_layer_ckpt(resume_dir: str, i: int, lp: Dict[str, Any], names, errors, masks) -> None:
    import os

    from ..utils import checkpoint as ckpt

    os.makedirs(resume_dir, exist_ok=True)
    quantized = {n: lp[n] for n in names if n in lp}
    extra = {
        "errors": {k: v for k, v in errors.items() if k.startswith(f"layer_{i}/")},
        "mask_keys": [k for k in masks if k.startswith(f"layer_{i}/")],
    }
    layer_dir = os.path.join(resume_dir, f"layer_{i}")
    ckpt.save_dense_checkpoint(layer_dir, quantized, extra)
    mask_arrays = {k.replace("/", "__"): masks[k] for k in extra["mask_keys"]}
    np.savez_compressed(os.path.join(layer_dir, "masks.npz"), **mask_arrays)


def _load_layer_ckpt(resume_dir: str, i: int, lp: Dict[str, Any], errors, masks) -> bool:
    import os

    from ..utils import checkpoint as ckpt

    layer_dir = os.path.join(resume_dir, f"layer_{i}")
    if not os.path.exists(os.path.join(layer_dir, "manifest.json")):
        return False
    quantized, extra = ckpt.load_dense_checkpoint(layer_dir)
    lp.update(quantized)
    errors.update(extra.get("errors", {}))
    z = np.load(os.path.join(layer_dir, "masks.npz"))
    for k in z.files:
        masks[k.replace("__", "/")] = z[k]
    return True


def save_masks(path: str, masks: Dict[str, np.ndarray], low_frac: float) -> None:
    """Persist salient masks for the QAT-Hessian handoff.

    Same role as the reference's `outputs/mask/mask_{low_frac}_{name}.pkl`
    (`gptq_pb/gptq.py:108-114`), as one npz instead of per-layer pickles.
    """
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, __low_frac__=np.float64(low_frac), **{k: v for k, v in masks.items()})


def load_masks(path: str) -> tuple[Dict[str, np.ndarray], float]:
    z = np.load(path)
    masks = {k: z[k] for k in z.files if k != "__low_frac__"}
    return masks, float(z["__low_frac__"])
