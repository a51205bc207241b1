"""PTQ CLI — parity surface with the reference's `gptq_pb/run.py` argparse
(same positionals/flags, :196-273) plus TPU-build extras (--format packed,
--save_pbw, --synthetic for offline smoke runs).

Example (reference sweep config, `gptq_pb/run_all.sh:2-5`):
    python -m pb_llm_tpu.cli.run_ptq huggyllama/llama-7b c4 xnor \
        --low_frac 0.9 --high_bit 8 --salient_metric hessian
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model", type=str, help="model to load; e.g. `huggyllama/llama-7b`")
    p.add_argument("dataset", type=str, choices=["wikitext2", "ptb", "c4"])
    p.add_argument("low_quant_method", type=str, choices=["xnor", "sign", "no", "2bit", "4bit", "prune"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--low_frac", type=float, default=0)
    p.add_argument("--blocksize", type=int, default=128)
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--salient_metric", type=str, default="magnitude", choices=["magnitude", "hessian"])
    p.add_argument("--high_bit", type=int, default=8)
    p.add_argument("--high_sym", action="store_true", help="symmetric 8-bit range (HighQuantizer sym)")
    p.add_argument("--high_mse", action="store_true", help="MSE clip search (HighQuantizer mse)")
    p.add_argument("--minlayer", type=int, default=-1)
    p.add_argument("--maxlayer", type=int, default=1000)
    p.add_argument("--quant_only", type=str, default="")
    p.add_argument("--invert", action="store_true")
    p.add_argument("--save", action="store_true",
                   help="HF save_pretrained of the quantized (sim) model (run.py:315-319)")
    p.add_argument("--save_dir", type=str, default=None,
                   help="export directory (default outputs/<config title>)")
    p.add_argument("--load_quantized", type=str, default=None,
                   help="skip quantization; eval a previously saved artifact "
                        "(HF dir or dense checkpoint; run.py:278-280)")
    p.add_argument("--disable_gptq", action="store_true")
    p.add_argument("--ppl_batch", type=int, default=4,
                   help="eval windows per forward (protocol-preserving ~Bx ppl throughput)")
    p.add_argument("--capture_batch", type=int, default=8,
                   help="calibration windows per Hessian-capture dispatch "
                        "(protocol-identical; divides tunnel round-trips)")
    p.add_argument("--log_wandb", action="store_true", help="accepted for parity; unused (as in the reference)")
    # TPU-build extras
    p.add_argument("--format", dest="fmt", type=str, default="sim", choices=["sim", "packed", "packed_v2"])
    p.add_argument("--mask_structure", type=str, default=None, choices=["element", "column"],
                   help="salient-mask granularity (default: element; packed_v2 implies column)")
    p.add_argument("--col_tile", type=int, default=0,
                   help="output-row group width for column masks; 0 = one global "
                        "column set per layer (fastest kernel layout, default)")
    p.add_argument("--save_pbw", type=str, default=None, help="directory for the packed PBW checkpoint")
    p.add_argument("--mask_out", type=str, default=None, help="npz path for GPTQ masks (QAT handoff)")
    p.add_argument("--synthetic", action="store_true", help="offline: synthetic corpus + byte tokenizer + random-init model")
    p.add_argument("--metrics", type=str, default=None, help="JSONL metrics path")
    p.add_argument("--stream", action="store_true",
                   help=">RAM GPTQ-PB: stream the checkpoint one decoder layer "
                        "at a time (model must be a local HF dir with sharded "
                        "weights; requires --save_pbw; skips the in-process "
                        "ppl eval — serve the artifact with `serve --pbw`)")
    return p


def load_model_and_tokenizer(args):
    from ..models.registry import family_for

    fam = family_for(args.model)
    if args.synthetic:
        import jax

        from ..data.synthetic import ByteTokenizer

        if fam.name == "opt":
            from ..models.opt import OPTConfig, init_params

            cfg = OPTConfig(vocab_size=259, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
                            num_attention_heads=4, max_position_embeddings=256)
        else:
            from ..models.llama import LlamaConfig, init_params

            cfg = LlamaConfig(vocab_size=259, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256)
        params = init_params(cfg, jax.random.PRNGKey(0))
        return params, cfg, fam, ByteTokenizer()
    from ..utils.tokenizer import get_tokenizer

    from ..models import hf_import

    params, cfg, _ = hf_import.from_pretrained(args.model)
    tokenizer = get_tokenizer(args.model)
    return params, cfg, fam, tokenizer


def main(argv=None) -> int:
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    from ..ops.kernel_config import pin_exact_prefill

    pin_exact_prefill()  # parity: exact hybrid prefill unless env overrides
    from ..calib.pipeline import quantize_model_ptq, save_masks
    from ..core.config import PTQJobConfig
    from ..data.loaders import get_loaders
    from ..data.synthetic import synthetic_source
    from ..eval.ppl import perplexity
    from ..utils.logging import MetricsLogger

    job = PTQJobConfig(
        model=args.model, dataset=args.dataset, low_quant_method=args.low_quant_method,
        low_frac=args.low_frac, high_bit=args.high_bit, salient_metric=args.salient_metric,
        groupsize=args.groupsize, blocksize=args.blocksize, percdamp=args.percdamp,
        nsamples=args.nsamples, seed=args.seed, minlayer=args.minlayer, maxlayer=args.maxlayer,
        quant_only=args.quant_only, invert=args.invert, disable_gptq=args.disable_gptq,
        high_sym=args.high_sym, high_mse=args.high_mse,
        fmt=args.fmt, mask_out=args.mask_out,
        mask_structure=args.mask_structure or ("column" if args.fmt == "packed_v2" else "element"),
        col_tile=args.col_tile,
    )
    log = MetricsLogger(args.metrics)
    if args.stream:
        if not args.save_pbw:
            raise SystemExit("--stream requires --save_pbw")
        if args.synthetic:
            raise SystemExit("--stream reads a real checkpoint dir; drop --synthetic")
        import transformers

        from ..calib.pipeline import quantize_model_ptq_streamed
        from ..models.hf_stream import StreamedLayerLoader
        from ..models.registry import family_for

        hf_cfg = transformers.AutoConfig.from_pretrained(args.model)
        fam = family_for("opt" if hf_cfg.model_type == "opt" else "llama")
        if fam.name == "opt":
            from ..models.opt import OPTConfig
            cfg = OPTConfig.from_hf(hf_cfg)
        else:
            from ..models.llama import LlamaConfig
            cfg = LlamaConfig.from_hf(hf_cfg)
        from ..utils.tokenizer import get_tokenizer as _gt
        tokenizer = _gt(args.model)
        calib, _ = get_loaders(job.dataset, tokenizer, nsamples=job.nsamples,
                               seed=job.seed, seqlen=cfg.seqlen, flavor="ptq",
                               model=job.model)
        loader = StreamedLayerLoader(args.model, fam.name)
        report = quantize_model_ptq_streamed(
            loader, cfg, fam, calib, job.solver(), args.save_pbw, fmt=job.fmt,
            log=lambda m: log.log("layer", msg=m), capture_batch=args.capture_batch)
        log.log("quantized", seconds=report.seconds,
                total_error=sum(report.errors.values()))
        if job.mask_out:
            save_masks(job.mask_out, report.masks, job.low_frac)
        print(f"streamed PBW checkpoint saved to {args.save_pbw} "
              f"(peak resident layers: {loader.max_live})")
        return 0
    params, cfg, fam, tokenizer = load_model_and_tokenizer(args)
    source = synthetic_source() if args.synthetic else None
    seqlen = min(cfg.seqlen, 128) if args.synthetic else cfg.seqlen

    tick = time.time()
    if args.load_quantized:
        import os

        if os.path.exists(os.path.join(args.load_quantized, "config.json")):
            from ..models import hf_import
            from ..models.registry import family_for

            params, cfg, famname = hf_import.from_pretrained(args.load_quantized)
            fam = family_for(famname)
        else:
            from ..utils.checkpoint import load_dense_checkpoint

            params, _ = load_dense_checkpoint(args.load_quantized)
        log.log("loaded_quantized", path=args.load_quantized)
    elif job.low_frac:
        calib, _ = get_loaders(job.dataset, tokenizer, nsamples=job.nsamples, seed=job.seed,
                               seqlen=seqlen, flavor="ptq", source=source, model=job.model)
        params, report = quantize_model_ptq(
            params, cfg, fam, calib, job.solver(), fmt=job.fmt,
            minlayer=job.minlayer, maxlayer=job.maxlayer,
            quant_only=job.quant_only, invert=job.invert,
            log=lambda m: log.log("layer", msg=m),
            capture_batch=args.capture_batch,
        )
        log.log("quantized", seconds=report.seconds, total_error=sum(report.errors.values()))
        if job.mask_out:
            save_masks(job.mask_out, report.masks, job.low_frac)
    print(f"quantization wall s: {time.time() - tick:.1f}")

    for ds in job.eval_datasets:
        _, evaltok = get_loaders(ds, tokenizer, nsamples=2, seed=job.seed, seqlen=seqlen,
                                 flavor="ptq", source=source, model=job.model)
        ppl = perplexity(params, cfg, fam.forward, evaltok, seqlen=seqlen,
                         window_batch=args.ppl_batch)
        log.log("ppl", dataset=ds, ppl=ppl)
        print(f"{ds} perplexity: {ppl:.4f}")

    if args.save_pbw and job.fmt in ("packed", "packed_v2"):
        from ..core import pbw as pbw_mod
        from ..core.pbw import PackedLinear, PackedLinearV2

        layers = {}
        for i, lp in enumerate(params["layers"]):
            for n, leaf in lp.items():
                if isinstance(leaf, (PackedLinear, PackedLinearV2)):
                    layers[f"layer_{i}/{n}"] = leaf
        pbw_mod.save_pbw(args.save_pbw, layers, {"model": job.model, "config": job.save_title})
        print(f"PBW checkpoint saved to {args.save_pbw}")

    if args.save:
        from ..models import hf_export

        out = args.save_dir or f"outputs/{job.save_title}"
        hf_export.save_pretrained(params, cfg, fam.name, out,
                                  tokenizer=None if args.synthetic else tokenizer)
        log.log("saved_hf", path=out)
        print(f"HF checkpoint saved to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
