"""QAT CLI — parity surface with the reference's `qat/run_qat.py` argparse
(:151-182) plus offline extras.

Example (reference command, README.md:77-88):
    python -m pb_llm_tpu.cli.run_qat --binarization_method=xnor_outlier \
        --model_id=facebook/opt-1.3b --train_step=10000 --dataset=red_pajama \
        --outlier_fraction 0.1
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="QAT fine-tuning")
    p.add_argument("--model_id", type=str, default="facebook/opt-350m")
    p.add_argument("--dataset", type=str, default="Abirate/english_quotes")
    p.add_argument("--data_percent", type=float, default=100)
    p.add_argument("-s", "--train_steps", "--train_step", dest="train_steps", type=int, default=1000)
    p.add_argument(
        "--binarization_method", type=str, default="xnor_outlier",
        choices=["xnor_outlier", "xnor_outlier_hessian"],
    )
    p.add_argument("--outlier_fraction", type=float, default=0.1)
    # TPU-build extras
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--seqlen", type=int, default=2048)
    p.add_argument("--gptq_masks", type=str, default=None, help="masks npz from run_ptq --mask_out (hessian variant)")
    p.add_argument("--wrap_compat_8bit", action="store_true",
                   help="freeze the sim-8bit master with the reference's "
                        "uint8 WRAP semantics (bit-for-bit replay of "
                        "reference QAT runs; default = documented clamp fix)")
    p.add_argument("--out_dir", type=str, default="outputs")
    p.add_argument("--save_hf", action="store_true",
                   help="also export an HF save_pretrained dir + tokenizer "
                        "(reference qat/run_qat.py:140-148)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis")
    p.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh axis")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3-style parameter/optimizer sharding over the "
                        "dp axis (shards the frozen sim-8bit masters too); "
                        "numerics unchanged, memory per chip ~1/dp")
    p.add_argument("--metrics", type=str, default=None)
    return p


def main(argv=None) -> int:
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    import jax
    import numpy as np

    from ..calib.pipeline import load_masks
    from ..data.loaders import get_qat_dataset
    from ..data.synthetic import ByteTokenizer, synthetic_source
    from ..models.registry import family_for
    from ..train import qat as tq
    from ..utils.checkpoint import save_dense_checkpoint
    from ..utils.logging import MetricsLogger

    log = MetricsLogger(args.metrics)
    fam = family_for(args.model_id)

    if args.synthetic:
        from ..models.opt import OPTConfig, init_params as opt_init
        from ..models.llama import LlamaConfig, init_params as llama_init

        if fam.name == "opt":
            cfg = OPTConfig(vocab_size=259, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
                            num_attention_heads=4, max_position_embeddings=256)
            params = opt_init(cfg, jax.random.PRNGKey(0))
        else:
            cfg = LlamaConfig(vocab_size=259, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256)
            params = llama_init(cfg, jax.random.PRNGKey(0))
        tokenizer = ByteTokenizer()
        source = synthetic_source()
        seqlen = min(args.seqlen, 128)
    else:
        from ..utils.tokenizer import get_tokenizer

        from ..models import hf_import

        params, cfg, _ = hf_import.from_pretrained(args.model_id)
        tokenizer = get_tokenizer(args.model_id)
        source = None
        seqlen = args.seqlen

    qcfg = tq.QATConfig(
        binarization_method=args.binarization_method,
        outlier_fraction=args.outlier_fraction,
        train_steps=args.train_steps,
        learning_rate=args.learning_rate,
        wrap_compat_8bit=args.wrap_compat_8bit,
    )
    gptq_masks = None
    if args.gptq_masks:
        gptq_masks, _ = load_masks(args.gptq_masks)
    params = tq.replace_linears(params, fam, qcfg, gptq_masks)
    bits = tq.mean_bits_report(params, fam)
    # reference report format (qat/run_qat.py:110)
    print(f"mean_bit: {bits} frac: {bits / 16}")
    log.log("mean_bits", bits=bits)

    if args.dp * args.tp > 1:
        from ..parallel import mesh as pmesh, sharding

        mesh = pmesh.make_mesh(dp=args.dp, tp=args.tp)
        params = sharding.shard_params(params, mesh, fam.name, fsdp=args.fsdp)

    data = get_qat_dataset(args.dataset, tokenizer, args.data_percent, seqlen=seqlen,
                           batch_size=args.batch_size, source=source)
    params, losses = tq.train(
        params, cfg, fam, qcfg, data,
        log=lambda i, l: log.log("train", step=i, loss=l),
    )

    dense = tq.export_dense(params, fam)
    save_dir = os.path.join(
        args.out_dir, args.model_id, f"{args.binarization_method}_{args.outlier_fraction}_{args.train_steps}"
    )
    save_dense_checkpoint(save_dir, dense, {"model_id": args.model_id, "final_loss": losses[-1] if losses else None})
    print(f"model saved to {save_dir}")

    if args.save_hf:
        from ..models import hf_export

        hf_dir = save_dir + "_hf"
        hf_export.save_pretrained(dense, cfg, fam.name, hf_dir,
                                  tokenizer=None if args.synthetic else tokenizer)
        log.log("saved_hf", path=hf_dir)
        print(f"HF checkpoint saved to {hf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
