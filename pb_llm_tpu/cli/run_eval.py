"""Eval CLI — parity surface with `qat/eval_after_qat.py` + `evaluate_model`
(`evaluate.py:87-183`): windowed perplexity on wikitext2/ptb/c4 and
multiple-choice task suites (boolq,piqa / llmqat / mmlu).

Example (reference quick + full passes, eval_after_qat.py:17-33):
    python -m pb_llm_tpu.cli.run_eval outputs/... --model_id facebook/opt-1.3b \
        --tasks boolq,piqa --limit 200 --eval_ppl wikitext2,ptb,c4
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Perplexity + task evaluation")
    p.add_argument("checkpoint", type=str, nargs="?", default=None,
                   help="dense/QAT checkpoint dir (utils.checkpoint) or PBW dir; omit to eval the base model")
    p.add_argument("--model_id", type=str, required=True)
    p.add_argument("--tasks", type=str, default="", help="comma list; suites: llmqat, mmlu")
    p.add_argument("--eval_ppl", type=str, default="wikitext2,ptb,c4")
    p.add_argument("--limit", type=int, default=-1)
    p.add_argument("--ppl_batch", type=int, default=4,
                   help="eval windows per forward (protocol-preserving ~Bx ppl throughput)")
    p.add_argument("--ppl_limit", type=int, default=None, help="max ppl windows per dataset (evaluate.py:144-145 early stop)")
    p.add_argument("--seqlen", type=int, default=None)
    p.add_argument("--flavor", type=str, default="qat", choices=["ptq", "qat"],
                   help="eval-text construction flavor (the two reference pipelines differ)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--metrics", type=str, default=None)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel ways for the ppl forward: shard "
                        "each eval window over an sp mesh axis with ring "
                        "attention (long windows beyond one chip's memory); "
                        "seqlen must be divisible by sp")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over stacked layers for the ppl forward "
                        "(one compiled body; large models compile in seconds)")
    p.add_argument("--vocab_limit", type=int, default=50257,
                   help="slice logits to the first N rows during task scoring "
                        "(reference evaluate.py:79 does this unconditionally; "
                        "no-op when vocab <= N); 0 disables")
    p.add_argument("--num_fewshot", type=int, default=0,
                   help="lm-eval v0.3 few-shot prompting (labeled examples "
                        "joined into each query context; reference "
                        "evaluate.py:94)")
    return p


def main(argv=None) -> int:
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    from ..ops.kernel_config import pin_exact_prefill

    pin_exact_prefill()  # parity: exact hybrid prefill unless env overrides
    import numpy as np

    from ..eval.ppl import perplexity
    from ..eval.tasks import evaluate_model_tasks
    from ..data.loaders import get_eval_tokens, get_loaders
    from ..models.registry import family_for
    from ..utils.logging import MetricsLogger

    log = MetricsLogger(args.metrics)
    fam = family_for(args.model_id)

    if args.synthetic:
        import jax

        from ..data.synthetic import ByteTokenizer, synthetic_source

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
        seqlen = args.seqlen or 64
    else:
        from ..utils.tokenizer import get_tokenizer

        from ..models import hf_import

        params, cfg, _ = hf_import.from_pretrained(args.model_id)
        tokenizer = get_tokenizer(args.model_id)
        source = None
        seqlen = args.seqlen or cfg.seqlen

    if args.checkpoint:
        from ..utils.checkpoint import load_dense_checkpoint

        params, extra = load_dense_checkpoint(args.checkpoint)
        log.log("loaded_checkpoint", path=args.checkpoint, **{k: str(v) for k, v in extra.items()})

    if args.scan_layers:
        from ..models.stacking import stack_layers

        params = stack_layers(params)

    for ds in [d for d in args.eval_ppl.split(",") if d]:
        if args.flavor == "qat":
            evaltok = get_eval_tokens(ds, tokenizer, source=source)
        else:
            _, evaltok = get_loaders(ds, tokenizer, nsamples=2, seqlen=seqlen, flavor="ptq", source=source)
        if args.sp > 1:
            from ..eval.ppl import perplexity_sp
            from ..parallel.ring_attention import make_sp_mesh

            ppl = perplexity_sp(params, cfg, fam.forward, evaltok, make_sp_mesh(args.sp),
                                seqlen=seqlen, window_limit=args.ppl_limit)
        else:
            ppl = perplexity(params, cfg, fam.forward, evaltok, seqlen=seqlen, window_limit=args.ppl_limit,
                             window_batch=args.ppl_batch)
        log.log("ppl", dataset=ds, ppl=ppl)
        print(f"{ds} perplexity: {ppl:.4f}")

    tasks = [t for t in args.tasks.split(",") if t]
    if tasks:
        out = evaluate_model_tasks(params, cfg, fam, tokenizer, tasks, limit=args.limit,
                                   vocab_limit=args.vocab_limit or None,
                                   num_fewshot=args.num_fewshot)
        for t, r in out["results"].items():
            print(f"{t}: acc {r['acc']:.4f} (n={r['n']})")
            log.log("task", task=t, **r)
        print(f"mean acc: {out['mean_acc']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
