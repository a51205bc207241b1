"""Serving demo CLI: continuous-batching generation over a (packed) model.

The reference has no serving path (SURVEY.md §3.5).  This CLI loads a dense
or PBW checkpoint (or a synthetic model offline), runs a batch of prompts
through the continuous batcher, and reports tokens/s.

    python -m pb_llm_tpu.cli.serve --model_id huggyllama/llama-7b \
        --pbw checkpoints/llama7b_pbw --slots 16 --max_new_tokens 64
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="continuous-batching serving demo")
    p.add_argument("--model_id", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None, help="dense checkpoint dir")
    p.add_argument("--pbw", type=str, default=None, help="PBW packed checkpoint dir (core.pbw.save_pbw)")
    p.add_argument("--slots", type=int, default=8)
    p.add_argument("--max_seq", type=int, default=2048)
    p.add_argument("--max_new_tokens", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--kv_int8", action="store_true",
                   help="force the absmax-quantized int8 KV cache (composes "
                        "with --page_size); already the TPU default")
    p.add_argument("--kv_dtype", type=str, default="auto",
                   choices=["auto", "int8", "bf16", "f32"],
                   help="KV cache dtype; auto = int8 on TPU (measured 1.42x "
                        "decode vs bf16 with the Pallas attention kernel), "
                        "f32 elsewhere")
    p.add_argument("--page_size", type=int, default=0,
                   help="paged KV cache: page size in tokens (0 = fixed strips); "
                        "HBM per request becomes proportional to its length")
    p.add_argument("--n_pages", type=int, default=0,
                   help="page-pool size (0 = full strip capacity; lower values "
                        "oversubscribe slots under length variance)")
    p.add_argument("--prefix_cache", action="store_true",
                   help="prefix caching over the paged pool (requires "
                        "--page_size): requests sharing a page-aligned "
                        "prompt prefix reuse its cached KV pages and only "
                        "prefill their suffix")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways: shard packed weights + KV over a tp mesh "
                        "(one shard_map per program; same batcher interface)")
    p.add_argument("--prefill_batch", type=int, default=4,
                   help="prefill up to K same-bucket prompts in one program "
                        "(amortizes the packed path's per-layer weight "
                        "dequant K-fold; 1 disables)")
    p.add_argument("--prefill_chunk", type=int, default=0,
                   help="chunked prefill: prompts longer than this prefill "
                        "one chunk per tick, interleaved with decode steps "
                        "(no head-of-line blocking; 0 disables)")
    p.add_argument("--spec_gamma", type=int, default=0,
                   help="greedy-exact speculative decoding: verify this many "
                        "draft tokens per decode step (token streams "
                        "identical to plain greedy; 0 disables). Drafts come "
                        "from prompt-lookup unless a --draft_* flag is given")
    p.add_argument("--draft_model_id", type=str, default=None,
                   help="draft MODEL for speculative decoding: HF id of a "
                        "small same-vocab model proposing the spec_gamma "
                        "tokens (lifts acceptance on non-repetitive text)")
    p.add_argument("--draft_checkpoint", type=str, default=None,
                   help="dense checkpoint dir for the draft model")
    p.add_argument("--draft_pbw", type=str, default=None,
                   help="PBW packed checkpoint dir for the draft model")
    p.add_argument("--draft_synthetic", action="store_true",
                   help="with --synthetic: use a 1-layer synthetic draft model")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over stacked decoder layers: one compiled "
                        "decode body instead of num_layers unrolled copies")
    p.add_argument("--fuse_linears", action="store_true",
                   help="fuse q/k/v and gate/up into single packed matmuls "
                        "(PBW v2 global-selection checkpoints; quality-"
                        "identical, fewer kernel launches; single-device)")
    p.add_argument("--decode_dot", type=str, default=None,
                   choices=["auto", "f32", "int8", "dma", "bf16", "pair"],
                   help="PBW-v2 decode dot arm (default: env PB_TPU_DECODE_DOT "
                        "or auto=int8 — fastest measured, <2%% NLL shift; f32 "
                        "is exact)")
    p.add_argument("--prefill_kernel", type=str, default=None,
                   choices=["auto", "int8", "hybrid", "hybrid_bf16"],
                   help="PBW-v2 prefill arm (default: env or auto = fused "
                        "int8 on TPU, >=1.0x dense bf16; hybrid = exact)")
    p.add_argument("--attention_impl", type=str, default=None,
                   choices=["auto", "flash", "flash_interpret", "xla"],
                   help="full-sequence attention impl (default: env or auto)")
    p.add_argument("--prompts", type=str, default=None, help="file with one prompt per line")
    p.add_argument("--n_requests", type=int, default=16)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--demo", action="store_true",
                   help="run the built-in prompt batch and exit (default when --http is not given)")
    p.add_argument("--http", type=int, default=0, metavar="PORT",
                   help="serve POST /generate over HTTP on this port (runtime.server)")
    p.add_argument("--host", type=str, default="0.0.0.0")
    return p


def main(argv=None) -> int:
    from ..utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    args = build_parser().parse_args(argv)
    import time

    import jax

    from ..models.registry import family_for
    from ..runtime.batching import ContinuousBatcher, Request
    from ..runtime.engine import Engine, EngineConfig
    from ..runtime.sampler import SamplingParams

    fam = family_for(args.model_id)
    if args.synthetic:
        from ..data.synthetic import ByteTokenizer
        from ..models.llama import LlamaConfig, init_params as llama_init
        from ..models.opt import OPTConfig, init_params as opt_init

        if fam.name == "opt":
            cfg = OPTConfig(vocab_size=259, hidden_size=64, ffn_dim=128, num_hidden_layers=2,
                            num_attention_heads=4, max_position_embeddings=256)
            params = opt_init(cfg, jax.random.PRNGKey(0))
        else:
            cfg = LlamaConfig(vocab_size=259, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256)
            params = llama_init(cfg, jax.random.PRNGKey(0))
        tokenizer = ByteTokenizer()
        max_seq = min(args.max_seq, 128)
    else:
        from ..utils.tokenizer import get_tokenizer

        from ..models import hf_import

        params, cfg, _ = hf_import.from_pretrained(args.model_id)
        tokenizer = get_tokenizer(args.model_id)
        max_seq = args.max_seq

    if args.checkpoint:
        from ..utils.checkpoint import load_dense_checkpoint

        params, _ = load_dense_checkpoint(args.checkpoint)
    if args.pbw:
        from ..core.pbw import install_pbw, load_pbw

        layers, _ = load_pbw(args.pbw)
        params = install_pbw(params, layers)

    if args.prompts:
        with open(args.prompts) as fh:
            texts = [line.rstrip("\n") for line in fh if line.strip()]
    else:
        texts = [f"request {i}: the quick brown fox" for i in range(args.n_requests)]

    import jax.numpy as jnp

    buckets = tuple(b for b in (32, 128, 512) if b < max_seq) + (max_seq,)
    if args.page_size:
        buckets = tuple(sorted({min(-(-b // args.page_size) * args.page_size, max_seq)
                                for b in buckets}))
    kernels = None
    if args.decode_dot or args.prefill_kernel or args.attention_impl:
        import dataclasses as _dc

        from ..ops import kernel_config as _kc

        over = {k: v for k, v in (("decode_dot", args.decode_dot),
                                  ("prefill", args.prefill_kernel),
                                  ("attention", args.attention_impl)) if v}
        kernels = _dc.replace(_kc.from_env(), **over)
    ecfg = EngineConfig(
        n_slots=args.slots, max_seq=max_seq, prefill_buckets=buckets,
        cache_dtype=(jnp.int8 if args.kv_int8 else
                     {"auto": "auto", "int8": jnp.int8, "bf16": jnp.bfloat16,
                      "f32": jnp.float32}[args.kv_dtype]),
        scan_layers=args.scan_layers,
        page_size=args.page_size, n_pages=args.n_pages,
        prefix_cache=args.prefix_cache,
        max_prefill_batch=args.prefill_batch,
        spec_gamma=args.spec_gamma,
        prefill_chunk=args.prefill_chunk,
        kernels=kernels,
        fuse_linears=args.fuse_linears,
    )
    if args.tp > 1:
        from ..parallel.mesh import make_mesh
        from ..runtime.tp_engine import TPEngine

        eng = TPEngine(params, cfg, fam, ecfg, make_mesh(dp=1, tp=args.tp),
                       SamplingParams(temperature=args.temperature))
    else:
        eng = Engine(params, cfg, fam, ecfg, SamplingParams(temperature=args.temperature))

    draft_source = None
    if args.draft_model_id or args.draft_checkpoint or args.draft_pbw or args.draft_synthetic:
        if not args.spec_gamma:
            raise SystemExit("--draft_* requires --spec_gamma > 0")
        from ..runtime.draft import ModelDraftSource

        if args.draft_synthetic:
            if not args.synthetic:
                raise SystemExit("--draft_synthetic requires --synthetic")
            from ..models.llama import LlamaConfig, init_params as llama_init
            from ..models.opt import OPTConfig, init_params as opt_init

            if fam.name == "opt":
                dcfg = OPTConfig(vocab_size=259, hidden_size=32, ffn_dim=64,
                                 num_hidden_layers=1, num_attention_heads=4,
                                 max_position_embeddings=256)
                dparams = opt_init(dcfg, jax.random.PRNGKey(1))
            else:
                dcfg = LlamaConfig(vocab_size=259, hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=1, num_attention_heads=4,
                                   num_key_value_heads=4, max_position_embeddings=256)
                dparams = llama_init(dcfg, jax.random.PRNGKey(1))
            dfam = fam
        else:
            from ..models import hf_import

            if not args.draft_model_id:
                # a checkpoint alone has no config: building the draft engine
                # from the TARGET's config would shape the draft KV caches
                # (and positions) wrong — require the id explicitly
                raise SystemExit(
                    "--draft_checkpoint/--draft_pbw need --draft_model_id "
                    "(the draft model's config/architecture)")
            dparams, dcfg, _ = hf_import.from_pretrained(args.draft_model_id)
            dfam = family_for(args.draft_model_id)
            if args.draft_checkpoint:
                from ..utils.checkpoint import load_dense_checkpoint

                dparams, _ = load_dense_checkpoint(args.draft_checkpoint)
            if args.draft_pbw:
                from ..core.pbw import install_pbw, load_pbw

                dlayers, _ = load_pbw(args.draft_pbw)
                dparams = install_pbw(dparams, dlayers)
        decfg = EngineConfig(n_slots=args.slots, max_seq=max_seq,
                             prefill_buckets=buckets)
        draft_source = ModelDraftSource(Engine(dparams, dcfg, dfam, decfg))
    if args.http:
        if jax.process_count() > 1:
            raise SystemExit(
                "--http is single-process (requests arrive at one host); "
                "multi-process deployments drive MultiHostBatcher directly")
        from ..runtime.server import serve_http

        server = serve_http(eng, host=args.host, port=args.http,
                            encode=tokenizer.encode, decode=tokenizer.decode,
                            draft_source=draft_source)
        print(f"serving on http://{args.host}:{args.http}  "
              f"(POST /generate, GET /health, GET /stats)")
        try:
            import threading

            threading.Event().wait()  # run until interrupted
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
            server.serving_loop.shutdown()
        return 0

    if jax.process_count() > 1:
        # pod deployment: host-0 admission broadcast keeps every process
        # enqueueing identical programs (runtime.multihost_batching); the
        # draft source needs no extra coordination (replicated engine)
        from ..runtime.multihost_batching import MultiHostBatcher

        batcher = MultiHostBatcher(eng, draft_source=draft_source)
    else:
        batcher = ContinuousBatcher(eng, draft_source=draft_source)
    reqs = [
        Request(request_id=i, prompt_ids=tokenizer.encode(t)[: max_seq // 2], max_new_tokens=args.max_new_tokens)
        for i, t in enumerate(texts)
    ]
    t0 = time.time()
    done = batcher.run(reqs)
    dt = time.time() - t0
    for r in done[:4]:
        print(f"[{r.request_id}] {tokenizer.decode(r.output_ids)!r}")
    s = batcher.stats
    print(f"requests={len(done)} tokens={s.generated_tokens} steps={s.decode_steps} "
          f"wall={dt:.2f}s tokens/s={s.generated_tokens / dt:.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
