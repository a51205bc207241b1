"""Worker for the 2-process MultiHostBatcher test (test_multihost.py).

Each process runs its own engine replica (computation-follows-data: a plain
jit runs on the process's local devices); ONLY the scheduler coordinates —
host 0 decides admissions and broadcasts the fixed-shape record over the
fake DCN.  Every host must produce byte-identical output streams, including
batched prefill grouping, speculative-decode drafts (pure functions of the
replicated request histories), eos retirement and remaining-budget
accounting after the record round-trip.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=rank)

    import json

    import numpy as np
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    from pb_llm_tpu.models import hf_import
    from pb_llm_tpu.models.registry import family_for
    from pb_llm_tpu.runtime.batching import Request
    from pb_llm_tpu.runtime.engine import Engine, EngineConfig
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)  # identical weights on every process
    params, cfg, _ = hf_import.from_torch_model(OPTForCausalLM(hf_cfg).eval().float())
    fam = family_for("opt")

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8, 16),
        max_prefill_batch=2, spec_gamma=2, prefill_chunk=8))

    class Capturing(MultiHostBatcher):
        """Record every request object (incl. non-host0 shadows) so each
        rank can dump its observed streams."""

        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.seen = {}

        def _maybe_retire(self, slot, token, **kw):
            req = self.slot_to_request[slot]
            self.seen[req.request_id] = req
            super()._maybe_retire(slot, token, **kw)

    b = Capturing(eng, max_prompt=16)
    # submitted on host 0 only; others receive via the admission record.
    # eos_token_id=9 exercises the record's eos field (retirement must not
    # diverge across hosts) - the repetitive prompt makes 9 likely to fire.
    reqs = [Request(request_id=i, prompt_ids=[7, 8, 9, 7, 8, 9, 7, 8],
                    max_new_tokens=10, eos_token_id=9) for i in range(3)]
    # a LONG prompt exercises lockstep chunked prefill across processes
    reqs.append(Request(request_id=3, prompt_ids=[7, 8, 9] * 4,
                        max_new_tokens=10, eos_token_id=9))
    # a stochastically-SAMPLED request exercises the record's fixed-point
    # sampling columns: every rank decodes the same params and shares the
    # engine PRNG seed, so even sampled streams must be byte-identical —
    # and its presence must pause spec ticks identically everywhere
    from pb_llm_tpu.runtime.sampler import SamplingParams

    reqs.append(Request(request_id=4, prompt_ids=[3, 14, 15],
                        max_new_tokens=6,
                        sampling=SamplingParams(temperature=0.937, top_k=12)))
    b.run(reqs)

    streams = {str(rid): req.output_ids for rid, req in sorted(b.seen.items())}
    stats = {"prefills": b.stats.prefills, "decode_steps": b.stats.decode_steps,
             "generated": b.stats.generated_tokens,
             "spec_accepted": b.stats.spec_accepted,
             "lengths": [int(x) for x in eng.lengths]}

    # phase 2 (VERDICT r4 item 8): spec decoding with a DRAFT MODEL active.
    # Each host rolls its own draft-engine replica (identical torch seed);
    # propose() is a deterministic function of the replicated request
    # histories, so drafts — and therefore accept/reject patterns, slot
    # lengths and streams — must stay byte-identical with NO extra DCN
    # traffic beyond the admission record.
    from pb_llm_tpu.runtime.draft import ModelDraftSource

    torch.manual_seed(1)  # different weights than the target, same per host
    draft_hf = OPTConfig(
        vocab_size=128, hidden_size=16, ffn_dim=32, num_hidden_layers=1,
        num_attention_heads=2, max_position_embeddings=64,
        word_embed_proj_dim=16, dropout=0.0)
    dparams, dcfg, _ = hf_import.from_torch_model(
        OPTForCausalLM(draft_hf).eval().float())
    draft_eng = Engine(dparams, dcfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8, 16)))
    eng2 = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8, 16),
        max_prefill_batch=2, spec_gamma=2))
    b2 = Capturing(eng2, max_prompt=16,
                   draft_source=ModelDraftSource(draft_eng))
    # NON-repetitive prompts: prompt-lookup would never fire here, so any
    # accepted token in phase 2 came from the draft model
    reqs2 = [Request(request_id=10 + i, prompt_ids=[2 + i, 31, 5, 77],
                     max_new_tokens=8) for i in range(3)]
    b2.run(reqs2)
    streams2 = {str(rid): req.output_ids for rid, req in sorted(b2.seen.items())}
    stats2 = {"decode_steps": b2.stats.decode_steps,
              "generated": b2.stats.generated_tokens,
              "spec_accepted": b2.stats.spec_accepted,
              "draft_lengths": [int(x) for x in draft_eng.lengths],
              "lengths": [int(x) for x in eng2.lengths]}

    with open(os.path.join(outdir, f"serving_{rank}.json"), "w") as fh:
        json.dump({"streams": streams, "stats": stats,
                   "draft_streams": streams2, "draft_stats": stats2}, fh)
    print("WORKER_OK", rank, flush=True)


if __name__ == "__main__":
    main()
