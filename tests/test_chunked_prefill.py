"""Chunked prefill: chunk-by-chunk prompt processing must be token-exact
with one-shot prefill (strips, int8 strips, paged, int8 paged), and the
scheduler must interleave decode with a long prompt's chunks."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request
from pb_llm_tpu.runtime.engine import Engine, EngineConfig


@pytest.fixture(scope="module")
def tiny_opt():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    return params, cfg, family_for("opt")


PROMPT = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2, 19, 88, 41, 6, 77, 31, 12, 9]  # 18 tokens


@pytest.mark.parametrize("kw", [
    {},                                   # strips f32
    {"cache_dtype": jnp.int8},            # strips int8
    {"page_size": 8},                     # paged f32
    {"page_size": 8, "cache_dtype": jnp.int8},  # paged int8
])
def test_chunked_prefill_matches_one_shot(tiny_opt, kw):
    params, cfg, fam = tiny_opt
    base = dict(n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32))

    one = Engine(params, cfg, fam, EngineConfig(**base, **kw))
    want = [one.prefill(0, PROMPT)]
    for _ in range(4):
        want.append(one.decode_step()[0])

    eng = Engine(params, cfg, fam, EngineConfig(**base, prefill_chunk=8, **kw))
    eng.start_chunked_prefill(0, PROMPT)  # 18 tokens -> chunks 8+8+2 (ragged)
    tok = None
    steps = 0
    while tok is None:
        tok = eng.prefill_chunk_step(0)
        steps += 1
    assert steps == 3
    got = [tok]
    for _ in range(4):
        got.append(eng.decode_step()[0])
    assert got == want, (kw, got, want)


def test_chunked_prefill_interleaves_with_decode(tiny_opt):
    """A short request keeps decoding while a long prompt prefills one chunk
    per tick; outputs equal the non-chunked run exactly."""
    params, cfg, fam = tiny_opt

    def run(chunk):
        reqs = [
            Request(request_id=0, prompt_ids=[7, 8, 9, 7], max_new_tokens=8),
            Request(request_id=1, prompt_ids=list(PROMPT), max_new_tokens=6),
        ]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32),
            prefill_chunk=chunk))
        b = ContinuousBatcher(eng)
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    plain, _ = run(0)
    chunked, stats = run(8)
    assert chunked == plain, (chunked, plain)
    # the long prompt prefilled across ticks; decode steps ran in between
    assert stats.decode_steps > 0 and stats.prefills == 2


def test_chunked_prefill_paged_with_decode_traffic(tiny_opt):
    """Decode steps for another slot while a paged chunked prefill is mid-
    flight must NOT corrupt the chunked slot's already-written rows (the
    parked-position regression)."""
    params, cfg, fam = tiny_opt

    def run(chunk):
        reqs = [
            Request(request_id=0, prompt_ids=[7, 8, 9, 7], max_new_tokens=10),
            Request(request_id=1, prompt_ids=list(PROMPT), max_new_tokens=6),
        ]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32),
            page_size=8, prefill_chunk=chunk))
        ContinuousBatcher(eng).run(reqs)
        return [r.output_ids for r in reqs]

    assert run(8) == run(0)


def test_chunked_prefill_tp_matches_single_device(tiny_opt):
    """Chunked prefill under TP shard_map (strips and paged): streams match
    the single-device chunked engine."""
    import copy

    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime.tp_engine import TPEngine

    params, cfg, fam = tiny_opt
    for kw in ({}, {"page_size": 8}):
        ecfg = EngineConfig(n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32),
                            prefill_chunk=8, **kw)
        ref = Engine(copy.deepcopy(params), cfg, fam, ecfg)
        reqs = lambda: [Request(request_id=0, prompt_ids=list(PROMPT), max_new_tokens=5)]
        r = reqs()
        ContinuousBatcher(ref).run(r)
        want = r[0].output_ids

        mesh = pmesh.make_mesh(dp=1, tp=4)
        eng = TPEngine(copy.deepcopy(params), cfg, fam, ecfg, mesh)
        g = reqs()
        ContinuousBatcher(eng).run(g)
        assert g[0].output_ids == want, (kw, g[0].output_ids, want)


def test_chunked_prefill_with_spec_and_paged(tiny_opt):
    """Everything at once: paged pool + speculative decode + chunked prefill
    — a long prompt's chunks interleave with another slot's spec verifies
    (whose parked-slot writes must stay clamped to safe positions); outputs
    equal the plain (no chunk, no spec) paged run."""
    params, cfg, fam = tiny_opt

    def run(**kw):
        reqs = [
            Request(request_id=0, prompt_ids=[7, 8, 9, 7], max_new_tokens=10),
            Request(request_id=1, prompt_ids=list(PROMPT), max_new_tokens=6),
        ]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32), page_size=8, **kw))
        ContinuousBatcher(eng).run(reqs)
        return [r.output_ids for r in reqs]

    plain = run()
    combo = run(prefill_chunk=8, spec_gamma=2)
    assert combo == plain, (combo, plain)


def test_chunked_config_validation(tiny_opt):
    params, cfg, fam = tiny_opt
    with pytest.raises(ValueError):  # max_seq not divisible by chunk
        Engine(params, cfg, fam, EngineConfig(
            max_seq=50, prefill_buckets=(8, 50), prefill_chunk=8))
    with pytest.raises(ValueError):  # chunk exceeds largest bucket
        Engine(params, cfg, fam, EngineConfig(
            max_seq=64, prefill_buckets=(8,), prefill_chunk=16))
    with pytest.raises(ValueError):  # chunk not page-aligned
        Engine(params, cfg, fam, EngineConfig(
            max_seq=64, prefill_buckets=(8, 16), page_size=8, prefill_chunk=12))


def test_multihost_batcher_chunked(tiny_opt):
    """Single-process MultiHostBatcher with chunked prefill: outputs equal
    the non-chunked run (lockstep chunk jobs from the broadcast record)."""
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt

    def run(chunk):
        reqs = [
            Request(request_id=0, prompt_ids=[7, 8, 9, 7], max_new_tokens=8),
            Request(request_id=1, prompt_ids=list(PROMPT), max_new_tokens=6),
        ]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32),
            prefill_chunk=chunk))
        MultiHostBatcher(eng, max_prompt=32).run(reqs)
        return [r.output_ids for r in reqs]

    assert run(8) == run(0)
