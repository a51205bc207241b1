"""Prefix caching over the paged KV pool (`runtime.paged_kv.PagePool`).

Requests sharing a page-aligned prompt prefix reuse its cached pages and
prefill only their suffix; greedy token streams must be IDENTICAL with the
cache on or off (the reused K/V rows are exactly what recomputation would
produce).  Reference counterpart: none (the reference has no serving path,
SURVEY.md §3.5); the design follows vLLM-style hash-indexed full pages.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request
from pb_llm_tpu.runtime.engine import Engine, EngineConfig
from pb_llm_tpu.runtime.paged_kv import PagePool


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


# ---------------------------------------------------------------------------
# pool-level unit tests
# ---------------------------------------------------------------------------


def test_pool_register_match_refcount():
    pool = PagePool(n_pages=8, page_size=4, n_slots=3, max_seq=32, prefix_cache=True)
    toks = list(range(10))  # 2 full pages + 2 tail tokens
    pool.ensure(0, 10)
    pool.register_chain(0, toks)
    # same prefix matches both full pages; cap keeps the last token uncached
    n, pages = pool.match_prefix(toks, max_pages=(len(toks) - 1) // 4)
    assert n == 2 and pages == pool.owned[0][:2]
    # a diverging second page matches only the first
    n2, pages2 = pool.match_prefix(toks[:4] + [99, 98, 97, 96, 5], max_pages=2)
    assert n2 == 1 and pages2 == pool.owned[0][:1]
    # attach refcounts; release keeps shared pages out of the free pool
    pool.attach(1, pages)
    assert pool.ref[pages[0]] == 2
    pool.release(0)
    assert pool.ref[pages[0]] == 1 and not pool.evictable
    pool.release(1)
    # now unreferenced but still cached (evictable), so they still match
    assert set(pool.evictable) == set(pages)
    n3, _ = pool.match_prefix(toks, max_pages=2)
    assert n3 == 2
    # allocation pressure evicts LRU-cached pages and drops their hashes
    free_before = pool.free_pages
    pool.ensure(2, 32)  # 8 pages: takes every free + both evictable pages
    assert pool.free_pages == free_before - 8
    n4, _ = pool.match_prefix(toks, max_pages=2)
    assert n4 == 0 and not pool.hash_page and not pool.page_hash


def test_pool_prefix_disabled_is_inert():
    pool = PagePool(n_pages=4, page_size=4, n_slots=1, max_seq=16)
    pool.ensure(0, 8)
    pool.register_chain(0, list(range(8)))
    assert pool.match_prefix(list(range(8)), max_pages=2) == (0, [])
    assert not pool.hash_page


def test_prefix_cache_requires_pages(tiny_opt):
    params, cfg, fam = tiny_opt
    with pytest.raises(ValueError, match="prefix_cache"):
        Engine(params, cfg, fam, EngineConfig(n_slots=1, max_seq=32,
                                              prefill_buckets=(16,), prefix_cache=True))


# ---------------------------------------------------------------------------
# engine / scheduler parity
# ---------------------------------------------------------------------------


def _serve(params, cfg, fam, prompts, steps=6, **ecfg_kw):
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 24), page_size=8, **ecfg_kw))
    reqs = [Request(request_id=i, prompt_ids=list(p), max_new_tokens=steps)
            for i, p in enumerate(prompts)]
    ContinuousBatcher(eng).run(reqs)
    return [r.output_ids for r in reqs], eng


def test_prefix_hit_streams_match_cold(tiny_opt):
    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2]  # 10 tokens: 1 full page
    prompts = [shared + [19, 4], shared + [19, 4], shared + [77]]
    cold, _ = _serve(params, cfg, fam, prompts)
    warm, eng = _serve(params, cfg, fam, prompts, prefix_cache=True)
    assert warm == cold
    assert eng.pool.prefix_hit_pages > 0
    assert eng.pool.prefix_queries >= len(prompts)


def test_shared_pages_not_rewritten(tiny_opt):
    """The reused pages' bytes must be untouched by the second request's
    suffix prefill and decode (full shared pages are read-only)."""
    params, cfg, fam = tiny_opt
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16), page_size=8,
        prefix_cache=True))
    prompt = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2]  # 1 full page + 2
    eng.prefill(0, prompt)
    for _ in range(3):
        eng.decode_step()
    shared = eng.pool.owned[0][0]
    before = [np.asarray(c["k_pages"][shared]).copy() for c in eng.caches]
    tok = eng.prefill(1, prompt + [33])  # hits the cached first page
    assert eng.pool.ref[shared] == 2
    for _ in range(3):
        eng.decode_step()
    after = [np.asarray(c["k_pages"][shared]) for c in eng.caches]
    for b, a in zip(before, after):
        np.testing.assert_array_equal(b, a)
    assert isinstance(tok, int)


def test_prefix_cache_across_release_and_eviction(tiny_opt):
    """Pages released by a retired request stay matchable (evictable LRU)
    until allocation pressure reclaims them; streams stay correct either
    way."""
    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23]  # exactly 1 page
    prompts = [shared + [19], shared + [4], shared + [2], shared + [60]]
    cold, _ = _serve(params, cfg, fam, prompts, steps=4)
    # pool barely larger than one request's footprint: later admissions must
    # evict the earlier request's cached pages
    warm, eng = _serve(params, cfg, fam, prompts, steps=4,
                       prefix_cache=True, n_pages=5)
    assert warm == cold
    assert eng.pool.prefix_hit_pages > 0


def test_prefix_cache_with_spec_decode(tiny_opt):
    # 3 requests over 2 slots: the third admits after a retirement and hits
    # the registered prefix (same-tick co-admissions intentionally don't
    # share — the first one's pages register only after its prefill runs)
    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2]
    prompts = [shared + [19, 4], shared + [19, 4], shared + [19, 4]]
    cold, _ = _serve(params, cfg, fam, prompts, spec_gamma=2)
    warm, eng = _serve(params, cfg, fam, prompts, spec_gamma=2, prefix_cache=True)
    assert warm == cold
    assert eng.pool.prefix_hit_pages > 0


def test_prefix_cache_int8_pages(tiny_opt):
    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2]
    prompts = [shared + [19, 4], shared + [19, 4], shared + [19, 4]]
    cold, _ = _serve(params, cfg, fam, prompts, cache_dtype=jnp.int8)
    warm, eng = _serve(params, cfg, fam, prompts, cache_dtype=jnp.int8,
                       prefix_cache=True)
    assert warm == cold
    assert eng.pool.prefix_hit_pages > 0


def test_prefix_cache_chunked_prefill(tiny_opt):
    """Long prompts: the chunked job starts at the chunk-aligned prefix
    offset (skipping whole chunks of compute) and streams stay identical."""
    params, cfg, fam = tiny_opt
    rng = np.random.default_rng(3)
    shared = [int(t) for t in rng.integers(1, 100, size=24)]
    prompts = [shared + [9, 1], shared + [9, 1], shared + [8]]
    cold, _ = _serve(params, cfg, fam, prompts, prefill_chunk=8)
    warm, eng = _serve(params, cfg, fam, prompts, prefill_chunk=8,
                       prefix_cache=True)
    assert warm == cold
    assert eng.pool.prefix_hit_pages > 0


def test_prefix_suffix_same_bucket_oversubscribed_pool(tiny_opt):
    """ADVICE r2 (high): when the suffix pads into the SAME bucket as the
    full prompt, `_prefill_suffix` used to ensure offset + bucket(n-offset)
    pages — exceeding the bucket(n)+1 reservation `can_admit` made, crashing
    an oversubscribed pool with a bare RuntimeError (and pinning padding
    pages even when it fit).  The window is now clamped to the bucket(n)
    footprint: the same workload completes and matches the cache-off run."""
    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23, 60, 2, 19, 4, 33, 8, 25, 14]  # 2 pages
    prompts = [shared + [9], shared + [9, 1, 2, 3, 4, 5, 6, 7, 50]]  # 17 / 25 toks
    kw = dict(n_slots=1, max_seq=48, prefill_buckets=(8, 32), page_size=8)

    def run(**extra):
        eng = Engine(params, cfg, fam, EngineConfig(**kw, **extra))
        reqs = [Request(request_id=i, prompt_ids=list(p), max_new_tokens=4)
                for i, p in enumerate(prompts)]
        ContinuousBatcher(eng).run(reqs)
        return [r.output_ids for r in reqs], eng

    cold, _ = run(n_pages=5)
    # 5 pages = exactly the bucket(25)+1 reservation; the old suffix path
    # needed 6 and died in PagePool.ensure
    warm, eng = run(n_pages=5, prefix_cache=True)
    assert warm == cold
    assert eng.pool.prefix_hit_pages == 2
    assert eng.pool.free_pages == eng.pool.n_pages  # nothing stays pinned


def test_chunk_hit_below_chunk_not_counted(tiny_opt):
    """ADVICE r2 (low): a chunked-prefill hit that aligns down to start == 0
    attaches nothing and saves no compute — the /stats hit counter must not
    claim otherwise (it now counts at attach, not match)."""
    params, cfg, fam = tiny_opt
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(16, 32), page_size=8,
        prefill_chunk=16, prefix_cache=True))
    rng = np.random.default_rng(5)
    prompt = [int(t) for t in rng.integers(1, 100, size=20)]
    eng.start_chunked_prefill(0, prompt)
    while eng.prefill_chunk_step(0) is None:
        pass
    eng.release(0)
    hits0 = eng.pool.prefix_hit_pages
    # shares EXACTLY one page (8 tokens < chunk 16): start aligns to 0
    p2 = prompt[:8] + [int(t) for t in rng.integers(1, 100, size=12)]
    eng.start_chunked_prefill(1, p2)
    assert eng._chunk_jobs[1][1] == 0
    assert eng.pool.prefix_hit_pages == hits0


def test_prefix_cache_under_preemption(tiny_opt):
    """Prefix cache composes with recompute preemption (the PARITY.md claim,
    now actually tested): a pool too small for both active requests forces a
    preemption; the preempted request re-admits through the prefix-hit
    suffix path (its own registered pages) and greedy streams still match
    the cache-off run."""
    from pb_llm_tpu.runtime.batching import ContinuousBatcher as CB

    params, cfg, fam = tiny_opt
    shared = [5, 17, 99, 3, 42, 7, 11, 23]  # exactly 1 page
    prompts = [shared + [19, 4], shared + [2, 6]]
    kw = dict(n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32), page_size=8,
              n_pages=5)

    def run(**extra):
        eng = Engine(params, cfg, fam, EngineConfig(**kw, **extra))
        reqs = [Request(request_id=i, prompt_ids=list(p), max_new_tokens=10)
                for i, p in enumerate(prompts)]
        b = CB(eng)
        b.run(reqs)
        return [r.output_ids for r in reqs], b, eng

    cold, _, _ = run()
    warm, batcher, eng = run(prefix_cache=True)
    assert warm == cold
    assert batcher.stats.preemptions > 0
    assert eng.pool.prefix_hit_pages > 0
    assert eng.pool.free_pages == eng.pool.n_pages


def test_chunked_job_starts_at_aligned_offset(tiny_opt):
    params, cfg, fam = tiny_opt
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 24), page_size=8,
        prefill_chunk=8, prefix_cache=True))
    rng = np.random.default_rng(4)
    prompt = [int(t) for t in rng.integers(1, 100, size=20)]  # 2 full pages
    eng.start_chunked_prefill(0, prompt)
    while eng.prefill_chunk_step(0) is None:
        pass
    eng.release(0)
    # the identical prompt now skips the first 16 tokens (2 pages = 2 chunks)
    eng.start_chunked_prefill(1, prompt)
    assert eng._chunk_jobs[1][1] == 16
    tok = eng.prefill_chunk_step(1)  # single remaining chunk finishes the job
    assert tok is not None
