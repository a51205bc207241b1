"""Paged KV cache: kernel oracle, pool bookkeeping, engine token parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.ops.paged_attention import paged_attention, paged_attention_reference
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


def test_paged_attention_kernel_oracle():
    r = np.random.default_rng(0)
    B, H, D, PS, MAXP, P = 3, 4, 32, 16, 4, 24
    q = jnp.asarray(r.standard_normal((B, H, D)).astype(np.float32))
    kp = jnp.asarray(r.standard_normal((P, H, PS, D)).astype(np.float32))
    vp = jnp.asarray(r.standard_normal((P, H, PS, D)).astype(np.float32))
    table = jnp.asarray(r.integers(0, P, size=(B, MAXP)).astype(np.int32))
    lengths = jnp.asarray(np.array([7, 64, 33], np.int32))
    ref = paged_attention_reference(q, kp, vp, table, lengths, 0.25, PS)
    got = paged_attention(q, kp, vp, table, lengths, 0.25, PS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_page_pool_alloc_free():
    pool = PagePool(n_pages=8, page_size=16, n_slots=2, max_seq=64)
    assert pool.can_admit(40) and pool.pages_needed(40) == 3
    pool.ensure(0, 40)
    assert len(pool.owned[0]) == 3 and pool.free_pages == 5
    pool.ensure(0, 41)  # same page count
    assert pool.free_pages == 5
    pool.ensure(0, 49)  # one more page
    assert pool.free_pages == 4
    pool.ensure(1, 64)
    assert pool.free_pages == 0
    with pytest.raises(ValueError):
        pool.ensure(1, 65)  # > max_seq
    small = PagePool(n_pages=2, page_size=16, n_slots=2, max_seq=64)
    with pytest.raises(RuntimeError):
        small.ensure(0, 48)  # needs 3 pages, pool has 2
    pool.release(0)
    assert pool.free_pages == 4
    assert (pool.table[0] == pool.trash_page).all()


def _greedy_tokens(eng, prompt, steps):
    got = [eng.prefill(0, prompt)]
    for _ in range(steps - 1):
        got.append(eng.decode_step()[0])
    eng.release(0)
    return got


def test_paged_engine_matches_strip_engine(tiny_opt):
    params, cfg, fam = tiny_opt
    strip = Engine(params, cfg, fam, EngineConfig(n_slots=2, max_seq=48, prefill_buckets=(8, 16)))
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16), page_size=8))
    for prompt in ([5, 17, 99, 3], [42, 7, 11, 23, 60, 2, 19]):
        want = _greedy_tokens(strip, prompt, 8)
        got = _greedy_tokens(paged, prompt, 8)
        assert got == want, (prompt, got, want)


def test_paged_engine_interleaved_and_reuse(tiny_opt):
    """Two slots decode together over the pool; released pages are reused."""
    params, cfg, fam = tiny_opt
    # pool sized to exactly 2 slots' bucket (8) + some decode growth
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8,), page_size=8, n_pages=6))
    strip = Engine(params, cfg, fam, EngineConfig(n_slots=2, max_seq=48, prefill_buckets=(8,)))

    p0, p1 = [5, 17, 99, 3], [42, 7, 11, 23, 60]
    w0 = _greedy_tokens(strip, p0, 6)
    w1 = _greedy_tokens(strip, p1, 6)

    g0 = [paged.prefill(0, p0)]
    g1 = [paged.prefill(1, p1)]
    for _ in range(5):
        toks = paged.decode_step()
        g0.append(toks[0])
        g1.append(toks[1])
    assert g0 == w0 and g1 == w1
    used = paged.pool.free_pages
    paged.release(0)
    paged.release(1)
    assert paged.pool.free_pages == 6

    # reuse: a fresh request on recycled pages still matches
    g0b = [paged.prefill(1, p0)]
    for _ in range(5):
        g0b.append(paged.decode_step()[1])
    assert g0b == w0
    assert used < 6  # the run actually consumed pages


def test_paged_engine_rejects_bad_config(tiny_opt):
    params, cfg, fam = tiny_opt
    with pytest.raises(ValueError):
        Engine(params, cfg, fam, EngineConfig(prefill_buckets=(12,), page_size=8))


def test_paged_scan_layers_token_parity(tiny_opt):
    """scan_layers composes with the paged pool (VERDICT r2 item 9): the
    stacked cache carries [L]-axis pages/table, and greedy streams are
    identical to the unrolled paged engine."""
    params, cfg, fam = tiny_opt

    def run(scan):
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16), page_size=8,
            scan_layers=scan))
        toks = _greedy_tokens(eng, [5, 17, 99, 3], 8)
        # paged bookkeeping engages identically: fresh request reuses slots
        toks += _greedy_tokens(eng, [42, 7, 11, 23, 60, 2, 19], 6)
        return toks

    assert run(True) == run(False)


def test_paged_scan_layers_chunked_prefill(tiny_opt):
    """Chunked prefill under scan_layers + pages: same stream as the
    unrolled/unchunked paged engine."""
    params, cfg, fam = tiny_opt
    prompt = [42, 7, 11, 23, 60, 2, 19, 8, 77, 31]
    want = _greedy_tokens(Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(16,), page_size=8)), prompt, 6)

    for paged_kw in ({"page_size": 8}, {}):  # paged and strip chunk paths
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(16,),
            prefill_chunk=8, scan_layers=True, **paged_kw))
        eng.start_chunked_prefill(0, prompt)
        first = None
        while first is None:
            first = eng.prefill_chunk_step(0)
        got = [first] + [eng.decode_step()[0] for _ in range(5)]
        assert got == want, (paged_kw, got, want)


def test_paged_attention_kernel_gqa():
    """Grouped-head (GQA) paged decode: q heads share kv heads in-kernel."""
    r = np.random.default_rng(1)
    B, HQ, HKV, D, PS, MAXP, P = 2, 8, 2, 32, 16, 3, 12
    q = jnp.asarray(r.standard_normal((B, HQ, D)).astype(np.float32))
    kp = jnp.asarray(r.standard_normal((P, HKV, PS, D)).astype(np.float32))
    vp = jnp.asarray(r.standard_normal((P, HKV, PS, D)).astype(np.float32))
    table = jnp.asarray(r.integers(0, P, size=(B, MAXP)).astype(np.int32))
    lengths = jnp.asarray(np.array([11, 40], np.int32))
    ref = paged_attention_reference(q, kp, vp, table, lengths, 0.25, PS)
    got = paged_attention(q, kp, vp, table, lengths, 0.25, PS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_engine_gqa_llama():
    """End-to-end paged decode on a GQA llama (kv_heads < heads)."""
    from pb_llm_tpu.models.llama import LlamaConfig, init_params

    cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=2, max_position_embeddings=64,
    )
    params = init_params(cfg, jax.random.PRNGKey(0))
    fam = family_for("llama")
    strip = Engine(params, cfg, fam, EngineConfig(n_slots=1, max_seq=48, prefill_buckets=(8,)))
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=1, max_seq=48, prefill_buckets=(8,), page_size=8))
    prompt = [5, 17, 42, 3]
    want = _greedy_tokens(strip, prompt, 6)
    got = _greedy_tokens(paged, prompt, 6)
    assert got == want, (got, want)


def test_paged_attention_kernel_int8_oracle():
    """int8 pages + per-(token, head) scale planes: in-kernel dequant (scales
    folded into scores / probability weights) matches the dense dequantized
    oracle exactly."""
    r = np.random.default_rng(3)
    B, HQ, HKV, D, PS, MAXP, P = 2, 8, 2, 32, 16, 3, 12
    q = jnp.asarray(r.standard_normal((B, HQ, D)).astype(np.float32))
    kq = jnp.asarray(r.integers(-127, 128, size=(P, HKV, PS, D)).astype(np.int8))
    vq = jnp.asarray(r.integers(-127, 128, size=(P, HKV, PS, D)).astype(np.int8))
    ks = jnp.asarray(r.uniform(0.005, 0.02, size=(P, HKV, PS)).astype(np.float32))
    vs = jnp.asarray(r.uniform(0.005, 0.02, size=(P, HKV, PS)).astype(np.float32))
    table = jnp.asarray(r.integers(0, P, size=(B, MAXP)).astype(np.int32))
    lengths = jnp.asarray(np.array([11, 40], np.int32))
    ref = paged_attention_reference(q, kq, vq, table, lengths, 0.25, PS,
                                    k_scale_pages=ks, v_scale_pages=vs)
    got = paged_attention(q, kq, vq, table, lengths, 0.25, PS,
                          k_scale_pages=ks, v_scale_pages=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_int8_engine_quality_bound(tiny_opt):
    """int8 paged pool e2e: teacher-forced decode ppl within 2% of the f32
    paged pool (same bound as the int8 strip cache)."""
    params, cfg, fam = tiny_opt
    base = dict(n_slots=1, max_seq=48, prefill_buckets=(8,), page_size=8)
    eng32 = Engine(params, cfg, fam, EngineConfig(**base))
    eng8 = Engine(params, cfg, fam, EngineConfig(**base, cache_dtype=jnp.int8))
    assert "k_scale_pages" in eng8.caches[0]

    prompt, cont = [5, 17, 99, 3], [7, 21, 42, 11, 63, 5, 30, 2, 50, 19, 88, 41]
    eng32.prefill(0, prompt)
    eng8.prefill(0, prompt)
    nll32 = eng32.forced_decode_nll(0, cont)
    nll8 = eng8.forced_decode_nll(0, cont)
    ppl_ratio = float(np.exp(nll8 - nll32))
    assert abs(ppl_ratio - 1.0) < 0.02, (nll32, nll8, ppl_ratio)


def test_paged_preemption_recompute(tiny_opt):
    """Pool too small for two slots growing together: the batcher preempts
    the later-admitted request (vLLM-style recompute — fold generated tokens
    into the prompt, requeue at the front) instead of crashing, and greedy
    token streams still match the strip engine exactly."""
    from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request

    params, cfg, fam = tiny_opt
    strip = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32)))
    w0 = _greedy_tokens(strip, [5, 17, 99, 3], 10)
    w1 = _greedy_tokens(strip, [42, 7, 11, 23, 60], 10)

    # 3 pages x 8 tokens: both slots crossing length 8 need a 2nd page but
    # only one is free -> PoolExhausted -> preempt
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32), page_size=8, n_pages=3))
    b = ContinuousBatcher(paged)
    done = b.run([
        Request(request_id=0, prompt_ids=[5, 17, 99, 3], max_new_tokens=10),
        Request(request_id=1, prompt_ids=[42, 7, 11, 23, 60], max_new_tokens=10),
    ])
    assert b.stats.preemptions >= 1
    assert all(r.done for r in done)
    assert done[0].output_ids == w0, (done[0].output_ids, w0)
    assert done[1].output_ids == w1, (done[1].output_ids, w1)
    assert paged.pool.free_pages == 3  # everything released


def test_multihost_batcher_paged_preemption(tiny_opt):
    """Single-process MultiHostBatcher over a paged engine: admission gates
    on free pages, preemption sheds the later request, streams match strips."""
    from pb_llm_tpu.runtime.batching import Request
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt
    strip = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32)))
    w0 = _greedy_tokens(strip, [5, 17, 99, 3], 10)
    w1 = _greedy_tokens(strip, [42, 7, 11, 23, 60], 10)

    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32), page_size=8, n_pages=3))
    b = MultiHostBatcher(paged, max_prompt=32)
    done = b.run([
        Request(request_id=0, prompt_ids=[5, 17, 99, 3], max_new_tokens=10),
        Request(request_id=1, prompt_ids=[42, 7, 11, 23, 60], max_new_tokens=10),
    ])
    assert b.stats.preemptions >= 1
    assert done[0].output_ids == w0, (done[0].output_ids, w0)
    assert done[1].output_ids == w1, (done[1].output_ids, w1)


def test_paged_inactive_slot_does_not_corrupt(tiny_opt):
    """Decode writes for INACTIVE slots land in the trash page, never in a
    live slot's pages (regression: zeroed table rows used to alias page 0)."""
    params, cfg, fam = tiny_opt
    strip = Engine(params, cfg, fam, EngineConfig(n_slots=2, max_seq=48, prefill_buckets=(8,)))
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8,), page_size=8))
    prompt = [5, 17, 99, 3]
    want = _greedy_tokens(strip, prompt, 8)
    # slot 0 active, slot 1 NEVER prefilled — its batched decode writes must
    # not touch slot 0's pages (page 0 in particular)
    got = [paged.prefill(0, prompt)]
    for _ in range(7):
        got.append(paged.decode_step()[0])
    assert got == want, (got, want)


def test_paged_attention_multi_oracle():
    """Multi-query (speculative verify) paged kernel vs a dense oracle:
    query row j attends keys <= base + j; windows span page boundaries."""
    r = np.random.default_rng(4)
    B, T, HQ, HKV, D, PS, MAXP, P = 2, 3, 4, 2, 32, 8, 4, 16
    q = jnp.asarray(r.standard_normal((B, T, HQ, D)).astype(np.float32))
    kp = jnp.asarray(r.standard_normal((P, HKV, PS, D)).astype(np.float32))
    vp = jnp.asarray(r.standard_normal((P, HKV, PS, D)).astype(np.float32))
    table = jnp.asarray(r.integers(0, P, size=(B, MAXP)).astype(np.int32))
    base = jnp.asarray(np.array([6, 13], np.int32))  # 6+3 and 13+3 cross pages
    scale = 0.25

    from pb_llm_tpu.ops.paged_attention import paged_attention_multi

    got = paged_attention_multi(q, kp, vp, table, base, scale, PS, interpret=True)

    # dense oracle: gather pages, per-row causal limit
    k = jnp.swapaxes(kp[table], 2, 3).reshape(B, MAXP * PS, HKV, D)
    v = jnp.swapaxes(vp[table], 2, 3).reshape(B, MAXP * PS, HKV, D)
    k = jnp.repeat(k, HQ // HKV, axis=2)
    v = jnp.repeat(v, HQ // HKV, axis=2)
    s = jnp.einsum("bthd,bshd->bths", q, k) * scale
    kpos = jnp.arange(MAXP * PS)[None, None, None, :]
    limit = (base[:, None] + 1 + jnp.arange(T)[None, :])[:, :, None, None]
    s = jnp.where(kpos < limit, s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bths,bshd->bthd", w, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_paged_spec_decode_matches_plain_paged(tiny_opt):
    """Speculative decoding over the PAGED pool (multi-query kernel +
    per-token page writes): streams identical to plain paged decode, incl.
    verify windows crossing page boundaries and int8 pages."""
    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    for dt in (jnp.float32, jnp.int8):
        base_kw = dict(n_slots=1, max_seq=48, prefill_buckets=(8,),
                       page_size=8, cache_dtype=dt)
        plain = Engine(params, cfg, fam, EngineConfig(**base_kw))
        want = [plain.prefill(0, prompt)]
        for _ in range(11):
            want.append(plain.decode_step()[0])

        eng = Engine(params, cfg, fam, EngineConfig(**base_kw, spec_gamma=3))
        got = [eng.prefill(0, prompt)]
        while len(got) < len(want):
            drafts = np.zeros((1, 3), np.int32)
            nxt = want[len(got): len(got) + 3]
            drafts[0, : len(nxt)] = nxt  # oracle drafts -> multi-token hops
            got.extend(eng.spec_decode_step(drafts)[0])
        assert got[: len(want)] == want, (dt, got, want)


def test_paged_engine_windowed_table_matches_strip(tiny_opt):
    """maxp > 4 triggers the WINDOWED page-table read (lax.switch over
    power-of-two table widths, models.attention): token streams must match
    the strip engine across window-bucket crossings (4 → 8 pages here:
    lengths run 5 .. 38 over page_size 8 with maxp 16)."""
    params, cfg, fam = tiny_opt
    strip = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=128, prefill_buckets=(8,)))
    paged = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=128, prefill_buckets=(8,), page_size=8))
    assert paged.pool.table.shape[1] == 16  # window path active (maxp > 4)
    prompt = [5, 17, 99, 3, 42]
    want = _greedy_tokens(strip, prompt, 34)   # crosses 32 = 4 pages
    got = _greedy_tokens(paged, prompt, 34)
    assert got == want, (got, want)
