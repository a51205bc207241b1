"""Greedy-exact speculative decoding: verify-step semantics and scheduler
integration.  The contract: token streams are IDENTICAL to plain greedy
decode no matter what the drafts are; good drafts only change how many
program invocations it takes."""

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


def _plain_stream(params, cfg, fam, prompt, steps, **ekw):
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), **ekw))
    toks = [eng.prefill(0, prompt)]
    for _ in range(steps):
        toks.append(eng.decode_step()[0])
    return toks


def test_spec_step_exact_for_any_drafts(tiny_opt):
    """All-correct, all-wrong and mixed drafts: concatenated spec streams
    equal plain greedy decode exactly."""
    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    want = _plain_stream(params, cfg, fam, prompt, steps=12)

    for draft_mode in ("oracle", "wrong", "mixed"):
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=3))
        got = [eng.prefill(0, prompt)]
        verifies = 0
        while len(got) < len(want):
            if draft_mode == "oracle":  # the true continuation
                nxt = want[len(got): len(got) + 3]
                d = nxt + [0] * (3 - len(nxt))
            elif draft_mode == "wrong":
                d = [(want[len(got) - 1] + 7) % 128] * 3
            else:
                nxt = want[len(got): len(got) + 3]
                d = (nxt + [0] * (3 - len(nxt)))[:1] + [99, 98]
            drafts = np.zeros((2, 3), np.int32)
            drafts[0] = d
            got.extend(eng.spec_decode_step(drafts)[0])
            verifies += 1
        assert got[: len(want)] == want, (draft_mode, got, want)
        if draft_mode == "oracle":
            assert verifies <= (len(want) + 2) // 4 + 1  # ~4 tokens/verify
        if draft_mode == "wrong":
            assert verifies == len(want) - 1  # 1 token per verify


def test_spec_interleaved_slots(tiny_opt):
    """Two slots with different acceptance rates advance independently."""
    params, cfg, fam = tiny_opt
    p0, p1 = [5, 17, 99, 3], [42, 7, 11]
    w0 = _plain_stream(params, cfg, fam, p0, steps=6)
    eng2 = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)))
    t1 = [eng2.prefill(0, p1)]
    for _ in range(6):
        t1.append(eng2.decode_step()[0])

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=2))
    g0 = [eng.prefill(0, p0)]
    g1 = [eng.prefill(1, p1)]
    while len(g0) < 7 or len(g1) < 7:
        drafts = np.zeros((2, 2), np.int32)
        nxt0 = w0[len(g0): len(g0) + 2]
        drafts[0, : len(nxt0)] = nxt0          # slot 0: oracle drafts
        drafts[1] = [1, 2]                      # slot 1: junk drafts
        out = eng.spec_decode_step(drafts)
        g0.extend(out.get(0, []))
        g1.extend(out.get(1, []))
    assert g0[:7] == w0
    assert g1[:7] == t1


def test_batcher_spec_matches_plain(tiny_opt):
    """ContinuousBatcher with spec_gamma=3 (prompt-lookup drafts) produces
    identical outputs to plain decode, in fewer decode invocations when the
    text repeats."""
    params, cfg, fam = tiny_opt

    def run(gamma):
        # repetitive prompts make prompt-lookup drafts land
        reqs = [Request(request_id=i,
                        prompt_ids=[7, 8, 9, 7, 8, 9, 7, 8],
                        max_new_tokens=16) for i in range(3)]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=gamma))
        b = ContinuousBatcher(eng)
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    plain, _ = run(0)
    spec, stats = run(3)
    assert spec == plain
    assert stats.spec_drafted > 0
    # acceptance must actually happen on repetitive continuations
    assert stats.spec_accepted > 0, (stats.spec_drafted, stats.spec_accepted)


def test_spec_sampled_runs_with_temperature(tiny_opt):
    """temperature > 0 no longer raises: the verify switches to rejection
    sampling (VERDICT r2 item 8) and still emits 1..γ+1 tokens per step."""
    params, cfg, fam = tiny_opt
    from pb_llm_tpu.runtime.sampler import SamplingParams

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=1, max_seq=64, prefill_buckets=(8,), spec_gamma=2),
        SamplingParams(temperature=0.7))
    eng.prefill(0, [5, 17, 99])
    for _ in range(4):
        out = eng.spec_decode_step(np.zeros((1, 2), np.int32))
        assert 1 <= len(out[0]) <= 3
        assert len(eng.token_logprobs[0]) == len(out[0])


def test_spec_verify_sample_distribution_equality():
    """The rejection-sampling verify's FIRST emitted token must be
    distribution-equal to plain sampling from the (temperature/top-k)
    filtered target — checked empirically over 20k keys against the
    analytic filtered softmax, for an arbitrary (wrong-ish) draft."""
    import jax
    import jax.numpy as jnp

    from pb_llm_tpu.runtime.sampler import filter_logits_vec, spec_verify_sample

    V, t = 16, 3
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((1, t, V)).astype(np.float32) * 2.0)
    drafts = jnp.asarray(np.asarray([[3, 7]], np.int32))
    for tk_val in (0, 4):
        temp = jnp.asarray([0.8], jnp.float32)
        tk = jnp.asarray([tk_val], jnp.int32)
        tp = jnp.asarray([1.0], jnp.float32)

        @jax.jit
        def one(key):
            acc, corr, _, _ = spec_verify_sample(logits, drafts, key, temp, tk, tp)
            return jnp.where(acc[0, 0], drafts[0, 0], corr[0, 0])

        keys = jax.random.split(jax.random.PRNGKey(1), 20000)
        emitted = np.asarray(jax.vmap(one)(keys))
        x = filter_logits_vec(np.asarray(logits)[0, :1, :].astype(np.float32),
                              temp, tk, tp)
        p = np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1))[0]
        freq = np.bincount(emitted, minlength=V) / len(emitted)
        assert np.abs(freq - p).max() < 0.02, (tk_val, freq, p)
        # and outside-support tokens never appear
        assert freq[p == 0.0].sum() == 0.0


def test_spec_sampled_topk1_matches_plain_and_accepts(tiny_opt):
    """top_k=1 sampling is deterministic (argmax), so the rejection-sampling
    spec stream must EXACTLY equal plain decode with the same params — and
    with a self-draft source every draft is accepted, so spec ticks keep
    their speed win at temperature > 0 (spec_accepted > 0)."""
    params, cfg, fam = tiny_opt
    from pb_llm_tpu.runtime.sampler import SamplingParams

    sp = SamplingParams(temperature=0.7, top_k=1)
    mk_reqs = lambda: [
        Request(request_id=0, prompt_ids=[5, 17, 99, 3], max_new_tokens=10,
                sampling=sp),
        Request(request_id=1, prompt_ids=[42, 7, 11], max_new_tokens=8),
    ]

    def run(gamma, draft=False):
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=gamma))
        b = ContinuousBatcher(
            eng, draft_source=_draft_source(params, cfg, fam) if draft else None)
        reqs = mk_reqs()
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    plain, _ = run(0)
    spec, stats = run(3, draft=True)
    assert spec == plain
    assert stats.spec_drafted > 0
    assert stats.spec_accepted == stats.spec_drafted  # self-draft + top_k=1


def test_spec_tp_matches_single_device(tiny_opt):
    """Spec verify under TP shard_map: streams identical to the
    single-device spec engine and to plain greedy."""
    import copy

    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime.tp_engine import TPEngine

    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    want = _plain_stream(params, cfg, fam, prompt, steps=8)

    mesh = pmesh.make_mesh(dp=1, tp=4)
    eng = TPEngine(copy.deepcopy(params), cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=3), mesh)
    got = [eng.prefill(0, prompt)]
    while len(got) < len(want):
        drafts = np.zeros((2, 3), np.int32)
        nxt = want[len(got): len(got) + 3]
        drafts[0, : len(nxt)] = nxt
        got.extend(eng.spec_decode_step(drafts)[0])
    assert got[: len(want)] == want, (got, want)


def test_multihost_batcher_spec(tiny_opt):
    """Single-process MultiHostBatcher with spec_gamma: outputs identical
    to its plain-decode run."""
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt

    def run(gamma):
        reqs = [Request(request_id=i, prompt_ids=[7, 8, 9, 7, 8, 9, 7, 8],
                        max_new_tokens=12) for i in range(3)]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=gamma))
        b = MultiHostBatcher(eng, max_prompt=16)
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    plain, _ = run(0)
    spec, stats = run(3)
    assert spec == plain
    assert stats.spec_accepted > 0


def test_spec_int8_cache_matches_plain_int8(tiny_opt):
    """Spec verify writes multi-token rows into the int8 strip cache
    (quantized scatter with t>1): streams match plain int8 decode."""
    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    want = _plain_stream(params, cfg, fam, prompt, steps=8, cache_dtype=jnp.int8)

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=1, max_seq=64, prefill_buckets=(8,), spec_gamma=3,
        cache_dtype=jnp.int8))
    got = [eng.prefill(0, prompt)]
    while len(got) < len(want):
        drafts = np.zeros((1, 3), np.int32)
        nxt = want[len(got): len(got) + 3]
        drafts[0, : len(nxt)] = nxt
        got.extend(eng.spec_decode_step(drafts)[0])
    assert got[: len(want)] == want, (got, want)


def test_spec_at_max_seq_boundary_matches_plain(tiny_opt):
    """A fully-accepted verify window ending at the cache boundary must not
    truncate the stream: each emitted token is judged at ITS OWN position
    (regression: out_of_cache used the window's final length for every
    token, retiring after the first)."""
    params, cfg, fam = tiny_opt

    def run(gamma):
        # max_seq tight: prompt 8 + 20 budget runs into the boundary window
        reqs = [Request(request_id=0, prompt_ids=[7, 8, 9, 7, 8, 9, 7, 8],
                        max_new_tokens=30)]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=1, max_seq=24, prefill_buckets=(8,), spec_gamma=gamma))
        b = ContinuousBatcher(eng)
        b.run(reqs)
        return reqs[0].output_ids

    plain = run(0)
    spec = run(3)
    assert spec == plain, (spec, plain)


def test_preemption_with_spec_and_double_preemption(tiny_opt):
    """Recompute preemption + speculative decoding: outputs merge the
    preempted prefix back, histories never double-count (a second
    preemption of the same request stays admissible), and streams equal
    the roomy-pool run exactly."""
    params, cfg, fam = tiny_opt

    def run(n_pages):
        reqs = [Request(request_id=i, prompt_ids=[7, 8, 9, 7, 8, 9, 7, 8],
                        max_new_tokens=14) for i in range(2)]
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=48, prefill_buckets=(8, 16, 32), page_size=8,
            n_pages=n_pages, spec_gamma=2))
        b = ContinuousBatcher(eng)
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    roomy, _ = run(12)
    tight, stats = run(4)  # forces preemption under growth
    assert stats.preemptions >= 1
    assert tight == roomy, (stats.preemptions, tight, roomy)
    assert all(len(o) == 14 for o in tight)


# ---------------------------------------------------------------------------
# draft-MODEL speculative decoding (runtime.draft.ModelDraftSource)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_opt_draft():
    """A DIFFERENT (smaller, differently-seeded) model over the same vocab —
    a realistic draft: correlated with nothing, so acceptance is luck, but
    streams must still be exact."""
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=1,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(1)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    return params, cfg, family_for("opt")


def _draft_source(dparams, dcfg, dfam, n_slots=2, max_seq=64):
    from pb_llm_tpu.runtime.draft import ModelDraftSource

    return ModelDraftSource(Engine(dparams, dcfg, dfam, EngineConfig(
        n_slots=n_slots, max_seq=max_seq, prefill_buckets=(8, 16, 32))))


def test_model_draft_spec_matches_plain(tiny_opt, tiny_opt_draft):
    """Batcher + ModelDraftSource: outputs identical to plain greedy decode
    on NON-repetitive prompts (where prompt-lookup would rarely fire)."""
    params, cfg, fam = tiny_opt
    dparams, dcfg, dfam = tiny_opt_draft

    def run(gamma, source=None, page_size=0):
        reqs = [Request(request_id=i, prompt_ids=[3 + 11 * i, 29, 64 + i, 90 - i],
                        max_new_tokens=12) for i in range(3)]
        ekw = dict(page_size=page_size, n_pages=24) if page_size else {}
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=gamma, **ekw))
        b = ContinuousBatcher(eng, draft_source=source)
        b.run(reqs)
        return [r.output_ids for r in reqs], b.stats

    plain, _ = run(0)
    spec, stats = run(3, source=_draft_source(dparams, dcfg, dfam))
    assert spec == plain
    assert stats.spec_drafted > 0
    # paged target engine + strip draft engine compose too
    spec_p, stats_p = run(3, source=_draft_source(dparams, dcfg, dfam), page_size=8)
    assert spec_p == plain
    assert stats_p.spec_drafted > 0


def test_model_draft_self_accepts_everything(tiny_opt):
    """Draft == target model: every draft token is the target's own argmax,
    so acceptance is 100% and each verify advances γ+1 tokens.

    5 requests over 2 slots with different budgets force slot REUSE between
    propose() calls (retire + re-admit happen in the same tick, before the
    spec step) — if the draft engine ever kept a previous request's KV for
    a reused slot, its drafts would be conditioned on the wrong context and
    this 100%-acceptance invariant would break (regression: review finding,
    slot identity tracking in ModelDraftSource)."""
    params, cfg, fam = tiny_opt

    reqs = [Request(request_id=i,
                    prompt_ids=[(7 * i + 5) % 128, (13 * i + 17) % 128,
                                (29 * i + 99) % 128, (41 * i + 3) % 128],
                    max_new_tokens=4 + 3 * i) for i in range(5)]
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=3))
    b = ContinuousBatcher(eng, draft_source=_draft_source(params, cfg, fam))
    b.run(reqs)
    assert b.stats.spec_drafted > 0
    assert b.stats.spec_accepted == b.stats.spec_drafted


def test_model_draft_catchup_after_plain_ticks(tiny_opt, tiny_opt_draft):
    """Ticks run WITHOUT the source (near-max_seq fallback, temperature
    fallback) leave the draft engine behind; the next propose() must
    force-feed the missed tokens and then draft exactly what a freshly
    prefilled draft engine would."""
    from types import SimpleNamespace

    params, cfg, fam = tiny_opt
    dparams, dcfg, dfam = tiny_opt_draft
    prompt = [5, 17, 99, 3]

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)))
    req = Request(request_id=0, prompt_ids=prompt, max_new_tokens=16)
    req.output_ids.append(eng.prefill(0, prompt))
    fake = SimpleNamespace(engine=eng, slot_to_request={0: req})

    src = _draft_source(dparams, dcfg, dfam)
    d1 = src.propose(fake, 3)          # lazy admission path
    assert d1 is not None

    # ... then 2 scheduler ticks that bypassed the source entirely
    # (propose() rolled the draft 3 ahead on speculation; these plain steps
    # also exercise the rollback branch)
    for _ in range(2):
        req.output_ids.append(eng.decode_step()[0])

    d2 = src.propose(fake, 3)          # rollback + catch-up path

    # oracle: a FRESH draft engine prefilled with the full history
    hist = prompt + req.output_ids
    fresh = Engine(dparams, dcfg, dfam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8, 16, 32)))
    fresh.prefill(0, hist[:-1])
    fresh.last_token[0] = hist[-1]
    want = []
    for _ in range(3):
        want.append(fresh.decode_step()[0])
    assert list(d2[0]) == want


def test_model_draft_under_multihost_batcher(tiny_opt, tiny_opt_draft):
    """MultiHostBatcher + ModelDraftSource (single process: the broadcast is
    identity): streams identical to plain greedy ContinuousBatcher.  On a
    pod the same wiring is deterministic without extra broadcasts — drafts
    are a pure function of the (replicated) request histories through a
    replicated draft engine."""
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt
    dparams, dcfg, dfam = tiny_opt_draft

    def reqs():
        return [Request(request_id=i, prompt_ids=[3 + 11 * i, 29, 64 + i, 90 - i],
                        max_new_tokens=12) for i in range(3)]

    plain_reqs = reqs()
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)))
    ContinuousBatcher(eng).run(plain_reqs)

    spec_reqs = reqs()
    eng2 = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=3))
    b = MultiHostBatcher(eng2, max_prompt=8,
                         draft_source=_draft_source(dparams, dcfg, dfam))
    b.run(spec_reqs)

    assert [r.output_ids for r in spec_reqs] == [r.output_ids for r in plain_reqs]
    assert b.stats.spec_drafted > 0
