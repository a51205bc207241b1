"""Per-request sampling: the vectorized sampler, engine slot overrides,
scheduler integration, and the spec-decode fallback.

Reference counterpart: none (the reference's only sampling is the
`model.generate` demo helper, utils.py:127-137); this is serving surface
the TPU build adds.  Determinism anchors: greedy rows must be bit-equal to
argmax, and top_k=1 forces argmax through the stochastic path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.runtime.batching import ContinuousBatcher, Request
from pb_llm_tpu.runtime.engine import Engine, EngineConfig
from pb_llm_tpu.runtime.sampler import SamplingParams, sample, sample_vec


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
# sample_vec vs the scalar sampler
# ---------------------------------------------------------------------------


def _vecs(b, sp):
    return (jnp.full((b,), sp.temperature, jnp.float32),
            jnp.full((b,), sp.top_k, jnp.int32),
            jnp.full((b,), sp.top_p, jnp.float32))


@pytest.mark.parametrize("sp", [
    SamplingParams(),                                     # greedy
    SamplingParams(temperature=0.7),
    SamplingParams(temperature=1.3, top_k=5),
    SamplingParams(temperature=0.9, top_p=0.6),
    SamplingParams(temperature=1.1, top_k=7, top_p=0.5),
])
def test_sample_vec_matches_scalar_uniform(sp):
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((6, 64)).astype(np.float32) * 3)
    key = jax.random.PRNGKey(11)
    want = np.asarray(sample(logits, key, sp))
    got = np.asarray(sample_vec(logits, key, *_vecs(6, sp)))
    np.testing.assert_array_equal(got, want)


def test_sample_vec_mixed_rows():
    """Greedy rows are bit-equal to argmax; top_k=1 rows are deterministic
    argmax through the stochastic path; a top_p≈0 row too."""
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 3)
    temp = jnp.asarray([0.0, 1.0, 0.8, 1.2], jnp.float32)
    tk = jnp.asarray([0, 1, 0, 0], jnp.int32)
    tp = jnp.asarray([1.0, 1.0, 1e-6, 1.0], jnp.float32)
    toks = np.asarray(sample_vec(logits, jax.random.PRNGKey(0), temp, tk, tp))
    am = np.asarray(jnp.argmax(logits, axis=-1))
    assert toks[0] == am[0]          # greedy row
    assert toks[1] == am[1]          # top_k=1 forces argmax
    assert toks[2] == am[2]          # top_p→0 keeps only the top token
    assert 0 <= toks[3] < 64


# ---------------------------------------------------------------------------
# engine + scheduler integration
# ---------------------------------------------------------------------------


def _run(params, cfg, fam, reqs, spec_gamma=0, engine_sampling=SamplingParams()):
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), spec_gamma=spec_gamma),
        engine_sampling)
    b = ContinuousBatcher(eng)
    b.run(reqs)
    return [r.output_ids for r in reqs], b.stats


def test_per_request_greedy_rides_with_sampled(tiny_opt):
    """A greedy request batched WITH a stochastic one produces exactly the
    all-greedy stream; the stochastic one emits valid tokens."""
    params, cfg, fam = tiny_opt
    p0, p1 = [5, 17, 99, 3], [42, 7, 11]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p0, max_new_tokens=10)])

    reqs = [
        Request(request_id=0, prompt_ids=p0, max_new_tokens=10),
        Request(request_id=1, prompt_ids=p1, max_new_tokens=10,
                sampling=SamplingParams(temperature=0.9, top_k=8)),
    ]
    out, _ = _run(params, cfg, fam, reqs)
    assert out[0] == plain[0]
    assert len(out[1]) == 10 and all(0 <= t < 128 for t in out[1])


def test_per_request_topk1_is_greedy(tiny_opt):
    """temperature>0 with top_k=1 must walk the greedy path exactly (the
    stochastic decode program collapses to argmax)."""
    params, cfg, fam = tiny_opt
    p = [5, 17, 99, 3]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p, max_new_tokens=10)])
    out, _ = _run(params, cfg, fam, [
        Request(request_id=0, prompt_ids=p, max_new_tokens=10,
                sampling=SamplingParams(temperature=1.0, top_k=1)),
    ])
    assert out[0] == plain[0]


def test_per_request_greedy_override_on_stochastic_engine(tiny_opt):
    """Engine-wide sampling is stochastic; a request overriding to greedy
    still gets the exact greedy stream."""
    params, cfg, fam = tiny_opt
    p = [5, 17, 99, 3]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p, max_new_tokens=10)])
    out, _ = _run(params, cfg, fam, [
        Request(request_id=0, prompt_ids=p, max_new_tokens=10,
                sampling=SamplingParams()),
    ], engine_sampling=SamplingParams(temperature=0.8))
    assert out[0] == plain[0]


def test_spec_continues_while_any_slot_samples(tiny_opt):
    """spec_gamma>0 + a stochastic request: spec ticks KEEP RUNNING
    (rejection-sampling verify, VERDICT r2 item 8) — the greedy request's
    stream stays exactly the plain-greedy stream (greedy rows in the
    sampled verify accept on token-match and correct with argmax)."""
    params, cfg, fam = tiny_opt
    p0 = [7, 8, 9, 7, 8, 9, 7, 8]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p0, max_new_tokens=10)])
    reqs = [
        Request(request_id=0, prompt_ids=p0, max_new_tokens=10),
        Request(request_id=1, prompt_ids=[42, 7, 11], max_new_tokens=10,
                sampling=SamplingParams(temperature=0.9)),
    ]
    out, stats = _run(params, cfg, fam, reqs, spec_gamma=3)
    assert stats.spec_drafted > 0
    assert out[0] == plain[0]
    assert len(out[1]) == 10


def test_tp_engine_per_request_sampling(tiny_opt):
    """Per-request sampling under TP shard_map: the greedy request's stream
    equals the single-device greedy stream while a sampled request shares
    the decode program."""
    from pb_llm_tpu.parallel import mesh as pmesh
    from pb_llm_tpu.runtime import tp_engine

    params, cfg, fam = tiny_opt
    p0, p1 = [5, 17, 99, 3], [42, 7, 11]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p0, max_new_tokens=8)])

    eng = tp_engine.TPEngine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)), pmesh.make_mesh(dp=1, tp=4))
    reqs = [
        Request(request_id=0, prompt_ids=p0, max_new_tokens=8),
        Request(request_id=1, prompt_ids=p1, max_new_tokens=8,
                sampling=SamplingParams(temperature=0.9, top_k=8)),
    ]
    b = ContinuousBatcher(eng)
    b.run(reqs)
    assert reqs[0].output_ids == plain[0]
    assert len(reqs[1].output_ids) == 8
    assert all(0 <= t < 128 for t in reqs[1].output_ids)


def test_multihost_per_request_sampling(tiny_opt):
    """Per-request sampling rides the broadcast admission record as fixed
    point; single-process MultiHostBatcher must (a) keep greedy requests
    bit-exact, (b) be deterministic run-to-run (the cross-host determinism
    precondition: every rank decodes the same record and shares the PRNG
    seed), (c) exercise the encode→decode path even on host 0."""
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt
    p0, p1 = [5, 17, 99, 3], [42, 7, 11]
    plain, _ = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=p0, max_new_tokens=8)])

    def run_mh():
        eng = Engine(params, cfg, fam, EngineConfig(
            n_slots=2, max_seq=64, prefill_buckets=(8,)))
        b = MultiHostBatcher(eng)
        reqs = [
            Request(request_id=0, prompt_ids=p0, max_new_tokens=8),
            Request(request_id=1, prompt_ids=p1, max_new_tokens=8,
                    sampling=SamplingParams(temperature=0.937, top_k=12)),
        ]
        for r in reqs:
            b.submit(r)
        while any(not r.done for r in reqs):
            b.step()
        return [r.output_ids for r in reqs]

    out_a = run_mh()
    out_b = run_mh()
    assert out_a == out_b                      # determinism precondition
    assert out_a[0] == plain[0]                # greedy stays exact
    assert len(out_a[1]) == 8 and all(0 <= t < 128 for t in out_a[1])
