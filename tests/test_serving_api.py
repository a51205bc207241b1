"""Serving API surface: per-token logprobs and stop_token_ids.

Reference counterpart: none (SURVEY §3.5 — the reference has no serving).
Determinism anchors: greedy logprobs must equal the teacher-forced NLL of
the same stream, and the speculative path must report the same logprobs as
plain decode (accepted drafts ARE the argmax tokens)."""

import json
import urllib.request

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


def _run(params, cfg, fam, reqs, **ekw):
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,), **ekw))
    ContinuousBatcher(eng).run(reqs)
    return reqs


def test_logprobs_match_teacher_forced_nll(tiny_opt):
    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    (req,) = _run(params, cfg, fam,
                  [Request(request_id=0, prompt_ids=prompt, max_new_tokens=8,
                           logprobs=True)])
    assert len(req.output_logprobs) == len(req.output_ids) == 8

    fresh = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)))
    fresh.prefill(0, prompt)
    nll = fresh.forced_decode_nll(0, req.output_ids)
    assert nll == pytest.approx(-float(np.mean(req.output_logprobs)), rel=1e-4)


def test_spec_logprobs_match_plain(tiny_opt):
    params, cfg, fam = tiny_opt
    prompt = [7, 8, 9, 7, 8, 9, 7, 8]  # repetitive: prompt-lookup fires

    def run(gamma):
        (req,) = _run(params, cfg, fam,
                      [Request(request_id=0, prompt_ids=prompt,
                               max_new_tokens=12, logprobs=True)],
                      spec_gamma=gamma)
        return req

    plain, spec = run(0), run(3)
    assert spec.output_ids == plain.output_ids
    np.testing.assert_allclose(spec.output_logprobs, plain.output_logprobs,
                               rtol=1e-4, atol=1e-5)


def test_stop_token_ids_retire(tiny_opt):
    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    (plain,) = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=prompt, max_new_tokens=10)])
    stop = plain.output_ids[3]  # the 4th greedy token
    (req,) = _run(params, cfg, fam,
                  [Request(request_id=0, prompt_ids=prompt, max_new_tokens=10,
                           stop_token_ids=[stop])])
    first_hit = plain.output_ids.index(stop)
    assert req.output_ids == plain.output_ids[: first_hit + 1]


def test_multihost_stop_and_logprobs_via_record(tiny_opt):
    """stop_token_ids ride the broadcast record (shadow retirement must
    match), logprobs are recorded on host 0's rich request."""
    from pb_llm_tpu.runtime.multihost_batching import MultiHostBatcher

    params, cfg, fam = tiny_opt
    prompt = [5, 17, 99, 3]
    (plain,) = _run(params, cfg, fam,
                    [Request(request_id=0, prompt_ids=prompt, max_new_tokens=10)])
    stop = plain.output_ids[3]

    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=64, prefill_buckets=(8,)))
    b = MultiHostBatcher(eng)
    req = Request(request_id=0, prompt_ids=prompt, max_new_tokens=10,
                  stop_token_ids=[stop], logprobs=True)
    b.submit(req)
    while not req.done:
        b.step()
    first_hit = plain.output_ids.index(stop)
    assert req.output_ids == plain.output_ids[: first_hit + 1]
    assert len(req.output_logprobs) == len(req.output_ids)

    with pytest.raises(ValueError, match="at most"):
        b2 = MultiHostBatcher(eng)
        b2.submit(Request(request_id=1, prompt_ids=prompt,
                          stop_token_ids=[1, 2, 3, 4, 5]))
        b2.step()


def test_http_logprobs_and_stop(tiny_opt):
    from pb_llm_tpu.runtime.server import serve_http

    params, cfg, fam = tiny_opt
    eng = Engine(params, cfg, fam, EngineConfig(
        n_slots=2, max_seq=48, prefill_buckets=(8,)))
    server = serve_http(eng, host="127.0.0.1", port=0)
    port = server.server_address[1]

    def post(payload):
        r = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(r, timeout=120).read())

    try:
        base = post({"prompt_ids": [5, 17, 99, 3], "max_new_tokens": 8})
        stop = base["output_ids"][2]
        res = post({"prompt_ids": [5, 17, 99, 3], "max_new_tokens": 8,
                    "logprobs": True, "stop_token_ids": [stop]})
        first_hit = base["output_ids"].index(stop)
        assert res["output_ids"] == base["output_ids"][: first_hit + 1]
        assert len(res["logprobs"]) == len(res["output_ids"])
        assert all(lp <= 0.0 for lp in res["logprobs"])
    finally:
        server.shutdown()
        server.serving_loop.shutdown()
