"""HTTP serving front-end: concurrent /generate over the continuous batcher.

Contract: responses through the server match direct greedy generation, and
concurrent connections share the batcher (continuous batching across HTTP
clients, not per-call runs).
"""

import json
import threading
import urllib.request

import pytest
import torch

import jax.numpy as jnp

from pb_llm_tpu.models import hf_import
from pb_llm_tpu.models.registry import family_for
from pb_llm_tpu.runtime.engine import Engine, EngineConfig
from pb_llm_tpu.runtime.server import ServingLoop, serve_http


@pytest.fixture(scope="module")
def tiny_engine():
    from transformers import OPTConfig, OPTForCausalLM

    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=32, ffn_dim=64, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64,
        word_embed_proj_dim=32, dropout=0.0,
    )
    torch.manual_seed(0)
    model = OPTForCausalLM(hf_cfg).eval().float()
    params, cfg, _ = hf_import.from_torch_model(model)
    fam = family_for("opt")
    return Engine(params, cfg, fam, EngineConfig(n_slots=2, max_seq=48, prefill_buckets=(8,)))


def _greedy_reference(eng, prompt, steps):
    got = [eng.prefill(0, prompt)]
    for _ in range(steps - 1):
        got.append(eng.decode_step()[0])
    eng.release(0)
    return got


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_generate_matches_direct(tiny_engine):
    prompts = [[5, 17, 99, 3], [42, 7, 11, 23], [1, 2, 3]]
    want = [_greedy_reference(tiny_engine, p, 6) for p in prompts]

    server = serve_http(tiny_engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        results = [None] * len(prompts)

        def worker(i):
            results[i] = _post(port, {"prompt_ids": prompts[i], "max_new_tokens": 6})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(prompts))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i, res in enumerate(results):
            assert res is not None and res["output_ids"] == want[i], (i, res, want[i])

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["generated_tokens"] >= 18 and stats["prefills"] == 3
    finally:
        server.shutdown()
        server.serving_loop.shutdown()


def test_http_bad_request(tiny_engine):
    server = serve_http(tiny_engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b'{"nope": 1}',
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        server.shutdown()
        server.serving_loop.shutdown()


def test_serving_loop_library_surface(tiny_engine):
    loop = ServingLoop(tiny_engine).start()
    try:
        req = loop.generate([5, 17, 99, 3], max_new_tokens=4, timeout=120)
        assert req.done and len(req.output_ids) == 4
    finally:
        loop.shutdown()


def test_http_streaming(tiny_engine):
    """stream=true: one NDJSON line per token over a Connection: close
    response; the concatenated stream equals the non-streamed output."""
    prompt = [5, 17, 99, 3]
    want = _greedy_reference(tiny_engine, prompt, 6)

    server = serve_http(tiny_engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt_ids": prompt, "max_new_tokens": 6,
                             "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            lines = [json.loads(l) for l in r.read().decode().splitlines()]
        toks = [l["token"] for l in lines if "token" in l]
        tail = lines[-1]
        assert toks == want, (toks, want)
        assert tail["done"] and tail["output_ids"] == want
    finally:
        server.shutdown()
        server.serving_loop.shutdown()


def test_http_per_request_sampling(tiny_engine):
    """Per-request sampling over HTTP: a top_k=1 stochastic request must be
    exactly greedy (determinism anchor), and mixing greedy + sampled
    requests leaves the greedy one bit-exact."""
    prompt = [5, 17, 99, 3]
    want = _greedy_reference(tiny_engine, prompt, 6)

    server = serve_http(tiny_engine, host="127.0.0.1", port=0)
    port = server.server_address[1]
    try:
        res_g = _post(port, {"prompt_ids": prompt, "max_new_tokens": 6})
        res_k1 = _post(port, {"prompt_ids": prompt, "max_new_tokens": 6,
                              "temperature": 1.0, "top_k": 1})
        res_s = _post(port, {"prompt_ids": [42, 7, 11], "max_new_tokens": 6,
                             "temperature": 0.9, "top_p": 0.8})
        assert res_g["output_ids"] == want
        assert res_k1["output_ids"] == want
        assert len(res_s["output_ids"]) == 6
        assert all(0 <= t < 128 for t in res_s["output_ids"])
    finally:
        server.shutdown()
        server.serving_loop.shutdown()
