"""bench_e2e smoke: every arm of the TPU bench harness runs end-to-end on
CPU with tiny dims — the driver only exercises bench.py, so this protects
bench_e2e's decode/prefill/arms modes from bitrot between TPU sessions."""

import json
import subprocess
import sys

import pytest

BASE = [sys.executable, "bench_e2e.py", "--layers", "1", "--slots", "2",
        "--ctx", "64", "--hidden", "64", "--ffn", "128", "--heads", "2"]
ENV = {"PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"}


def _run(extra):
    import os

    env = dict(os.environ)
    env.update(ENV)
    out = subprocess.run(BASE + extra, capture_output=True, text=True,
                         timeout=600, env=env, cwd=".")
    assert out.returncode == 0, (out.stdout, out.stderr)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.parametrize("extra", [
    [],                                   # plain decode
    ["--kv_int8"],
    ["--paged", "32"],
    ["--paged", "32", "--kv_int8"],
    ["--scan_layers"],
    ["--prefill"],
    ["--prefill", "--prefill_batches", "1,2"],
    ["--arms", "strips,paged_int8", "--paged", "32"],
])
def test_bench_e2e_modes(extra):
    res = _run(extra)
    assert "metric" in res
    if "arms" in res:
        assert all("ms_per_step" in v or "ms_per_call" in v for v in res["arms"].values())
    else:
        assert res["value"] > 0 or res["value"] is not None
