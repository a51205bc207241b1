"""2-process fake-DCN test: jax.distributed over localhost (SURVEY.md §4)."""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.timeout(180)
def test_two_process_dcn_matmul(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    port = "12387"
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), port, str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(outs)[-2000:]
    assert all("WORKER_OK" in o for o in outs)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    w = rng.standard_normal((16, 32)).astype(np.float32)
    y_ref = x @ w

    # global psum identical on both hosts
    t0 = np.load(tmp_path / "total_0.npy")
    t1 = np.load(tmp_path / "total_1.npy")
    np.testing.assert_allclose(t0, t1)
    np.testing.assert_allclose(float(t0), y_ref.sum(), rtol=1e-5)

    # the replicated (cross-host all-gathered) product matches on both hosts
    for r in range(2):
        y = np.load(tmp_path / f"y_{r}.npy")
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-5)
