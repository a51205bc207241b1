"""GPTQ-PB solver vs an independent NumPy oracle of the same algorithm."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick
import jax.numpy as jnp
import scipy.linalg

from pb_llm_tpu.calib.hessian import hessian_from_samples, hessian_update
from pb_llm_tpu.calib.solver import SolverConfig, gptq_pb

# --- NumPy oracle ------------------------------------------------------------
# Written separately from the JAX code, mirroring the reference's algorithm
# (gptq_pb/gptq.py:54-187) step by step in float32 numpy.


def oracle_gptq_pb(w, h, low_frac, metric, percdamp=0.01, blocksize=128, groupsize=-1, disable_gptq=False):
    w = w.astype(np.float32).copy()
    h = h.astype(np.float32).copy()
    oc, ic = w.shape
    gs = ic if groupsize == -1 else groupsize
    maxq = 255.0

    # high quantizer on the full W, pre-dead-zeroing
    xmin = np.minimum(w.min(1), 0)
    xmax = np.maximum(w.max(1), 0)
    deg = (xmin == 0) & (xmax == 0)
    xmin[deg], xmax[deg] = -1, 1
    hscale = ((xmax - xmin) / maxq).astype(np.float32)
    hzero = np.round(-xmin / hscale).astype(np.float32)

    def q_high(x):
        q = np.clip(np.round(x / hscale[:, None]) + hzero[:, None], 0, maxq)
        return (hscale[:, None] * (q - hzero[:, None])).astype(np.float32)

    dead = np.diag(h) == 0
    h[dead, dead] = 1
    w[:, dead] = 0

    damp = percdamp * np.mean(np.diag(h))
    h[np.arange(ic), np.arange(ic)] += damp
    L = np.linalg.cholesky(h)
    hinv_full = scipy.linalg.cho_solve((L, True), np.eye(ic, dtype=np.float32)).astype(np.float32)
    hinv = np.linalg.cholesky(hinv_full).T.astype(np.float32)

    mask = np.zeros_like(w, bool)
    means = np.zeros((ic // gs if ic % gs == 0 else ic // gs + 1, oc), np.float32)
    scales = np.zeros_like(means)
    for g in range(means.shape[0]):
        st, ed = g * gs, min((g + 1) * gs, ic)
        if metric == "magnitude":
            sal = np.abs(w[:, st:ed])
        else:
            sal = w[:, st:ed] ** 2 / np.diag(hinv)[st:ed][None, :] ** 2
        k = min(int(sal.size * low_frac), sal.size - 1)
        thresh = np.sort(sal.flatten())[k]
        mask[:, st:ed] = sal <= thresh
        wm = (w[:, st:ed] * mask[:, st:ed]).astype(np.float32)
        means[g] = wm.mean(-1)
        scales[g] = np.abs(wm - means[g][:, None]).mean(-1)

    def q_low(x, g):
        return (np.sign(x - means[g][:, None]) * scales[g][:, None] + means[g][:, None]).astype(np.float32)

    losses = np.zeros(oc, np.float32)
    for st in range(0, ic, blocksize):
        ed = min(st + blocksize, ic)
        g = st // gs
        if disable_gptq:
            w1 = w[:, st:ed]
            q = np.where(mask[:, st:ed], q_low(w1, g), q_high(w1))
            w[:, st:ed] = q
            continue
        w1 = w[:, st:ed].copy()
        q1 = np.zeros_like(w1)
        err1 = np.zeros_like(w1)
        h1 = hinv[st:ed, st:ed]
        for i in range(ed - st):
            wc = w1[:, i : i + 1]
            d = h1[i, i]
            q = np.where(mask[:, st + i : st + i + 1], q_low(wc, g), q_high(wc))
            q1[:, i : i + 1] = q
            losses += ((wc - q) ** 2 / d**2)[:, 0] / 2
            err = (wc - q) / d
            w1[:, i:] -= err @ h1[i : i + 1, i:]
            err1[:, i : i + 1] = err
        w[:, st:ed] = q1
        w[:, ed:] -= err1 @ hinv[st:ed, ed:]
    return w, mask, float(losses.sum())


def _problem(oc=24, ic=64, seed=0, nsamp=6, tokens=32):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    xs = rng.standard_normal((nsamp, tokens, ic)).astype(np.float32)
    h = np.asarray(hessian_from_samples(jnp.asarray(xs)))
    return w, h, xs


def test_hessian_accumulation_matches_definition():
    w, h, xs = _problem()
    href = 2.0 / xs.shape[0] * sum(x.T @ x for x in xs)
    np.testing.assert_allclose(h, href, rtol=1e-5, atol=1e-4)


def test_hessian_online_update_matches_batch():
    _, h, xs = _problem()
    hrun = jnp.zeros((xs.shape[-1], xs.shape[-1]), jnp.float32)
    n = 0
    for x in xs:
        hrun, n = hessian_update(hrun, n, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hrun), h, rtol=1e-4, atol=1e-4)


def test_solver_matches_oracle_magnitude():
    w, h, _ = _problem(seed=1)
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=0.5, salient_metric="magnitude", blocksize=32))
    q_ref, mask_ref, err_ref = oracle_gptq_pb(w, h, 0.5, "magnitude", blocksize=32)
    np.testing.assert_array_equal(np.asarray(out["mask"]), mask_ref)
    np.testing.assert_allclose(np.asarray(out["w_q"]), q_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(out["error"]), err_ref, rtol=1e-2)


def test_solver_matches_oracle_hessian_metric():
    w, h, _ = _problem(seed=2)
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=0.8, salient_metric="hessian", blocksize=32))
    q_ref, mask_ref, err_ref = oracle_gptq_pb(w, h, 0.8, "hessian", blocksize=32)
    assert np.mean(np.asarray(out["mask"]) == mask_ref) > 0.995  # float-tie tolerance
    np.testing.assert_allclose(np.asarray(out["w_q"]), q_ref, rtol=5e-3, atol=5e-3)


def test_solver_rtn_path():
    w, h, _ = _problem(seed=3)
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=0.5, disable_gptq=True, blocksize=32))
    q_ref, mask_ref, _ = oracle_gptq_pb(w, h, 0.5, "magnitude", blocksize=32, disable_gptq=True)
    np.testing.assert_array_equal(np.asarray(out["mask"]), mask_ref)
    np.testing.assert_allclose(np.asarray(out["w_q"]), q_ref, rtol=1e-4, atol=1e-5)


def test_gptq_beats_rtn_on_layer_reconstruction():
    # the point of error feedback: tr((W-Q) H (W-Q)^T) should drop
    w, h, _ = _problem(oc=32, ic=96, seed=4)
    cfg = dict(low_frac=0.9, salient_metric="hessian", blocksize=32)
    q_g = np.asarray(gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(**cfg))["w_q"])
    q_r = np.asarray(gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(disable_gptq=True, **cfg))["w_q"])

    def recon(q):
        d = w - q
        return float(np.trace(d @ h @ d.T))

    assert recon(q_g) < recon(q_r)


def test_mask_fraction_close_to_low_frac():
    w, h, _ = _problem(seed=5)
    for frac in (0.5, 0.8, 0.95):
        out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=frac, blocksize=32))
        got = float(np.asarray(out["mask"]).mean())
        assert abs(got - frac) < 0.02


def test_grouped_solver_runs():
    w, h, _ = _problem(oc=16, ic=64, seed=6)
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=0.5, groupsize=32, blocksize=32))
    q_ref, mask_ref, _ = oracle_gptq_pb(w, h, 0.5, "magnitude", blocksize=32, groupsize=32)
    np.testing.assert_array_equal(np.asarray(out["mask"]), mask_ref)
    np.testing.assert_allclose(np.asarray(out["w_q"]), q_ref, rtol=1e-3, atol=1e-3)
    assert out["low_state"]["scale"].shape == (2, 16)


def test_dead_columns_zeroed():
    w, _, xs = _problem(seed=7)
    xs2 = np.asarray(xs).copy()
    xs2[:, :, 5] = 0.0  # column 5 never activated -> dead
    h = np.asarray(hessian_from_samples(jnp.asarray(xs2)))
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h), SolverConfig(low_frac=0.5, blocksize=32))
    q_ref, _, _ = oracle_gptq_pb(w, h, 0.5, "magnitude", blocksize=32)
    np.testing.assert_allclose(np.asarray(out["w_q"]), q_ref, rtol=1e-3, atol=1e-3)


def test_solver_high_sym_and_mse_options():
    w, h, _ = _problem(seed=9)
    out = gptq_pb(jnp.asarray(w), jnp.asarray(h),
                  SolverConfig(low_frac=0.5, blocksize=32, high_sym=True, high_mse=True, high_bit=4))
    # symmetric: zero point is (maxq+1)/2 = 8 for 4-bit
    np.testing.assert_allclose(np.asarray(out["high_state"]["zero"]), 8.0)
    assert np.isfinite(float(out["error"]))
