"""Quality experiment: GPTQ-PB output MSE vs salient-selection granularity.

The v2 kernel gets faster as the column-structured salient selection gets
coarser (col_tile -> oc means ONE global column set and a 43x smaller
activation gather at llama-7b MLP shape).  This measures what that costs:
relative output MSE  E||x(W - Wq)||^2 / E||xW||^2  after full GPTQ error
feedback, for elementwise selection (the reference's semantics,
`/root/reference/gptq_pb/gptq.py:84-101`) and column selection at several
granularities.

Run on CPU: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/mse_col_tile.py
"""

import numpy as np

import jax
import jax.numpy as jnp

from pb_llm_tpu.calib.solver import SolverConfig, gptq_pb

OC, IC = 1024, 1024
NS = 512
LOW_FRAC = 0.9


def main():
    r = np.random.default_rng(0)
    # realistic-ish statistics: heavy-tailed weights, correlated activations
    # with per-channel scale spread (outlier channels)
    w = (r.standard_normal((OC, IC)) * (1 + 0.5 * np.abs(r.standard_normal((OC, 1))))).astype(np.float32)
    ch_scale = np.exp(0.8 * r.standard_normal(IC)).astype(np.float32)
    basis = r.standard_normal((IC, IC)).astype(np.float32) / np.sqrt(IC)
    x = (r.standard_normal((NS, IC)).astype(np.float32) @ basis) * ch_scale
    h = jnp.asarray(2.0 * (x.T @ x) / NS)
    wj = jnp.asarray(w)
    y_ref = x @ w.T
    denom = float(np.mean(y_ref**2))

    arms = [("element", 0), ("column", 256), ("column", 1024), ("column", OC)]
    for structure, ct in arms:
        cfg = SolverConfig(low_frac=LOW_FRAC, salient_metric="hessian",
                           mask_structure=structure, col_tile=ct or 256)
        out = gptq_pb(wj, h, cfg)
        wq = np.asarray(out["w_q"])
        rel = float(np.mean((x @ (w - wq).T) ** 2)) / denom
        tag = structure if structure == "element" else f"column ct={ct}"
        print(f"{tag:16s} rel output MSE: {rel:.4e}  (solver err {float(np.sum(out['error'])):.1f})",
              flush=True)


if __name__ == "__main__":
    main()
