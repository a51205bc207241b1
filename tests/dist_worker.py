"""Worker for the 2-process fake-DCN test (launched by test_multihost.py).

Each process owns 2 virtual CPU devices; the 2×2 mesh puts the process
boundary on the "dp" (DCN) axis and intra-process devices on "tp" (ICI) —
the same topology shape as a 2-host pod slice.  Runs a TP-sharded matmul
over a global batch and writes its addressable result shards for the test
to verify against the unsharded computation.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    rank = int(sys.argv[1])
    port = sys.argv[2]
    outdir = sys.argv[3]
    jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=rank)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    assert len(devs) == 4
    mesh = Mesh(np.array(devs).reshape(2, 2), ("dp", "tp"))

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((8, 16)).astype(np.float32)
    w_np = rng.standard_normal((16, 32)).astype(np.float32)

    x = jax.make_array_from_callback((8, 16), NamedSharding(mesh, P("dp", None)), lambda i: x_np[i])
    w = jax.make_array_from_callback((16, 32), NamedSharding(mesh, P(None, "tp")), lambda i: w_np[i])

    f = jax.jit(
        lambda x, w: (x @ w, jnp.sum(x @ w)),
        # replicate the product so every process holds the full result
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    y, total = f(x, w)   # the replication forces cross-host all-gathers
    np.save(os.path.join(outdir, f"total_{rank}.npy"), np.asarray(total))
    np.save(os.path.join(outdir, f"y_{rank}.npy"), np.asarray(y))
    print("WORKER_OK", rank, flush=True)


if __name__ == "__main__":
    main()
