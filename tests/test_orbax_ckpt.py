"""Orbax sharded checkpointing: packed trees round-trip, sharded restore."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pb_llm_tpu.utils.orbax_ckpt import restore_sharded, save_sharded


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_dense_tree_roundtrip(tmp_path):
    tree = {
        "w": jnp.arange(12.0).reshape(3, 4),
        "nested": {"b": jnp.ones((5,), jnp.int32)},
    }
    save_sharded(str(tmp_path / "ck"), tree)
    got = restore_sharded(str(tmp_path / "ck"), tree)
    _tree_equal(tree, got)


def test_packed_v2_tree_roundtrip(tmp_path):
    from tests.test_pbw_v2 import _make_v2

    _, _, p, _, _ = _make_v2(oc=256, ic=256, col_tile=0, bias=True)
    tree = {"layer0": {"up_proj": p}}
    save_sharded(str(tmp_path / "ck"), tree)
    got = restore_sharded(str(tmp_path / "ck"), tree)
    q = got["layer0"]["up_proj"]
    assert q.ic == p.ic and q.oc == p.oc and q.col_tile == p.col_tile
    _tree_equal(tree, got)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_restore_placement(tmp_path):
    from pb_llm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=1, tp=8)
    w = jnp.arange(64.0 * 16).reshape(64, 16)
    save_sharded(str(tmp_path / "ck"), {"w": w})

    got = restore_sharded(str(tmp_path / "ck"), {"w": w}, mesh=mesh,
                          shardings={"w": P(None, "tp")})
    assert got["w"].sharding == NamedSharding(mesh, P(None, "tp"))
    np.testing.assert_array_equal(np.asarray(got["w"]), np.asarray(w))
