"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2s_ismr_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return pmesh.sweep_mesh(8)


def test_shard_lanes_placement(mesh8):
    a = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    (sa,) = pmesh.shard_lanes((a,), mesh8)
    assert sa.sharding.num_devices == 8
    np.testing.assert_array_equal(np.asarray(sa), a)


def test_collectives(mesh8):
    v = jnp.arange(16.0)
    sv = pmesh.shard_lanes((v,), mesh8)[0]
    assert float(pmesh.pmean_over_lanes(sv, mesh8)) == pytest.approx(7.5)
    v2 = jnp.asarray(np.roll(np.arange(16.0), 5))
    sv2 = pmesh.shard_lanes((v2,), mesh8)[0]
    assert int(pmesh.argmin_over_lanes(sv2, mesh8)) == int(np.argmin(np.asarray(v2)))


def test_shard_map_lanes_runs_training(mesh8):
    """The dryrun path: a real train step sharded over 8 devices."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, (variables, x) = g.entry()
    out = jax.jit(fn)(variables, x)
    assert out.shape == (16, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
