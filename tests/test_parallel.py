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


@pytest.mark.slow
def test_sweep_over_mesh_matches_single_device():
    """run_unet_sweep(mesh=...) shards folds x lrs lanes over the 8-device
    virtual mesh and reproduces the single-device sweep's val losses."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.grid import Domain
    from s2s_ismr_tpu.ops import terciles
    from s2s_ismr_tpu.parallel import mesh as pmesh
    from s2s_ismr_tpu.train import splits
    from s2s_ismr_tpu.train.sweep import TuningGrid, run_unet_sweep

    b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=5, signal=0.8,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    b = b.fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=3)
    wm = timeutils.week_window_matrix(1)
    labels = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(labels), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])
    grid = TuningGrid(n_blocks=(2,), n_filters=(1,), ct_kernels=((3, 3),),
                      batch_sizes=(16,), learning_rates=(1e-3, 1e-4),
                      patience=4)

    res1 = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=4)
    mesh = pmesh.sweep_mesh(8)
    res8 = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=4,
                          mesh=mesh)
    np.testing.assert_allclose(res8.val_loss_table, res1.val_loss_table,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        [t.index for t in res8.best_trial], [t.index for t in res1.best_trial])


def test_elr_folds_mesh_matches_single_device():
    """Pixel-sharded ELR (Y axis over the mesh) matches the unsharded
    program — each pixel's GLM is independent, zero collectives."""
    import numpy as np
    import jax.numpy as jnp
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.grid import Domain
    from s2s_ismr_tpu.ops import elr as elr_ops, terciles
    from s2s_ismr_tpu.parallel import mesh as pmesh
    from s2s_ismr_tpu.train import splits

    b = synthetic.synthetic_hindcast(years=(2003, 2010), seed=3,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    fm = splits.bootstrap_masks_elr(b.years, n_bootstraps=3)
    wm = timeutils.week_window_matrix(1)

    def fold_fit(pm):
        e, p = terciles.rolling_edges(b.y, b.weeks, pm, wm)
        return (terciles.elr_targets(b.y, b.weeks, e, p),
                terciles.label_terciles(b.y, b.weeks, e, p, True))
    targets, _ = jax.jit(jax.vmap(fold_fit))(jnp.asarray(fm.train))

    xm = b.ensemble_mean()
    ref = np.asarray(elr_ops.elr_folds(xm, targets, fm.train, fm.test, b.y))
    m = pmesh.sweep_mesh()
    shd = np.asarray(elr_ops.elr_folds(xm, targets, fm.train, fm.test, b.y,
                                       mesh=m))
    np.testing.assert_allclose(shd, ref, rtol=1e-5, atol=1e-6)
