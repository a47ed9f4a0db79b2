"""Serial per-lane dispatch (round-3 default single-device execution
model) vs the vmapped formulation: same winners, near-identical losses.

The two modes are distinct compiled formulations (plain vs grouped convs
under vmap-over-weights), so agreement is numerical, not bitwise — on CPU
they track to ~1e-4; on TPU PERF.md records ~1e-2 worst-case val-loss
drift with 17/20 stop-epoch agreement. Each mode is bit-reproducible
run-to-run (test_program_memo_reuses_compiled_sweeps covers the serial
default's determinism)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2s_ismr_tpu import timeutils
from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.ops import terciles
from s2s_ismr_tpu.train import splits
from s2s_ismr_tpu.train.sweep import TuningGrid, run_unet_sweep


def _setup(seed=13, folds=3):
    b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=seed,
                                     signal=0.8,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    b = b.fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=folds)
    wm = timeutils.week_window_matrix(1)
    lab = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(lab), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])
    return x, y_oh, fm


@pytest.mark.slow
def test_serial_matches_vmap():
    x, y_oh, fm = _setup()
    grid = TuningGrid(n_blocks=[2], n_filters=[1],
                      ct_kernels=[(2, 2), (3, 3)],
                      batch_sizes=[16], learning_rates=[1e-3, 1e-4],
                      patience=3)
    rs = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=5,
                        lane_dispatch="serial")
    rv = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=5,
                        lane_dispatch="vmap")
    assert rs.timings["lane_dispatch"] == "serial"
    assert rv.timings["lane_dispatch"] == "vmap"
    np.testing.assert_allclose(rs.val_loss_table, rv.val_loss_table,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        [t.index for t in rs.best_trial], [t.index for t in rv.best_trial])
    # winner predictions flow through the SAME vmapped forward program in
    # both modes, so with equal winners they agree to conv-formulation
    # tolerance on the trained weights
    np.testing.assert_allclose(np.asarray(rs.predictions),
                               np.asarray(rv.predictions), atol=5e-3)
    assert rs.train_steps <= rv.train_steps   # per-lane early exit
    for f in range(fm.train.shape[0]):
        assert rs.best_trial[f].index == int(np.argmin(rs.val_loss_table[f]))


def test_serial_rejects_mesh():
    from s2s_ismr_tpu.parallel import mesh as pmesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device")
    x, y_oh, fm = _setup(folds=2)
    grid = TuningGrid(n_blocks=[2], n_filters=[1], ct_kernels=[(2, 2)],
                      batch_sizes=[16], learning_rates=[1e-3], patience=2)
    with pytest.raises(ValueError, match="serial"):
        run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=2,
                       mesh=pmesh.sweep_mesh(), lane_dispatch="serial")
    with pytest.raises(ValueError, match="lane_dispatch"):
        run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=2,
                       lane_dispatch="bogus")
