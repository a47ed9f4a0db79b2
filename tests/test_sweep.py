"""Sweep tests: bucketing, product-order parity, winner selection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from s2s_ismr_tpu import timeutils
from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.ops import terciles
from s2s_ismr_tpu.train import splits
from s2s_ismr_tpu.train.sweep import (TuningGrid, bucket_trials,
                                      enumerate_trials, run_unet_sweep)


def test_product_order_matches_reference():
    import itertools
    grid = TuningGrid(n_blocks=[3], n_filters=[2, 3],
                      ct_kernels=[(2, 2), (3, 3), (5, 5)],
                      batch_sizes=[16, 32], learning_rates=[1e-3, 1e-4])
    trials = enumerate_trials(grid)
    assert len(trials) == 24
    ref = list(itertools.product([16, 32], [1e-3, 1e-4],
                                 [(2, 2), (3, 3), (5, 5)], [2, 3], [3]))
    for t, (bs, lr, k, f, b) in zip(trials, ref):
        assert (t.batch_size, t.lr, t.ct_kernel, t.filters, t.n_blocks) == \
            (bs, lr, k, f, b)
    buckets = bucket_trials(trials)
    assert len(buckets) == 12            # 2 bs x 3 kern x 2 filt
    assert all(len(v) == 2 for v in buckets.values())  # 2 lrs per bucket


@pytest.mark.slow
def test_small_sweep_end_to_end():
    b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=11, signal=0.8,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    b = b.fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=2)
    wm = timeutils.week_window_matrix(1)
    lab_folds = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(lab_folds), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])

    grid = TuningGrid(n_blocks=[2], n_filters=[1], ct_kernels=[(2, 2), (3, 3)],
                      batch_sizes=[16], learning_rates=[1e-3, 1e-4], patience=4)
    res = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=4)

    F, n_trials = 2, 4
    assert res.val_loss_table.shape == (F, n_trials)
    assert np.isfinite(res.val_loss_table).all()
    assert res.predictions.shape == (F,) + x.shape[:-1] + (3,)
    np.testing.assert_allclose(res.predictions.sum(-1), 1.0, atol=1e-4)
    # winner really is the row-wise first minimum
    for f in range(F):
        assert res.best_trial[f].index == int(np.argmin(res.val_loss_table[f]))
        np.testing.assert_allclose(res.best_val_loss[f],
                                   res.val_loss_table[f].min())
    # winner variables have the winning architecture's shapes
    for f in range(F):
        cfg = res.winner_configs[f]
        k = cfg.ct_kernel
        kern = res.winner_variables[f]["params"]["up1_convT"]["kernel"]
        assert kern.shape[:2] == k


@pytest.mark.slow
def test_program_memo_reuses_compiled_sweeps():
    """A second same-shape sweep reuses every compiled bucket program
    (the MME fast path: one sweep per model over identical shapes,
    training.py:322-350) and, because x is a program input rather than a
    baked-in constant, still computes on the NEW data."""
    from s2s_ismr_tpu.train.sweep import _program_memo

    def setup(seed):
        b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=seed,
                                         signal=0.8,
                                         domain=Domain(67, 98, 7, 38),
                                         step=2.0).fillna(0.0)
        fm = splits.bootstrap_masks(b.years, n_bootstraps=2)
        wm = timeutils.week_window_matrix(1)
        lab = jax.vmap(
            lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
        )(jnp.asarray(fm.train))
        y_oh = jnp.nan_to_num(terciles.one_hot_labels(lab), nan=0.0)
        return jnp.asarray(b.ensemble_mean()[..., None]), y_oh, fm

    grid = TuningGrid(n_blocks=[2], n_filters=[1], ct_kernels=[(2, 2)],
                      batch_sizes=[16], learning_rates=[1e-3, 1e-4],
                      patience=4)
    _program_memo.clear()
    x1, y1, fm1 = setup(11)
    r1 = run_unet_sweep(x1, y1, fm1.train, fm1.val, grid, epochs=4)
    assert r1.timings["compile_cached_buckets"] == 0

    # identical call -> full cache hit, bit-identical results
    r1b = run_unet_sweep(x1, y1, fm1.train, fm1.val, grid, epochs=4)
    assert r1b.timings["compile_cached_buckets"] == 1
    np.testing.assert_array_equal(r1b.val_loss_table, r1.val_loss_table)
    np.testing.assert_array_equal(r1b.predictions, r1.predictions)

    # different data, same shapes -> cache hit AND different results
    x2, y2, fm2 = setup(12)
    r2 = run_unet_sweep(x2, y2, fm2.train, fm2.val, grid, epochs=4)
    assert r2.timings["compile_cached_buckets"] == 1
    assert not np.array_equal(r2.val_loss_table, r1.val_loss_table)

    # different epochs (a TrainSettings static) -> miss
    r3 = run_unet_sweep(x1, y1, fm1.train, fm1.val, grid, epochs=3)
    assert r3.timings["compile_cached_buckets"] == 0


@pytest.mark.slow
def test_compile_only_populates_memo():
    """run_unet_sweep(compile_only=True) — the suite runner's compile-ahead
    path — must populate the SAME memo entries a real run uses (returning
    None, executing nothing), so the subsequent real sweep reports a full
    bucket-cache hit and still computes correct results."""
    from s2s_ismr_tpu.train.sweep import _program_memo

    b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=21,
                                     signal=0.8,
                                     domain=Domain(67, 98, 7, 38),
                                     step=2.0).fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=2)
    wm = timeutils.week_window_matrix(1)
    lab = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(lab), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])
    grid = TuningGrid(n_blocks=[2], n_filters=[1], ct_kernels=[(2, 2)],
                      batch_sizes=[16], learning_rates=[1e-3, 1e-4],
                      patience=4)

    _program_memo.clear()
    # dummy zero labels: only SHAPES reach the compiled program
    y_dummy = jnp.zeros_like(y_oh)
    assert run_unet_sweep(x, y_dummy, fm.train, fm.val, grid, epochs=4,
                          compile_only=True) is None
    n_prefetched = len(_program_memo._d)
    assert n_prefetched > 0

    res = run_unet_sweep(x, y_oh, fm.train, fm.val, grid, epochs=4)
    assert res.timings["compile_cached_buckets"] == 1     # full hit
    assert np.isfinite(res.val_loss_table).all()
    np.testing.assert_allclose(res.predictions.sum(-1), 1.0, atol=1e-4)


def test_program_memo_inflight_dedup():
    """Concurrent compiles of the same program key must happen once: the
    second claimant waits on the first's future (the suite's background
    prefetch can race the foreground sweep on shared shapes, and each
    duplicate remote compile costs 20-500 s)."""
    import threading

    from s2s_ismr_tpu.train.sweep import _ProgramMemo

    memo = _ProgramMemo()
    exe, fut = memo.begin(("k",))
    assert exe is None and fut is None          # first claim owns it
    exe2, fut2 = memo.begin(("k",))
    assert exe2 is None and fut2 is not None    # second waits

    got = []
    t = threading.Thread(target=lambda: got.append(fut2.result(timeout=5)))
    t.start()
    memo.finish(("k",), "compiled")
    t.join(timeout=5)
    assert got == ["compiled"]
    assert memo.get(("k",)) == "compiled"       # published to the memo
    exe3, fut3 = memo.begin(("k",))
    assert exe3 == "compiled" and fut3 is None  # later claims hit

    # a failed compile propagates to waiters and releases the slot
    assert memo.begin(("bad",)) == (None, None)
    _, wf = memo.begin(("bad",))
    memo.finish(("bad",), error=RuntimeError("boom"))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        wf.result(timeout=5)
    assert memo.get(("bad",)) is None           # not published
    assert memo.begin(("bad",)) == (None, None)  # slot reclaimable

    # None keys (model_factory sweeps) bypass the memo entirely
    assert memo.begin(None) == (None, None)
    memo.finish(None, "x")


def test_foreground_compile_priority_depth():
    """The foreground-priority gate is depth-counted: nested holders
    (pipeline ELR stage + sweep compile phase) keep prefetch compiles
    deferred until the LAST holder exits."""
    from s2s_ismr_tpu.train import sweep as sweep_mod

    ev = sweep_mod._fg_compile_idle
    assert ev.is_set()
    with sweep_mod.foreground_compile_priority():
        assert not ev.is_set()
        with sweep_mod.foreground_compile_priority():
            assert not ev.is_set()
        assert not ev.is_set()        # inner exit: outer still holds
    assert ev.is_set()
    # exceptions release the hold
    try:
        with sweep_mod.foreground_compile_priority():
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert ev.is_set()
