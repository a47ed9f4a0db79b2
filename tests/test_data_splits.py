import numpy as np
import pytest

from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.data.bundle import DataBundle
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.train import splits


@pytest.fixture(scope="module")
def bundle():
    return synthetic.synthetic_hindcast(years=(2003, 2012), seed=1,
                                        domain=Domain(67, 98, 7, 38), step=2.0)


def test_synthetic_shapes_and_conventions(bundle):
    assert bundle.x.shape[0] == bundle.y.shape[0] == len(bundle.t)
    assert bundle.x.shape[1] == synthetic.ENSEMBLE_SIZES["ECMWF"]
    assert bundle.x.shape[2:] == bundle.y.shape[1:] == (16, 16)
    # ocean mask present and static
    nanmask = np.isnan(bundle.y)
    assert nanmask.any() and (nanmask == nanmask[0]).all()
    # no NaNs in predictors
    assert not np.isnan(bundle.x).any()
    # weekly cadence, target season
    # T = S + mean lead shifts the last September inits into October weeks
    assert set(np.unique(bundle.weeks)) <= set(range(18, 45))


def test_synthetic_signal_is_learnable(bundle):
    """Ensemble mean should correlate with obs where obs are valid."""
    xm = bundle.ensemble_mean()
    ok = bundle.valid_pixels()
    a = xm[:, ok].ravel()
    b = bundle.y[:, ok].ravel()
    r = np.corrcoef(np.log(a + 1e-3), np.log(b + 1e-3))[0, 1]
    assert r > 0.3, f"synthetic signal too weak: r={r}"


def test_bundle_pad_and_fill(bundle):
    # 16x16 divisible by 8 already
    assert bundle.pad_to_grid(3) is bundle
    padded = bundle.pad_to_grid(5)  # needs 32 multiple
    assert padded.x.shape[2:] == (32, 32)
    assert np.isnan(padded.y[:, 16:]).all()
    assert (padded.x[:, :, 16:] == 0).all()
    filled = bundle.fillna(0.0)
    assert not np.isnan(filled.y).any()


def test_bundle_validation():
    with pytest.raises(ValueError):
        DataBundle(x=np.zeros((3, 2, 4, 4)), y=np.zeros((2, 4, 4)),
                   t=np.array(["2003-01-01", "2003-01-08"], dtype="datetime64[ns]"),
                   lats=np.arange(4), lons=np.arange(4))


def _reference_nn_partition(unique_years, i, frac_valid=0.2, frac_test=0.1):
    """Independent re-derivation of preprocessing.py:359-371."""
    np.random.seed(i)
    shuffled = np.random.permutation(unique_years)
    n = len(shuffled)
    nv, nt = int(frac_valid * n), int(frac_test * n)
    return (set(shuffled[nv + nt:]), set(shuffled[:nv]), set(shuffled[nv:nv + nt]))


def test_nn_split_seed_parity(bundle):
    fm = splits.bootstrap_masks(bundle.years, n_bootstraps=10)
    uniq = np.unique(bundle.years)
    for i in range(10):
        tr, va, te = _reference_nn_partition(uniq, i)
        assert fm.train_years[i] == tr
        assert fm.val_years[i] == va
        assert fm.test_years[i] == te
        # masks consistent with year sets and disjoint/complete
        yrs = bundle.years
        np.testing.assert_array_equal(fm.train[i], np.isin(yrs, list(tr)))
        assert not (fm.train[i] & fm.val[i]).any()
        assert not (fm.train[i] & fm.test[i]).any()
        assert (fm.train[i] | fm.val[i] | fm.test[i]).all()


def test_elr_split_seed_parity(bundle):
    fm = splits.bootstrap_masks_elr(bundle.years, n_bootstraps=10, frac_test=0.3)
    uniq = np.unique(bundle.years)
    for i in range(10):
        np.random.seed(i)
        shuffled = np.random.permutation(uniq)
        n_test = int(len(shuffled) * 0.3)
        assert fm.train_years[i] == set(shuffled[:-n_test].tolist())
        assert fm.test_years[i] == set(shuffled[-n_test:].tolist())
        assert (fm.train[i] | fm.test[i]).all()
        assert not (fm.train[i] & fm.test[i]).any()


def test_mme_ensemble_shares_truth():
    xs, ys = synthetic.synthetic_ensemble(models=("GEFS", "ECMWF"), seed=3,
                                          years=(2003, 2006), step=2.0)
    a, b = xs["GEFS"], xs["ECMWF"]
    np.testing.assert_array_equal(a.y, b.y)          # shared obs
    assert a.t is not None and (a.t == b.t).all()    # aligned T
    assert not np.allclose(a.x[:, 0], b.x[:, 0])     # different forecasts
    assert a.n_m == synthetic.ENSEMBLE_SIZES["GEFS"]
    assert b.n_m == synthetic.ENSEMBLE_SIZES["ECMWF"]


def test_predictor_modes(bundle):
    """mean / multi_predictor / stacked tensor modes
    (preprocessing.py:21-49)."""
    m, t_n = bundle.n_m, bundle.n_t
    mp = bundle.multi_predictor()
    assert mp.shape == (t_n, 16, 16, m)
    np.testing.assert_array_equal(mp[:, :, :, 2], bundle.x[:, 2])

    st = bundle.stacked()
    assert st.x.shape == (m * t_n, 1, 16, 16)
    assert st.y.shape == (m * t_n, 16, 16)
    # member-major stack order: block k is member k at all times
    np.testing.assert_array_equal(st.x[t_n:2 * t_n, 0], bundle.x[:, 1])
    np.testing.assert_array_equal(st.y[:t_n], bundle.y)
    np.testing.assert_array_equal(st.weeks[:t_n], bundle.weeks)
    np.testing.assert_array_equal(st.years[t_n:2 * t_n], bundle.years)

    assert bundle.predictor_images("mean").shape == (t_n, 16, 16, 1)
    assert bundle.predictor_images("multi_predictor").shape == (t_n, 16, 16, m)
    assert st.predictor_images("stacked").shape == (m * t_n, 16, 16, 1)
    with pytest.raises(ValueError):
        bundle.predictor_images("nope")


def test_stacked_split_masks_select_whole_years(bundle):
    st = bundle.stacked()
    fm = splits.bootstrap_masks(st.years, n_bootstraps=2)
    fm0 = splits.bootstrap_masks(bundle.years, n_bootstraps=2)
    # same year partition as the unstacked split, tiled M times
    np.testing.assert_array_equal(fm.train[0],
                                  np.tile(fm0.train[0], bundle.n_m))


def test_standardize_formula_and_label_invariance(bundle):
    """bootstrap_splits(standardize=True) semantics (preprocessing.py:
    338-343): per-pixel (v - mean_T)/(std_T + 1e-6). Tercile labels are
    invariant under the per-pixel positive-affine map."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.ops import terciles

    b = bundle
    s = b.standardize()
    # reference formula, skipna mean/std over T (xarray defaults)
    exp_x = (b.x - np.nanmean(b.x, 0)) / (np.nanstd(b.x, 0) + 1e-6)
    exp_y = (b.y - np.nanmean(b.y, 0)) / (np.nanstd(b.y, 0) + 1e-6)
    np.testing.assert_allclose(s.x, exp_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s.y, exp_y, rtol=1e-5, atol=1e-6)

    fm = splits.bootstrap_masks(b.years, n_bootstraps=2)
    wm = timeutils.week_window_matrix(1)
    pm = jnp.asarray(fm.train[0])

    def labels_of(y):
        return np.asarray(terciles.fit_and_label(
            jnp.asarray(y), b.weeks, pm, wm, None)[0])

    l_raw = labels_of(b.y)
    l_std = labels_of(s.y)
    ok = np.isfinite(l_raw) & np.isfinite(l_std)
    assert ok.any()
    np.testing.assert_array_equal(l_raw[ok], l_std[ok])


def test_standardize_external_stats(bundle):
    """standardize(stats=...) applies an externally-fit transform (the
    operational realtime path transforms dated forecasts with HINDCAST
    stats); with the bundle's own stats it must equal standardize()."""
    b = bundle
    stats = b.standardize_stats()
    np.testing.assert_array_equal(b.standardize(stats=stats).x,
                                  b.standardize().x)
    # applying hindcast stats to a different bundle: exact affine map
    import dataclasses
    other = dataclasses.replace(b, x=b.x * 2.0 + 1.0, y=b.y + 3.0)
    s = other.standardize(stats=stats)
    xm, xs, ym, ys = stats
    np.testing.assert_allclose(s.x, (other.x - xm) / xs, rtol=1e-6)
    np.testing.assert_allclose(s.y, (other.y - ym) / ys, rtol=1e-6)


def test_pipeline_standardize_flag(tmp_path):
    """run_pipeline(standardize=True) standardizes before both branches and
    still yields finite skill tensors."""
    import dataclasses
    from s2s_ismr_tpu.pipelines import get_config
    from s2s_ismr_tpu.pipelines.tune import run_pipeline

    cfg = dataclasses.replace(get_config("tune_ECMWF_com").fast_variant(),
                              years=(2003, 2012), epochs=2, standardize=True)
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, save_outputs=False,
                       log=lambda *a: None)
    assert np.isfinite(out.nn.rpss_test.values).any()
    assert np.isfinite(out.elr.rpss_test.values).any()


def test_native_grid_synthetic_shapes():
    """regrid=None configs generate their reference native-grid workload
    shapes from synthetic_grid (ECMWF full 23->24x24 with lat 40.5 pad,
    tune_ECMWF_full.py:50-57; IITM full 64x64; GEFS full 32x32) — a plain
    1-deg default produced indivisible grids that aborted the sweep."""
    from s2s_ismr_tpu.pipelines import get_config
    from s2s_ismr_tpu.pipelines.tune import load_bundles, _apply_pad

    want = {"tune_ECMWF_full": ((23, 24), (24, 24)),
            "tune_GEFS_full": ((32, 32), (32, 32)),
            "tune_IITM_full": ((64, 64), (64, 64))}
    for name, (raw, padded) in want.items():
        cfg = get_config(name)
        b = load_bundles(cfg, "synthetic")[cfg.models[0]]
        assert b.x.shape[2:] == raw, name
        b2 = _apply_pad(cfg, b)
        assert b2.x.shape[2:] == padded, name
        d = 2 ** max(cfg.tuning.n_blocks)
        assert b2.x.shape[2] % d == 0 and b2.x.shape[3] % d == 0, name
    # ECMWF pad appends the synthetic 40.5 lat row
    cfg = get_config("tune_ECMWF_full")
    b2 = _apply_pad(cfg, load_bundles(cfg, "synthetic")["ECMWF"])
    assert b2.lats[-1] == 40.5
    # an explicit step (smoke runs) still overrides the native grid
    b3 = load_bundles(cfg, "synthetic", synthetic_step=2.0)["ECMWF"]
    assert b3.x.shape[2:] != (23, 24)


def test_smooth2d_matches_stacked_mean():
    """The in-place accumulating box smoother must stay bit-identical to
    the k-way stacked-mean formulation it replaced (numpy's add.reduce
    is sequential for k <= 8, so the summation order matches exactly)."""
    from s2s_ismr_tpu.data.synthetic import _smooth2d

    def stacked(a, k):
        for axis in (-2, -1):
            pad = [(0, 0)] * a.ndim
            pad[axis] = (k // 2, k // 2)
            ap = np.pad(a, pad, mode="edge")
            a = np.mean(
                np.stack([np.take(ap, range(i, i + a.shape[axis]),
                                  axis=axis) for i in range(k)], 0), 0)
        return a

    rng = np.random.default_rng(7)
    for k in (3, 5, 7):
        for shape in ((9, 11), (4, 9, 11), (2, 3, 8, 8)):
            x = rng.normal(size=shape)
            np.testing.assert_array_equal(_smooth2d(x.copy(), k),
                                          stacked(x.copy(), k))
