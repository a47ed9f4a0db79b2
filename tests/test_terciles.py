"""Golden tests: on-device rolling tercile labeler vs an independent
numpy/pandas re-derivation of the reference semantics
(/root/reference/utils/preprocessing.py:53-167, 246-333)."""

import numpy as np
import pandas as pd
import pytest

from s2s_ismr_tpu import timeutils
from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.ops import quantiles, terciles


# ---------------------------------------------------------------- reference
def ref_rolling_label(y, t, pool_idx, window=1, degenerate=False):
    """Numpy/pandas transliteration of the reference algorithm: fit weekly
    tercile edges on y[pool_idx], label every sample of y."""
    weeks = pd.DatetimeIndex(t).isocalendar().week.to_numpy().astype(np.int64)
    pool_weeks = weeks[pool_idx]
    uniq = np.unique(pool_weeks)
    edges = {}
    ypool = y[pool_idx]
    for w in uniq:
        win = [(w + i) % 53 or 53 for i in range(-window, window + 1)]
        sel = np.isin(pool_weeks, win)
        sub = ypool[sel]  # (n, Y, X)
        with np.errstate(all="ignore"):
            e = np.nanquantile(sub, [1 / 3, 2 / 3], axis=0) if sub.size else \
                np.full((2,) + y.shape[1:], np.nan)
        edges[w] = e
    idx = pd.Index(uniq)
    out = np.full(y.shape, np.nan, dtype=np.float64)
    for w in np.unique(weeks):
        near = uniq[idx.get_indexer([w], method="nearest")[0]]
        e = edges[near]
        mask = np.isnan(e[0]) | np.isnan(e[1])
        if degenerate:
            mask = mask | (e[0] == 0) | (e[0] == e[1])
        sel = weeks == w
        with np.errstate(invalid="ignore"):
            lab = np.where(y[sel] < e[0], 0.0,
                           np.where(y[sel] > e[1], 2.0, 1.0))
        lab = np.where(mask[None], np.nan, lab)
        out[sel] = lab
    return out


# ------------------------------------------------------------------- fixtures
@pytest.fixture(scope="module")
def bundle():
    return synthetic.synthetic_hindcast(years=(2003, 2012), seed=5,
                                        domain=Domain(67, 98, 7, 38), step=2.0)


# ------------------------------------------------------------------- quantiles
def test_masked_quantile_matches_numpy(rng):
    v = rng.normal(size=(40, 6, 7)).astype(np.float32)
    valid = rng.random((40, 6, 7)) > 0.3
    vv = np.where(valid, v, np.nan)
    with np.errstate(all="ignore"):
        expected = np.nanquantile(vv, [1 / 3, 2 / 3], axis=0)
    got = np.asarray(quantiles.masked_quantile(v, valid, [1 / 3, 2 / 3], axis=0))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_masked_quantile_empty_and_single():
    v = np.array([[1.0, 5.0], [2.0, 7.0], [3.0, 9.0]], np.float32)
    valid = np.array([[False, True], [False, False], [False, False]])
    got = np.asarray(quantiles.masked_quantile(v, valid, [0.5], axis=0))
    assert np.isnan(got[0, 0])          # empty -> NaN
    assert got[0, 1] == 5.0             # single value -> that value


def test_masked_mean():
    v = np.array([1.0, np.nan, 3.0], np.float32)
    assert float(quantiles.masked_mean(v, np.array([True, True, True]))) == 2.0
    assert np.isnan(float(quantiles.masked_mean(v, np.zeros(3, bool))))


# --------------------------------------------------------------------- labeler
def test_labeler_full_pool_matches_reference(bundle):
    y = np.nan_to_num(bundle.y, nan=0.0)  # NN-path fillna(0)
    pool = np.ones(bundle.n_t, bool)
    wm = timeutils.week_window_matrix(1)
    labels, edges, present = terciles.fit_and_label(y, bundle.weeks, pool, wm, None)
    expected = ref_rolling_label(y, bundle.t, pool)
    np.testing.assert_allclose(np.asarray(labels), expected, atol=0, rtol=0)
    # sanity: labels roughly balanced over valid pixels
    lab = np.asarray(labels)
    counts = [np.sum(lab == k) for k in range(3)]
    assert min(counts) > 0.2 * max(counts)


def test_labeler_train_pool_only_and_nearest_borrowing(bundle):
    """Edges fit on a train-year subset; val/test weeks may be absent from
    the pool and must borrow nearest-week edges (ties -> larger week)."""
    years = bundle.years
    pool = np.isin(years, np.unique(years)[:6])       # first 6 years train
    y = np.nan_to_num(bundle.y, nan=0.0)
    wm = timeutils.week_window_matrix(1)
    labels, edges, present = terciles.fit_and_label(y, bundle.weeks, pool, wm, None)
    expected = ref_rolling_label(y, bundle.t, pool)
    np.testing.assert_allclose(np.asarray(labels), expected)


def test_labeler_elr_variant_with_nans(bundle):
    """ELR path: NaNs kept, degenerate edges masked."""
    y = bundle.y.copy()                                # has ocean NaNs
    pool = np.isin(bundle.years, np.unique(bundle.years)[:7])
    wm = timeutils.week_window_matrix(1)
    labels, edges, present = terciles.fit_and_label(
        y, bundle.weeks, pool, wm, None, degenerate_mask=True)
    expected = ref_rolling_label(y, bundle.t, pool, degenerate=True)
    np.testing.assert_allclose(np.asarray(labels), expected)
    # ocean pixels must be NaN-labeled
    ocean = np.isnan(y[0])
    assert np.isnan(np.asarray(labels)[:, ocean]).all()


def test_elr_targets_cumulative(bundle):
    y = bundle.y
    pool = np.ones(bundle.n_t, bool)
    wm = timeutils.week_window_matrix(1)
    edges, present = terciles.rolling_edges(y, bundle.weeks, pool, wm)
    tg = np.asarray(terciles.elr_targets(y, bundle.weeks, edges, present))
    assert tg.shape == (2,) + y.shape
    valid = ~np.isnan(tg[0])
    # cumulative: below33 implies below66
    assert (tg[1][valid] >= tg[0][valid]).all()
    # rough thirds
    assert abs(np.nanmean(tg[0]) - 1 / 3) < 0.08
    assert abs(np.nanmean(tg[1]) - 2 / 3) < 0.08


def test_one_hot_labels_nan_preserving():
    lab = np.array([0.0, 1.0, 2.0, np.nan])
    oh = np.asarray(terciles.one_hot_labels(lab))
    np.testing.assert_array_equal(oh[0], [1, 0, 0])
    np.testing.assert_array_equal(oh[2], [0, 0, 1])
    assert np.isnan(oh[3]).all()


def test_nearest_present_week_tiebreak():
    present = np.zeros(53, bool)
    present[[19, 29]] = True  # weeks 20 and 30 (0-based 19/29)
    near = np.asarray(terciles.nearest_present_week(present))
    assert near[24] == 29     # week 25: tie -> larger (pandas behavior)
    assert near[19] == 19
    assert near[0] == 19      # far below -> smallest present
    assert near[52] == 29


def test_static_terciles_matches_numpy(rng):
    """Static labeler (make_tercile_labeler, preprocessing.py:11-19)."""
    import jax.numpy as jnp
    from s2s_ismr_tpu.ops.terciles import static_terciles
    y = rng.gamma(2, 2, size=(60, 4, 4)).astype(np.float32)
    y[:, 0, 0] = np.nan
    lab, edges = static_terciles(jnp.asarray(y))
    lab, edges = np.asarray(lab), np.asarray(edges)
    q = np.nanquantile(y, [1 / 3, 2 / 3], axis=0)
    np.testing.assert_allclose(edges[:, 1:, 1:], q[:, 1:, 1:],
                               rtol=1e-5, atol=1e-5)
    ref = np.where(y < q[0], 0.0, np.where(y > q[1], 2.0, 1.0))
    ref[np.isnan(y)] = np.nan
    np.testing.assert_array_equal(np.isnan(lab), np.isnan(ref))
    np.testing.assert_allclose(lab[~np.isnan(lab)], ref[~np.isnan(ref)])

    pool = np.zeros(60, bool); pool[:30] = True
    lab2, edges2 = static_terciles(jnp.asarray(y), jnp.asarray(pool))
    q2 = np.nanquantile(y[:30], [1 / 3, 2 / 3], axis=0)
    np.testing.assert_allclose(np.asarray(edges2)[:, 1:, 1:], q2[:, 1:, 1:],
                               rtol=1e-5, atol=1e-5)
