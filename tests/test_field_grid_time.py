import numpy as np
import pandas as pd
import pytest

from s2s_ismr_tpu import field, grid, timeutils


def test_field_basic_ops():
    f = field.Field(np.arange(24, dtype=float).reshape(2, 3, 4),
                    dims=("T", "Y", "X"),
                    coords={"T": [0, 1], "Y": [10, 11, 12]})
    assert f.sizes() == {"T": 2, "Y": 3, "X": 4}
    g = f.transpose("Y", "T", "X")
    assert g.shape == (3, 2, 4)
    m = f.mean("T")
    assert m.dims == ("Y", "X")
    np.testing.assert_allclose(m.values, f.values.mean(0))
    s = f.isel(T=0)
    assert s.dims == ("Y", "X")
    s2 = f.isel(Y=np.array([0, 2]))
    np.testing.assert_array_equal(s2.coords["Y"], [10, 12])


def test_field_nan_ops():
    v = np.array([[1.0, np.nan], [3.0, 4.0]])
    f = field.Field(v, dims=("T", "X"))
    assert f.fillna(0).values[0, 1] == 0
    w = f.where(np.array([[True, True], [False, True]]))
    assert np.isnan(w.values[1, 0])
    m = f.mean("T")
    np.testing.assert_allclose(m.values, [2.0, 4.0])


def test_field_pad_dim_matches_reference_ecmwf_pad():
    # tune_ECMWF_full.py:50-57 pads Y 23->24, new lat 40.5, zeros fill
    f = field.Field(np.ones((2, 23, 24)), dims=("T", "Y", "X"),
                    coords={"Y": np.arange(7.5, 30.5 + 1, 1.0)[:23]})
    p = f.pad_dim("Y", 1, fill=0.0, coord_fill=40.5)
    assert p.shape == (2, 24, 24)
    assert p.values[:, -1].sum() == 0
    assert p.coords["Y"][-1] == 40.5


def test_field_concat_bootstrap_mean():
    fs = [field.Field(np.full((2, 2), i, dtype=float), dims=("Y", "X"))
          for i in range(4)]
    m = field.stack_mean(fs)
    np.testing.assert_allclose(m.values, 1.5)


def test_grid_divisibility_and_padding():
    with pytest.raises(ValueError):
        grid.check_divisible(23, 24, 3)
    g = grid.make_grid(np.arange(7.5, 30.0, 1.0), np.arange(67.0, 91.0, 1.0),
                       n_blocks_max=3, pad_lat_value=40.5)
    assert (g.ny, g.nx) == (23, 24)
    assert (g.padded_ny, g.padded_nx) == (24, 24)
    assert g.padded_lats()[-1] == 40.5
    vm = g.valid_mask()
    assert vm[:23].all() and not vm[23].any()


def test_regular_grid_ecmwf_common():
    # ECMWF common: domain (67,98,7,38) regridded to 1 deg -> 32x32
    lats, lons = grid.regular_grid(grid.Domain(67, 98, 7, 38), 1.0)
    assert len(lats) == 32 and len(lons) == 32


def test_iso_week_matches_pandas():
    t = pd.date_range("2003-01-01", "2004-12-31", freq="7D")
    w = timeutils.iso_week(t.values)
    expected = t.isocalendar().week.to_numpy()
    np.testing.assert_array_equal(w, expected)
    assert w.min() >= 1 and w.max() <= 53


def test_week_window_wraps_like_reference():
    # reference formula: (week + i) % 53 or 53 (preprocessing.py:114)
    assert timeutils.week_window(1) == [53, 1, 2]
    assert timeutils.week_window(53) == [52, 53, 1]
    assert timeutils.week_window(20) == [19, 20, 21]
    # NOTE the reference quirk: week 52's window is [51, 52, 0->53]? no:
    # (52+1) % 53 = 0 -> 'or 53' -> 53, so window = [51, 52, 53]
    assert timeutils.week_window(52) == [51, 52, 53]


def test_week_window_matrix_consistency():
    m = timeutils.week_window_matrix(1)
    for w in (1, 20, 52, 53):
        cols = np.where(m[w - 1])[0] + 1
        assert sorted(timeutils.week_window(w)) == sorted(cols.tolist())


def test_nearest_present_week_matches_pandas_sel():
    """The on-device nearest-week borrow (the production labeler path,
    ops/terciles.py) must match pandas' nearest indexer — what xarray's
    edges.sel(week=w, method='nearest') uses (preprocessing.py:141) —
    including the tie-break toward the larger week."""
    from s2s_ismr_tpu.ops.terciles import nearest_present_week
    present_weeks = np.array([18, 22, 30, 40])
    present = np.zeros(53, bool)
    present[present_weeks - 1] = True
    nearest0 = np.asarray(nearest_present_week(present))  # 0-based
    idx = pd.Index(present_weeks)
    for wk in range(1, 54):
        pos = idx.get_indexer([wk], method="nearest")[0]
        assert nearest0[wk - 1] + 1 == present_weeks[pos], wk


def test_weekly_mondays_season_filter():
    t = timeutils.weekly_mondays((2003, 2004), "May-Sep")
    months = timeutils.month(t)
    assert set(np.unique(months)) <= {5, 6, 7, 8, 9}
    years = timeutils.year(t)
    assert set(np.unique(years)) == {2003, 2004}
    # weekly stride
    dt = np.diff(t).astype("timedelta64[D]").astype(int)
    assert (np.unique(dt) % 7 == 0).all()
