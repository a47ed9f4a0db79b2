import numpy as np
import pytest

from s2s_ismr_tpu.field import Field
from s2s_ismr_tpu.io import read_netcdf, write_netcdf


def test_roundtrip_rpss_style(tmp_path):
    """The outputs/**/unet_rpss_test_wk3-4.nc artifact shape: (bootstrap, Y, X)."""
    rng = np.random.default_rng(0)
    vals = rng.normal(size=(10, 8, 9)).astype(np.float32)
    vals[:, 0, 0] = np.nan
    f = Field(vals, ("bootstrap", "Y", "X"),
              {"Y": np.arange(7.0, 15.0), "X": np.arange(67.0, 76.0)},
              name="rpss")
    p = tmp_path / "out" / "unet_rpss_test_wk3-4.nc"
    write_netcdf(f, str(p))
    g = read_netcdf(str(p))
    assert g.dims == ("bootstrap", "Y", "X")
    np.testing.assert_allclose(g.values, vals, atol=1e-6)
    np.testing.assert_allclose(g.coords["Y"], f.coords["Y"])


def test_roundtrip_time_and_category_coords(tmp_path):
    t = np.array(["2003-05-05", "2003-05-12"], dtype="datetime64[ns]")
    f = Field(np.zeros((2, 3), np.float32), ("T", "category"),
              {"T": t, "category": np.array(["below", "normal", "above"])},
              name="probs")
    p = tmp_path / "probs.nc"
    write_netcdf(f, str(p))
    g = read_netcdf(str(p))
    assert list(g.coords["category"]) == ["below", "normal", "above"]
    np.testing.assert_array_equal(g.coords["T"], t)


def test_read_missing_variable(tmp_path):
    f = Field(np.ones((2, 2)), ("Y", "X"))
    p = tmp_path / "x.nc"
    write_netcdf(f, str(p), var_name="foo")
    g = read_netcdf(str(p), var_name="foo")
    assert g.name == "foo"
    with pytest.raises(KeyError):
        read_netcdf(str(p), var_name="bar")


def test_split_guard_raises_on_empty_splits():
    from s2s_ismr_tpu.train import splits
    years = np.repeat(np.arange(2003, 2011), 20)    # 8 unique years
    with pytest.raises(ValueError):
        splits.bootstrap_masks(years, n_bootstraps=2)  # int(0.1*8)=0 test years
