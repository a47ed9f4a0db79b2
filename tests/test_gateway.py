"""Gateway tests against a fake IRIDL cache (no network in CI — the
synthetic-netcdf backend the reference never had, SURVEY.md section 4)."""

import os

import numpy as np
import pandas as pd
import pytest
from scipy.io import netcdf_file

from s2s_ismr_tpu.data import gateway, iridl


def _write_iridl_nc(path, var="prcp", dims=("S", "M", "Y", "X"),
                    nt=10, nm=4, ny=6, nx=6, t_units="days since 1999-01-01",
                    t_start=1585, missing=None, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    shape = {"S": nt, "T": nt, "M": nm, "Y": ny, "X": nx}
    with netcdf_file(path, "w") as f:
        for d in dims:
            f.createDimension(d, shape[d])
            v = f.createVariable(d, np.float64, (d,))
            if d in ("S", "T"):
                v[:] = t_start + np.arange(shape[d]) * 7.0
                v.units = t_units
            elif d == "M":
                v[:] = np.arange(1, shape[d] + 1, dtype=float)
            elif d == "Y":
                v[:] = 7.0 + np.arange(ny)
            else:
                v[:] = 67.0 + np.arange(nx)
        dv = f.createVariable(var, np.float32, dims)
        data = rng.gamma(2, 2, size=tuple(shape[d] for d in dims)) \
            .astype(np.float32)
        if missing is not None:
            data[..., 0, 0] = missing
            dv.missing_value = np.float32(missing)
        dv[:] = data


def test_cf_time_decoding():
    t = gateway.decode_cf_time([0, 1, 7], "days since 1999-01-01")
    assert t[0] == np.datetime64("1999-01-01", "ns")
    assert (t[2] - t[0]) == np.timedelta64(7, "D")
    t2 = gateway.decode_cf_time([24], "hours since 2000-06-01")
    assert t2[0] == np.datetime64("2000-06-02", "ns")
    with pytest.raises(ValueError):
        gateway.decode_cf_time([0], "fortnights since 2000-01-01")


def test_open_netcdf_missing_value(tmp_path):
    p = tmp_path / "download" / "GEFS_IMD" / "m.nc"
    _write_iridl_nc(str(p), missing=-999.0)
    da = gateway.open_netcdf_da(str(p))
    assert np.isnan(da.values[..., 0, 0]).all()
    assert da.dims == ("S", "M", "Y", "X")


def test_get_data_gefs_cached(tmp_path):
    cache = str(tmp_path / "download")
    years = (2003, 2018)
    _write_iridl_nc(os.path.join(cache, "GEFS_IMD",
                                 f"GEFS_wk2_{years[0]}-{years[1]}.nc"))
    _write_iridl_nc(os.path.join(cache, "GEFS_IMD",
                                 f"GEFS_IMD_wk2_{years[0]}-{years[1]}.nc"),
                    dims=("T", "Y", "X"),
                    t_start=1585 + 12, seed=1)   # T = S + 12 (wk2 midpoint)
    x, y = gateway.get_data(years=years, download=False, week="wk2",
                            model="GEFS", obs="IMD", domain=(67, 98, 7, 38),
                            season="May-Sep", cache_dir=cache,
                            log=lambda *a: None)
    assert x.dims == ("T", "M", "Y", "X")
    assert y.dims == ("T", "Y", "X")
    # mid-lead stamping: wk2 = (9,15) -> +12 days
    np.testing.assert_array_equal(x.coords["T"], y.coords["T"])
    b = gateway.to_bundle(x, y, "GEFS_IMD")
    assert b.x.shape == (10, 4, 6, 6)


def test_get_data_iitm_concatenates_members(tmp_path):
    cache = str(tmp_path / "download")
    years = (2003, 2018)
    for k in iridl.IITM_MEMBERS:
        _write_iridl_nc(os.path.join(cache, "IITM_IMD",
                                     f"{k}_wk3-4_{years[0]}-{years[1]}.nc"),
                        nm=4, t_units="days since 1960-01-01", t_start=16000,
                        seed=hash(k) % 100)
    _write_iridl_nc(os.path.join(cache, "IITM_IMD",
                                 f"IITM_IMD_wk3-4_{years[0]}-{years[1]}.nc"),
                    dims=("T", "Y", "X"), t_units="days since 1960-01-01",
                    t_start=16000 + 22, seed=7)   # +22 = (16+29)/2 rounded
    x, y = gateway.get_data(years=years, download=False, week="wk3-4",
                            model="IITM", obs="IMD", domain=(67, 98, 7, 38),
                            season="May-Sep", cache_dir=cache,
                            log=lambda *a: None)
    assert x.shape[1] == 24          # 6 sub-models x 4 members


def test_get_data_ecmwf_control_member(tmp_path):
    cache = str(tmp_path / "download")
    years = (2003, 2018)
    _write_iridl_nc(os.path.join(
        cache, "ECMWF_IMD", f"ECMWF_perturbed_wk3-4_{years[0]}-{years[1]}.nc"),
        dims=("T", "M", "Y", "X"), nm=10, t_units="days since 1960-01-01",
        t_start=16000)
    _write_iridl_nc(os.path.join(
        cache, "ECMWF_IMD", f"ECMWF_control_wk3-4_{years[0]}-{years[1]}.nc"),
        dims=("T", "Y", "X"), t_units="days since 1960-01-01", t_start=16000)
    _write_iridl_nc(os.path.join(
        cache, "ECMWF_IMD", f"ECMWF_IMD_wk3-4_{years[0]}-{years[1]}.nc"),
        dims=("T", "Y", "X"), t_units="days since 1960-01-01", t_start=16000)
    x, y = gateway.get_data(years=years, download=False, week="wk3-4",
                            model="ECMWF", obs="IMD", domain=(67, 98, 7, 38),
                            season="May-Sep", cache_dir=cache,
                            log=lambda *a: None)
    assert x.shape[1] == 11
    assert x.coords["M"][-1] == 11.0   # control tagged M=11


def test_get_data_time_mismatch_raises(tmp_path):
    cache = str(tmp_path / "download")
    years = (2003, 2018)
    _write_iridl_nc(os.path.join(cache, "GEFS_IMD",
                                 f"GEFS_wk2_{years[0]}-{years[1]}.nc"))
    _write_iridl_nc(os.path.join(cache, "GEFS_IMD",
                                 f"GEFS_IMD_wk2_{years[0]}-{years[1]}.nc"),
                    dims=("T", "Y", "X"), t_start=999)
    with pytest.raises(AssertionError):
        gateway.get_data(years=years, download=False, week="wk2",
                         model="GEFS", obs="IMD", domain=(67, 98, 7, 38),
                         season="May-Sep", cache_dir=cache,
                         log=lambda *a: None)


def test_missing_cache_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        gateway.get_data(years=(2003, 2018), download=False, week="wk2",
                         model="GEFS", obs="IMD", domain=(67, 98, 7, 38),
                         season="May-Sep", cache_dir=str(tmp_path),
                         log=lambda *a: None)


def test_url_construction_sanity():
    url = iridl.hindcast_url("GEFS", (2003, 2018), (9, 15), "May-Sep",
                             (67, 98, 7, 38), regrid=1)
    assert url.startswith("https://iridl.ldeo.columbia.edu/SOURCES/.Models")
    assert "X/-180/1/179/GRID" in url          # regrid fragment
    assert "L/9/15/RANGEEDGES" in url
    assert url.endswith("data.nc")
    url2 = iridl.hindcast_url("ECMWF_perturbed", (2003, 2018), (16, 30),
                              "May-Sep", (67, 98, 7, 38))
    assert "reforecast" in url2 and "hdate/(2003)/(2018)/RANGE" in url2
    # reference operator order (dataloader.py:35): weekly S subsample
    # BEFORE the season S VALUES, differences AFTER (ECMWF starts are
    # twice-weekly; omitting S/7/STEP doubles the sample)
    assert ("L/16/30/VALUES/S/7/STEP/S/(May-Sep%202023)/VALUES/"
            "%5BL%5Ddifferences" in url2)
    purl2 = iridl.predictand_url("ECMWF_perturbed", "IMD", (2003, 2018),
                                 (16, 30), "May-Sep", (67, 98, 7, 38))
    assert "S/7/STEP/" in purl2
    purl = iridl.predictand_url("GEFS", "IMD", (2003, 2018), (9, 15),
                                "May-Sep", (67, 98, 7, 38), regrid=1)
    assert "regridLinear" in purl and "runningAverage" in purl \
        and "SAMPLE" in purl
    with pytest.raises(ValueError):
        iridl.hindcast_url("NOPE", (2003, 2018), (9, 15), "May-Sep",
                           (67, 98, 7, 38))
    with pytest.raises(ValueError):
        iridl.predictand_url("GEFS", "NOPE", (2003, 2018), (9, 15),
                             "May-Sep", (67, 98, 7, 38))


def test_forecast_url_ecmwf_cycle_cutover():
    u1 = iridl.forecast_url("ECMWF", 1, "Jun", 2023, (16, 29), (67, 98, 7, 38))
    u2 = iridl.forecast_url("ECMWF", 28, "Jun", 2023, (16, 29), (67, 98, 7, 38))
    assert "CY41-47" in u1 and "CY48" in u2    # dataloader.py:373-379
    # the cutover is a date: any 2024+ fetch is CY48 even in spring
    # (the reference compares month/day only — written for 2023)
    u4 = iridl.forecast_url("ECMWF", 1, "May", 2024, (16, 29), (67, 98, 7, 38))
    assert "CY48" in u4
    # realtime ECMWF keeps differences+convert inline (dataloader.py:356)
    assert "differences" in u2 and "unitconvert" in u2
    u3 = iridl.forecast_url("GEFS", 1, "Jul", 2023, (2, 8), (67, 98, 7, 38))
    assert "86400/mul" in u3                   # GEFS m/s -> mm/day scale


def test_gefs_climatology_url_and_matching():
    """dc0018 external-climatology path (ACCs.ipynb cells 28/38)."""
    import numpy as np
    from s2s_ismr_tpu.data import gateway, iridl

    url = iridl.gefs_climatology_url((67, 98, 7, 38))
    assert ".dc0018/.pr" in url and "Y/7/38/RANGE" in url \
        and "X/67/98/RANGE" in url

    # per-sample matching: climatology entries every ~7 days of 2000
    s_dates = np.array([f"2000-06-{d:02d}" for d in (1, 8, 15, 22, 29)],
                       dtype="datetime64[D]")
    clim = np.arange(5, dtype=np.float32)[:, None, None] * np.ones(
        (5, 2, 2), np.float32)
    # sample with T = S + 23 days, S = 2018-06-15 -> entry index 2
    t = np.array(["2018-07-08"], dtype="datetime64[D]")
    out = gateway.external_clim_for_times(t, (16, 30), s_dates, clim)
    assert out.shape == (1, 2, 2)
    np.testing.assert_allclose(out[0], 2.0)
