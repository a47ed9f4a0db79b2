"""Operational MJO/ENSO index plumbing (README.md:22's diagnostics):
IRIDL RMM/Nino3.4 acquisition through the gateway cache, date sampling,
missing-index semantics, and composite netcdfs reachable from the
realtime drivers over a fake transport."""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

from s2s_ismr_tpu.data import gateway, iridl
from s2s_ismr_tpu.pipelines import realtime

EPOCH = np.datetime64("1999-01-01")


def _days(date_str):
    return float((np.datetime64(date_str) - EPOCH) / np.timedelta64(1, "D"))


def _write_series(path, var, t_days, values):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with netcdf_file(path, "w") as f:
        f.createDimension("T", len(t_days))
        tv = f.createVariable("T", np.float64, ("T",))
        tv[:] = t_days
        tv.units = "days since 1999-01-01"
        dv = f.createVariable(var, np.float32, ("T",))
        dv[:] = np.asarray(values, np.float32)


def _fake_index_cache(cache_dir):
    """Daily RMM over Jun 2023 + monthly Nino3.4 for 2023."""
    t_daily = [_days(f"2023-06-{d:02d}") for d in range(1, 31)]
    rmm1 = np.linspace(-2, 2, 30)
    rmm2 = np.linspace(2, -2, 30)
    _write_series(os.path.join(cache_dir, "indices", "RMM1.nc"),
                  "RMM1", t_daily, rmm1)
    _write_series(os.path.join(cache_dir, "indices", "RMM2.nc"),
                  "RMM2", t_daily, rmm2)
    t_monthly = [_days(f"2023-{m:02d}-16") for m in range(1, 13)]
    nino = np.array([1.2, 0.9, 0.4, 0.1, -0.2, -0.6, -0.8, -0.6, -0.3,
                     0.1, 0.6, 1.1])
    _write_series(os.path.join(cache_dir, "indices", "NINO34.nc"),
                  "NINO34", t_monthly, nino)
    return rmm1, rmm2, nino


def test_index_urls():
    u = iridl.index_url("RMM1")
    assert u.startswith(iridl.BASE + "SOURCES/.BoM/.MJO/.RMM/.RMM1")
    assert u.endswith("data.nc")
    u = iridl.index_url("NINO34", years=(2020, 2024))
    assert "T/(2020)/(2024)/RANGE/" in u
    assert ".Indices/.nino/.EXTENDED/.NINO34" in u
    with pytest.raises(ValueError, match="unknown index"):
        iridl.index_url("PDO")


def test_rmm_sampling_from_cache(tmp_path):
    cache = str(tmp_path)
    rmm1, rmm2, _ = _fake_index_cache(cache)
    rmm = gateway.get_rmm_index(["2023-06-15", "2023-06-22"],
                                download=False, cache_dir=cache,
                                log=lambda *a: None)
    assert rmm.shape == (2, 2)
    np.testing.assert_allclose(rmm[0], [rmm1[14], rmm2[14]], atol=1e-6)
    np.testing.assert_allclose(rmm[1], [rmm1[21], rmm2[21]], atol=1e-6)
    # a date outside the record (beyond max_gap_days) samples NaN
    rmm = gateway.get_rmm_index(["2023-08-15"], download=False,
                                cache_dir=cache, log=lambda *a: None)
    assert np.isnan(rmm).all()


def test_nino34_monthly_sampling(tmp_path):
    cache = str(tmp_path)
    _, _, nino = _fake_index_cache(cache)
    vals = gateway.get_nino34(["2023-06-05", "2023-11-28"],
                              download=False, cache_dir=cache,
                              log=lambda *a: None)
    np.testing.assert_allclose(vals, [nino[5], nino[10]], atol=1e-6)


def test_index_cache_miss_raises_without_download(tmp_path):
    with pytest.raises(FileNotFoundError):
        gateway.get_index_series("RMM1", download=False,
                                 cache_dir=str(tmp_path),
                                 log=lambda *a: None)


def test_mjo_phase_missing_index():
    phase, active = realtime.mjo_phase(np.array([1.5, np.nan]),
                                       np.array([0.0, 1.0]))
    assert phase[0] in range(1, 9) and active[0]
    assert phase[1] == 0 and not active[1]


def test_enso_state_unknown():
    st = realtime.enso_state(np.array([0.9, -0.7, 0.1, np.nan]))
    assert list(st) == ["elnino", "lanina", "neutral", "unknown"]


def test_fetch_indices_degrade_gracefully(tmp_path):
    """A missing index cache yields (None, None) + log lines, never an
    exception — composites are diagnostics, not the forecast product."""
    msgs = []
    rmm, nino = realtime.fetch_indices_for_dates(
        ["2023-06-15"], download=False, cache_dir=str(tmp_path),
        log=msgs.append)
    assert rmm is None and nino is None
    assert any("MJO composites skipped" in m for m in msgs)
    assert any("ENSO composites skipped" in m for m in msgs)


def test_write_composites(tmp_path):
    res = realtime.RealtimeResult(
        probs=np.zeros((2, 4, 4, 3)), labels=None, rps_map=None,
        rpss_map=None, gradcam_maps=None,
        mjo_composites={"3": np.full((4, 4), 0.4),
                        "inactive": np.full((4, 4), 0.3)},
        enso_composites={"elnino": np.full((4, 4), 0.5)})
    coords = {"Y": np.arange(4.0), "X": np.arange(4.0)}
    paths = realtime.write_composites(res, str(tmp_path), coords, "wk3-4")
    assert set(paths) == {"mjo_3", "mjo_inactive", "enso_elnino"}
    da = gateway.open_netcdf_da(paths["enso_elnino"],
                                var_names=("p_above",))
    np.testing.assert_allclose(da.values, 0.5, atol=1e-6)


@pytest.mark.slow
def test_operational_forecast_emits_composites(tmp_path):
    """CLI-path equivalent over a fake transport: run_realtime_forecast
    auto-fetches the (cached) real indices and writes mjo_*/enso_*
    composite netcdfs next to the probs/gradcam/rpss outputs."""
    import jax
    from s2s_ismr_tpu.grid import Domain
    from s2s_ismr_tpu.models import UNet, UNetConfig
    from s2s_ismr_tpu.pipelines.configs import PipelineConfig
    from s2s_ismr_tpu.train import checkpoint
    from s2s_ismr_tpu.train.sweep import SweepResult, Trial, TuningGrid

    root = str(tmp_path)
    cache = os.path.join(root, "cache")
    cfg = PipelineConfig(name="rt_idx", models=("GEFS",), obs="IMD",
                         domain=Domain(67, 98, 7, 38), years=(2003, 2012),
                         week="wk3-4", out_dir="Realtime Idx/",
                         tuning=TuningGrid(), n_bootstraps=2, epochs=2)
    lats = 7.0 + 2.0 * np.arange(16)
    lons = 67.0 + 2.0 * np.arange(16)
    rng = np.random.default_rng(0)
    fdir = os.path.join(cache, cfg.out_dir, "GEFS_IMD")

    def _write_nc(path, var, dims, coords, values):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with netcdf_file(path, "w") as f:
            for d in dims:
                f.createDimension(d, len(coords[d]))
                v = f.createVariable(d, np.float64, (d,))
                v[:] = coords[d]
                if d in ("S", "T"):
                    v.units = "days since 1999-01-01"
            dv = f.createVariable(var, np.float32, dims)
            dv[:] = values.astype(np.float32)

    for date, mon_name, day in [("2023-06-15", "Jun", 15),
                                ("2023-06-22", "Jun", 22)]:
        _write_nc(os.path.join(
            fdir, f"forecast_GEFS_{day}_{mon_name}_2023_ld16-29.nc"),
            "prcp", ("S", "M", "Y", "X"),
            {"S": np.array([_days(date)]), "M": np.arange(1.0, 5.0),
             "Y": lats, "X": lons}, rng.gamma(2, 2, size=(1, 4, 16, 16)))
    _write_nc(os.path.join(fdir, "IMD_wk3-4.nc"), "prcp", ("T", "Y", "X"),
              {"T": np.array([_days("2023-07-07"), _days("2023-07-14")]),
               "Y": lats, "X": lons}, rng.gamma(2, 2, size=(2, 16, 16)))
    _fake_index_cache(cache)

    ucfg = UNetConfig(filters=1, n_blocks=2)
    model = UNet(ucfg)
    variables = model.init(jax.random.key(0),
                           np.zeros((1, 16, 16, 1), np.float32),
                           train=False)
    res = SweepResult(best_val_loss=np.array([0.9, 1.0]),
                      best_trial=[Trial(0, 16, 1e-3, (3, 3), 1, 2)] * 2,
                      predictions=np.zeros((2, 2, 16, 16, 3)),
                      val_loss_table=np.array([[0.9], [1.0]]),
                      winner_variables=[variables, variables],
                      winner_configs=[ucfg, ucfg])
    mdir = os.path.join(root, "models", cfg.out_dir, "GEFS_IMD", cfg.week)
    checkpoint.save_sweep_winners(res, mdir, cfg.week,
                                  input_shape=(1, 16, 16, 1))

    res, paths = realtime.run_realtime_forecast(
        cfg, ["2023-06-15", "2023-06-22"], out_root=root, download=False,
        cache_dir=cache, hindcast_source="synthetic", synthetic_step=2.0,
        log=lambda *a: None)
    assert res.mjo_composites, "MJO composites should exist"
    assert res.enso_composites, "ENSO composites should exist"
    comp_keys = [k for k in paths if k.startswith(("mjo_", "enso_"))]
    assert comp_keys
    assert all(os.path.exists(paths[k]) for k in comp_keys)
    # June 2023 fake Nino3.4 is -0.6 -> lanina group present
    assert "enso_lanina" in paths
