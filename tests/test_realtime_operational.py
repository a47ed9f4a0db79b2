"""Operational realtime pipeline test over a fake IRIDL transport:
download_forecast + get_obs (cached files, no network) -> winner predict
-> probs/GradCAM/RPSS netcdfs — the composed flow of the reference's
missing Realtime_fcast_MME.ipynb (README.md:22, dataloader.py:338-495)."""

import os

import numpy as np
import pytest
from scipy.io import netcdf_file

import jax

from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.models import UNet, UNetConfig
from s2s_ismr_tpu.pipelines.configs import PipelineConfig
from s2s_ismr_tpu.pipelines.realtime import (fetch_realtime_set,
                                             run_realtime_forecast)
from s2s_ismr_tpu.train import checkpoint
from s2s_ismr_tpu.train.sweep import SweepResult, Trial, TuningGrid

LATS = 7.0 + 2.0 * np.arange(16)
LONS = 67.0 + 2.0 * np.arange(16)
EPOCH = np.datetime64("1999-01-01")


def _days(date_str):
    return float((np.datetime64(date_str) - EPOCH) / np.timedelta64(1, "D"))


def _fc_name(day, mon_name, year=2023, key="GEFS", lead=(16, 29)):
    """gateway.download_forecast cache naming (key + lead disambiguated,
    unlike the reference's forecast_{d}_{m}_{y}.nc)."""
    return f"forecast_{key}_{day}_{mon_name}_{year}_ld{lead[0]}-{lead[1]}.nc"


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


@pytest.fixture(scope="module")
def rt_setup(tmp_path_factory):
    """Fake transport cache (2 dated forecasts + verifying obs) and a
    persisted winner checkpoint matching the config's grid."""
    root = tmp_path_factory.mktemp("rt")
    cfg = PipelineConfig(name="rt_test", models=("GEFS",), obs="IMD",
                         domain=Domain(67, 98, 7, 38), years=(2003, 2012),
                         week="wk3-4", out_dir="Realtime Test/",
                         tuning=TuningGrid(), n_bootstraps=2, epochs=2)

    rng = np.random.default_rng(0)
    fdir = os.path.join(str(root), "cache", cfg.out_dir, "GEFS_IMD")
    # dated forecasts: single S each, 4 members
    for date, mon_name, day in [("2023-06-15", "Jun", 15),
                                ("2023-06-22", "Jun", 22)]:
        _write_nc(os.path.join(fdir, _fc_name(day, mon_name)),
                  "prcp", ("S", "M", "Y", "X"),
                  {"S": np.array([_days(date)]),
                   "M": np.arange(1.0, 5.0), "Y": LATS, "X": LONS},
                  rng.gamma(2, 2, size=(1, 4, 16, 16)))
    # verifying obs at the mid-lead valid times (wk3-4 -> S + 22 days)
    # plus an unrelated extra time
    t_obs = np.array([_days("2023-07-07"), _days("2023-07-14"),
                      _days("2023-07-21")])
    _write_nc(os.path.join(fdir, "IMD_wk3-4.nc"), "prcp", ("T", "Y", "X"),
              {"T": t_obs, "Y": LATS, "X": LONS},
              rng.gamma(2, 2, size=(3, 16, 16)))

    # a persisted tuned winner (fresh init weights are fine: the pipeline
    # contract under test is compose+predict+score, not skill)
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
    mdir = os.path.join(str(root), "models", cfg.out_dir, "GEFS_IMD",
                        cfg.week)
    checkpoint.save_sweep_winners(res, mdir, cfg.week,
                                  input_shape=(1, 16, 16, 1))
    return root, cfg


def test_fetch_realtime_set_matches_obs(rt_setup):
    root, cfg = rt_setup
    b = fetch_realtime_set(cfg, ["2023-06-15", "2023-06-22"],
                           download=False,
                           cache_dir=os.path.join(str(root), "cache"),
                           log=lambda *a: None)
    assert b.x.shape == (2, 4, 16, 16)
    assert b.y.shape == (2, 16, 16)
    # both valid times found verifying obs
    assert np.isfinite(b.y).all()
    # valid times = init + 22 days (wk3-4 mid-lead)
    assert str(b.t[0])[:10] == "2023-07-07"
    assert str(b.t[1])[:10] == "2023-07-14"


def test_fetch_realtime_future_unverified(rt_setup):
    """A forecast whose valid time has no obs yet keeps NaN y (a true
    operational future forecast is still predictable)."""
    root, cfg = rt_setup
    rng = np.random.default_rng(5)
    fdir = os.path.join(str(root), "cache", cfg.out_dir, "GEFS_IMD")
    _write_nc(os.path.join(fdir, _fc_name(15, "Aug")),
              "prcp", ("S", "M", "Y", "X"),
              {"S": np.array([_days("2023-08-15")]),
               "M": np.arange(1.0, 5.0), "Y": LATS, "X": LONS},
              rng.gamma(2, 2, size=(1, 4, 16, 16)))
    b = fetch_realtime_set(cfg, ["2023-06-15", "2023-08-15"],
                           download=False,
                           cache_dir=os.path.join(str(root), "cache"),
                           log=lambda *a: None)
    assert np.isfinite(b.y[0]).all()
    assert np.isnan(b.y[1]).all()        # valid 09-06: no obs within 1d


@pytest.mark.slow
def test_run_realtime_forecast_end_to_end(rt_setup):
    root, cfg = rt_setup
    res, paths = run_realtime_forecast(
        cfg, ["2023-06-15", "2023-06-22"], out_root=str(root),
        download=False, cache_dir=os.path.join(str(root), "cache"),
        hindcast_source="synthetic", synthetic_step=2.0,
        log=lambda *a: None)
    assert res.probs.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(res.probs.sum(-1), 1.0, atol=1e-5)
    assert res.gradcam_maps.shape == (2, 16, 16)
    assert res.rpss_map is not None and res.rpss_map.shape == (16, 16)
    for key in ("probs", "gradcam", "rpss"):
        assert os.path.exists(paths[key]), key
    # netcdf round-trip of the forecast probabilities
    from s2s_ismr_tpu.data.gateway import open_netcdf_da
    da = open_netcdf_da(paths["probs"], var_names=("p_above",))
    np.testing.assert_allclose(da.values, res.probs[..., 2], atol=1e-6)


def test_run_realtime_forecast_rejects_stacked(rt_setup):
    root, cfg = rt_setup
    from dataclasses import replace
    with pytest.raises(ValueError, match="stacked"):
        run_realtime_forecast(replace(cfg, predictor="stacked"),
                              ["2023-06-15"], out_root=str(root),
                              download=False, log=lambda *a: None)
    with pytest.raises(ValueError, match="deterministic"):
        run_realtime_forecast(replace(cfg, output="deterministic"),
                              ["2023-06-15"], out_root=str(root),
                              download=False, log=lambda *a: None)


@pytest.mark.slow
def test_unverified_dates_do_not_score(rt_setup):
    """A mixed verified/unverified date set: the unverified row's labels
    must be NaN (not a fabricated 'normal' — label_terciles maps NaN obs
    with finite land edges to category 1), and RPS/RPSS must average only
    the verified rows."""
    root, cfg = rt_setup
    rng = np.random.default_rng(5)
    fdir = os.path.join(str(root), "cache", cfg.out_dir, "GEFS_IMD")
    _write_nc(os.path.join(fdir, _fc_name(15, "Aug")),
              "prcp", ("S", "M", "Y", "X"),
              {"S": np.array([_days("2023-08-15")]),
               "M": np.arange(1.0, 5.0), "Y": LATS, "X": LONS},
              rng.gamma(2, 2, size=(1, 4, 16, 16)))
    res, _ = run_realtime_forecast(
        cfg, ["2023-06-15", "2023-08-15"], out_root=str(root),
        download=False, cache_dir=os.path.join(str(root), "cache"),
        hindcast_source="synthetic", synthetic_step=2.0,
        log=lambda *a: None)
    assert np.isfinite(res.labels[0]).any()   # verified row labels land
    assert np.isnan(res.labels[1]).all()      # unverified row: all NaN
    # scores equal a verified-only run (masking, not dilution)
    solo, _ = run_realtime_forecast(
        cfg, ["2023-06-15"], out_root=str(root),
        download=False, cache_dir=os.path.join(str(root), "cache"),
        hindcast_source="synthetic", synthetic_step=2.0,
        log=lambda *a: None)
    # same land/ocean footprint as the solo run's labels (ocean pixels
    # have no tercile edges and stay NaN in both)
    np.testing.assert_array_equal(np.isfinite(res.labels[0]),
                                  np.isfinite(solo.labels[0]))
    np.testing.assert_allclose(res.rps_map, solo.rps_map, atol=1e-6)


def test_fingerprint_mismatch_fails_before_fetch(rt_setup, tmp_path):
    """Winners tuned under a different input/output contract are rejected
    up front (before any download), mirroring the load-replay check."""
    root, cfg = rt_setup
    import json
    src = os.path.join(str(root), "models", cfg.out_dir, "GEFS_IMD",
                       cfg.week)
    dst = os.path.join(str(tmp_path), "models", cfg.out_dir, "GEFS_IMD",
                       cfg.week)
    os.makedirs(dst)
    with open(os.path.join(src, f"winners_{cfg.week}.json")) as f:
        manifest = json.load(f)
    for e in manifest:
        e["fingerprint"] = {"predictor": "multi_predictor",
                            "output": "proba"}
    with open(os.path.join(dst, f"winners_{cfg.week}.json"), "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="predictor"):
        run_realtime_forecast(cfg, ["2023-06-15"], out_root=str(tmp_path),
                              download=False, log=lambda *a: None)
    # standardize is part of the contract too: a winner trained on
    # z-scored inputs must not silently receive mm/day-scale images
    for e in manifest:
        e["fingerprint"] = {"predictor": "mean", "output": "proba",
                            "standardize": True}
    with open(os.path.join(dst, f"winners_{cfg.week}.json"), "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="standardize"):
        run_realtime_forecast(cfg, ["2023-06-15"], out_root=str(tmp_path),
                              download=False, log=lambda *a: None)


def test_obs_match_requires_same_stamp(rt_setup, tmp_path):
    """The obs URL samples the obs dataset's own T grid, so a verifying
    stamp coincides with the forecast valid time when the window is
    observed; a stamp 3 days off (e.g. the record's newest obs near a
    future forecast) must NOT verify it (it covers a shifted window)."""
    root, cfg = rt_setup
    cache = os.path.join(str(tmp_path), "cache")
    fdir = os.path.join(cache, cfg.out_dir, "GEFS_IMD")
    rng = np.random.default_rng(9)
    _write_nc(os.path.join(fdir, _fc_name(15, "Jun")),
              "prcp", ("S", "M", "Y", "X"),
              {"S": np.array([_days("2023-06-15")]),
               "M": np.arange(1.0, 5.0), "Y": LATS, "X": LONS},
              rng.gamma(2, 2, size=(1, 4, 16, 16)))
    # valid time is 2023-07-07; the only obs stamp is 3 days earlier
    _write_nc(os.path.join(fdir, "IMD_wk3-4.nc"), "prcp", ("T", "Y", "X"),
              {"T": np.array([_days("2023-07-04")]), "Y": LATS, "X": LONS},
              rng.gamma(2, 2, size=(1, 16, 16)))
    b = fetch_realtime_set(cfg, ["2023-06-15"], download=False,
                           cache_dir=cache, log=lambda *a: None)
    assert np.isnan(b.y).all()


def test_realtime_eval_applies_grid_pad(rt_setup):
    """Winners from pad configs (tune_ECMWF_full's 23->24 Y rows) must be
    replayable by run_realtime_eval: the held-out bundle gets the same
    _apply_pad the tune run trained on (a 15-row grid would otherwise
    crash the stride-2 U-Net whose checkpoint expects 16 rows)."""
    from dataclasses import replace

    from s2s_ismr_tpu.pipelines.realtime import run_realtime_eval
    root, cfg = rt_setup
    cfg_pad = replace(cfg, pad_y_rows=1, pad_lat_value=39.0,
                      synthetic_grid=(15, 16))
    res, paths = run_realtime_eval(cfg_pad, out_root=str(root),
                                   source="synthetic",
                                   log=lambda *a: None)
    assert res.probs.shape[1:] == (16, 16, 3)
    assert os.path.exists(paths["probs"])


@pytest.mark.slow
def test_realtime_standardize_transform(rt_setup):
    """--standardize winners get hindcast-standardized realtime inputs
    (run_pipeline trains on standardized tensors; feeding raw mm/day
    images to such a winner would be silently wrong)."""
    from dataclasses import replace
    root, cfg = rt_setup
    kw = dict(out_root=str(root), download=False,
              cache_dir=os.path.join(str(root), "cache"),
              hindcast_source="synthetic", synthetic_step=2.0,
              log=lambda *a: None)
    raw, _ = run_realtime_forecast(cfg, ["2023-06-15"], **kw)
    std, _ = run_realtime_forecast(replace(cfg, standardize=True),
                                   ["2023-06-15"], **kw)
    # same winner, transformed inputs -> different probabilities
    assert not np.allclose(raw.probs, std.probs)
    np.testing.assert_allclose(std.probs.sum(-1), 1.0, atol=1e-5)
    # labels stay valid terciles (obs transformed consistently with edges)
    assert np.isfinite(std.labels).any()


@pytest.fixture(scope="module")
def rt_mme_setup(tmp_path_factory):
    """Two-model MME fixture: per-model dated forecast caches, a shared
    obs series, and a DISTINCT persisted winner per model (the blend must
    actually mix two different networks)."""
    root = tmp_path_factory.mktemp("rtmme")
    cfg = PipelineConfig(name="rt_mme_test", models=("GEFS", "ECMWF"),
                         obs="IMD", domain=Domain(67, 98, 7, 38),
                         years=(2003, 2012), week="wk3-4",
                         out_dir="Realtime MME Test/",
                         tuning=TuningGrid(), n_bootstraps=2, epochs=2)
    rng = np.random.default_rng(1)
    for model in cfg.models:
        fdir = os.path.join(str(root), "cache", cfg.out_dir,
                            f"{model}_IMD")
        _write_nc(os.path.join(fdir, _fc_name(15, "Jun", key=model)),
                  "prcp", ("S", "M", "Y", "X"),
                  {"S": np.array([_days("2023-06-15")]),
                   "M": np.arange(1.0, 5.0), "Y": LATS, "X": LONS},
                  rng.gamma(2, 2, size=(1, 4, 16, 16)))
        _write_nc(os.path.join(fdir, "IMD_wk3-4.nc"), "prcp",
                  ("T", "Y", "X"),
                  {"T": np.array([_days("2023-07-07")]),
                   "Y": LATS, "X": LONS},
                  rng.gamma(2, 2, size=(1, 16, 16)))
        ucfg = UNetConfig(filters=1, n_blocks=2)
        m = UNet(ucfg)
        variables = m.init(
            jax.random.key({"GEFS": 11, "ECMWF": 23}[model]),
            np.zeros((1, 16, 16, 1), np.float32), train=False)
        res = SweepResult(best_val_loss=np.array([0.9, 1.0]),
                          best_trial=[Trial(0, 16, 1e-3, (3, 3), 1, 2)] * 2,
                          predictions=np.zeros((2, 2, 16, 16, 3)),
                          val_loss_table=np.array([[0.9], [1.0]]),
                          winner_variables=[variables, variables],
                          winner_configs=[ucfg, ucfg])
        mdir = os.path.join(str(root), "models", cfg.out_dir,
                            f"{model}_IMD", cfg.week)
        checkpoint.save_sweep_winners(res, mdir, cfg.week,
                                      input_shape=(1, 16, 16, 1))
    return root, cfg


@pytest.mark.slow
def test_run_realtime_forecast_mme_blend(rt_mme_setup):
    """MME operational realtime: per-model winner predictions blended
    with renormalization (training.py:344-350), outputs under the
    joined-models directory."""
    root, cfg = rt_mme_setup
    res, paths = run_realtime_forecast(
        cfg, ["2023-06-15"], out_root=str(root),
        download=False, cache_dir=os.path.join(str(root), "cache"),
        hindcast_source="synthetic", synthetic_step=2.0,
        log=lambda *a: None)
    assert res.probs.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(res.probs.sum(-1), 1.0, atol=1e-5)
    assert "GEFS_ECMWF_IMD" in paths["probs"]
    # the blend equals renormalize(mean(per-model winner predictions))
    from s2s_ismr_tpu.pipelines.realtime import (fetch_realtime_set,
                                                 load_winner_for_realtime)
    per_model = []
    for m in cfg.models:
        b = fetch_realtime_set(cfg, ["2023-06-15"], download=False,
                               cache_dir=os.path.join(str(root), "cache"),
                               log=lambda *a: None, model=m)
        mdir = os.path.join(str(root), "models", cfg.out_dir,
                            f"{m}_IMD", cfg.week)
        net, variables = load_winner_for_realtime(mdir, cfg.week)
        x = b.fillna(0.0).predictor_images("mean")
        per_model.append(np.asarray(net.apply(variables, x, train=False)))
    assert not np.allclose(per_model[0], per_model[1])   # distinct nets
    mean = np.mean(np.stack(per_model), 0)
    np.testing.assert_allclose(res.probs,
                               mean / mean.sum(-1, keepdims=True),
                               atol=1e-6)


def test_run_realtime_eval_mme(rt_mme_setup):
    """Held-out MME eval: blended winner replay over the final hindcast
    year, written under the joined-models directory."""
    from s2s_ismr_tpu.pipelines.realtime import run_realtime_eval
    root, cfg = rt_mme_setup
    res, paths = run_realtime_eval(cfg, out_root=str(root),
                                   source="synthetic", synthetic_step=2.0,
                                   log=lambda *a: None)
    np.testing.assert_allclose(res.probs.sum(-1), 1.0, atol=1e-5)
    assert res.rpss_map is not None
    assert "GEFS_ECMWF_IMD" in paths["probs"]
