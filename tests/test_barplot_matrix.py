"""Bar_plot.ipynb full-matrix parity: the cell-5 probe matrix
(Common/Full/MME/2MME x models x wk1/wk2/wk3-4 x ELR/unet), the
MME_IMD/2MME_IMD filesystem contract (tune_MME.py:47,92-93,135-137),
and the figure set of cells 7/9/10/16/19 — all reachable from
`run barplot` with zero hand-written Python."""

import json
import os

import numpy as np
import pytest

from s2s_ismr_tpu import analysis
from s2s_ismr_tpu.field import Field
from s2s_ismr_tpu.io import write_netcdf
from s2s_ismr_tpu.pipelines import notebooks


def _write_rpss(root, period, model, week, archs=("ELR", "unet"), n=6,
                seed=0, obs="IMD", value=None):
    rng = np.random.default_rng(seed)
    coords = {"Y": np.arange(float(n)), "X": np.arange(float(n))}
    for arch in archs:
        v = rng.normal(0.05, 0.1, (2, n, n)).astype(np.float32)
        if value is not None:
            v[:] = value
        if arch == "ELR":
            v[:, 0, 0] = np.nan          # cell-3 masks come from ELR NaNs
        f = Field(v, ("bootstrap", "Y", "X"), coords, "rpss")
        write_netcdf(f, os.path.join(root, "outputs", period,
                                     f"{model}_{obs}",
                                     f"{arch}_rpss_test_{week}.nc"))


def _fake_suite_tree(root):
    """outputs/ tree a full `run suite` produces: 3 single models in both
    periods + MME/2MME blends, wk3-4 (GEFS com also wk2)."""
    for m in ("ECMWF", "IITM", "GEFS"):
        _write_rpss(root, "Common Period", m, "wk3-4")
        _write_rpss(root, "Full Period", m, "wk3-4")
    _write_rpss(root, "Common Period", "GEFS", "wk2")
    _write_rpss(root, "MME", "MME", "wk3-4")
    _write_rpss(root, "2MME", "2MME", "wk3-4")


def test_default_matrix_matches_cell5():
    runs = notebooks.default_barplot_runs()
    periods = {r["period"] for r in runs}
    assert periods == {"Common Period", "Full Period", "MME", "2MME"}
    # Full period has no MME mask (notebook KeyError -> skip)
    assert not [r for r in runs if r["period"] == "Full Period"
                and r["model"] in ("MME", "2MME")]
    # (4 periods x 5 models - 2 full-period MME rows) x 3 weeks x 2 archs
    assert len(runs) == (4 * 5 - 2) * 3 * 2
    # MME rows are masked by the Common-Period ECMWF wk3-4 ELR map
    mme = next(r for r in runs if r["model"] == "MME")
    assert mme["mask_model"] == "ECMWF"
    assert mme["mask_period_dir"] == "Common Period/"
    assert mme["mask_week"] == "wk3-4"
    # Full-period rows are masked by the Full-Period map of the model
    full = next(r for r in runs if r["period"] == "Full Period"
                and r["model"] == "IITM")
    assert full["mask_period_dir"] == "Full Period/"
    assert full["mask_model"] == "IITM"


def test_barplot_full_matrix_figures(tmp_path):
    """After a (fake) full suite, run_barplot emits the Full-Period,
    MME per-arch, and MME-compare figures and reports skipped rows."""
    root = str(tmp_path)
    _fake_suite_tree(root)
    paths = notebooks.run_barplot(out_root=root, log=lambda *a: None)
    for key in ("by_model", "by_lead", "full_period_ELR",
                "full_period_unet", "mme_ELR", "mme_unet", "mme_compare"):
        assert key in paths, f"missing figure {key}"
        assert os.path.exists(paths[key]), key
    # skipped rows are REPORTED, not silently dropped: the fake tree has
    # 18 artifacts of the 108-row probe matrix
    assert isinstance(paths["skipped"], list)
    assert len(paths["skipped"]) == (4 * 5 - 2) * 3 * 2 - 18
    assert all(p.endswith(".nc") for p in paths["skipped"])


def test_weeks_cross_product_fills_every_fillable_row(tmp_path):
    """`suite --week wk1,wk2,wk3-4` writes the complete output tree the
    reference's own 8 scripts can produce (each re-run per lead by
    editing its `week` constant): 3 single models x 2 periods + the
    MME/2MME blends, each at all 3 weeks. Over that tree the 108-row
    cell-5 probe matrix fills exactly its 48 reference-producible rows;
    the other 60 probe trees no reference script ever writes (Common/
    Full-period MME_IMD dirs, single-model dirs under MME/2MME) and
    stay reported-as-skipped, mirroring the notebook's KeyError-skip."""
    root = str(tmp_path)
    for week in ("wk1", "wk2", "wk3-4"):
        for m in ("ECMWF", "IITM", "GEFS"):
            _write_rpss(root, "Common Period", m, week)
            _write_rpss(root, "Full Period", m, week)
        _write_rpss(root, "MME", "MME", week)
        _write_rpss(root, "2MME", "2MME", week)
    paths = notebooks.run_barplot(out_root=root, log=lambda *a: None)
    fillable = (3 * 2 + 1 + 1) * 3 * 2          # = 48
    assert len(paths["skipped"]) == (4 * 5 - 2) * 3 * 2 - fillable
    skipped_models = {os.sep + "MME_IMD" + os.sep in p
                      or os.sep + "2MME_IMD" + os.sep in p
                      for p in paths["skipped"]
                      if "Common Period" in p or "Full Period" in p}
    assert skipped_models == {True}      # only blend dirs under single
    # periods (and single models under MME/2MME) remain unfillable
    for key in ("by_model", "by_lead", "full_period_ELR",
                "full_period_unet", "mme_ELR", "mme_unet", "mme_compare"):
        assert os.path.exists(paths[key]), key


def test_barplot_without_mme_skips_mme_figures(tmp_path):
    root = str(tmp_path)
    _write_rpss(root, "Common Period", "ECMWF", "wk3-4")
    paths = notebooks.run_barplot(out_root=root, log=lambda *a: None)
    assert "mme_compare" not in paths
    assert "full_period_ELR" not in paths
    assert os.path.exists(paths["by_model"])


def test_barplot_region_facets(tmp_path, monkeypatch):
    """Cells 16/19: per-region facets for Full Period and Common+MME."""
    from test_regions import write_dbf, write_shp
    root = str(tmp_path)
    _fake_suite_tree(root)
    shp = str(tmp_path / "regions.shp")
    write_shp(shp, [[[(-0.5, -0.5), (2.5, -0.5), (2.5, 5.5), (-0.5, 5.5),
                      (-0.5, -0.5)]],
                    [[(2.5, -0.5), (5.5, -0.5), (5.5, 5.5), (2.5, 5.5),
                      (2.5, -0.5)]]])
    write_dbf(str(tmp_path / "regions.dbf"), ["West", "East"])
    paths = notebooks.run_barplot(out_root=root, shapefile=shp,
                                  log=lambda *a: None)
    assert os.path.exists(paths["by_region"])
    assert os.path.exists(paths["region_full_week_3-4"])
    assert os.path.exists(paths["region_mme_week_3-4"])


def test_mme_legacy_name_alias(tmp_path):
    """Round-2 trees wrote MME blends under GEFS_IITM_ECMWF_IMD; the
    loader falls back so old results stay aggregatable."""
    root = str(tmp_path)
    _write_rpss(root, "MME", "GEFS_IITM_ECMWF", "wk3-4", value=0.25)
    f = analysis.load_rpss(root, "MME/", "MME", "IMD", "unet", "wk3-4")
    assert np.allclose(f.values, 0.25)
    # canonical name wins when both exist
    _write_rpss(root, "MME", "MME", "wk3-4", value=0.5)
    f = analysis.load_rpss(root, "MME/", "MME", "IMD", "unet", "wk3-4")
    assert np.allclose(f.values, 0.5)


def test_mme_compare_masks_rows_by_common_ecmwf(tmp_path):
    """Cell-5 masking: the MME row is masked by the COMMON-PERIOD ECMWF
    ELR wk3-4 NaN map, not by its own map."""
    root = str(tmp_path)
    _write_rpss(root, "Common Period", "ECMWF", "wk3-4", n=4, value=0.1)
    _write_rpss(root, "MME", "MME", "wk3-4", n=4, value=0.2)
    runs = [r for r in notebooks.default_barplot_runs()
            if r["model"] == "MME" and r["period"] == "MME"
            and r["week"] == "wk3-4" and r["arch"] == "unet"]
    table = analysis.rpss_records(runs, root)
    # the ECMWF ELR map has exactly one NaN pixel (0, 0) -> 15 survive
    assert len(table.values) == 15
    assert np.allclose(table.values, 0.2)


def test_cli_barplot_runs_override(tmp_path, capsys):
    """`run barplot --runs custom.json` drives a user-supplied matrix."""
    from s2s_ismr_tpu.run import main
    root = str(tmp_path)
    _write_rpss(root, "Common Period", "ECMWF", "wk3-4")
    runs = [{"period_dir": "Common Period/", "period": "Common Period",
             "model": "ECMWF", "obs": "IMD", "arch": a, "week": "wk3-4",
             "label": "week 3-4"} for a in ("ELR", "unet")]
    rpath = str(tmp_path / "runs.json")
    with open(rpath, "w") as fh:
        json.dump(runs, fh)
    rc = main(["barplot", "--out", root, "--runs", rpath, "--cpu"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["skipped"] == []
    assert os.path.exists(out["by_model"])


@pytest.mark.slow
def test_tune_mme_writes_reference_contract_paths(tmp_path):
    """End-to-end: the tune_MME pipeline writes its blend rpss under
    outputs/MME/MME_IMD/ (tune_MME.py:47,92-93,135-137) so Bar_plot's
    cell-5 probe finds it; per-member checkpoints stay under
    models/MME/{member}_IMD (tune_MME.py:43)."""
    import dataclasses
    from s2s_ismr_tpu.pipelines import get_config
    from s2s_ismr_tpu.pipelines.tune import run_pipeline

    cfg = dataclasses.replace(get_config("tune_MME").fast_variant(),
                              years=(2003, 2012), epochs=2)
    run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                 synthetic_step=2.0, log=lambda *a: None)
    base = tmp_path / "outputs" / "MME" / "MME_IMD"
    for arch in ("ELR", "unet"):
        assert (base / f"{arch}_rpss_test_wk3-4.nc").exists()
    for member in ("GEFS", "IITM", "ECMWF"):
        mdir = tmp_path / "models" / "MME" / f"{member}_IMD" / "wk3-4"
        assert (mdir / "winners_wk3-4.json").exists()
    # and run_barplot's probe matrix picks the blend up
    paths = notebooks.run_barplot(out_root=str(tmp_path),
                                  log=lambda *a: None)
    assert "mme_compare" in paths
