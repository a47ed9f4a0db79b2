"""--week x persistence seams (VERDICT r4 #6).

The weeks cross product (`suite --week`) writes winners under
models/{dir}/{model}_{obs}/{week} per week and outputs under
outputs/{dir}/{model}_{obs}/*_{week}.nc — the filesystem contract between
the tune scripts, training_type='load', realtime and Bar_plot.ipynb
(tune_ECMWF_com.py:36-39). These tests drive those seams end-to-end from
REAL produced files: load/realtime replay the right week's winners and
fail loudly on week mismatches (via path or fingerprint), and a real
`suite --week` output tree feeds the barplot matrix without synthesis.
"""

import dataclasses
import json
import os
import shutil

import numpy as np
import pytest

from s2s_ismr_tpu.pipelines import get_config
from s2s_ismr_tpu.pipelines.tune import run_pipeline


def _wk_cfg(week):
    return dataclasses.replace(
        get_config("tune_ECMWF_com").fast_variant(),
        years=(2003, 2012), epochs=3).with_week(week)


@pytest.fixture(scope="module")
def wk1_tree(tmp_path_factory):
    """One wk1 fast tune run: outputs + persisted winners."""
    root = tmp_path_factory.mktemp("wk1run")
    out = run_pipeline(_wk_cfg("wk1"), source="synthetic",
                       out_root=str(root), synthetic_step=2.0,
                       log=lambda *a: None)
    return root, out


@pytest.mark.slow
def test_load_replays_the_tuned_week(wk1_tree):
    """training_type='load' with --week wk1 replays the wk1 winners
    bit-identically; load for a week that was never tuned fails with the
    missing-manifest error, not silent fallback to another week."""
    root, tuned = wk1_tree
    loaded = run_pipeline(_wk_cfg("wk1"), source="synthetic",
                          out_root=str(root), synthetic_step=2.0,
                          training_type="load", log=lambda *a: None)
    np.testing.assert_array_equal(loaded.nn.rpss_test.values,
                                  tuned.nn.rpss_test.values)
    with pytest.raises(FileNotFoundError, match="winner manifest"):
        run_pipeline(_wk_cfg("wk2"), source="synthetic",
                     out_root=str(root), synthetic_step=2.0,
                     training_type="load", log=lambda *a: None)


@pytest.mark.slow
def test_load_rejects_week_mismatched_winners(wk1_tree):
    """A winners tree copied across week dirs (manifest renamed to the
    new week) must fail the load-path fingerprint validation — the
    fingerprint records the tuned week (tune.py settings_fingerprint),
    so lead-blending cannot happen silently."""
    root, _ = wk1_tree
    mdir = root / "models" / "Common Period" / "ECMWF_IMD"
    shutil.copytree(mdir / "wk1", mdir / "wk2")
    os.rename(mdir / "wk2" / "winners_wk1.json",
              mdir / "wk2" / "winners_wk2.json")
    # checkpoint filenames are week-agnostic (best_model_*_{fold}_*.msgpack),
    # so only the manifest rename is needed to fake a wk2 tune
    with pytest.raises(ValueError, match="week"):
        run_pipeline(_wk_cfg("wk2"), source="synthetic",
                     out_root=str(root), synthetic_step=2.0,
                     training_type="load", log=lambda *a: None)
    shutil.rmtree(mdir / "wk2")


@pytest.mark.slow
def test_realtime_week_uses_matching_winners(wk1_tree):
    """realtime --week wk1 evaluates with the wk1 winners; the base week
    (never tuned here) fails on the missing manifest, and a copied
    mismatched tree fails the realtime fingerprint check."""
    from s2s_ismr_tpu.pipelines.realtime import run_realtime_eval
    root, _ = wk1_tree
    res, paths = run_realtime_eval(_wk_cfg("wk1"), out_root=str(root),
                                   source="synthetic", synthetic_step=2.0,
                                   fetch_indices=False,
                                   log=lambda *a: None)
    assert np.isfinite(np.asarray(res.rpss_map)).any()
    assert any(p.endswith(".nc") for p in paths.values())

    with pytest.raises(FileNotFoundError):
        run_realtime_eval(_wk_cfg("wk2"), out_root=str(root),
                          source="synthetic", synthetic_step=2.0,
                          fetch_indices=False, log=lambda *a: None)

    mdir = root / "models" / "Common Period" / "ECMWF_IMD"
    shutil.copytree(mdir / "wk1", mdir / "wk2")
    os.rename(mdir / "wk2" / "winners_wk1.json",
              mdir / "wk2" / "winners_wk2.json")
    try:
        with pytest.raises(ValueError, match="week"):
            run_realtime_eval(_wk_cfg("wk2"), out_root=str(root),
                              source="synthetic", synthetic_step=2.0,
                              fetch_indices=False, log=lambda *a: None)
    finally:
        shutil.rmtree(mdir / "wk2")


@pytest.mark.slow
def test_suite_week_tree_feeds_barplot_from_real_files(tmp_path):
    """A real `suite --week` session (fast CPU variant: ECMWF_com + 2MME
    at wk1/wk3-4) writes the per-week outputs tree, and run_barplot
    consumes those REAL netcdfs (the 48-row matrix test synthesizes its
    tree; this one proves the producer and consumer agree on paths,
    filenames, dims and masks end-to-end)."""
    from s2s_ismr_tpu import run as cli
    from s2s_ismr_tpu.pipelines import notebooks

    out = str(tmp_path)
    rc = cli.main(["suite", "--configs", "tune_ECMWF_com,tune_2MME",
                   "--week", "wk1,wk3-4", "--fast", "--epochs", "3",
                   "--step", "2.0", "--out", out, "--cpu"])
    assert rc == 0
    with open(tmp_path / "suite_summary.json") as fh:
        s = json.load(fh)
    assert set(s["configs"]) == {"tune_ECMWF_com[wk1]",
                                 "tune_ECMWF_com[wk3-4]",
                                 "tune_2MME[wk1]", "tune_2MME[wk3-4]"}
    for week in ("wk1", "wk3-4"):
        assert os.path.exists(os.path.join(
            out, "outputs", "Common Period", "ECMWF_IMD",
            f"unet_rpss_test_{week}.nc"))
        assert os.path.exists(os.path.join(
            out, "outputs", "2MME", "2MME_IMD",
            f"ELR_rpss_test_{week}.nc"))

    # barplot over the REAL tree: the produced rows render, absent probe
    # rows are reported as skipped (notebook KeyError-skip semantics)
    runs = [r for r in notebooks.default_barplot_runs()
            if r["week"] in ("wk1", "wk3-4")
            and ((r["period"] == "Common Period" and r["model"] == "ECMWF")
                 or (r["period"] == "2MME" and r["model"] == "2MME"))]
    assert len(runs) == 8                     # 2 rows x 2 weeks x 2 archs
    paths = notebooks.run_barplot(out_root=out, runs=runs,
                                  log=lambda *a: None)
    assert paths["skipped"] == []
    assert os.path.exists(paths["by_model"])
