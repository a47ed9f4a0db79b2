"""training_type='train' (training.py:119-125): the reference's third
training mode — a single configuration (the first grid entry), no grid
search, no EarlyStopping (ModelCheckpoint best-val weights only) — now
reachable for every architecture from the pipeline and CLI, plus the
fixed-winner (cnn/mlp and unet-train) load replay round-trips."""

import dataclasses
import json
import os

import numpy as np
import pytest

from s2s_ismr_tpu.pipelines import get_config
from s2s_ismr_tpu.pipelines.tune import run_pipeline


def _fast_cfg(**over):
    cfg = dataclasses.replace(get_config("tune_ECMWF_com").fast_variant(),
                              years=(2003, 2012), epochs=3)
    return dataclasses.replace(cfg, **over) if over else cfg


def test_cli_accepts_training_type_train():
    from s2s_ismr_tpu.run import main
    # argparse must accept it (the run itself would need data; --list
    # short-circuits before any pipeline work)
    assert main(["--list"]) == 0
    import argparse
    with pytest.raises(SystemExit):
        main(["tune_ECMWF_com", "--training-type", "bogus"])


def test_unet_from_grid_uses_first_entry():
    from s2s_ismr_tpu.pipelines.tune import _unet_from_grid
    cfg = get_config("tune_GEFS_com")      # blocks (3,4,5), kernels x3
    model, ucfg = _unet_from_grid(cfg)
    g = cfg.tuning
    assert ucfg.n_blocks == g.n_blocks[0]
    assert ucfg.filters == g.n_filters[0]
    assert ucfg.ct_kernel == tuple(g.ct_kernels[0])


@pytest.mark.slow
def test_unet_train_mode_pipeline_and_load_roundtrip(tmp_path):
    """U-Net 'train' -> outputs + persisted fixed winners with the
    UNetConfig in the manifest -> 'load' replays bit-identically."""
    cfg = _fast_cfg()
    trained = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                           synthetic_step=2.0, log=lambda *a: None,
                           training_type="train")
    assert not trained.nn.sweeps                # no grid search ran
    assert "ECMWF" in trained.nn.fixed_winners
    mdir = tmp_path / "models" / cfg.out_dir / "ECMWF_IMD" / cfg.week
    with open(mdir / f"winners_{cfg.week}.json") as fh:
        manifest = json.load(fh)
    assert manifest[0]["architecture"] == "unet"
    assert manifest[0]["config"]["n_blocks"] == cfg.tuning.n_blocks[0]
    assert manifest[0]["file"].endswith("_trained.msgpack")
    # rpss outputs written under the usual contract
    out = tmp_path / "outputs" / cfg.out_dir / "ECMWF_IMD"
    assert (out / f"unet_rpss_test_{cfg.week}.nc").exists()

    loaded = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                          synthetic_step=2.0, log=lambda *a: None,
                          training_type="load")
    np.testing.assert_array_equal(loaded.nn.predictions,
                                  trained.nn.predictions)
    np.testing.assert_array_equal(loaded.nn.rpss_test.values,
                                  trained.nn.rpss_test.values)


@pytest.mark.slow
def test_unet_train_differs_from_tune_winner_selection(tmp_path):
    """'train' fixes the first grid entry while 'tune' may pick another
    trial — both must produce valid, finite val losses and the train
    mode must run without the sweep machinery."""
    cfg = _fast_cfg()
    trained = run_pipeline(cfg, source="synthetic",
                           out_root=str(tmp_path / "a"),
                           synthetic_step=2.0, log=lambda *a: None,
                           training_type="train")
    _, vloss, ucfg = trained.nn.fixed_winners["ECMWF"]
    assert np.isfinite(vloss).all()
    assert ucfg is not None
    hp = trained.nn.best_hparams[0]["ECMWF"]
    assert hp["blocks"] == cfg.tuning.n_blocks[0]


@pytest.mark.slow
def test_cnn_fixed_load_roundtrip(tmp_path):
    """Pipeline-level cnn 'load' replay of fixed winners (training.py:
    127-131 fallback to best_model_{arch}_{i}.keras), bit-identical to
    the original run — the cnn/mlp mirror of the U-Net bit-identity
    test."""
    cfg = _fast_cfg(architecture="cnn")
    ran = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None)
    assert "ECMWF" in ran.nn.fixed_winners
    loaded = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                          synthetic_step=2.0, log=lambda *a: None,
                          training_type="load")
    np.testing.assert_array_equal(loaded.nn.predictions,
                                  ran.nn.predictions)
    np.testing.assert_array_equal(loaded.nn.rpss_test.values,
                                  ran.nn.rpss_test.values)
    assert loaded.nn.best_hparams[0]["ECMWF"]["architecture"] == "cnn"


@pytest.mark.slow
def test_batch_size_full_train_manifest_records_resolved_bs(tmp_path):
    """`--batch-size full --training-type train`: the winner manifest
    must record the RESOLVED batch size (T), not the `full` sentinel 0
    the raw grid carries — it must agree with best_hparams_<week>.json
    (regression: persistence recomputed hp from the unresolved
    cfg.tuning)."""
    cfg = _fast_cfg()
    cfg = dataclasses.replace(
        cfg, tuning=dataclasses.replace(cfg.tuning, batch_sizes=(0,)))
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None,
                       training_type="train")
    mdir = tmp_path / "models" / cfg.out_dir / "ECMWF_IMD" / cfg.week
    with open(mdir / f"winners_{cfg.week}.json") as fh:
        manifest = json.load(fh)
    bs = manifest[0]["hparams"]["batch_size"]
    assert bs > 0, "manifest recorded the unresolved 'full' sentinel"
    assert bs == out.nn.best_hparams[0]["ECMWF"]["batch_size"]
    odir = tmp_path / "outputs" / cfg.out_dir / "ECMWF_IMD"
    with open(odir / f"best_hparams_{cfg.week}.json") as fh:
        best = json.load(fh)
    assert bs == best[0]["ECMWF"]["batch_size"]


@pytest.mark.slow
def test_mlp_train_mode_runs(tmp_path):
    """'train' also reaches cnn/mlp (no early exit, all epochs)."""
    cfg = _fast_cfg(architecture="mlp")
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None,
                       training_type="train")
    _, vloss, ucfg = out.nn.fixed_winners["ECMWF"]
    assert ucfg is None
    assert np.isfinite(vloss).all()
