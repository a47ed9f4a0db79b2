"""CLI surface tests: listing, config resolution, error paths."""

import json

import pytest

from s2s_ismr_tpu import run as cli
from s2s_ismr_tpu.pipelines import CONFIGS, get_config


def test_list_prints_all_configs(capsys):
    assert cli.main(["--list"]) == 0
    out = capsys.readouterr().out
    for name in CONFIGS:
        assert name in out
    for extra in ("accs", "barplot", "realtime"):
        assert extra in out


def test_unknown_config_errors(capsys):
    assert cli.main(["tune_NOPE"]) == 2
    assert "unknown pipeline" in capsys.readouterr().err


def test_get_config_prefix():
    assert get_config("ECMWF_com").name == "tune_ECMWF_com"
    with pytest.raises(KeyError):
        get_config("nope")


def test_fast_variant_shrinks():
    cfg = get_config("tune_GEFS_com")
    fast = cfg.fast_variant()
    assert fast.n_bootstraps < cfg.n_bootstraps
    assert fast.epochs < cfg.epochs
    assert len(fast.tuning.n_blocks) == 1


def test_barplot_without_outputs_raises(tmp_path):
    from s2s_ismr_tpu.pipelines.notebooks import run_barplot
    with pytest.raises(FileNotFoundError):
        run_barplot(out_root=str(tmp_path), log=lambda *a: None)


def test_suite_unknown_config_errors(capsys):
    assert cli.main(["suite", "--configs", "tune_NOPE"]) == 2
    assert "unknown pipeline" in capsys.readouterr().err


def test_suite_listed(capsys):
    assert cli.main(["--list"]) == 0
    assert "suite" in capsys.readouterr().out
