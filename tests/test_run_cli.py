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


def test_suite_incremental_and_resume(tmp_path, monkeypatch):
    """suite writes the summary after every config (kill-safe) and
    --resume skips configs already recorded."""
    import json as _json
    import numpy as np
    from types import SimpleNamespace

    calls = []

    def fake_run_pipeline(cfg, **kw):
        calls.append(cfg.name)
        fld = SimpleNamespace(values=np.zeros((2, 4, 4)))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)

    out = str(tmp_path)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", out]) == 0
    with open(tmp_path / "suite_summary.json") as fh:
        s = _json.load(fh)
    assert set(s["configs"]) == {"tune_ECMWF_com", "tune_GEFS_com"}
    assert s["partial"] is False
    assert calls == ["tune_ECMWF_com", "tune_GEFS_com"]

    # resume: both already recorded -> no new pipeline runs
    calls.clear()
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", out, "--resume"]) == 0
    assert calls == []

    # resume after dropping one config -> only that one reruns
    s["configs"].pop("tune_GEFS_com")
    with open(tmp_path / "suite_summary.json", "w") as fh:
        _json.dump(s, fh)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", out, "--resume"]) == 0
    assert calls == ["tune_GEFS_com"]


def test_suite_isolates_config_failures(tmp_path, monkeypatch):
    """A config that raises is recorded with an error, the suite continues
    (exit 1), and --resume retries only the failed config."""
    import json as _json
    import numpy as np
    from types import SimpleNamespace

    calls = []
    failed_once = []

    def fake_run_pipeline(cfg, **kw):
        calls.append(cfg.name)
        if cfg.name == "tune_ECMWF_com" and not failed_once:
            failed_once.append(True)
            raise RuntimeError("remote_compile: body closed")
        fld = SimpleNamespace(values=np.zeros((2, 4, 4)))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)

    out = str(tmp_path)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", out]) == 1
    with open(tmp_path / "suite_summary.json") as fh:
        s = _json.load(fh)
    assert "error" in s["configs"]["tune_ECMWF_com"]
    assert "error" not in s["configs"]["tune_GEFS_com"]
    assert calls == ["tune_ECMWF_com", "tune_GEFS_com"]

    calls.clear()
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", out, "--resume"]) == 0
    assert calls == ["tune_ECMWF_com"]   # only the failed one reruns


def test_compile_with_retry_transient():
    from s2s_ismr_tpu.train.sweep import _compile_with_retry

    class Flaky:
        def __init__(self, fails, msg):
            self.fails, self.msg, self.n = fails, msg, 0

        def compile(self):
            if self.n < self.fails:
                self.n += 1
                raise RuntimeError(self.msg)
            return "exe"

    # transient message -> retried to success
    f = Flaky(2, "INTERNAL: remote_compile: read body: closed")
    assert _compile_with_retry(f) == "exe"
    assert f.n == 2
    # non-transient -> raises immediately
    f2 = Flaky(1, "lowering error: bad shapes")
    with pytest.raises(RuntimeError):
        _compile_with_retry(f2)
    assert f2.n == 1
    # transient but exhausted -> raises
    f3 = Flaky(5, "UNAVAILABLE: server gone")
    with pytest.raises(RuntimeError):
        _compile_with_retry(f3, attempts=2)


def test_fast_variant_keeps_native_grid():
    """ECMWF_full --fast must keep its divisible native grid (a cleared
    synthetic_grid regressed to an indivisible 34x35 abort)."""
    cfg = get_config("tune_ECMWF_full").fast_variant()
    assert cfg.synthetic_grid == (23, 24)
