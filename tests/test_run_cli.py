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
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)   # no real compiles here

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
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)   # no real compiles here

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


def test_suite_compile_ahead_scheduling(tmp_path, monkeypatch):
    """The suite prefetches every pending config's programs — config 0's
    overlap its own data+ELR stages; N+1's overlap N's training (tune
    only, never resume-skipped configs) — and a prefetch crash must not
    fail the suite. The prefetch-vs-run compile race is resolved by the
    program memo's in-flight dedup (test_program_memo_inflight_dedup)."""
    import json as _json
    import numpy as np
    from types import SimpleNamespace

    runs, prefetches = [], []

    def fake_run_pipeline(cfg, **kw):
        runs.append(cfg.name)
        fld = SimpleNamespace(values=np.zeros((2, 4, 4)))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    def fake_prefetch(cfg, **kw):
        prefetches.append(cfg.name)
        if cfg.name == "tune_IITM_com":
            raise RuntimeError("remote_compile: dropped")   # must be benign
        return 1

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs", fake_prefetch)

    out = str(tmp_path)
    names = "tune_ECMWF_com,tune_GEFS_com,tune_IITM_com"
    assert cli.main(["suite", "--configs", names, "--fast",
                     "--out", out]) == 0
    assert runs == names.split(",")
    # every pending config is prefetched (incl. the crashing one)
    assert prefetches == ["tune_ECMWF_com", "tune_GEFS_com",
                          "tune_IITM_com"]

    # training_type=load never prefetches (nothing to compile ahead:
    # the replay path compiles winner-forward programs lazily)
    runs.clear(); prefetches.clear()
    assert cli.main(["suite", "--configs", names, "--fast", "--out",
                     str(tmp_path / "l"), "--training-type", "load"]) == 0
    assert prefetches == []

    # resume: already-recorded configs are neither run nor prefetched
    runs.clear(); prefetches.clear()
    with open(tmp_path / "suite_summary.json") as fh:
        s = _json.load(fh)
    s["configs"].pop("tune_IITM_com")
    with open(tmp_path / "suite_summary.json", "w") as fh:
        _json.dump(s, fh)
    assert cli.main(["suite", "--configs", names, "--fast", "--out", out,
                     "--resume"]) == 0
    # the one pending config still gets its own compile-ahead overlap;
    # recorded configs are neither run nor prefetched
    assert runs == ["tune_IITM_com"] and prefetches == ["tune_IITM_com"]


@pytest.mark.slow
def test_prefetch_matches_run_nn_branch_programs(tmp_path):
    """prefetch_nn_programs must reproduce run_nn_branch's exact program
    statics + input shapes (grid, TrainSettings, predictor images, label
    rank) — a drifted prefetch would silently compile dead programs and
    the suite's compile-ahead would buy nothing. Proven by a full bucket
    memo hit on the real run."""
    from s2s_ismr_tpu.pipelines import tune as tune_mod
    from s2s_ismr_tpu.train.sweep import _program_memo

    cfg = get_config("tune_GEFS_com").fast_variant()
    _program_memo.clear()
    # step=2.0 -> 16x16 grid, divisible through the 3 down-blocks.
    # use_mesh='auto' on BOTH sides: the suite's prefetch and run_pipeline
    # make the same topology choice (a mesh mismatch selects entirely
    # different programs); under the conftest's 8-device CPU backend this
    # exercises the mesh-sharded program path.
    assert tune_mod.prefetch_nn_programs(
        cfg, source="synthetic", seed=0, synthetic_step=2.0,
        log=lambda *a: None) == 5   # 3 ELR + labeler + NN buckets
    bundles = tune_mod.load_bundles(cfg, "synthetic", seed=0,
                                    synthetic_step=2.0)
    bundles = {n: tune_mod._apply_pad(cfg, b) for n, b in bundles.items()}
    import jax as _jax
    mesh = None
    if len(_jax.devices()) > 1:
        from s2s_ismr_tpu.parallel import mesh as pmesh
        mesh = pmesh.sweep_mesh()
    # the ELR/labeling/RPSS programs were prefetched too (VERDICT r4 #2:
    # the ELR stage was the suite's un-prefetched critical-path floor);
    # the real branches must be FULL memo hits — zero new program keys
    _SHARED_TAGS = ("elr_fit_folds", "elr_folds", "rpss_folds",
                    "fit_label_folds")
    def shared_keys():
        return {k for k in _program_memo._d if k[0] in _SHARED_TAGS}
    before = shared_keys()
    assert len(before) >= 4
    elr_res = tune_mod.run_elr_branch(cfg, bundles, log=lambda *a: None,
                                      mesh=mesh)
    import numpy as _np
    assert _np.isfinite(elr_res.rpss_test.values).any()
    res = tune_mod.run_nn_branch(cfg, bundles, log=lambda *a: None,
                                 mesh=mesh)
    assert shared_keys() == before, \
        "prefetched ELR/label/RPSS avals drifted from the real branches'"
    assert res.sweeps, "unet config must produce a sweep"
    from s2s_ismr_tpu.train.sweep import bucket_trials, enumerate_trials
    n_buckets = len(bucket_trials(enumerate_trials(cfg.tuning)))
    assert n_buckets == 2                      # fast grid: 2 ct_kernels
    for sw in res.sweeps.values():
        # every bucket program was already in the memo (full hit)
        assert sw.timings["compile_cached_buckets"] == n_buckets


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


def test_with_week_semantics():
    """--week implements the reference's intended re-targeting contract
    (tune_ECMWF_com.py:31 edits `week`): a different week reverts
    custom_lead/custom_leads to LEAD_MAPPING (in the reference a stale
    custom_lead silently wins over the edited week, dataloader.py:170-173
    — a footgun, not a feature); the same week is a no-op."""
    cfg = get_config("tune_ECMWF_com")          # custom_lead (16, 30)
    wk1 = cfg.with_week("wk1")
    assert wk1.week == "wk1" and wk1.custom_lead is None
    assert wk1.lead() == (2, 8)
    assert cfg.with_week("wk3-4") is cfg        # same week keeps (16, 30)
    assert cfg.with_week("wk3-4").lead() == (16, 30)
    mme = get_config("tune_MME")                # per-model custom_leads
    assert mme.with_week("wk1").lead("ECMWF") == (2, 8)
    assert mme.with_week("wk3-4").lead("ECMWF") == (16, 30)
    with pytest.raises(KeyError):
        cfg.with_week("wk5")


def test_week_comma_rejected_outside_suite():
    with pytest.raises(SystemExit):
        cli.main(["tune_ECMWF_com", "--week", "wk1,wk2", "--fast"])


def test_week_list_validated_up_front(capsys):
    """Malformed --week lists fail before any pipeline work: a stray
    empty entry ('wk1,' would silently run the BASE week under a '[]'
    summary key) and duplicates (second run would overwrite the first's
    summary slot) are both rejected with exit 2."""
    assert cli.main(["suite", "--week", "wk1,", "--fast"]) == 2
    assert "unknown week" in capsys.readouterr().err
    assert cli.main(["suite", "--week", "wk1,wk1", "--fast"]) == 2
    assert "duplicate" in capsys.readouterr().err
    # realtime path: a bad week is a clean exit 2, not a KeyError
    assert cli.main(["realtime", "--from-config", "tune_ECMWF_com",
                     "--week", "wk9"]) == 2
    assert "unknown week" in capsys.readouterr().err


def test_batch_size_non_integer_rejected():
    for bad in ("1.5", "abc"):
        with pytest.raises(SystemExit, match="batch-size"):
            cli.main(["tune_ECMWF_com", "--batch-size", bad, "--fast"])


def test_suite_week_cross_product(tmp_path, monkeypatch):
    """suite --week a,b runs the configs x weeks cross product with
    distinct summary keys, and each expanded config carries the right
    week + standard lead (fills the Bar_plot matrix rows per lead)."""
    import numpy as np
    from types import SimpleNamespace

    seen = []

    def fake_run_pipeline(cfg, **kw):
        seen.append((cfg.name, cfg.week, cfg.lead()))
        fld = SimpleNamespace(values=np.zeros((2, 4, 4)))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)

    out = str(tmp_path)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com",
                     "--week", "wk1,wk3-4", "--fast", "--out", out]) == 0
    assert seen == [("tune_ECMWF_com[wk1]", "wk1", (2, 8)),
                    ("tune_ECMWF_com[wk3-4]", "wk3-4", (16, 30))]
    with open(tmp_path / "suite_summary.json") as fh:
        s = json.load(fh)
    assert set(s["configs"]) == {"tune_ECMWF_com[wk1]",
                                 "tune_ECMWF_com[wk3-4]"}
    assert s["settings"]["week"] == "wk1,wk3-4"

    # a bad week aborts up front, before any pipeline work
    seen.clear()
    assert cli.main(["suite", "--configs", "tune_ECMWF_com",
                     "--week", "wk9", "--fast", "--out", out]) == 2
    assert seen == []


@pytest.mark.slow
def test_week_override_pipeline_end_to_end(tmp_path):
    """A week-overridden fast pipeline writes the wk1-named outputs tree
    and persists wk1-fingerprinted winners (the filesystem contract
    Bar_plot.ipynb cell 5 reads per lead)."""
    import dataclasses
    from s2s_ismr_tpu.pipelines.tune import run_pipeline
    cfg = dataclasses.replace(get_config("tune_ECMWF_com").fast_variant(),
                              years=(2003, 2012), epochs=3).with_week("wk1")
    out = run_pipeline(cfg, source="synthetic", out_root=str(tmp_path),
                       synthetic_step=2.0, log=lambda *a: None)
    odir = tmp_path / "outputs" / "Common Period" / "ECMWF_IMD"
    assert (odir / "ELR_rpss_test_wk1.nc").exists()
    assert (odir / "unet_rpss_test_wk1.nc").exists()
    mdir = tmp_path / "models" / "Common Period" / "ECMWF_IMD" / "wk1"
    with open(mdir / "winners_wk1.json") as fh:
        manifest = json.load(fh)
    assert manifest and manifest[0]["fingerprint"]["week"] == "wk1"


def test_suite_check_gate(tmp_path, monkeypatch, capsys):
    """suite --check compares each config's ELR/NN test-RPSS means to the
    expectation file and exits 1 on drift beyond the tolerance — the
    three-session bit-identity property (PERF.md 'Skill outputs') turned
    into a standing regression gate so perf changes cannot silently move
    skill. Expected-but-not-run configs are reported, not failed (a
    --configs subset checks only its subset)."""
    import numpy as np
    from types import SimpleNamespace

    vals = {"tune_ECMWF_com": 0.25, "tune_GEFS_com": 0.27}

    def fake_run_pipeline(cfg, **kw):
        fld = SimpleNamespace(values=np.full((2, 4, 4), vals[cfg.name]))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)

    exp = {"tolerance": 1e-9,
           "configs": {
               "tune_ECMWF_com": {"elr_rpss_test_mean": 0.25,
                                  "nn_rpss_test_mean": 0.25},
               "tune_GEFS_com": {"elr_rpss_test_mean": 0.27,
                                 "nn_rpss_test_mean": 0.27},
               "tune_IITM_com": {"nn_rpss_test_mean": 0.5}}}
    epath = tmp_path / "expected.json"
    epath.write_text(json.dumps(exp))

    # all within tolerance -> 0; the un-run config is skipped, not failed
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", str(tmp_path / "a"),
                     "--check", str(epath)]) == 0
    cap = capsys.readouterr()
    assert "skip tune_IITM_com" in cap.err and "[check] ok" in cap.err
    assert json.loads(cap.out)["check"]["ok"] is True

    # drift -> exit 1 with the offending key named
    exp["configs"]["tune_GEFS_com"]["nn_rpss_test_mean"] = 0.2701
    epath.write_text(json.dumps(exp))
    assert cli.main(["suite", "--configs", "tune_ECMWF_com,tune_GEFS_com",
                     "--fast", "--out", str(tmp_path / "b"),
                     "--check", str(epath)]) == 1
    err = capsys.readouterr().err
    assert "FAIL tune_GEFS_com.nn_rpss_test_mean" in err

    # an errored config fails the check explicitly
    def failing_run(cfg, **kw):
        raise RuntimeError("boom")
    monkeypatch.setattr(tune_mod, "run_pipeline", failing_run)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com", "--fast",
                     "--out", str(tmp_path / "c"),
                     "--check", str(epath)]) == 1


def test_week_rejected_for_barplot_accs():
    """--week is consumed only by tune configs, suite and realtime; for
    barplot/accs it must be rejected rather than silently ignored
    (ADVICE r4: `run barplot --week wk1` quietly ran the default
    matrix). --list with a week still lists."""
    for sub in ("barplot", "accs"):
        with pytest.raises(SystemExit, match="not consumed"):
            cli.main([sub, "--week", "wk1"])
    assert cli.main(["--list", "--week", "wk9"]) == 0   # no validation


def test_suite_single_week_suffixes_keys(tmp_path, monkeypatch):
    """Even a single --week suffixes summary keys: `suite --week wk1` and
    a later plain `suite` into the same --out must never share config
    keys (ADVICE r4: identical keys were distinguished only by the
    settings fingerprint, discarding prior summary entries on resume)."""
    import numpy as np
    from types import SimpleNamespace

    def fake_run_pipeline(cfg, **kw):
        fld = SimpleNamespace(values=np.zeros((2, 4, 4)))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)
    out = str(tmp_path)
    assert cli.main(["suite", "--configs", "tune_ECMWF_com", "--week",
                     "wk1", "--fast", "--out", out]) == 0
    with open(tmp_path / "suite_summary.json") as fh:
        s = json.load(fh)
    assert set(s["configs"]) == {"tune_ECMWF_com[wk1]"}


def test_fast_variant_keeps_native_grid():
    """ECMWF_full --fast must keep its divisible native grid (a cleared
    synthetic_grid regressed to an indivisible 34x35 abort)."""
    cfg = get_config("tune_ECMWF_full").fast_variant()
    assert cfg.synthetic_grid == (23, 24)


def test_suite_resume_accumulates_total_and_persists_check(tmp_path,
                                                           monkeypatch):
    """A --resume session must (a) carry the prior sessions' measured
    total_s forward instead of clobbering it with its own short clock,
    and (b) persist the --check verdict into suite_summary.json (round-5
    regression: the verdict was only printed, and a later no-op resume
    reset a 9,400 s measured wall to ~1 s)."""
    import numpy as np
    from types import SimpleNamespace

    def fake_run_pipeline(cfg, **kw):
        fld = SimpleNamespace(values=np.full((2, 4, 4), 0.25))
        return SimpleNamespace(elr=SimpleNamespace(rpss_test=fld),
                               nn=SimpleNamespace(rpss_test=fld),
                               elapsed_s=1.0, paths={}, figures={})

    from s2s_ismr_tpu.pipelines import tune as tune_mod
    monkeypatch.setattr(tune_mod, "run_pipeline", fake_run_pipeline)
    monkeypatch.setattr(tune_mod, "prefetch_nn_programs",
                        lambda *a, **k: 0)
    exp = {"tolerance": 1e-9, "configs": {
        "tune_ECMWF_com": {"elr_rpss_test_mean": 0.25,
                           "nn_rpss_test_mean": 0.25}}}
    epath = tmp_path / "expected.json"
    epath.write_text(json.dumps(exp))
    out = str(tmp_path)
    argv = ["suite", "--configs", "tune_ECMWF_com", "--fast", "--out", out,
            "--check", str(epath)]
    assert cli.main(argv) == 0
    spath = tmp_path / "suite_summary.json"
    with open(spath) as fh:
        s = json.load(fh)
    # the gate verdict is persisted, not just printed
    assert s["check"]["ok"] is True and s["check"]["failures"] == []
    # simulate a long prior session, then a no-op resume over it
    s["total_s"] = 9000.0
    with open(spath, "w") as fh:
        json.dump(s, fh)
    assert cli.main(argv + ["--resume"]) == 0
    with open(spath) as fh:
        s2 = json.load(fh)
    assert s2["total_s"] >= 9000.0          # accumulated, not clobbered
    assert s2["check"]["ok"] is True
