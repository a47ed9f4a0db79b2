"""CLI: `python -m s2s_ismr_tpu.run <config> [options]`.

The reference has eight copy-pasted scripts with hardcoded constants
(SURVEY.md section 2.7); here one entry point runs any registered config:

    python -m s2s_ismr_tpu.run tune_ECMWF_com --synthetic --fast
    python -m s2s_ismr_tpu.run tune_MME --source iridl --plots
    python -m s2s_ismr_tpu.run --list
"""

from __future__ import annotations

import argparse
import json
import sys


def _check_suite(results, expected_path):
    """Regression gate (suite --check): per-config elr/nn RPSS test means
    vs a checked-in expectation file. The suite's skill outputs measured
    bit-identical across three consecutive production sessions on the
    v5e (PERF.md 'Skill outputs'); this turns that property into a CI
    check so perf work cannot silently move skill. Returns a list of
    human-readable failure strings (empty = pass); expected configs that
    were not run this session are reported but do not fail (a --configs
    subset run checks only its subset)."""
    with open(expected_path) as fh:
        expected = json.load(fh)
    tol = float(expected.get("tolerance", 0.0))
    failures = []
    for name, want in expected.get("configs", {}).items():
        got = results.get(name)
        if got is None:
            print(f"[check] skip {name}: not run this session",
                  file=sys.stderr)
            continue
        if "error" in got:
            failures.append(f"{name}: run errored: {got['error']}")
            continue
        for key in ("elr_rpss_test_mean", "nn_rpss_test_mean"):
            if key not in want:
                continue
            drift = abs(float(got[key]) - float(want[key]))
            if not (drift <= tol):        # catches NaN too
                failures.append(
                    f"{name}.{key}: got {got[key]!r}, expected "
                    f"{want[key]!r} (drift {drift:.3e} > tol {tol:.1e})")
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser(prog="s2s_ismr_tpu.run", description=__doc__)
    ap.add_argument("config", nargs="?", help="pipeline name (e.g. tune_ECMWF_com)")
    ap.add_argument("--list", action="store_true", help="list configs")
    ap.add_argument("--source", default=None,
                    choices=["synthetic", "iridl"],
                    help="data source (default: synthetic — except the "
                         "operational `realtime --date`, whose tercile "
                         "edges must come from the real hindcast record, "
                         "so it defaults to iridl)")
    ap.add_argument("--synthetic", dest="source", action="store_const",
                    const="synthetic")
    ap.add_argument("--fast", action="store_true",
                    help="shrunken smoke variant (2 folds, tiny grid)")
    ap.add_argument("--plots", action="store_true", help="render figures")
    ap.add_argument("--out", default=".", help="output root directory")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--step", type=float, default=None,
                    help="synthetic grid step in degrees")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--folds", type=int, default=None)
    ap.add_argument("--training-type", dest="training_type",
                    default="tune", choices=["tune", "train", "load"],
                    help="'tune' runs the grid search; 'train' fits the "
                         "single first-grid-entry configuration with no "
                         "grid and no early stopping (training.py:119-125)"
                         "; 'load' replays the winner checkpoints "
                         "persisted by a prior run")
    ap.add_argument("--week", default=None,
                    help="re-target the config at another lead week "
                         "(wk1, wk2, wk3-4) — the reference edits the "
                         "script constant for this (tune_ECMWF_com.py:31)."
                         " `suite` accepts a comma list and runs the "
                         "configs x weeks cross product, filling the "
                         "Bar_plot matrix rows for every lead")
    ap.add_argument("--standardize", action="store_true",
                    help="per-pixel standardize x/y over T before splits "
                         "(bootstrap_splits standardize= option)")
    ap.add_argument("--output", choices=("proba", "deterministic"),
                    default="proba",
                    help="U-Net head: softmax tercile probabilities or "
                         "the deterministic ReLU precip head "
                         "(deep_nn_models.py:102-105), scored via "
                         "fold-edge categorization")
    ap.add_argument("--predictor", choices=("mean", "multi_predictor",
                                            "stacked"), default=None,
                    help="override the config's predictor mode "
                         "(preprocessing.py:25-35)")
    ap.add_argument("--batch-size", dest="batch_size", default=None,
                    metavar="N|full",
                    help="override the tuning grid's batch sizes with one "
                         "value; 'full' trains whole-training-set batches "
                         "(bs=T) — measured 4.3x step utilization on the "
                         "v5e at changed SGD semantics (1 step/epoch; "
                         "PERF.md), an explicit non-parity throughput "
                         "trade, never a default")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write jax.profiler traces + stage timings to DIR")
    ap.add_argument("--models", default=None,
                    help="comma-separated model list for `accs`")
    ap.add_argument("--fig-format", dest="fig_format", default="png",
                    choices=("png", "pdf"),
                    help="accs: figure file format — the reference "
                         "notebook exports dpi-300 PDFs (ACCs.ipynb "
                         "cells 10-13/23-25/36-38)")
    ap.add_argument("--configs", default=None,
                    help="comma-separated config list for `suite` "
                         "(default: all tune configs)")
    ap.add_argument("--resume", action="store_true",
                    help="suite: skip configs already recorded in "
                         "<out>/suite_summary.json from a prior run")
    ap.add_argument("--check", default=None, metavar="JSON",
                    help="suite: regression gate — compare each config's "
                         "elr/nn_rpss_test_mean against the expected "
                         "values in JSON ({'tolerance': t, 'configs': "
                         "{name: {...}}}) and exit 1 on drift beyond the "
                         "tolerance. The suite's skill outputs are "
                         "bit-identical session-to-session on one "
                         "backend (PERF.md), so perf changes cannot be "
                         "allowed to silently move skill")
    ap.add_argument("--from-config", dest="from_config",
                    default="tune_ECMWF_com",
                    help="tune config whose winners `realtime` evaluates")
    ap.add_argument("--date", default=None,
                    help="realtime: comma-separated YYYY-MM-DD init dates "
                         "— fetches dated forecasts + verifying obs via "
                         "the operational gateway (download_forecast/"
                         "get_obs) and predicts with the tuned winner; "
                         "without --date, realtime scores the held-out "
                         "final hindcast year")
    ap.add_argument("--no-download", dest="download", action="store_false",
                    help="realtime/iridl: use cached files only")
    ap.add_argument("--no-indices", dest="indices", action="store_false",
                    help="realtime: skip RMM/Nino3.4 index acquisition "
                         "(MJO/ENSO composites are then omitted)")
    ap.add_argument("--shapefile", default=None,
                    help="barplot: region polygon shapefile for "
                         "per-region RPSS boxplots (Bar_plot.ipynb "
                         "cells 12-19)")
    ap.add_argument("--regions", default=None,
                    help="barplot: comma-separated region names matching "
                         "--shapefile polygon order (default: .dbf "
                         "attribute names, else region{i})")
    ap.add_argument("--runs", default=None, metavar="JSON",
                    help="barplot: path to a JSON list of run dicts "
                         "(period_dir/model/obs/arch/week[/label/period/"
                         "mask_*]) overriding the default Bar_plot.ipynb "
                         "cell-5 matrix")
    args = ap.parse_args(argv)
    if args.week and args.config and not args.list:
        from .pipelines.configs import LEAD_MAPPING
        if args.config in ("barplot", "accs"):
            # these aggregate EXISTING outputs across all weeks; silently
            # ignoring --week would look like a filter that never applied
            raise SystemExit(f"--week is not consumed by `{args.config}` "
                             f"(use --runs to select barplot rows)")
        if args.config != "suite" and "," in args.week:
            raise SystemExit("--week takes a single week outside `suite`")
        wk_list = args.week.split(",")
        bad = [w for w in wk_list if w not in LEAD_MAPPING]
        if bad:
            # catches typos AND stray empties ('wk1,' would otherwise
            # silently run the config's BASE week under a '[ ]' key)
            print(f"error: unknown week(s) {bad}; choose from "
                  f"{sorted(LEAD_MAPPING)}", file=sys.stderr)
            return 2
        if len(set(wk_list)) != len(wk_list):
            # duplicates would run the pipeline twice under one summary
            # key, the second silently overwriting the first
            print("error: duplicate weeks in --week", file=sys.stderr)
            return 2
    if args.profile and not args.fast:
        # a jax.profiler trace of a production NN sweep stage exceeds the
        # 2 GB XSpace protobuf limit (fails to serialize after a ~59 GB
        # RSS, multi-minute stall); stage-timing JSONs are written on
        # every run without it (outputs/**/profile_{week}.json)
        print("[warn] --profile traces a full production sweep; at this "
              "scale the profiler exceeds the 2 GB XSpace limit (see "
              "CLAUDE.md). Stage timings are recorded without --profile; "
              "combine --profile with --fast for an inspectable trace.",
              file=sys.stderr)
    if args.source is None:
        # operational realtime fits tercile edges on the hindcast record;
        # a synthetic default there would silently score real forecasts
        # against random-data edges
        args.source = ("iridl" if args.config == "realtime" and args.date
                       else "synthetic")

    from .pipelines import CONFIGS, get_config
    if args.list or not args.config:
        for name, cfg in CONFIGS.items():
            print(f"{name:18s} models={'+'.join(cfg.models):16s} "
                  f"years={cfg.years} week={cfg.week} dir={cfg.out_dir!r}")
        print("suite              run several tune configs in one process "
              "(shares compiled programs)")
        print("accs               CC/ACC skill-map sweep (ACCs.ipynb)")
        print("barplot            RPSS boxplot aggregation (Bar_plot.ipynb)")
        print("realtime           realtime eval + GradCAM + MJO/ENSO "
              "(Realtime_fcast_MME)")
        return 0

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .compile_cache import enable_compilation_cache
    enable_compilation_cache()

    if args.config == "accs":
        from .pipelines.notebooks import run_accs
        kw = {}
        if args.models:
            kw["models"] = tuple(args.models.split(","))
        # logs to stderr: stdout stays machine-readable JSON (as barplot)
        out = run_accs(source=args.source, out_root=args.out,
                       seed=args.seed, step=args.step or 2.0,
                       make_plots=args.plots, fig_format=args.fig_format,
                       log=lambda m: print(m, file=sys.stderr), **kw)
        print(json.dumps(out, indent=1))
        return 0
    if args.config == "barplot":
        from .pipelines.notebooks import run_barplot
        rnames = tuple(args.regions.split(",")) if args.regions else None
        runs = None
        if args.runs:
            with open(args.runs) as fh:
                runs = json.load(fh)
        # logs to stderr: stdout stays machine-readable JSON
        print(json.dumps(run_barplot(out_root=args.out, runs=runs,
                                     shapefile=args.shapefile,
                                     region_names=rnames,
                                     log=lambda m: print(m,
                                                         file=sys.stderr)),
                         indent=1))
        return 0
    if args.config == "realtime":
        cfg = get_config(args.from_config)
        from dataclasses import replace
        # mirror the tune-path overrides so the cfg matches the winners
        # being loaded (the manifest fingerprint is validated downstream)
        if args.output != "proba":
            cfg = replace(cfg, output=args.output)
        if args.predictor:
            cfg = replace(cfg, predictor=args.predictor)
        if args.standardize:
            cfg = replace(cfg, standardize=True)
        if args.week:
            cfg = cfg.with_week(args.week)
        if args.date:
            from .pipelines.realtime import run_realtime_forecast
            _, paths = run_realtime_forecast(
                cfg, args.date.split(","), out_root=args.out,
                download=args.download, hindcast_source=args.source,
                seed=args.seed, synthetic_step=args.step,
                fetch_indices=args.indices, make_plots=args.plots)
        else:
            from .pipelines.realtime import run_realtime_eval
            _, paths = run_realtime_eval(cfg, out_root=args.out,
                                         source=args.source, seed=args.seed,
                                         synthetic_step=args.step,
                                         download=args.download,
                                         fetch_indices=args.indices,
                                         make_plots=args.plots)
        print(json.dumps(paths, indent=1))
        return 0

    def _resolve(name):
        cfg = get_config(name)
        if args.fast:
            cfg = cfg.fast_variant()
        from dataclasses import replace
        if args.epochs:
            cfg = replace(cfg, epochs=args.epochs)
        if args.folds:
            cfg = replace(cfg, n_bootstraps=args.folds)
        if args.standardize:
            cfg = replace(cfg, standardize=True)
        if args.output != "proba":
            cfg = replace(cfg, output=args.output)
        if args.predictor:
            cfg = replace(cfg, predictor=args.predictor)
        if args.batch_size:
            try:
                bs = 0 if args.batch_size == "full" else int(args.batch_size)
            except ValueError:
                raise SystemExit("--batch-size must be a positive integer "
                                 "or 'full'") from None
            if args.batch_size != "full" and bs <= 0:
                raise SystemExit("--batch-size must be a positive integer "
                                 "or 'full'")
            cfg = replace(cfg, tuning=replace(cfg.tuning,
                                              batch_sizes=(bs,)))
        return cfg

    def _run(cfg, **kw):
        from .pipelines.tune import run_pipeline
        import numpy as np
        out = run_pipeline(cfg, source=args.source, out_root=args.out,
                           make_plots=args.plots, seed=args.seed,
                           synthetic_step=args.step,
                           training_type=args.training_type, **kw)
        return out, {
            "config": cfg.name,
            "elapsed_s": round(out.elapsed_s, 2),
            "elr_rpss_test_mean": float(np.nanmean(out.elr.rpss_test.values)),
            "nn_rpss_test_mean": float(np.nanmean(out.nn.rpss_test.values)),
        }

    if args.config == "suite":
        # Whole-session runner: several configs in ONE process, so
        # same-shape sweeps reuse compiled programs via the sweep's
        # program memo (the reference runs 8 separate scripts, each
        # paying its own Keras graph builds)
        import os
        import time
        names = (args.configs.split(",") if args.configs
                 else [n for n in CONFIGS])
        weeks = args.week.split(",") if args.week else [None]
        # resolve every name up front: a typo in the 3rd config must not
        # abort the session after an hour of work on the first two
        try:
            from dataclasses import replace as _replace
            cfgs = []
            for nm in names:
                base = _resolve(nm)
                for w in weeks:
                    c = base.with_week(w) if w else base
                    if w:
                        # distinct summary keys per (config, week) — even
                        # for a single --week, so a later plain `suite`
                        # into the same --out never shares keys with it;
                        # the output tree needs no suffix — filenames
                        # carry the week (reference layout, Bar_plot
                        # reads it)
                        c = _replace(c, name=f"{c.name}[{w}]")
                    cfgs.append(c)
        except KeyError as e:
            print(f"error: {e.args[0]}", file=sys.stderr)
            return 2
        # run-settings fingerprint: --resume only reuses results produced
        # under identical settings (a fast smoke must not satisfy a later
        # production resume)
        fingerprint = {k: getattr(args, k) for k in
                       ("fast", "epochs", "folds", "standardize", "output",
                        "predictor", "source", "seed", "step",
                        "training_type", "batch_size", "week")}
        t0 = time.time()
        prior_total = 0.0   # wall already spent in resumed-over sessions
        spath = os.path.join(args.out, "suite_summary.json")
        results = {}
        if args.resume and os.path.exists(spath):
            try:
                with open(spath) as fh:
                    prior = json.load(fh)
            except json.JSONDecodeError:
                print(f"[suite] {spath} is corrupt; starting fresh",
                      file=sys.stderr)
                prior = {}
            if prior.get("settings", {}) == fingerprint:
                # keep successes; failed configs are retried
                results = {k: v for k, v in prior.get("configs", {}).items()
                           if "error" not in v}
                # cumulative wall: a resumed session must not clobber the
                # prior sessions' measured total with its own (short) clock
                prior_total = float(prior.get("total_s", 0.0))
                if results:
                    print(f"[suite] resuming past {sorted(results)}",
                          file=sys.stderr)
            elif prior:
                print("[suite] prior summary has different run settings; "
                      "starting fresh", file=sys.stderr)
        os.makedirs(args.out, exist_ok=True)

        def _dump(partial):
            summary = {"configs": results, "settings": fingerprint,
                       "total_s": round(prior_total + time.time() - t0, 2),
                       "partial": partial}
            tmp = spath + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(summary, fh, indent=1)
            os.replace(tmp, spath)    # atomic: a kill can't truncate it
            return summary

        # Compile-ahead pipeline: a single background thread traces +
        # remote-compiles pending configs' bucket programs into the
        # sweep's process memo (config 0's while its own data/ELR stages
        # run; config N+1's while N trains on-device), moving the
        # 20-500 s/program compiles off the session's critical path.
        from concurrent.futures import ThreadPoolExecutor
        from .pipelines.tune import prefetch_nn_programs

        def _prefetch(cfg):
            try:
                prefetch_nn_programs(cfg, source=args.source,
                                     seed=args.seed,
                                     synthetic_step=args.step,
                                     log=lambda m: print(m,
                                                         file=sys.stderr))
            except Exception as e:      # never fail the suite from here:
                # the real run compiles whatever the memo is missing
                print(f"[suite] prefetch {cfg.name} skipped: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

        pending = [c for c in cfgs if c.name not in results]
        with ThreadPoolExecutor(max_workers=1) as prefetch_pool:
            # The program memo's in-flight dedup (sweep._ProgramMemo.begin)
            # makes a prefetch racing the foreground run on the same
            # program SHARE the compile rather than duplicate it, so the
            # suite never blocks on a prefetch future — and the FIRST
            # config is prefetched too: its bucket compiles start while
            # the foreground is still in the data+ELR stages.
            if pending and args.training_type == "tune":
                prefetch_pool.submit(_prefetch, pending[0])
            for i, cfg in enumerate(pending):
                if i + 1 < len(pending) and args.training_type == "tune":
                    prefetch_pool.submit(_prefetch, pending[i + 1])
                kw = {}
                if args.profile:
                    kw["profile_dir"] = os.path.join(args.profile, cfg.name)
                try:
                    _, results[cfg.name] = _run(cfg, **kw)
                except Exception as e:
                    # one config must not kill the session (e.g. a
                    # transient remote-compile drop); record it —
                    # --resume retries
                    results[cfg.name] = {
                        "config": cfg.name,
                        "error": f"{type(e).__name__}: {e}"}
                    print(f"[suite] {cfg.name} FAILED: {e}",
                          file=sys.stderr)
                _dump(partial=True)   # survive a kill mid-suite
        summary = _dump(partial=False)
        check_failures = []
        if args.check:
            check_failures = _check_suite(results, args.check)
            summary["check"] = {
                "expected": args.check,
                "failures": check_failures,
                "ok": not check_failures}
            # re-dump so the persisted summary carries the gate verdict
            # (not just the stdout copy)
            tmp = spath + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(summary, fh, indent=1)
            os.replace(tmp, spath)
            for line in check_failures:
                print(f"[check] FAIL {line}", file=sys.stderr)
            if not check_failures:
                print("[check] ok: all configs within tolerance",
                      file=sys.stderr)
        print(json.dumps(summary, indent=1))
        if any("error" in r for r in results.values()) or check_failures:
            return 1
        return 0

    try:
        cfg = _resolve(args.config)
        if args.week:
            cfg = cfg.with_week(args.week)
    except KeyError as e:
        print(f"error: {e.args[0]}", file=sys.stderr)
        return 2
    out, summary = _run(cfg, profile_dir=args.profile)
    summary["outputs"] = out.paths
    summary["figures"] = out.figures
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
