"""Round-4 production flag-matrix session (VERDICT r3 item 5).

Drives the round-3/4 CLI surface at PRODUCTION scale in ONE process on
whatever chip jax sees (the v5e in the real session):

  1. tune_ECMWF_com  --training-type train      (training.py:119-125 mode)
  2. tune_ECMWF_com  --output deterministic     (deep_nn_models.py:102-105)
  3. tune_GEFS_com   --standardize              (preprocessing.py bootstrap opt)
  4. tune_ECMWF_com  --predictor multi_predictor (preprocessing.py:25-35)
  5. tune_IITM_com   --batch-size full          (PERF.md bs=T opt-in; skill
     delta vs the suite's stock IITM_com run is the PARITY.md table row)
  6. run barplot over the real 8-config suite tree (full cell-5 matrix)
  7. run realtime (eval) + --plots from the suite's persisted winners
  8. run realtime --date (operational, dataloader.py:338-495 flow) over a
     FAKE cached IRIDL transport (this host has zero egress): the cache
     files download_forecast/get_obs read with --no-download are written
     here first, mirroring tests/test_realtime_operational.py.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site \
          python probes/flagmatrix_r4.py [--suite-root runs_r4_suite]

Writes <suite-root>/../runs_r4_flags/flagmatrix_summary.json with one
entry per leg: argv, wall, and the run's own JSON summary (or the error).
A leg failure records the traceback and moves on — the point of the
session is to find exactly those crashes (VERDICT r3 item 5).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
import traceback
from contextlib import redirect_stdout

import numpy as np

EPOCH = np.datetime64("1999-01-01")


def _days(date_str):
    return float((np.datetime64(date_str) - EPOCH) / np.timedelta64(1, "D"))


def _write_nc(path, var, dims, coords, values):
    from scipy.io import netcdf_file
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with netcdf_file(path, "w") as f:
        for d in dims:
            f.createDimension(d, len(coords[d]))
            v = f.createVariable(d, np.float64, (d,))
            v[:] = coords[d]
            if d in ("S", "T"):
                v.units = b"days since 1999-01-01"
        dv = f.createVariable(var, np.float32, dims)
        dv[:] = values.astype(np.float32)


def write_fake_operational_cache(cache_dir="download"):
    """Fake IRIDL cache for tune_ECMWF_com dated forecasts: the files
    gateway.download_forecast/get_obs resolve with download=False
    (naming: gateway.py:260-263, 280-281). ECMWF lead (16,30) stamps the
    mid-lead valid time at S+23d; obs rows sit exactly there."""
    lats = 7.0 + np.arange(32.0)
    lons = 67.0 + np.arange(32.0)
    rng = np.random.default_rng(7)
    d = os.path.join(cache_dir, "Common Period", "ECMWF_IMD")
    for date, mon, day in [("2023-06-15", "Jun", 15),
                           ("2023-06-22", "Jun", 22)]:
        _write_nc(os.path.join(
                      d, f"forecast_ECMWF_{day}_{mon}_2023_ld16-30.nc"),
                  "prcp", ("S", "M", "Y", "X"),
                  {"S": np.array([_days(date)]),
                   "M": np.arange(1.0, 12.0), "Y": lats, "X": lons},
                  rng.gamma(2, 2, size=(1, 11, 32, 32)))
    t_obs = np.array([_days("2023-07-08"), _days("2023-07-15"),
                      _days("2023-07-22")])
    _write_nc(os.path.join(d, "IMD_wk3-4.nc"), "prcp", ("T", "Y", "X"),
              {"T": t_obs, "Y": lats, "X": lons},
              rng.gamma(2, 2, size=(3, 32, 32)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite-root", default="runs_r4_suite",
                    help="out root of the completed production suite "
                         "(winners + outputs tree for legs 6-8)")
    ap.add_argument("--flags-root", default="runs_r4_flags")
    ap.add_argument("--legs", default=None,
                    help="comma-separated subset of leg names")
    args = ap.parse_args(argv)

    from s2s_ismr_tpu import run as cli

    legs = [
        ("train_mode", ["tune_ECMWF_com", "--training-type", "train",
                        "--out", f"{args.flags_root}/train"]),
        ("deterministic", ["tune_ECMWF_com", "--output", "deterministic",
                           "--out", f"{args.flags_root}/det"]),
        ("standardize", ["tune_GEFS_com", "--standardize",
                         "--out", f"{args.flags_root}/std"]),
        ("multi_predictor", ["tune_ECMWF_com", "--predictor",
                             "multi_predictor",
                             "--out", f"{args.flags_root}/mp"]),
        ("batch_full", ["tune_IITM_com", "--batch-size", "full",
                        "--out", f"{args.flags_root}/bsf"]),
        ("barplot", ["barplot", "--out", args.suite_root]),
        ("realtime_eval", ["realtime", "--from-config", "tune_ECMWF_com",
                           "--out", args.suite_root, "--plots"]),
        ("realtime_dated", ["realtime", "--from-config", "tune_ECMWF_com",
                            "--out", args.suite_root, "--synthetic",
                            "--date", "2023-06-15,2023-06-22",
                            "--no-download", "--no-indices", "--plots"]),
    ]
    if args.legs:
        keep = set(args.legs.split(","))
        legs = [l for l in legs if l[0] in keep]

    os.makedirs(args.flags_root, exist_ok=True)
    results = {}
    spath = os.path.join(args.flags_root, "flagmatrix_summary.json")
    for name, leg_argv in legs:
        if name == "realtime_dated":
            write_fake_operational_cache()
        print(f"\n===== [{name}] run {' '.join(leg_argv)}", flush=True)
        buf = io.StringIO()
        t0 = time.time()
        try:
            with redirect_stdout(buf):
                rc = cli.main(leg_argv)
            out = buf.getvalue()
            # pipeline stage logs share stdout with the CLI's final JSON
            # summary — parse the LAST top-level JSON object, not the
            # whole stream
            payload = None
            for m in reversed(list(re.finditer(r"^\{", out, re.M))):
                try:
                    # raw_decode ignores trailing text, so a log line
                    # printed AFTER the CLI's JSON summary cannot make
                    # every candidate fail (json.loads on the full
                    # remainder required the JSON to end the stream)
                    payload, _ = json.JSONDecoder().raw_decode(out,
                                                               m.start())
                    break
                except json.JSONDecodeError:
                    continue
            if payload is None:
                payload = {"stdout_tail": out[-2000:]}
            results[name] = {"argv": leg_argv, "rc": rc,
                             "wall_s": round(time.time() - t0, 2),
                             "result": payload}
        except BaseException as e:          # record + continue; the
            # session's job is to FIND these (keyboard interrupt excluded)
            if isinstance(e, KeyboardInterrupt):
                raise
            sys.stdout.write(buf.getvalue())
            results[name] = {"argv": leg_argv,
                             "wall_s": round(time.time() - t0, 2),
                             "error": f"{type(e).__name__}: {e}",
                             "traceback": traceback.format_exc()}
            print(f"===== [{name}] FAILED: {e}", flush=True)
        else:
            print(f"===== [{name}] done rc={rc} "
                  f"{results[name]['wall_s']:.1f}s", flush=True)
        with open(spath + ".tmp", "w") as fh:
            json.dump(results, fh, indent=1)
        os.replace(spath + ".tmp", spath)
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk != "traceback"}
                      for k, v in results.items()}, indent=1))
    return 1 if any("error" in r for r in results.values()) else 0


if __name__ == "__main__":
    sys.exit(main())
