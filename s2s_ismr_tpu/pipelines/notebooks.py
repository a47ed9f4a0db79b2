"""CLI drivers replacing the reference's analysis notebooks.

`accs`   = ACCs.ipynb (40 cells): per model and lead week, climatology
           maps + CC/ACC skill maps, written as netcdfs + PNG panels.
           Lead windows per the notebook: wk1/wk2 from the standard
           mapping, wk3=(16,22), wk4=(23,29) ((23,30) for ECMWF),
           wk3-4 combined (cells 4-8/17-21/30-34).
`barplot`= Bar_plot.ipynb (21 cells): aggregate saved RPSS netcdfs into
           lead/model/arch boxplots, optionally split by homogeneous
           climate regions rasterized from a met-subdivision shapefile.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np

from .. import analysis
from ..field import Field
from ..io import write_netcdf

# ACCs.ipynb lead windows (cells 4-8); ECMWF wk4 runs to day 30
ACC_LEADS = {"wk1": (2, 8), "wk2": (9, 15), "wk3": (16, 22),
             "wk4": (23, 29), "wk3-4": (16, 29)}
ACC_LEADS_ECMWF = {**ACC_LEADS, "wk4": (23, 30), "wk3-4": (16, 30)}


def run_accs(models: Sequence[str] = ("IITM", "ECMWF", "GEFS"),
             source="synthetic", out_root=".", years=(2003, 2018),
             obs="IMD", domain=None, seed=0, step=2.0, make_plots=False,
             log=print) -> Dict[str, dict]:
    """CC/ACC skill-map sweep across models and lead weeks."""
    from ..grid import Domain
    domain = domain or Domain(67, 98, 7, 38)
    out: Dict[str, dict] = {}
    for model in models:
        leads = ACC_LEADS_ECMWF if model == "ECMWF" else ACC_LEADS

        def make_bundle(wk, lead, model=model):
            if source == "synthetic":
                from ..data import synthetic
                return synthetic.synthetic_hindcast(
                    model=model, obs=obs, years=years, domain=domain,
                    step=step, seed=seed, lead=lead)
            from ..data import gateway
            # week=wk keys the download cache per lead window — a shared
            # name would silently serve one lead's data for another
            x, y = gateway.get_data(years=years, download=True, week=wk,
                                    model=model, obs=obs,
                                    domain=domain.as_tuple(),
                                    season="May-Sep", custom_lead=lead)
            return gateway.to_bundle(x, y, name=f"{model}_{obs}")

        if model == "GEFS" and source == "iridl":
            # GEFS ACC uses the dc0018 lead-dependent model climatology
            # instead of the sample weekly mean (ACCs.ipynb cells 28/38);
            # the file is lead-independent, so download it once
            from ..data import gateway
            _clim_dl = {"download": True}

            def make_clim(lead, bundle):
                s_dates, clim = gateway.get_gefs_climatology(
                    domain.as_tuple(), lead, log=log, **_clim_dl)
                _clim_dl["download"] = False
                return gateway.external_clim_for_times(
                    bundle.t, lead, s_dates, clim)
        else:
            make_clim = None

        maps = {}
        for wk, lead in leads.items():
            b = make_bundle(wk, lead)
            ext = make_clim(lead, b) if make_clim else None
            maps[wk] = analysis.compute_skill_maps(b, external_clim=ext)
        out_dir = os.path.join(out_root, "outputs", "ACC", f"{model}_{obs}")
        paths = {}
        for wk, sm in maps.items():
            coords = {"Y": sm.lats, "X": sm.lons}
            fld = Field(np.stack([sm.cc, sm.acc, sm.climatology,
                                  sm.climatology_fcst]),
                        ("metric", "Y", "X"), coords, "skill")
            paths[wk] = write_netcdf(
                fld, os.path.join(out_dir, f"ccacc_{wk}.nc"))
            log(f"[accs] {model} {wk}: CC mean "
                f"{np.nanmean(sm.cc):+.3f}, ACC mean {np.nanmean(sm.acc):+.3f}")
        if make_plots:
            from ..viz import maps as vmaps
            figdir = os.path.join(out_root, "figures", "ACC",
                                  f"{model}_{obs}")
            for wk, sm in maps.items():
                coords = {"Y": sm.lats, "X": sm.lons}
                paths[f"fig_{wk}"] = next(iter(vmaps.plot_rpss_panels(
                    {"CC": Field(sm.cc[None], ("bootstrap", "Y", "X"),
                                 coords, "cc"),
                     "ACC": Field(sm.acc[None], ("bootstrap", "Y", "X"),
                                  coords, "acc")},
                    sm.lats, sm.lons, figdir, f"CCACC_{wk}",
                    vmin=-0.6, vmax=0.6).values()))
                # mm/day climatology maps — the notebook renders these
                # ONLY for the weeks3-4 window (cells 10-11/23/36 all
                # plot x_week34/y_week34); ECMWF's forecast field is a
                # 14-day accumulation there, divided by 14 (cell 23 —
                # IITM/GEFS cells 11/36 have no division)
                if wk == "wk3-4":
                    scale = 1.0 / 14.0 if model == "ECMWF" else 1.0
                    paths[f"fig_climo_obs_{wk}"] = vmaps.plot_climatology(
                        sm.climatology, sm.lats, sm.lons,
                        os.path.join(figdir, f"climo_obs_{wk}.png"))
                    paths[f"fig_climo_{wk}"] = vmaps.plot_climatology(
                        sm.climatology_fcst * scale, sm.lats, sm.lons,
                        os.path.join(figdir, f"climo_{wk}.png"))
        out[model] = paths
    return out


# Bar_plot.ipynb cell-5 run matrix: which saved outputs to aggregate
DEFAULT_BARPLOT_RUNS = [
    {"period_dir": "Common Period/", "model": "ECMWF", "obs": "IMD",
     "arch": "unet", "week": "wk3-4", "label": "wk3-4"},
    {"period_dir": "Common Period/", "model": "ECMWF", "obs": "IMD",
     "arch": "ELR", "week": "wk3-4", "label": "wk3-4"},
    {"period_dir": "Common Period/", "model": "GEFS", "obs": "IMD",
     "arch": "unet", "week": "wk2", "label": "wk2"},
    {"period_dir": "Common Period/", "model": "GEFS", "obs": "IMD",
     "arch": "ELR", "week": "wk2", "label": "wk2"},
    {"period_dir": "Common Period/", "model": "IITM", "obs": "IMD",
     "arch": "unet", "week": "wk3-4", "label": "wk3-4"},
    {"period_dir": "Common Period/", "model": "IITM", "obs": "IMD",
     "arch": "ELR", "week": "wk3-4", "label": "wk3-4"},
]


def run_barplot(out_root=".", runs: Optional[list] = None,
                shapefile: Optional[str] = None,
                region_names: Optional[Sequence[str]] = None,
                ylim=(-0.2, 0.5), log=print) -> Dict[str, str]:
    """Aggregate saved RPSS netcdfs into boxplots (skips absent runs)."""
    runs = runs if runs is not None else DEFAULT_BARPLOT_RUNS
    present = []
    for r in runs:
        p = os.path.join(out_root, "outputs", r["period_dir"],
                         f"{r['model']}_{r['obs']}",
                         f"{r['arch']}_rpss_test_{r['week']}.nc")
        (present.append(r) if os.path.exists(p)
         else log(f"[barplot] skipping missing {p}"))
    if not present:
        raise FileNotFoundError(
            f"no rpss outputs found under {out_root}/outputs — run tune "
            f"pipelines first")
    figdir = os.path.join(out_root, "figures", "barplots")
    paths = {}
    table = analysis.rpss_records(present, out_root)
    paths["by_model"] = analysis.rpss_boxplot(
        table, os.path.join(figdir, "rpss_by_model.png"),
        by="model", hue="arch", ylim=ylim)
    paths["by_lead"] = analysis.rpss_boxplot(
        table, os.path.join(figdir, "rpss_by_lead.png"),
        by="lead", hue="arch", ylim=ylim)
    if shapefile:
        f0 = analysis.load_rpss(out_root, present[0]["period_dir"],
                                present[0]["model"], present[0]["obs"],
                                present[0]["arch"], present[0]["week"])
        rt = analysis.region_rpss(out_root, shapefile, present,
                                  f0.coords["Y"], f0.coords["X"],
                                  region_names)
        paths["by_region"] = analysis.rpss_boxplot(
            rt, os.path.join(figdir, "rpss_by_region.png"),
            by="region", hue="arch", ylim=ylim)
    summary = {k: v for k, v in paths.items()}
    log(f"[barplot] {json.dumps(summary)}")
    return paths
