"""Realtime forecast evaluation with GradCAM + MJO/ENSO diagnostics.

Rebuilds the capability of the reference's Realtime_fcast_MME.ipynb,
which is MISSING from the snapshot (.MISSING_LARGE_BLOBS; README.md:22
describes it: 2023 realtime forecast evaluation, GradCAM maps, MJO/ENSO
diagnostics). The surviving plumbing it relied on — download_forecast and
get_obs (dataloader.py:338-495) — maps to data/gateway.py here.

Flow: load per-fold winner checkpoints -> fetch realtime forecasts for a
set of init dates -> predict tercile probabilities (optionally MME-blend
across models) -> label verifying obs with the hindcast-trained rolling
terciler -> score (RPS, hit rate) -> GradCAM attribution per date ->
composite skill by MJO phase and ENSO state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import attrib, timeutils
from ..ops import metrics, terciles
from ..train import checkpoint


# ---------------------------------------------------- MJO / ENSO machinery
def mjo_phase(rmm1, rmm2, active_threshold=1.0):
    """Standard WH04 8-phase MJO classification from the RMM index.
    Returns (phase 1..8 int array, active bool array)."""
    rmm1 = np.asarray(rmm1, float)
    rmm2 = np.asarray(rmm2, float)
    amp = np.hypot(rmm1, rmm2)
    ang = np.arctan2(rmm2, rmm1)          # [-pi, pi), 0 = +RMM1 axis
    # phase 1 starts at 180 deg and advances clockwise through the WH04 wheel
    phase = (np.floor((ang + np.pi) / (np.pi / 4)).astype(int) % 8) + 1
    return phase, amp >= active_threshold


def enso_state(nino34_anom, threshold=0.5):
    """'elnino' / 'neutral' / 'lanina' per sample from Nino3.4 anomalies."""
    a = np.asarray(nino34_anom, float)
    out = np.full(a.shape, "neutral", dtype=object)
    out[a >= threshold] = "elnino"
    out[a <= -threshold] = "lanina"
    return out


def composite_by(values, groups):
    """Mean of `values` (T, ...) per distinct group label."""
    groups = np.asarray(groups)
    out = {}
    for g in np.unique(groups):
        sel = groups == g
        with np.errstate(all="ignore"):
            out[str(g)] = np.nanmean(values[sel], axis=0)
    return out


# ------------------------------------------------------------ the pipeline
@dataclass
class RealtimeResult:
    probs: np.ndarray                     # (T, Y, X, 3)
    labels: Optional[np.ndarray]          # (T, Y, X) verifying terciles
    rps_map: Optional[np.ndarray]         # (Y, X)
    rpss_map: Optional[np.ndarray]        # (Y, X) vs climatology
    gradcam_maps: Optional[np.ndarray]    # (T, Y, X)
    mjo_composites: Dict[str, np.ndarray] = field(default_factory=dict)
    enso_composites: Dict[str, np.ndarray] = field(default_factory=dict)


def evaluate_realtime(model, variables, x_images, hindcast_obs,
                      hindcast_weeks, fcst_weeks, obs=None,
                      rmm=None, nino34=None, gradcam_category=2,
                      window=1):
    """Evaluate realtime forecasts against the hindcast climatology.

    model/variables: a winner checkpoint (train/checkpoint.py).
    x_images:     (T, H, W, C) realtime ensemble-mean forecast images
    hindcast_obs: (Th, H, W) the obs record used to fit tercile edges
                  (labels realtime obs exactly like training labels)
    hindcast_weeks/fcst_weeks: ISO weeks of both axes
    obs:          optional (T, H, W) verifying observations
    rmm:          optional (T, 2) RMM1/RMM2 MJO index at init time
    nino34:       optional (T,) Nino3.4 anomaly at init time
    """
    x = jnp.asarray(x_images, jnp.float32)
    probs = np.asarray(model.apply(variables, x, train=False))

    labels = rps_map = rpss_map = None
    if obs is not None:
        wm = timeutils.week_window_matrix(window)
        pool = np.ones(hindcast_obs.shape[0], bool)
        edges, present = terciles.rolling_edges(hindcast_obs, hindcast_weeks,
                                                pool, wm)
        labels = np.asarray(terciles.label_terciles(
            jnp.asarray(obs), fcst_weeks, edges, present))
        rps_map = np.asarray(metrics.rps(probs, labels))
        climo = np.full_like(probs, 1.0 / 3.0)
        rpss_map = np.asarray(metrics.rpss(climo, probs, labels))

    cams = np.asarray(attrib.gradcam(model, variables, x,
                                     category=gradcam_category))

    res = RealtimeResult(probs=probs, labels=labels, rps_map=rps_map,
                         rpss_map=rpss_map, gradcam_maps=cams)
    above = probs[..., 2]
    if rmm is not None:
        phase, active = mjo_phase(rmm[:, 0], rmm[:, 1])
        lab = np.where(active, phase.astype(str), "inactive")
        res.mjo_composites = composite_by(above, lab)
    if nino34 is not None:
        res.enso_composites = composite_by(above, enso_state(nino34))
    return res


def load_winner_for_realtime(models_dir, week, architecture="unet"):
    """Pick the best fold's checkpoint by stored val_loss."""
    import json
    import os
    with open(os.path.join(models_dir, f"winners_{week}.json")) as f:
        manifest = json.load(f)
    best = min(manifest, key=lambda e: e["val_loss"])
    return checkpoint.load_winner(models_dir, week, best["fold"],
                                  architecture)
