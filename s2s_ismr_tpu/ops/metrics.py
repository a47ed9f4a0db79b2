"""Probabilistic skill metrics, fully on device and fold-mask aware.

Reference semantics reproduced:
  * climo_predict (performance_metrics.py:11-23): constant 1/3 forecast,
    NaN-masked where the ensemble-mean predictor is NaN.
  * rps/rpss (performance_metrics.py:26-45): categorical ranked probability
    score via cumulative distributions, mean over the time axis skipping
    NaN entries (what xskillscore.rps(..., input_distributions='p') does),
    and RPSS = 1 - RPS_fcst / RPS_ref per pixel.
  * BSS / reliability / resolution (plots.py:13-139): 10-bin diagnostics
    with the reference's exact binning and its pinned 1/3 base rate for BSS.
  * CC / ACC (ACCs.ipynb cells 13/25/38): Pearson correlation over time of
    raw fields / ISO-week anomaly fields (optionally vs an external
    lead-dependent climatology like GEFS dc0018).

Every function takes an explicit time mask so a single jitted program can
evaluate all CV folds via vmap — the fold axis is data, not Python.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quantiles import masked_mean
from .terciles import one_hot_labels

N_CATEGORIES = 3


# --------------------------------------------------------------------- climo
def climo_forecast(x_mean):
    """(T,*S) ensemble-mean predictor -> (T,*S,3) constant-1/3 forecast,
    NaN where the predictor is NaN."""
    x_mean = jnp.asarray(x_mean, jnp.float32)
    f = jnp.full(x_mean.shape + (N_CATEGORIES,), 1.0 / N_CATEGORIES, jnp.float32)
    return jnp.where(jnp.isnan(x_mean)[..., None], jnp.nan, f)


# ----------------------------------------------------------------------- RPS
def rps(fcst, obs_labels, t_mask=None):
    """Ranked probability score per pixel.

    fcst: (T,*S,3) tercile probabilities; obs_labels: (T,*S) 0/1/2/NaN;
    t_mask: (T,) bool fold-membership (None = all). Returns (*S,) float32,
    NaN where no valid samples.
    """
    fcst = jnp.asarray(fcst, jnp.float32)
    obs_oh = one_hot_labels(obs_labels, N_CATEGORIES)
    cum_f = jnp.cumsum(fcst, axis=-1)
    cum_o = jnp.cumsum(obs_oh, axis=-1)
    score = jnp.sum((cum_f - cum_o) ** 2, axis=-1)     # (T,*S); NaN propagates
    if t_mask is None:
        t_mask = jnp.ones(score.shape[0], bool)
    m = jnp.asarray(t_mask, bool).reshape((-1,) + (1,) * (score.ndim - 1))
    return masked_mean(score, m, axis=0)


def rpss(reference_fcst, fcst, obs_labels, t_mask=None):
    """1 - RPS(fcst)/RPS(reference) per pixel (performance_metrics.py:44-45)."""
    return 1.0 - rps(fcst, obs_labels, t_mask) / rps(reference_fcst, obs_labels, t_mask)


# ------------------------------------------------------- binned diagnostics
_EDGE_SCALE = 0.9999999999999  # reference's digitize edge-case guard (plots.py:72)


def _bin_stats(y_pred, y_true, valid, num_bins=10):
    """Shared 10-bin machinery with the reference's EXACT binning
    convention (plots.py:36-39, 125-128): np.digitize(p, linspace(0,1,11),
    right=True) - 1 clipped to [0, nbins-1] — i.e. left-exclusive bins
    (i/n, (i+1)/n], with p <= 0 joining bin 0. ceil(p*n)-1 reproduces
    digitize(right=True) on uniform edges."""
    p = jnp.asarray(y_pred, jnp.float32).ravel()
    t = jnp.asarray(y_true, jnp.float32).ravel()
    v = jnp.asarray(valid, bool).ravel() & jnp.isfinite(p) & jnp.isfinite(t)
    idx = jnp.clip(jnp.ceil(p * num_bins).astype(jnp.int32) - 1,
                   0, num_bins - 1)
    w = v.astype(jnp.float32)
    counts = jnp.zeros(num_bins, jnp.float32).at[idx].add(w)
    sum_p = jnp.zeros(num_bins, jnp.float32).at[idx].add(jnp.where(v, p, 0.0))
    sum_t = jnp.zeros(num_bins, jnp.float32).at[idx].add(jnp.where(v, t, 0.0))
    denom = jnp.maximum(counts, 1.0)
    return counts, sum_p / denom, sum_t / denom        # counts, avg pred, obs freq


def reliability_score(y_pred, y_true, valid=None, num_bins=10):
    """Count-weighted mean squared (avg-pred - obs-freq), the reference's
    compute_reliability_score (plots.py:13-58). Note the reference scales
    y_pred by 0.9999999999999 in BSS/resolution but NOT here — binning and
    averages both use the raw probabilities (plots.py:27-52)."""
    if valid is None:
        valid = jnp.ones_like(jnp.asarray(y_pred), bool)
    counts, avg_p, obs_f = _bin_stats(y_pred, y_true, valid, num_bins)
    total = jnp.maximum(counts.sum(), 1.0)
    return jnp.sum((avg_p - obs_f) ** 2 * counts) / total


def brier_skill_score(y_pred, y_true, valid=None, base_rate=1.0 / 3.0):
    """BSS with the reference's pinned 1/3 base rate (plots.py:80-81)."""
    p = jnp.asarray(y_pred, jnp.float32).ravel() * _EDGE_SCALE
    t = jnp.asarray(y_true, jnp.float32).ravel()
    if valid is None:
        valid = jnp.ones_like(p, bool)
    v = jnp.asarray(valid, bool).ravel() & jnp.isfinite(p) & jnp.isfinite(t)
    bs = masked_mean((p - t) ** 2, v)
    br = masked_mean((base_rate - t) ** 2, v)
    return 1.0 - bs / br


def resolution_score(y_pred, y_true, valid=None, num_bins=10):
    """Count-weighted (obs-freq - base-rate)^2; base rate is the observed
    mean, and predictions are scaled by the reference's edge guard BEFORE
    binning (plots.py:109-128 — unlike reliability, which bins raw)."""
    p = jnp.asarray(y_pred, jnp.float32).ravel() * _EDGE_SCALE
    t = jnp.asarray(y_true, jnp.float32).ravel()
    if valid is None:
        valid = jnp.ones_like(p, bool)
    v = jnp.asarray(valid, bool).ravel() & jnp.isfinite(p) & jnp.isfinite(t)
    base = masked_mean(t, v)
    counts, _avg_p, obs_f = _bin_stats(p, y_true, v, num_bins)
    total = jnp.maximum(counts.sum(), 1.0)
    return jnp.sum(counts * (obs_f - base) ** 2) / total


# ------------------------------------------------------------------ ACC / CC
def masked_corr(a, b, t_mask=None):
    """Pearson correlation over the leading (time) axis, skipping samples
    where either input is NaN — xr.corr semantics (ACCs.ipynb cell 13)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ok = jnp.isfinite(a) & jnp.isfinite(b)
    if t_mask is not None:
        ok = ok & jnp.asarray(t_mask, bool).reshape((-1,) + (1,) * (a.ndim - 1))
    n = jnp.sum(ok, 0).astype(jnp.float32)
    aw = jnp.where(ok, a, 0.0)
    bw = jnp.where(ok, b, 0.0)
    den = jnp.maximum(n, 1.0)
    ma, mb = jnp.sum(aw, 0) / den, jnp.sum(bw, 0) / den
    da = jnp.where(ok, a - ma, 0.0)
    db = jnp.where(ok, b - mb, 0.0)
    cov = jnp.sum(da * db, 0)
    var = jnp.sqrt(jnp.sum(da * da, 0) * jnp.sum(db * db, 0))
    out = cov / jnp.where(var > 0, var, jnp.nan)
    return jnp.where(n > 1, out, jnp.nan)


def weekly_climatology(v, weeks, t_mask=None, n_weeks=53):
    """Per-ISO-week mean over time: (T,*S) -> (53,*S). The sample-mean
    climatology the ACC notebook builds per week (ACCs.ipynb cells 13/25)."""
    v = jnp.asarray(v, jnp.float32)
    w0 = jnp.asarray(weeks, jnp.int32) - 1
    ok = jnp.isfinite(v)
    if t_mask is not None:
        ok = ok & jnp.asarray(t_mask, bool).reshape((-1,) + (1,) * (v.ndim - 1))
    okf = ok.astype(jnp.float32)
    shape = (n_weeks,) + v.shape[1:]
    num = jnp.zeros(shape, jnp.float32).at[w0].add(jnp.where(ok, v, 0.0))
    den = jnp.zeros(shape, jnp.float32).at[w0].add(okf)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), jnp.nan)


def anomaly_cc(x_mean, y, weeks, x_clim=None, y_clim=None, t_mask=None):
    """ACC: correlation of ISO-week anomalies. Pass x_clim (53,*S) or a
    per-sample (T,*S) climatology to use an external lead-dependent product
    (the GEFS dc0018 path, ACCs.ipynb cell 38); default is the sample
    weekly climatology."""
    x_mean = jnp.asarray(x_mean, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    w0 = jnp.asarray(weeks, jnp.int32) - 1
    if x_clim is None:
        x_clim = weekly_climatology(x_mean, weeks, t_mask)
    if y_clim is None:
        y_clim = weekly_climatology(y, weeks, t_mask)
    xc = x_clim[w0] if x_clim.shape[0] == 53 else x_clim
    yc = y_clim[w0] if y_clim.shape[0] == 53 else y_clim
    return masked_corr(x_mean - xc, y - yc, t_mask)
