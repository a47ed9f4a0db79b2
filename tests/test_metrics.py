"""Golden tests for on-device metrics vs independent numpy re-derivations
of the reference formulas (performance_metrics.py, plots.py, ACCs.ipynb)."""

import numpy as np
import pytest

from s2s_ismr_tpu.ops import metrics


# ------------------------------------------------------------------ reference
def ref_rps(fcst, obs_labels):
    """Categorical RPS, mean over T skipping NaNs (xskillscore 'p' mode)."""
    T = obs_labels.shape[0]
    oh = np.full(obs_labels.shape + (3,), np.nan)
    for k in range(3):
        oh[..., k] = (obs_labels == k).astype(float)
    oh[np.isnan(obs_labels)] = np.nan
    cf = np.cumsum(fcst, -1)
    co = np.cumsum(oh, -1)
    score = np.sum((cf - co) ** 2, -1)
    with np.errstate(all="ignore"):
        return np.nanmean(score, axis=0)


def ref_bss(y_pred, t):
    y_pred = y_pred * 0.9999999999999
    msk = ~np.isnan(y_pred + t)
    y_pred, t = y_pred[msk], t[msk]
    base = 1 / 3
    bs = np.mean((y_pred - t) ** 2)
    br = np.mean((base - t) ** 2)
    return 1 - bs / br


def ref_reliability(y_true, y_pred, num_bins=10):
    """Literal transcription of compute_reliability_score (plots.py:13-58):
    digitize(right=True)-1 binning on RAW predictions, no edge scaling."""
    bp = np.zeros(num_bins); bt = np.zeros(num_bins); bc = np.zeros(num_bins)
    edges = np.linspace(0, 1, num_bins + 1)
    idx = np.clip(np.digitize(y_pred, edges, right=True) - 1,
                  0, num_bins - 1)
    for i in range(num_bins):
        m = idx == i
        if m.sum() > 0:
            bp[i] = y_pred[m].mean(); bt[i] = y_true[m].mean()
            bc[i] = m.sum()
    return np.nansum((bp - bt) ** 2 * bc) / bc.sum()


def ref_resolution(preds, obs, num_bins=10):
    """Literal transcription of compute_resolution_score (plots.py:94-139):
    predictions scaled by the edge guard BEFORE digitize(right=True)."""
    scaled = preds * 0.9999999999999
    base = np.nanmean(obs)
    edges = np.linspace(0, 1, num_bins + 1)
    idx = np.clip(np.digitize(scaled, edges, right=True) - 1,
                  0, num_bins - 1)
    bf = np.zeros(num_bins); bc = np.zeros(num_bins)
    for i in range(num_bins):
        m = idx == i
        bc[i] = m.sum()
        if bc[i] > 0:
            bf[i] = obs[m].mean()
    return np.nansum(bc * (bf - base) ** 2) / bc.sum()


# --------------------------------------------------------------------- tests
@pytest.fixture
def prob_data(rng):
    T, Y, X = 60, 5, 6
    logits = rng.normal(size=(T, Y, X, 3))
    fcst = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    obs = rng.integers(0, 3, size=(T, Y, X)).astype(float)
    obs[:, 0, 0] = np.nan          # an all-NaN pixel
    obs[5:9, 1, 1] = np.nan        # partially NaN pixel
    return fcst.astype(np.float32), obs


def test_climo_forecast_shape_and_mask():
    xm = np.array([[1.0, np.nan], [2.0, 3.0]], np.float32)
    f = np.asarray(metrics.climo_forecast(xm))
    assert f.shape == (2, 2, 3)
    assert np.isnan(f[0, 1]).all()
    np.testing.assert_allclose(f[0, 0], 1 / 3, rtol=1e-6)


def test_rps_matches_reference(prob_data):
    fcst, obs = prob_data
    got = np.asarray(metrics.rps(fcst, obs))
    expected = ref_rps(fcst, obs)
    np.testing.assert_allclose(got, expected, atol=1e-5)
    assert np.isnan(got[0, 0])     # all-NaN pixel -> NaN


def test_rps_with_fold_mask(prob_data):
    fcst, obs = prob_data
    mask = np.zeros(fcst.shape[0], bool)
    mask[10:30] = True
    got = np.asarray(metrics.rps(fcst, obs, mask))
    expected = ref_rps(fcst[mask], obs[mask])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_rpss_climo_vs_perfect(prob_data):
    fcst, obs = prob_data
    climo = np.full_like(fcst, 1 / 3)
    # perfect forecast: probability 1 on the observed class
    perfect = np.zeros_like(fcst)
    lab = np.nan_to_num(obs, nan=0).astype(int)
    for k in range(3):
        perfect[..., k] = (lab == k)
    s_perfect = np.asarray(metrics.rpss(climo, perfect, obs))
    s_climo = np.asarray(metrics.rpss(climo, climo, obs))
    ok = ~np.isnan(s_perfect)
    assert np.allclose(s_perfect[ok], 1.0, atol=1e-6)
    assert np.allclose(s_climo[ok], 0.0, atol=1e-6)


def test_bss_rel_res_match_reference(rng):
    n = 4000
    p = rng.random(n)
    t = (rng.random(n) < p * 0.7).astype(float)
    p2, t2 = p.copy(), t.copy()
    p2[::17] = np.nan
    valid = ~np.isnan(p2 + t2)
    np.testing.assert_allclose(float(metrics.brier_skill_score(p2, t2)),
                               ref_bss(p2, t2), atol=1e-5)
    np.testing.assert_allclose(float(metrics.reliability_score(p[valid], t[valid])),
                               ref_reliability(t[valid], p[valid]), atol=1e-5)
    np.testing.assert_allclose(float(metrics.resolution_score(p[valid], t[valid])),
                               ref_resolution(p[valid], t[valid]), atol=1e-5)


def test_binning_exact_edge_values(rng):
    """Pin the digitize(right=True) convention (plots.py:36-39): values
    exactly AT a bin edge belong to the LOWER bin ((i/10, (i+1)/10]), and
    p=0 joins bin 0 — the spots where a floor-based binning diverges."""
    edge_p = np.array([0.0, 0.1, 0.1, 0.2, 0.30000001, 0.5, 1.0] * 30)
    t = (rng.random(edge_p.shape) < edge_p).astype(float)
    np.testing.assert_allclose(
        float(metrics.reliability_score(edge_p, t)),
        ref_reliability(t, edge_p), atol=1e-6)
    np.testing.assert_allclose(
        float(metrics.resolution_score(edge_p, t)),
        ref_resolution(edge_p, t), atol=1e-6)


def test_masked_corr_matches_numpy(rng):
    T = 50
    a = rng.normal(size=(T, 4, 4)).astype(np.float32)
    b = (0.6 * a + 0.8 * rng.normal(size=(T, 4, 4))).astype(np.float32)
    b[:, 0, 0] = np.nan
    a[3:7, 1, 1] = np.nan
    got = np.asarray(metrics.masked_corr(a, b))
    for i in range(4):
        for j in range(4):
            ok = ~np.isnan(a[:, i, j] + b[:, i, j])
            if ok.sum() > 1:
                expected = np.corrcoef(a[ok, i, j], b[ok, i, j])[0, 1]
                np.testing.assert_allclose(got[i, j], expected, atol=1e-4)
            else:
                assert np.isnan(got[i, j])


def test_weekly_climatology_and_acc(rng):
    T = 80
    weeks = (np.arange(T) % 20) + 18
    clim_true = rng.normal(size=(53, 3, 3)).astype(np.float32) * 0 + \
        np.linspace(0, 5, 53)[:, None, None].astype(np.float32)
    noise = rng.normal(size=(T, 3, 3)).astype(np.float32)
    x = clim_true[weeks - 1] + noise
    clim = np.asarray(metrics.weekly_climatology(x, weeks))
    for w in np.unique(weeks):
        sel = weeks == w
        np.testing.assert_allclose(clim[w - 1], x[sel].mean(0), atol=1e-5)
    # ACC of x against itself+noise should be the anomaly correlation,
    # i.e. driven by noise, not by the seasonal cycle
    y = clim_true[weeks - 1] + 0.5 * noise + \
        0.8 * rng.normal(size=(T, 3, 3)).astype(np.float32)
    acc = np.asarray(metrics.anomaly_cc(x, y, weeks))
    cc = np.asarray(metrics.masked_corr(x, y))
    assert np.nanmean(cc) > np.nanmean(acc)  # seasonal cycle inflates raw CC
    assert 0.05 < np.nanmean(acc) < 0.95


def test_anomaly_cc_external_climatology(rng):
    T = 40
    weeks = (np.arange(T) % 10) + 20
    x = rng.normal(size=(T, 2, 2)).astype(np.float32)
    y = x + 0.1 * rng.normal(size=(T, 2, 2)).astype(np.float32)
    ext = np.zeros((53, 2, 2), np.float32)   # zero climatology -> raw corr
    acc = np.asarray(metrics.anomaly_cc(x, y, weeks, x_clim=ext, y_clim=ext))
    cc = np.asarray(metrics.masked_corr(x, y))
    np.testing.assert_allclose(acc, cc, atol=1e-5)
