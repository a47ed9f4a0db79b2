"""ELR tests: IRLS vs scipy-optimized logistic regression, conversion and
skip/fill conventions, fold vmapping."""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.optimize import minimize

from s2s_ismr_tpu import timeutils
from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.ops import elr, terciles
from s2s_ismr_tpu.train import splits


def _ref_logit_fit(X, y):
    """Unregularized logistic MLE via scipy (stand-in for statsmodels GLM)."""
    def nll(b):
        eta = np.clip(X @ b, -30, 30)
        p = 1 / (1 + np.exp(-eta))
        p = np.clip(p, 1e-12, 1 - 1e-12)
        return -(y * np.log(p) + (1 - y) * np.log(1 - p)).sum()
    res = minimize(nll, np.zeros(X.shape[1]), method="BFGS")
    return res.x


def _design(x):
    """Unscaled reference design matrix [1, x, q] with q = 33/67 blocks."""
    T = len(x)
    x2 = np.concatenate([x, x])
    q = np.concatenate([np.full(T, 33.0), np.full(T, 67.0)])
    return np.stack([np.ones(2 * T), x2, q], axis=1).astype(np.float32)


def test_irls_matches_mle(rng):
    T = 120
    x = rng.normal(2.0, 1.0, T).astype(np.float32)
    X = _design(x)
    true_beta = np.array([0.5, -0.8, 0.01])
    p = 1 / (1 + np.exp(-(X @ true_beta)))
    y = (rng.random(2 * T) < p).astype(np.float32)

    x2 = jnp.asarray(np.concatenate([x, x])[:, None])          # (2T, 1)
    q2 = jnp.asarray(((np.concatenate([np.full(T, 33.0), np.full(T, 67.0)])
                       - 50.0) / 17.0)[:, None].astype(np.float32))
    w = jnp.ones((2 * T, 1), jnp.float32)
    b0, b1, b2 = (np.asarray(v)[0] for v in elr._irls_pixels(
        x2, jnp.asarray(y[:, None]), w, q2))
    # convert from the scaled-q basis back to [1, x, q]
    beta = np.array([b0 - 50.0 * b2 / 17.0, b1, b2 / 17.0])
    beta_ref = _ref_logit_fit(X, y)
    np.testing.assert_allclose(beta, beta_ref, atol=5e-3)


def test_fit_pixel_conventions(rng):
    T = 60
    x = rng.gamma(2, 2, T).astype(np.float32)
    q1, q2 = np.quantile(x, [1 / 3, 2 / 3])
    tgt = np.stack([(x <= q1).astype(np.float32), (x <= q2).astype(np.float32)])
    valid = np.ones(T, bool)
    valid[5:8] = False
    tgt[:, ~valid] = np.nan
    train = np.zeros(T, bool); train[: T // 2] = True
    test = ~train
    y_raw = x.copy()

    probs = np.asarray(elr.elr_fold(
        jnp.asarray(x[:, None]), jnp.asarray(tgt[:, :, None]),
        jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(y_raw[:, None])))[:, 0]
    assert probs.shape == (T, 3)
    # invalid times -> exactly 1/3
    np.testing.assert_allclose(probs[~valid], 1 / 3)
    # valid probabilities sum to 1 and first category is monotone in -x
    np.testing.assert_allclose(probs[valid].sum(-1), 1.0, atol=1e-5)
    lo, hi = x[valid].argmin(), x[valid].argmax()
    assert probs[valid][lo, 0] > probs[valid][hi, 0]


def test_fit_pixel_skip_guards(rng):
    T = 40
    x = rng.gamma(2, 2, T).astype(np.float32)
    tgt = np.stack([(x <= 2).astype(np.float32), (x <= 4).astype(np.float32)])
    valid = np.ones(T, bool)
    train = np.zeros(T, bool); train[: T // 2] = True
    test = ~train

    # raw-NaN pixel -> all NaN
    y_nan = x.copy(); y_nan[3] = np.nan
    p = np.asarray(elr.elr_fold(
        jnp.asarray(x[:, None]), jnp.asarray(tgt[:, :, None]),
        jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(y_nan[:, None])))[:, 0]
    assert np.isnan(p).all()

    # too few valid rows -> skip
    few = np.zeros(T, bool); few[:1] = True
    tgt2 = tgt.copy(); tgt2[:, ~few] = np.nan
    p2 = np.asarray(elr.elr_fold(
        jnp.asarray(x[:, None]), jnp.asarray(tgt2[:, :, None]),
        jnp.asarray(train), jnp.asarray(test),
        jnp.asarray(x[:, None])))[:, 0]
    assert np.isnan(p2).all()


@pytest.mark.slow
def test_elr_folds_end_to_end():
    b = synthetic.synthetic_hindcast(years=(2003, 2010), seed=3, signal=0.8,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    fm = splits.bootstrap_masks_elr(b.years, n_bootstraps=2)
    wm = timeutils.week_window_matrix(1)
    x_mean = b.ensemble_mean()

    tgt_folds, train_m, test_m = [], [], []
    for f in range(2):
        edges, present = terciles.rolling_edges(b.y, b.weeks, fm.train[f], wm)
        tgt_folds.append(np.asarray(
            terciles.elr_targets(b.y, b.weeks, edges, present)))
    probs = np.asarray(elr.elr_folds(x_mean, np.stack(tgt_folds),
                                     fm.train, fm.test, b.y))
    assert probs.shape == (2,) + b.y.shape + (3,)
    ocean = np.isnan(b.y[0])
    assert np.isnan(probs[:, :, ocean]).all()          # skipped pixels NaN
    land = ~ocean
    pv = probs[:, :, land]
    assert np.isfinite(pv).all()
    np.testing.assert_allclose(pv.sum(-1), 1.0, atol=1e-4)
    # ELR should have some skill: test-RPSS vs climatology > 0 on average
    from s2s_ismr_tpu.ops import metrics
    lab0, _, _ = terciles.fit_and_label(b.y, b.weeks, fm.train[0], wm, None,
                                        degenerate_mask=True)
    climo = metrics.climo_forecast(x_mean)
    r = np.asarray(metrics.rpss(climo, probs[0], lab0, fm.test[0]))
    assert np.nanmean(r) > 0.0, f"mean test RPSS {np.nanmean(r)}"


def test_blend_probabilities():
    a = jnp.asarray([[0.5, 0.3, 0.2]])
    c = jnp.asarray([[0.1, 0.2, 0.7]])
    out = np.asarray(elr.blend_probabilities([a, c]))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(out, [[0.3, 0.25, 0.45]], atol=1e-6)
