"""ELR edge-case behavior vs statsmodels-GLM semantics on pathological
pixels (VERDICT round-1 item 6).

statsmodels itself is not installed in this image, so the oracle here is a
numpy IRLS transcription of sm.GLM(Binomial).fit() defaults: unpenalized
Newton scoring on [const, precip, quantile-indicator], maxiter=100,
convergence on deviance change (statsmodels.genmod.generalized_linear_model
defaults). Notes on the reference's actual control flow
(training.py:430-524):
  * the GLM fit itself is NOT wrapped in try/except — only predict() is;
    GLM(Binomial) does not raise on perfect separation (unlike sm.Logit),
    it runs to maxiter and the fitted probabilities saturate toward 0/1;
  * pixels failing the validity guards (any raw-NaN ytrain, NaN features,
    <= 2 usable rows) are skipped BEFORE fitting and stay NaN
    (training.py:435-481);
  * label-invalid times inside a fitted pixel are filled with 1/3
    (training.py:510,524).
Our fixed-30-iteration clipped IRLS must match the oracle's *predicted
probabilities* on such pixels (the betas may differ once saturated — the
predictions are what flow into RPSS).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from s2s_ismr_tpu.ops import elr


# ----------------------------------------------------- statsmodels oracle
def glm_binomial_irls(X, y, maxiter=100, tol=1e-8):
    """sm.GLM(y, X, family=Binomial()).fit() transcription: IRLS/Newton
    with no regularization, convergence on deviance change."""
    beta = np.zeros(X.shape[1])
    dev_old = np.inf
    for _ in range(maxiter):
        eta = X @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        mu = np.clip(mu, 1e-10, 1 - 1e-10)
        s = mu * (1 - mu)
        z = eta + (y - mu) / s
        W = s
        XtWX = X.T @ (X * W[:, None])
        XtWz = X.T @ (W * z)
        beta, *_ = np.linalg.lstsq(XtWX, XtWz, rcond=None)
        with np.errstate(all="ignore"):
            dev = -2 * np.sum(y * np.log(mu) + (1 - y) * np.log(1 - mu))
        if abs(dev - dev_old) < tol:
            break
        dev_old = dev
    return beta


def oracle_pixel_probs(x_t, y33, y66, train_mask):
    """Reference per-pixel fit + cumulative->categorical conversion
    (training.py:484-524) via the oracle GLM. Returns (T, 3)."""
    T = len(x_t)
    rows_x = np.concatenate([x_t, x_t])
    rows_q = np.concatenate([np.full(T, 33.0), np.full(T, 67.0)])
    rows_y = np.concatenate([y33, y66])
    keep = np.concatenate([train_mask, train_mask]) & ~np.isnan(rows_y)
    X = np.stack([np.ones(keep.sum()), rows_x[keep], rows_q[keep]], 1)
    beta = glm_binomial_irls(X, rows_y[keep])
    eta = beta[0] + beta[1] * rows_x + beta[2] * rows_q
    p = 1.0 / (1.0 + np.exp(-eta))
    p1, p2 = p[:T], p[T:]
    return np.stack([p1, p2 - p1, 1 - p2], -1)


def _run_ours(x_t, y33, y66, train_mask, test_mask=None):
    """Single-pixel call through the production elr_fold (1x1 grid)."""
    T = len(x_t)
    tm = np.asarray(train_mask, bool)
    sm_ = np.asarray(test_mask if test_mask is not None else ~tm, bool)
    probs = np.asarray(elr.elr_fold(
        jnp.asarray(x_t.reshape(T, 1, 1), jnp.float32),
        jnp.asarray(np.stack([y33, y66]).reshape(2, T, 1, 1), jnp.float32),
        jnp.asarray(tm), jnp.asarray(sm_),
        jnp.asarray(np.ones((T, 1, 1)), jnp.float32)))
    return probs[:, 0, 0, :]


def test_well_behaved_pixel_matches_oracle(rng):
    T = 60
    x = rng.gamma(2, 2, T).astype(np.float64)
    # targets consistent with a real tercile structure + noise
    y33 = ((x + rng.normal(0, 1.5, T)) < np.quantile(x, 1 / 3)).astype(float)
    y66 = np.maximum(y33, ((x + rng.normal(0, 1.5, T))
                           < np.quantile(x, 2 / 3)).astype(float))
    tm = np.ones(T, bool); tm[-15:] = False
    want = oracle_pixel_probs(x, y33, y66, tm)
    got = _run_ours(x, y33, y66, tm)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_perfectly_separable_pixel_saturates_like_glm(rng):
    """Perfect separation: GLM(Binomial) does not raise (no except path
    runs, training.py:484-491 wraps only predict); the fit saturates and
    predictions go to 0/1. Ours must saturate identically."""
    T = 40
    x = np.sort(rng.gamma(2, 2, T)).astype(np.float64)
    thr = np.median(x)
    y33 = (x < thr).astype(float)            # perfectly separated in x
    y66 = np.ones(T)                          # q66 block saturated at 1
    tm = np.ones(T, bool); tm[::4] = False    # reference needs test rows
    want = oracle_pixel_probs(x, y33, y66, tm)
    got = _run_ours(x, y33, y66, tm)
    # saturated regime: probabilities agree to ~1e-2 even though betas
    # differ (both sides are far along the separation direction)
    np.testing.assert_allclose(got, want, atol=1e-2)
    # and the below-category really is ~1 below the threshold, ~0 above
    assert got[x < thr - 0.5, 0].min() > 0.95
    assert got[x > thr + 0.5, 0].max() < 0.05


def test_constant_target_block(rng):
    """A block with all-one targets (every sample below q66 — common for
    short records): intercept runs away; predictions must saturate at 1
    for the cumulative p2, i.e. 'above' probability ~0, matching GLM."""
    T = 30
    x = rng.gamma(2, 2, T)
    y33 = rng.integers(0, 2, T).astype(float)
    y66 = np.ones(T)
    tm = np.ones(T, bool); tm[::4] = False
    want = oracle_pixel_probs(x, y33, y66, tm)
    got = _run_ours(x, y33, y66, tm)
    np.testing.assert_allclose(got[:, 2], want[:, 2], atol=1e-2)
    assert got[:, 2].max() < 0.01            # P(above) ~ 0 everywhere


def test_constant_predictor_pixel(rng):
    """x constant across T (e.g. a dry-season pixel after regridding):
    the x column is collinear with the constant; statsmodels' lstsq-based
    scoring still converges to the intercept+quantile fit. Predictions
    must match the oracle's (which handles the singularity via lstsq)."""
    T = 50
    x = np.full(T, 3.7)
    lab = rng.integers(0, 3, T)
    y33 = (lab == 0).astype(float)
    y66 = (lab <= 1).astype(float)
    tm = np.ones(T, bool); tm[::4] = False
    want = oracle_pixel_probs(x, y33, y66, tm)
    got = _run_ours(x, y33, y66, tm)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_train_constant_test_varying_pixel(rng):
    """x constant over the TRAIN rows but varying on test rows: the
    degeneracy guard zeroes the (train-collinear) precip column, so every
    test row gets the same intercept+quantile probabilities. statsmodels'
    pinv would instead split the fitted constant between intercept and
    slope (b1 = c*b/(1+c^2)), making test probabilities vary with x — a
    minimum-norm artifact, not signal. This test pins OUR deterministic
    choice (documented divergence, ops/elr.py degeneracy guard)."""
    T = 50
    x = np.full(T, 3.7)
    tm = np.ones(T, bool); tm[-10:] = False
    x[~tm] = rng.gamma(2, 2, (~tm).sum())    # test rows vary
    lab = rng.integers(0, 3, T)
    y33 = (lab == 0).astype(float)
    y66 = (lab <= 1).astype(float)
    got = _run_ours(x, y33, y66, tm)
    # all test rows share one probability triple (finite, normalized)
    test_probs = got[~tm]
    np.testing.assert_allclose(
        test_probs, np.broadcast_to(test_probs[:1], test_probs.shape),
        atol=1e-6)
    np.testing.assert_allclose(test_probs.sum(-1), 1.0, atol=1e-5)
    # and it equals the fully-constant-x fit on the train rows
    want = _run_ours(np.full(T, 3.7), y33, y66, tm)
    np.testing.assert_allclose(test_probs, want[~tm], atol=1e-5)


def test_skip_guards_stay_nan(rng):
    """Pixels the reference never fits stay NaN: any raw-NaN obs
    (training.py:435) and <= 1 usable time (training.py:477-481)."""
    T = 20
    x = rng.gamma(2, 2, (T, 1, 2)).astype(np.float32)
    tg = rng.integers(0, 2, (2, T, 1, 2)).astype(np.float32)
    y_raw = np.ones((T, 1, 2), np.float32)
    y_raw[3, 0, 0] = np.nan                  # pixel 0: raw NaN -> skip
    tg[:, 2:, 0, 1] = np.nan                 # pixel 1: 1 valid train row
    tm = np.ones(T, bool); tm[-5:] = False
    te = ~tm
    probs = np.asarray(elr.elr_fold(jnp.asarray(x), jnp.asarray(tg),
                                    jnp.asarray(tm), jnp.asarray(te),
                                    jnp.asarray(y_raw)))
    assert np.isnan(probs[:, 0, 0, :]).all()
    assert np.isnan(probs[:, 0, 1, :]).all()


def test_label_invalid_times_filled_one_third(rng):
    """Inside a fitted pixel, times with NaN targets get 1/3-1/3-1/3
    (training.py:510,524)."""
    T = 40
    x = rng.gamma(2, 2, T)
    y33 = (x < np.quantile(x, 1 / 3)).astype(float)
    y66 = (x < np.quantile(x, 2 / 3)).astype(float)
    y33[5] = np.nan
    y66[5] = np.nan
    tm = np.ones(T, bool); tm[-10:] = False
    got = _run_ours(x, y33, y66, tm)
    np.testing.assert_allclose(got[5], [1 / 3] * 3, atol=1e-6)
    assert np.isfinite(got).all()
