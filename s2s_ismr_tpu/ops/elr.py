"""Extended Logistic Regression baseline — vectorized per-pixel IRLS.

The reference fits one statsmodels GLM(Binomial) per grid point inside a
Python double loop (training.py:430-524): features are [const, ensemble-
mean precip, quantile-indicator], where the indicator is the constant 33
for the P(y<=q33) rows and 67 for the P(y<=q66) rows (the reference
overwrites the actual tercile edges with these constants,
training.py:445-447/459-460). Cumulative probabilities convert to tercile
probabilities as [p1, p2-p1, 1-p2]; label-invalid times are filled with
1/3; pixels failing its validity guards are skipped and stay NaN.

TPU-first: the double loop becomes one batched Newton/IRLS solve vmapped
over (fold, pixel) lanes — a (rows x 3) weighted least-squares per lane
with a closed-form 3x3 solve, fully jittable. A 32x32 grid x 10 folds is
10,240 simultaneous GLM fits in one XLA program.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Q_INDICATOR = (33.0, 67.0)   # the reference's constant 'quantile' feature
N_IRLS_ITERS = 30
RIDGE = 1e-8
ETA_CLIP = 30.0


def _design(x_t):
    """(2T, 3) design matrix for one pixel: rows = [q33 rows; q66 rows]."""
    T = x_t.shape[0]
    x2 = jnp.concatenate([x_t, x_t])
    qind = jnp.concatenate([jnp.full((T,), Q_INDICATOR[0], jnp.float32),
                            jnp.full((T,), Q_INDICATOR[1], jnp.float32)])
    return jnp.stack([jnp.ones_like(x2), x2, qind], axis=1)


def _irls(X, y, w, iters=N_IRLS_ITERS):
    """Weighted logistic IRLS; rows with w=0 are ignored. Returns beta (3,)."""
    y = jnp.nan_to_num(y, nan=0.0)

    def step(beta, _):
        eta = jnp.clip(X @ beta, -ETA_CLIP, ETA_CLIP)
        mu = jax.nn.sigmoid(eta)
        s = jnp.maximum(mu * (1.0 - mu), 1e-8)
        wi = w * s
        z = eta + (y - mu) / s
        A = (X * wi[:, None]).T @ X + RIDGE * jnp.eye(X.shape[1])
        b = (X * wi[:, None]).T @ z
        return jnp.linalg.solve(A, b), None

    beta, _ = jax.lax.scan(step, jnp.zeros(X.shape[1], jnp.float32),
                           None, length=iters)
    return beta


def _fit_pixel(x_t, tgt, valid_t, train_mask, test_mask, y_raw_t):
    """One (fold, pixel) lane.

    x_t: (T,) ensemble-mean predictor; tgt: (2, T) cumulative targets
    (NaN where label-invalid); valid_t: (T,) bool label validity;
    train_mask/test_mask: (T,) bool; y_raw_t: (T,) raw obs for the
    reference's any-NaN skip (training.py:435).
    Returns probs (T, 3) with the reference's NaN/skip/fill conventions.
    """
    T = x_t.shape[0]
    X = _design(x_t)
    y = jnp.concatenate([tgt[0], tgt[1]])
    valid2 = jnp.concatenate([valid_t, valid_t])
    w_train = (valid2 & jnp.concatenate([train_mask, train_mask])).astype(jnp.float32)

    n_valid_train = jnp.sum(valid_t & train_mask)
    n_valid_test = jnp.sum(valid_t & test_mask)
    x_nan_train = jnp.any(jnp.isnan(x_t) & valid_t & train_mask)
    x_nan_test = jnp.any(jnp.isnan(x_t) & valid_t & test_mask)
    raw_nan = jnp.any(jnp.isnan(y_raw_t) & train_mask)
    # reference skip guards (training.py:435, 465, 477, 480): any raw-NaN,
    # any NaN predictor at used rows, or <= 2 usable rows (= <= 1 time)
    skip = raw_nan | x_nan_train | x_nan_test | \
        (n_valid_train <= 1) | (n_valid_test <= 1)

    beta = _irls(X, y, w_train)
    eta = jnp.clip(X @ beta, -ETA_CLIP, ETA_CLIP)
    p = jax.nn.sigmoid(eta)
    p1, p2 = p[:T], p[T:]
    probs = jnp.stack([p1, p2 - p1, 1.0 - p2], axis=-1)       # (T, 3)
    third = jnp.full_like(probs, 1.0 / 3.0)
    probs = jnp.where(valid_t[:, None], probs, third)          # 1/3 fill
    return jnp.where(skip, jnp.nan, probs)


@jax.jit
def elr_fold(x_mean, targets, train_mask, test_mask, y_raw):
    """All pixels of one fold.

    x_mean: (T, *S); targets: (2, T, *S); masks (T,); y_raw (T, *S).
    Returns (T, *S, 3) tercile probabilities (NaN at skipped pixels).
    """
    shape_s = x_mean.shape[1:]
    T = x_mean.shape[0]
    xs = x_mean.reshape(T, -1)
    tg = targets.reshape(2, T, -1)
    yr = y_raw.reshape(T, -1)
    valid = ~jnp.isnan(tg[0])

    probs = jax.vmap(_fit_pixel, in_axes=(1, 2, 1, None, None, 1),
                     out_axes=1)(xs, tg, valid, train_mask, test_mask, yr)
    return probs.reshape((T,) + shape_s + (3,))


def elr_folds(x_mean, targets_folds, train_masks, test_masks, y_raw):
    """vmap over folds: targets_folds (F, 2, T, *S), masks (F, T).
    Returns (F, T, *S, 3)."""
    return jax.vmap(elr_fold, in_axes=(None, 0, 0, 0, None))(
        jnp.asarray(x_mean), jnp.asarray(targets_folds),
        jnp.asarray(train_masks), jnp.asarray(test_masks),
        jnp.asarray(y_raw))


def blend_probabilities(prob_list):
    """MME blend: average tercile probabilities across models and
    renormalize over the category axis (training.py:344-350, 622-626)."""
    p = jnp.mean(jnp.stack(prob_list), axis=0)
    return p / jnp.sum(p, axis=-1, keepdims=True)
