"""Extended Logistic Regression baseline — vectorized per-pixel IRLS.

The reference fits one statsmodels GLM(Binomial) per grid point inside a
Python double loop (training.py:430-524): features are [const, ensemble-
mean precip, quantile-indicator], where the indicator is the constant 33
for the P(y<=q33) rows and 67 for the P(y<=q66) rows (the reference
overwrites the actual tercile edges with these constants,
training.py:445-447/459-460). Cumulative probabilities convert to tercile
probabilities as [p1, p2-p1, 1-p2]; label-invalid times are filled with
1/3; pixels failing its validity guards are skipped and stay NaN.

TPU-first: the double loop becomes one pixel-parallel IRLS where the
pixel axis is a dense vector lane dimension. With only 3 features the
normal equations are 6 sums-of-products and the solve is a closed-form
3x3 Cramer inverse — every step is an elementwise VPU op or a (rows ->
pixel) reduction; no batched tiny matmuls, no linalg.solve. A 32x32 grid
x 10 folds is 10,240 simultaneous GLM fits in one XLA program. The
quantile-indicator feature is internally centered/scaled ((q-50)/17 maps
33/67 -> -/+1), which leaves eta and the fit invariant but keeps the
normal equations well-conditioned in float32.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Q_INDICATOR = (33.0, 67.0)   # the reference's constant 'quantile' feature
N_IRLS_ITERS = 30
RIDGE = 1e-8
ETA_CLIP = 30.0


_Q_CENTER = 50.0
_Q_SCALE = 17.0   # (33-50)/17 = -1, (67-50)/17 = +1


def _irls_pixels(x, y, w, q, iters=N_IRLS_ITERS):
    """Pixel-parallel weighted logistic IRLS.

    x, y, w: (R, P) — R = 2T stacked rows ([q33 block; q66 block]),
    P pixels; q: (R, 1) scaled quantile indicator. Rows with w=0 are
    ignored. Returns beta (3, P) in the SCALED feature basis.
    """
    y = jnp.nan_to_num(y, nan=0.0)
    x = jnp.nan_to_num(x, nan=0.0)   # NaN pixels are skipped downstream

    def step(beta, _):
        b0, b1, b2 = beta
        eta = jnp.clip(b0 + b1 * x + b2 * q, -ETA_CLIP, ETA_CLIP)
        mu = jax.nn.sigmoid(eta)
        s = jnp.maximum(mu * (1.0 - mu), 1e-8)
        wi = w * s
        z = eta + (y - mu) / s
        # normal equations: 6 unique entries of X^T W X, 3 of X^T W z —
        # all (R,P) -> (P,) reductions, elementwise on the pixel lanes
        wx, wq, wz = wi * x, wi * q, wi * z
        s1 = jnp.sum(wi, 0) + RIDGE
        sx, sq = jnp.sum(wx, 0), jnp.sum(wq, 0)
        sxx = jnp.sum(wx * x, 0) + RIDGE
        sxq, sqq = jnp.sum(wx * q, 0), jnp.sum(wq * q, 0) + RIDGE
        r0, rx, rq = jnp.sum(wz, 0), jnp.sum(wz * x, 0), jnp.sum(wz * q, 0)
        # closed-form symmetric 3x3 solve (adjugate / Cramer)
        c00 = sxx * sqq - sxq * sxq
        c01 = sq * sxq - sx * sqq
        c02 = sx * sxq - sq * sxx
        det = s1 * c00 + sx * c01 + sq * c02
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
        c11 = s1 * sqq - sq * sq
        c12 = sq * sx - s1 * sxq
        c22 = s1 * sxx - sx * sx
        nb0 = (c00 * r0 + c01 * rx + c02 * rq) * inv_det
        nb1 = (c01 * r0 + c11 * rx + c12 * rq) * inv_det
        nb2 = (c02 * r0 + c12 * rx + c22 * rq) * inv_det
        return (nb0, nb1, nb2), None

    P = x.shape[1]
    zero = jnp.zeros((P,), jnp.float32)
    (b0, b1, b2), _ = jax.lax.scan(step, (zero, zero, zero), None,
                                   length=iters)
    return b0, b1, b2


@jax.jit
def elr_fold(x_mean, targets, train_mask, test_mask, y_raw):
    """All pixels of one fold, fully pixel-parallel.

    x_mean: (T, *S); targets: (2, T, *S); masks (T,); y_raw (T, *S).
    Returns (T, *S, 3) tercile probabilities (NaN at skipped pixels).
    """
    shape_s = x_mean.shape[1:]
    T = x_mean.shape[0]
    xs = x_mean.reshape(T, -1)                       # (T, P)
    tg = targets.reshape(2, T, -1)
    yr = y_raw.reshape(T, -1)
    valid = ~jnp.isnan(tg[0])                        # (T, P)

    x2 = jnp.concatenate([xs, xs])                   # (2T, P)
    y2 = jnp.concatenate([tg[0], tg[1]])
    q2 = jnp.concatenate([
        jnp.full((T, 1), (Q_INDICATOR[0] - _Q_CENTER) / _Q_SCALE),
        jnp.full((T, 1), (Q_INDICATOR[1] - _Q_CENTER) / _Q_SCALE),
    ]).astype(jnp.float32)
    valid2 = jnp.concatenate([valid, valid])
    w_train = (valid2 & jnp.concatenate([train_mask, train_mask])[:, None]
               ).astype(jnp.float32)

    # per-pixel center/scale of the precip feature over the TRAIN rows.
    # Newton scoring is affine-equivariant, so the fit is identical in
    # exact arithmetic — but the float32 3x3 adjugate solve is not: a
    # (near-)constant x column (dry pixels, regrid artifacts) is collinear
    # with the intercept and the raw-basis determinant collapses, where
    # statsmodels' pinv-based scoring stays stable (training.py:484-487).
    # In the scaled basis that pixel cleanly decouples (x' = 0 -> b1 -> 0).
    wsum = jnp.maximum(jnp.sum(w_train, 0), 1e-8)
    x_nn = jnp.nan_to_num(x2, nan=0.0)
    xm = jnp.sum(w_train * x_nn, 0) / wsum
    xv = jnp.sum(w_train * (x_nn - xm) ** 2, 0) / wsum
    # relative-degeneracy guard: a variance at float32 rounding scale must
    # zero the column entirely (dividing by a tiny std would amplify the
    # mean's rounding noise into a garbage feature). For an all-zero
    # column this is exactly the b1=0 minimum-norm solution statsmodels'
    # pinv picks; for a nonzero constant c the pinv instead splits the
    # fitted constant between intercept and slope (b1 = c*b/(1+c^2) != 0),
    # so test rows whose x deviates from c get varying probabilities from
    # statsmodels but constant ones here — a deliberate, stable choice
    # (the pinv split is a norm artifact, not signal; pinned in
    # test_elr_edge_cases.py::test_train_constant_test_varying_pixel)
    degenerate = xv < 1e-10 * (1.0 + xm * xm)
    xsc = jnp.where(degenerate, 1.0, jnp.sqrt(jnp.maximum(xv, 1e-12)))
    x2 = jnp.where(degenerate, 0.0, (x2 - xm) / xsc)

    # reference skip guards (training.py:435, 465, 477, 480): any raw-NaN,
    # any NaN predictor at used rows, or <= 2 usable rows (= <= 1 time)
    n_valid_train = jnp.sum(valid & train_mask[:, None], 0)
    n_valid_test = jnp.sum(valid & test_mask[:, None], 0)
    x_nan_train = jnp.any(jnp.isnan(xs) & valid & train_mask[:, None], 0)
    x_nan_test = jnp.any(jnp.isnan(xs) & valid & test_mask[:, None], 0)
    raw_nan = jnp.any(jnp.isnan(yr) & train_mask[:, None], 0)
    skip = raw_nan | x_nan_train | x_nan_test | \
        (n_valid_train <= 1) | (n_valid_test <= 1)   # (P,)

    b0, b1, b2 = _irls_pixels(x2, y2, w_train, q2)
    eta = jnp.clip(b0 + b1 * jnp.nan_to_num(x2, nan=0.0) + b2 * q2,
                   -ETA_CLIP, ETA_CLIP)
    p = jax.nn.sigmoid(eta)
    p1, p2 = p[:T], p[T:]
    probs = jnp.stack([p1, p2 - p1, 1.0 - p2], axis=-1)        # (T, P, 3)
    probs = jnp.where(valid[..., None], probs, 1.0 / 3.0)      # 1/3 fill
    probs = jnp.where(skip[None, :, None], jnp.nan, probs)
    return probs.reshape((T,) + shape_s + (3,))


_FOLDS_VMAPPED = jax.vmap(elr_fold, in_axes=(None, 0, 0, 0, None))
_FOLDS_JIT = jax.jit(_FOLDS_VMAPPED)


def elr_folds(x_mean, targets_folds, train_masks, test_masks, y_raw,
              mesh=None, compile_only=False, background=None):
    """vmap over folds: targets_folds (F, 2, T, *S), masks (F, T).
    Returns (F, T, *S, 3).

    mesh: optional jax.sharding.Mesh — shards the Y (lat-row) axis over
    the devices. Every pixel's GLM is independent, so the partitioned
    program has zero cross-device collectives; Y is always divisible by
    the pipeline's 2^n_blocks grid constraint (8/16/24/32/64 rows).

    The executable is memoized process-wide (programs.memoized_call), so
    the suite's background prefetch can compile it from ShapeDtypeStruct
    avals (compile_only=True) while the previous config trains — the ELR
    stage's 20-500 s remote compiles move off the critical path exactly
    like the NN bucket programs' (VERDICT r4 #2)."""
    from ..programs import memoized_call
    args = (x_mean, targets_folds, train_masks, test_masks, y_raw)
    if mesh is None:
        return memoized_call("elr_folds", _FOLDS_JIT, args,
                             compile_only=compile_only,
                             background=(compile_only if background is None
                                         else background))
    from jax.sharding import NamedSharding, PartitionSpec as P
    ax = mesh.axis_names[0]
    in_sh = (NamedSharding(mesh, P(None, ax)),               # x (T,Y,X)
             NamedSharding(mesh, P(None, None, None, ax)),   # tg (F,2,T,Y,X)
             NamedSharding(mesh, P()),                       # masks (F,T)
             NamedSharding(mesh, P()),
             NamedSharding(mesh, P(None, ax)))               # y (T,Y,X)
    out_sh = NamedSharding(mesh, P(None, None, ax))          # (F,T,Y,X,3)
    jitted = jax.jit(_FOLDS_VMAPPED, in_shardings=in_sh,
                     out_shardings=out_sh)
    return memoized_call("elr_folds", jitted, args, mesh=mesh,
                         compile_only=compile_only,
                         background=(compile_only if background is None
                                     else background))


def blend_probabilities(prob_list):
    """MME blend: average tercile probabilities across models and
    renormalize over the category axis (training.py:344-350, 622-626)."""
    p = jnp.mean(jnp.stack(prob_list), axis=0)
    return p / jnp.sum(p, axis=-1, keepdims=True)
