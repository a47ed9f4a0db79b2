"""Rolling ISO-week tercile edges and labeling — fully on device.

Reference semantics being reproduced (see /root/reference/utils/preprocessing.py):
  * rolling_labeler (53-167): per target week w, pool observations whose ISO
    week lies in the +-window wrap-around window of w; tercile edges are the
    [1/3, 2/3] quantiles of the pool per pixel; a sample of week v is labeled
    with the edges of the *nearest* week present in the pool obs (xarray
    .sel(method='nearest'), ties -> larger week, pandas behavior);
    label = 0 if y < q33, 2 if y > q66 else 1; NaN where edges undefined.
  * rolling_labeler_ELR (246-333): same edges; additionally masks degenerate
    pixels (q33 == 0 or q33 == q66) and emits cumulative binary targets
    (y <= q33, y <= q66).

TPU-first shape: the labeler is not a Python closure over xarray groups but
a pair of array programs keyed on integer week vectors, so the whole thing
jits and vmaps over CV folds (pool membership is just a boolean mask).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..timeutils import N_ISO_WEEKS
from .quantiles import masked_quantile

TERCILE_QS = (1.0 / 3.0, 2.0 / 3.0)


def rolling_edges(y, weeks, pool_mask, window_matrix):
    """Tercile edges per ISO week.

    y:            (T, *S) observations (NaN allowed)
    weeks:        (T,) int32 ISO weeks 1..53
    pool_mask:    (T,) bool — which samples belong to the labeling pool
                  (the training fold; reference fits edges on ytrain only,
                  preprocessing.py:415)
    window_matrix:(53, 53) bool — week w pools week v iff [w-1, v-1]

    Returns edges (53, 2, *S) float32 (NaN where a week has no pool) and
    present (53,) bool — weeks with any pooled sample.
    """
    y = jnp.asarray(y, jnp.float32)
    weeks0 = jnp.asarray(weeks, jnp.int32) - 1           # 0-based
    pool_mask = jnp.asarray(pool_mask, bool)
    wm = jnp.asarray(window_matrix, bool)

    in_window = wm[:, weeks0]                            # (53, T)
    sample_sel = in_window & pool_mask[None, :]          # (53, T)
    # 'present' per reference = weeks that appear in the pooled observations
    # (the labeler computes edges only for np.unique(week_values),
    # preprocessing.py:112)
    present = (jnp.zeros((N_ISO_WEEKS,), jnp.int32)
               .at[weeks0].max(pool_mask.astype(jnp.int32))) > 0

    def per_week(sel):
        # sel: (T,) bool; edges: (2, *S)
        shape = (y.shape[0],) + (1,) * (y.ndim - 1)
        return masked_quantile(y, sel.reshape(shape), TERCILE_QS, axis=0)

    edges = jax.lax.map(per_week, sample_sel)            # (53, 2, *S)
    return edges, present


def nearest_present_week(present):
    """(53,) int32: for each target ISO week (0-based), the 0-based nearest
    week with present=True. Pandas nearest tie-break: prefer the LARGER week
    (verified against pd.Index.get_indexer)."""
    w = jnp.arange(N_ISO_WEEKS)
    dist = jnp.abs(w[:, None] - w[None, :])              # (target, candidate)
    score = 2 * dist + (w[None, :] < w[:, None])          # +1 penalty if smaller
    score = jnp.where(present[None, :], score, jnp.iinfo(jnp.int32).max)
    return jnp.argmin(score, axis=1).astype(jnp.int32)


def label_terciles(y, weeks, edges, present, degenerate_mask=False):
    """Assign 0/1/2 tercile labels (float32, NaN where masked).

    y: (T, *S); weeks: (T,); edges: (53, 2, *S); present: (53,) bool.
    degenerate_mask: also mask q33==0 or q33==q66 pixels (ELR variant,
    preprocessing.py:300-305).
    """
    y = jnp.asarray(y, jnp.float32)
    weeks0 = jnp.asarray(weeks, jnp.int32) - 1
    lookup = nearest_present_week(jnp.asarray(present, bool))
    e = edges[lookup[weeks0]]                            # (T, 2, *S)
    q0, q1 = e[:, 0], e[:, 1]
    # reference ordering: y < q0 -> 0 else (y > q1 -> 2 else 1); NaN y falls
    # through to label 1 exactly as xr.where does (preprocessing.py:155-158)
    lab = jnp.where(y < q0, 0.0, jnp.where(y > q1, 2.0, 1.0))
    mask = jnp.isnan(q0) | jnp.isnan(q1)
    if degenerate_mask:
        mask = mask | (q0 == 0.0) | (q0 == q1)
    return jnp.where(mask, jnp.nan, lab)


def elr_targets(y, weeks, edges, present):
    """Cumulative binary targets for ELR: (2, T, *S) with [y<=q33, y<=q66],
    NaN where the (degenerate-inclusive) mask applies
    (preprocessing.py:317-320)."""
    y = jnp.asarray(y, jnp.float32)
    weeks0 = jnp.asarray(weeks, jnp.int32) - 1
    lookup = nearest_present_week(jnp.asarray(present, bool))
    e = edges[lookup[weeks0]]
    q0, q1 = e[:, 0], e[:, 1]
    below33 = jnp.where(y <= q0, 1.0, 0.0)
    below66 = jnp.where(y <= q1, 1.0, 0.0)
    mask = jnp.isnan(q0) | jnp.isnan(q1) | (q0 == 0.0) | (q0 == q1)
    out = jnp.stack([below33, below66])
    return jnp.where(mask[None], jnp.nan, out)


@partial(jax.jit, static_argnames=("degenerate_mask",))
def fit_and_label(y, weeks, pool_mask, window_matrix, label_masks,
                  degenerate_mask=False):
    """One-shot: edges from the pool, labels for the full T axis.

    label_masks is unused for the math (labels are computed for every T and
    selected by masks downstream) but kept in the signature to document the
    contract. Returns (labels (T,*S), edges (53,2,*S), present (53,))."""
    edges, present = rolling_edges(y, weeks, pool_mask, window_matrix)
    labels = label_terciles(y, weeks, edges, present, degenerate_mask)
    return labels, edges, present


@jax.jit
def static_terciles(y, pool_mask=None):
    """Static (non-rolling) tercile labeler: edges are the [1/3, 2/3]
    quantiles over the whole pooled T axis per pixel, labels 0/1/2 with
    NaN where y is NaN (reference make_tercile_labeler,
    preprocessing.py:11-19; unused by the tune path but part of the API).

    y: (T, *S); pool_mask: (T,) bool or None (all).
    Returns (labels (T,*S), edges (2,*S)).
    """
    y = jnp.asarray(y, jnp.float32)
    if pool_mask is None:
        pool_mask = jnp.ones((y.shape[0],), bool)
    sel = jnp.asarray(pool_mask, bool).reshape(
        (y.shape[0],) + (1,) * (y.ndim - 1))
    edges = masked_quantile(y, sel, TERCILE_QS, axis=0)    # (2, *S)
    q0, q1 = edges[0], edges[1]
    lab = jnp.where(y < q0, 0.0, jnp.where(y > q1, 2.0, 1.0))
    lab = jnp.where(jnp.isnan(y) | jnp.isnan(q0) | jnp.isnan(q1),
                    jnp.nan, lab)
    return lab, edges


def one_hot_labels(labels, n=3):
    """(..., n) one-hot of 0/1/2 float labels; NaN label -> all-NaN row.

    The NN path's tf.keras.utils.to_categorical never sees NaN (inputs are
    fillna'd, preprocessing.py:341); the ELR scorer's terciled_to_ohe_xr
    NaN-preserves (training.py:377-398). This follows the latter, which is
    also what metrics need.
    """
    lab = jnp.asarray(labels)
    idx = jnp.clip(jnp.nan_to_num(lab, nan=0.0).astype(jnp.int32), 0, n - 1)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)
    return jnp.where(jnp.isnan(lab)[..., None], jnp.nan, oh)
