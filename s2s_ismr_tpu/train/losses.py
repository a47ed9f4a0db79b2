"""Losses with Keras-parity semantics + mask awareness.

Keras categorical_crossentropy on probability outputs clips to
[1e-7, 1 - 1e-7] and averages over every non-batch element; the reference
compiles exactly that (training.py:67). Here the mean is weighted by a
per-sample weight vector so statically padded batches (fold masking)
reproduce the ragged-batch mean of the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def categorical_crossentropy(probs, onehot, sample_weight=None):
    """Mean CE over weighted samples and all spatial positions.

    probs/onehot: (N, ..., C); sample_weight: (N,) or None.
    Returns scalar loss; 0-weight batches return 0 (callers gate updates).
    """
    p = jnp.clip(probs, _EPS, 1.0 - _EPS)
    ce = -jnp.sum(onehot * jnp.log(p), axis=-1)          # (N, ...)
    per_sample = jnp.mean(ce.reshape(ce.shape[0], -1), axis=1)
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = jnp.asarray(sample_weight, per_sample.dtype)
    tot = jnp.sum(w)
    return jnp.sum(per_sample * w) / jnp.maximum(tot, 1.0)


def masked_mse(pred, target, sample_weight=None):
    """Mean squared error for the deterministic head
    (deep_nn_models.py:104-105 — a dead branch in the reference's trainer,
    which only ever compiles categorical_crossentropy; this framework
    makes it trainable). NaN target positions (ocean pixels) are excluded
    from each sample's mean; the batch mean is sample-weighted like the
    CE above so padded/masked rows drop out.
    """
    valid = jnp.isfinite(target)
    sq = jnp.where(valid, (pred - jnp.where(valid, target, 0.0)) ** 2, 0.0)
    nsp = sq.reshape(sq.shape[0], -1)
    nv = jnp.maximum(valid.reshape(valid.shape[0], -1)
                     .sum(1).astype(nsp.dtype), 1.0)
    per_sample = nsp.sum(1) / nv
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = jnp.asarray(sample_weight, per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def categorical_accuracy(probs, onehot, sample_weight=None):
    """Keras 'accuracy' metric: argmax match over all positions."""
    hit = (jnp.argmax(probs, -1) == jnp.argmax(onehot, -1)).astype(jnp.float32)
    per_sample = jnp.mean(hit.reshape(hit.shape[0], -1), axis=1)
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = jnp.asarray(sample_weight, per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
