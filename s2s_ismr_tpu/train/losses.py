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


def categorical_accuracy(probs, onehot, sample_weight=None):
    """Keras 'accuracy' metric: argmax match over all positions."""
    hit = (jnp.argmax(probs, -1) == jnp.argmax(onehot, -1)).astype(jnp.float32)
    per_sample = jnp.mean(hit.reshape(hit.shape[0], -1), axis=1)
    if sample_weight is None:
        return jnp.mean(per_sample)
    w = jnp.asarray(sample_weight, per_sample.dtype)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
