"""Masked quantiles on device.

xarray's ``.quantile([1/3, 2/3], dim='T')`` (reference preprocessing.py:119)
is a skipna linear-interpolation quantile. On TPU we express it as one
sort along the pooled axis with invalid entries pushed to +inf, then a
gather at the (possibly fractional) order statistic q*(n_valid-1).

Static shapes, no data-dependent control flow — safe under jit/vmap/scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.4e38)  # +inf stand-in that still sorts correctly


def masked_quantile(values, valid, qs, axis=0):
    """Quantiles of `values` over `axis`, counting only `valid & finite`.

    values: float array; valid: bool, broadcastable to values.
    qs: 1-D array/tuple of quantiles in [0,1].
    Returns an array with `axis` replaced by a leading len(qs) axis.
    All-invalid slices yield NaN (matching xarray skipna semantics).
    Interpolation is numpy's default 'linear': index = q * (n-1).
    """
    values = jnp.asarray(values, jnp.float32)
    valid = jnp.broadcast_to(jnp.asarray(valid, bool), values.shape)
    ok = valid & jnp.isfinite(values)
    x = jnp.where(ok, values, _BIG)
    x = jnp.moveaxis(x, axis, 0)
    ok0 = jnp.moveaxis(ok, axis, 0)
    xs = jnp.sort(x, axis=0)                       # invalid -> tail
    n = jnp.sum(ok0, axis=0)                       # (...,) valid counts
    qs = jnp.asarray(qs, jnp.float32).reshape(-1)

    def one_q(q):
        pos = q * jnp.maximum(n - 1, 0).astype(jnp.float32)   # (...,)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.ceil(pos).astype(jnp.int32)
        frac = pos - lo.astype(jnp.float32)
        v_lo = jnp.take_along_axis(xs, lo[None], axis=0)[0]
        v_hi = jnp.take_along_axis(xs, hi[None], axis=0)[0]
        out = v_lo * (1.0 - frac) + v_hi * frac
        return jnp.where(n > 0, out, jnp.nan)

    return jax.vmap(one_q)(qs)


def masked_mean(values, valid, axis=None):
    """Mean over valid & finite entries; empty -> NaN (xarray skipna)."""
    values = jnp.asarray(values, jnp.float32)
    ok = jnp.broadcast_to(jnp.asarray(valid, bool), values.shape) & \
        jnp.isfinite(values)
    num = jnp.sum(jnp.where(ok, values, 0.0), axis=axis)
    den = jnp.sum(ok, axis=axis).astype(jnp.float32)
    return jnp.where(den > 0, num / jnp.maximum(den, 1.0), jnp.nan)
