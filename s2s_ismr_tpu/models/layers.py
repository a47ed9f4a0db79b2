"""Keras-semantics building blocks in flax.linen.

Skill parity with the reference (see BASELINE.md) requires matching the
exact layer conventions of Keras 3 used by utils/deep_nn_models.py:
  * Conv2D: glorot-uniform kernel, zero bias, channels-last, 'same' pad
  * Conv2DTranspose: gradient-of-conv semantics (NOT flax's ConvTranspose,
    whose 'SAME' placement differs for strided/even kernels)
  * BatchNormalization: momentum 0.99, epsilon 1e-3, biased batch variance
  * ELU, inverted dropout

Extra, TPU-first: BatchNorm takes an optional per-sample weight vector so
batches padded for static shapes (fold masking) do not pollute statistics —
the reference never needs this because Keras sees ragged numpy arrays.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

glorot_uniform = nn.initializers.glorot_uniform()
he_normal = nn.initializers.he_normal()


class Conv2D(nn.Module):
    """Keras-default 2D conv: glorot-uniform/zeros init, SAME padding."""
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, tuple(self.kernel_size),
                    strides=tuple(self.strides), padding=self.padding,
                    use_bias=self.use_bias, kernel_init=glorot_uniform,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="conv")(x)
        # mixed precision: compute in self.dtype (e.g. bf16 on the MXU),
        # params and downstream activations stay float32
        return y.astype(jnp.float32) if self.dtype is not None else y


class Conv2DTranspose(nn.Module):
    """Transposed conv with TF/Keras gradient-of-conv semantics.

    Implemented via lax.conv_transpose(transpose_kernel=True), which is the
    exact adjoint of a forward SAME conv — this is what Keras
    Conv2DTranspose computes, and it differs from flax nn.ConvTranspose for
    stride-2 SAME placement. Kernel stored HWIO of the *forward* direction
    so the adjoint maps in_features -> features.
    """
    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kh, kw = self.kernel_size
        # forward-conv kernel (features -> in_features); its transpose is us
        kernel = self.param("kernel", glorot_uniform,
                            (kh, kw, self.features, in_features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dt = self.dtype or x.dtype
        y = jax.lax.conv_transpose(
            x.astype(dt), kernel.astype(dt),
            strides=tuple(self.strides), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True)
        return y.astype(jnp.float32) + bias


class BatchNorm(nn.Module):
    """Keras-default BatchNormalization with optional per-sample weights.

    sample_weight: (N,) float — 0 marks padded samples (excluded from the
    batch statistics and from running-average updates). Running averages
    update as ra = momentum * ra + (1-momentum) * batch_stat, gated on the
    batch having any weight.
    """
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool, sample_weight=None):
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))

        if train:
            axes = tuple(range(x.ndim - 1))
            if sample_weight is None:
                mean = jnp.mean(x, axes)
                var = jnp.var(x, axes)
                has_data = jnp.asarray(True)
            else:
                w = jnp.asarray(sample_weight, x.dtype).reshape(
                    (-1,) + (1,) * (x.ndim - 1))
                tot = jnp.sum(w) * (x.size / x.shape[0] / features)
                tot_safe = jnp.maximum(tot, 1.0)
                mean = jnp.sum(x * w, axes) / tot_safe
                var = jnp.sum(w * (x - mean) ** 2, axes) / tot_safe
                has_data = jnp.sum(w) > 0
            if not self.is_initializing():
                m = self.momentum
                new_mean = m * ra_mean.value + (1 - m) * mean
                new_var = m * ra_var.value + (1 - m) * var
                ra_mean.value = jnp.where(has_data, new_mean, ra_mean.value)
                ra_var.value = jnp.where(has_data, new_var, ra_var.value)
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class Dense(nn.Module):
    """Keras-default Dense (glorot-uniform unless overridden)."""
    features: int
    kernel_init: Any = glorot_uniform

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.features, kernel_init=self.kernel_init,
                        bias_init=nn.initializers.zeros, name="dense")(x)


def avg_pool2(x):
    """AveragePooling2D((2,2)) valid, stride 2."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def max_pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def elu(x):
    return jax.nn.elu(x)


class PallasConv3x3(nn.Module):
    """Fused conv3x3 + bias + ELU via the Pallas TPU kernel
    (kernels/conv.py). Parameter tree is identical to Conv2D (nested
    'conv' scope holding kernel/bias), so checkpoints interchange freely
    between the XLA and Pallas backends."""
    features: int
    act: str = "elu"

    @nn.compact
    def __call__(self, x):
        return _PallasConvCore(self.features, self.act, name="conv")(x)


class _PallasConvCore(nn.Module):
    features: int
    act: str

    @nn.compact
    def __call__(self, x):
        from ..kernels import conv3x3_bias_act
        c = x.shape[-1]
        kernel = self.param("kernel", glorot_uniform,
                            (3, 3, c, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return conv3x3_bias_act(x.astype(jnp.float32), kernel, bias,
                                self.act)
