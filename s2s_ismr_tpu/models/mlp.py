"""MLP baseline (reference deep_nn_models.py:166-186).

Flatten -> Dense2048(he_normal, relu) + BN + Dropout(0.3)
        -> Dense512(he_normal, relu)  + BN + Dropout(0.3)
        -> Dense(lat*lon*3, linear) -> reshape (lat, lon, 3) -> softmax.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from flax import linen as nn

from .layers import BatchNorm, Dense, he_normal


class MLP(nn.Module):
    spatial_shape: Tuple[int, int]
    num_classes: int = 3
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool = False, sample_weight=None):
        n = x.shape[0]
        h = x.reshape(n, -1)
        h = nn.relu(Dense(2048, kernel_init=he_normal, name="fc1")(h))
        h = BatchNorm(name="bn1")(h, train=train, sample_weight=sample_weight)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(Dense(512, kernel_init=he_normal, name="fc2")(h))
        h = BatchNorm(name="bn2")(h, train=train, sample_weight=sample_weight)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        out = Dense(int(np.prod(self.spatial_shape)) * self.num_classes,
                    name="fc_out")(h)
        out = out.reshape((n,) + tuple(self.spatial_shape) + (self.num_classes,))
        return nn.softmax(out, axis=-1)
