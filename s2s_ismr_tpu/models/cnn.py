"""Plain 3-layer CNN baseline (reference deep_nn_models.py:188-203).

Reference topology: Conv3x3 relu widths f, 2f, 4f then a Conv3x3 softmax
head. NOTE a reference quirk: its CNN defaults to output_channels=1 and the
training path calls it without overriding (training.py:62), which makes the
softmax degenerate (always 1.0 over a single channel); we default to 3
tercile channels, which is what the surrounding pipeline actually expects.
"""

from __future__ import annotations

from flax import linen as nn

from .layers import Conv2D


class CNN(nn.Module):
    num_filters: int = 16
    output_channels: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False, sample_weight=None):
        h = nn.relu(Conv2D(self.num_filters, name="conv1")(x))
        h = nn.relu(Conv2D(self.num_filters * 2, name="conv2")(h))
        h = nn.relu(Conv2D(self.num_filters * 4, name="conv3")(h))
        logits = Conv2D(self.output_channels, name="head")(h)
        return nn.softmax(logits, axis=-1)
