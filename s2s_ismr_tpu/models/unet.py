"""U-Net for tercile-probability post-processing (flagship model).

Topology parity with the reference Keras model (deep_nn_models.py:17-163,
itself after Horat & Lerch 2023):
  encoder  : n_blocks x [Conv3x3 ELU, Dropout, Conv3x3 ELU, BN, AvgPool2]
             widths filters*4 * 2^k, skip connections taken pre-pool
  bottleneck: 2 x Conv3x3 ELU (width filters*4 * 2^n_blocks) + BN
  decoder  : n_blocks x [ConvT(ct_kernel, stride 2), Concat skip,
             Conv3x3 ELU, Dropout, Conv3x3 ELU, BN] — the LAST up block
             has no BN ("no normalization directly before softmax",
             deep_nn_models.py:99)
  head     : Conv1x1 softmax (proba) or Conv1x1 ReLU (deterministic)

TPU-first deltas: channels-last NHWC (MXU-friendly), weighted BatchNorm for
padded static batches, pure-functional params so the sweep can vmap lanes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (BatchNorm, Conv2D, Conv2DTranspose, PallasConv3x3,
                     avg_pool2, elu, max_pool2)


@dataclass(frozen=True)
class UNetConfig:
    """Static architecture knobs — exactly the reference's tunables
    (deep_nn_models.py:19-45 + tuning grids in the tune scripts)."""
    filters: int = 2
    n_blocks: int = 3
    ct_kernel: Tuple[int, int] = (3, 3)
    ct_stride: Tuple[int, int] = (2, 2)
    apool: bool = True
    bn: bool = True
    n_bins: int = 3
    output: str = "proba"          # 'proba' | 'deterministic'
    dropout_rate: float = 0.0
    conv_backend: str = "auto"     # 'auto' | 'xla' | 'pallas'
    compute_dtype: str = "auto"    # 'auto' | 'float32' | 'bfloat16'

    def block_width(self, k):
        """Width of encoder block k (1-based): filters*4 * 2^(k-1)."""
        return self.filters * 4 * (2 ** (k - 1))


class UNet(nn.Module):
    config: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(self, x, train: bool = False, sample_weight=None,
                 bottleneck_delta=None):
        cfg = self.config
        pool = avg_pool2 if cfg.apool else max_pool2
        drop = (lambda v: nn.Dropout(cfg.dropout_rate, deterministic=not train)(v)) \
            if cfg.dropout_rate > 0 else (lambda v: v)

        def bn(v, name):
            if not cfg.bn:
                return v
            return BatchNorm(name=name)(v, train=train, sample_weight=sample_weight)

        # Measured on TPU v5e (kernels/conv.py docstring): XLA's native conv
        # wins runtime at these channel widths, so 'auto' resolves to XLA;
        # 'pallas' stays available (parity-tested, ~3x faster to compile).
        from ..kernels import fused_conv_supported
        use_pallas = cfg.conv_backend == "pallas"
        # bf16 conv compute (f32 params/activations at layer boundaries):
        # measured +24% training throughput on TPU v5e at identical
        # val-loss trajectory (PERF.md); 'auto' = bf16 on TPU only
        if cfg.compute_dtype == "bfloat16" or (
                cfg.compute_dtype == "auto"
                and jax.default_backend() == "tpu"):
            cdt = jnp.bfloat16
        else:
            cdt = None

        def conv_elu(v, width, name):
            """conv3x3(same)+ELU: fused Pallas kernel on TPU-friendly
            shapes, XLA conv elsewhere (identical params/semantics)."""
            if use_pallas and fused_conv_supported(
                    v.shape[-3], v.shape[-2], v.shape[-1], width):
                return PallasConv3x3(width, name=name)(v)
            return elu(Conv2D(width, dtype=cdt, name=name)(v))

        # encoder
        skips = []
        h = x
        for k in range(1, cfg.n_blocks + 1):
            w = cfg.block_width(k)
            c = conv_elu(h, w, f"down{k}_conv1")
            c = drop(c)
            c = conv_elu(c, w, f"down{k}_conv2")
            c = bn(c, f"down{k}_bn")
            skips.append(c)
            h = pool(c)

        # bottleneck
        wb = cfg.filters * 4 * (2 ** cfg.n_blocks)
        h = conv_elu(h, wb, "bottleneck_conv1")
        h = conv_elu(h, wb, "bottleneck_conv2")
        h = bn(h, "bottleneck_bn")
        if bottleneck_delta is not None:
            # GradCAM tap: grads w.r.t. this zero perturbation are grads
            # w.r.t. the bottleneck activations (attrib.py)
            h = h + bottleneck_delta
        self.sow("intermediates", "bottleneck", h)

        # decoder (last block k=1 has no BN before softmax)
        for k in range(cfg.n_blocks, 0, -1):
            w = cfg.block_width(k)
            u = Conv2DTranspose(w, cfg.ct_kernel, cfg.ct_stride,
                                dtype=cdt, name=f"up{k}_convT")(h)
            u = jnp.concatenate([skips[k - 1], u], axis=-1)
            u = conv_elu(u, w, f"up{k}_conv1")
            u = drop(u)
            u = conv_elu(u, w, f"up{k}_conv2")
            h = bn(u, f"up{k}_bn") if k > 1 else u

        # head
        if cfg.output == "proba":
            logits = Conv2D(cfg.n_bins, (1, 1), name="head")(h)
            return nn.softmax(logits, axis=-1)
        logits = Conv2D(1, (1, 1), name="head")(h)
        return nn.relu(logits)


def check_input(cfg: UNetConfig, height, width):
    d = 2 ** cfg.n_blocks
    if height % d or width % d:
        raise ValueError(
            f"U-Net with n_blocks={cfg.n_blocks} needs H,W divisible by {d}; "
            f"got {height}x{width} (pad the grid, see grid.make_grid)")
