"""Pallas TPU kernels — the framework's native layer.

The reference is 100% Python (SURVEY.md section 2); it has no native code
to port. This framework's native layer is instead authored fresh as Pallas
TPU kernels for the hot ops of the training inner loop: the fused
conv3x3 + bias + ELU that dominates every U-Net block
(deep_nn_models.py:139-163 in the reference is Conv2D->ELU pairs).

Kernels run compiled on TPU and in interpreter mode elsewhere, so the CPU
test suite exercises identical code paths.
"""

from .conv import conv3x3_bias_act, fused_conv_supported  # noqa: F401
