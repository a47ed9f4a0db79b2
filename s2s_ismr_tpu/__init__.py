"""s2s_ismr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for probabilistic
S2S post-processing of Indian Summer Monsoon Rainfall forecasts.

From-scratch rebuild of the capabilities of emileDesmaili/s2s-ismr-unet
(reference mounted read-only at /root/reference), redesigned TPU-first:
the whole hindcast tuning sweep (leads x CV folds x hyperparameters) compiles
into jitted, mesh-shardable XLA programs; labeling, metrics and the ELR
baseline all run on device.

Layout:
  field      lightweight labeled-array layer (xarray-free host bookkeeping)
  grid       domain/grid geometry, divisibility checks, padding
  timeutils  ISO-calendar week/year machinery
  io         NetCDF classic read/write
  data       IRIDL gateway, synthetic generator, device packing (DataBundle)
  ops        on-device kernels: quantiles, tercile labeling, metrics, ELR, conv
  models     U-Net / CNN / MLP with Keras-semantics layers
  train      splits, losses, epoch engine (lax.scan), tuning sweep (vmap)
  parallel   device mesh + lane sharding
  pipelines  one declarative config per reference tune_*.py script
  viz        maps, reliability diagrams, region masks
"""

__version__ = "0.1.0"
