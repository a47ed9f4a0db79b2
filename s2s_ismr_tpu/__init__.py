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
  ops        on-device stats: quantiles, tercile labeling, metrics, ELR IRLS
  kernels    native layer: Pallas TPU kernels (fused conv, custom VJP)
  models     U-Net / CNN / MLP with Keras-semantics layers, bf16 option
  train      splits, losses, scan engine, bucketed vmap sweep, checkpoints
  parallel   device mesh + lane sharding (shard_map) + collectives
  pipelines  tune configs (one per reference script), notebooks drivers
             (accs/barplot), realtime eval
  analysis   CC/ACC maps, RPSS aggregation (the reference's notebooks)
  attrib     GradCAM / saliency attribution
  viz        maps, reliability diagrams, shapefile region masks
  profiling  jax.profiler traces, stage timers, steps/sec
  compile_cache  persistent XLA compilation cache
"""

__version__ = "0.1.0"
