"""Benchmark: U-Net hindcast tuning throughput (BASELINE.json metric).

Measures training steps/sec/chip on the reference's canonical workload
shape (tune_ECMWF_com.py: 32x32 grid, ~350 weekly samples, filters=2
n_blocks=3 U-Net, batch 16) in three modes:

  * sequential: one lane at a time, host-blocking after each — how the
    reference executes its sweep (Keras model.fit per trial,
    training.py:87-103);
  * serial-async: the SHIPPED execution model (sweep.py lane_dispatch,
    round 3) — the same per-lane programs dispatched back-to-back with a
    single final sync, pipelining host dispatch under device execute;
  * vmapped: all 20 lanes in one XLA program (rounds 1-2's execution
    model; kept for cross-round continuity — vmap-over-weights lowers to
    grouped convs whose step cost is super-linear in lane count, so it
    lost to per-lane dispatch at production shapes, PERF.md round 3).

Prints ONE JSON line; value is the shipped model's steps/s, vs_baseline
its speedup over the sequential execution model on the same chip (the
reference publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.models import UNet, UNetConfig
    from s2s_ismr_tpu.ops import terciles
    from s2s_ismr_tpu.train import splits
    from s2s_ismr_tpu.train.engine import TrainSettings, train_fold

    fast = os.environ.get("BENCH_FAST", "") not in ("", "0")
    platform = jax.devices()[0].platform

    years = (2003, 2012) if fast else (2003, 2018)
    epochs = 3 if fast else 10
    lanes = 4 if fast else 20
    folds = 2 if fast else 10

    b = synthetic.synthetic_hindcast(years=years, seed=0).fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=folds)
    wm = timeutils.week_window_matrix(1)
    labels = jax.vmap(
        lambda pm: terciles.fit_and_label(b.y, b.weeks, pm, wm, None)[0]
    )(jnp.asarray(fm.train))
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(labels), nan=0.0)
    x = jnp.asarray(b.ensemble_mean()[..., None])

    model = UNet(UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3)))
    st = TrainSettings(epochs=epochs, batch_size=16, patience=epochs,
                       val_rows=int(np.asarray(fm.val).sum(1).max()))
    T = x.shape[0]
    n_batches = -(-T // st.batch_size)
    steps_per_lane = epochs * n_batches

    def lane(y_oh_f, tmask, vmask, lr, key):
        _, vloss, _ = train_fold(model, x, y_oh_f, tmask, vmask, lr, key, st)
        return vloss

    # lane-major inputs: folds x lrs flattened
    lrs = np.tile([1e-3, 1e-4], lanes // 2 + 1)[:lanes].astype(np.float32)
    fold_idx = np.arange(lanes) % folds
    args = (y_oh[fold_idx], jnp.asarray(fm.train[fold_idx]),
            jnp.asarray(fm.val[fold_idx]), jnp.asarray(lrs),
            jax.random.split(jax.random.key(0), lanes))

    # --- sequential execution model (reference style: block per lane) ---
    seq = jax.jit(lane)
    seq(*[a[0] for a in args]).block_until_ready()      # compile
    t0 = time.perf_counter()
    for i in range(min(4, lanes)):
        seq(*[a[i] for a in args]).block_until_ready()
    seq_time_per_lane = (time.perf_counter() - t0) / min(4, lanes)
    seq_steps_per_sec = steps_per_lane / seq_time_per_lane

    # --- serial-async: the shipped sweep execution model ---
    # same compiled per-lane program, all lanes enqueued before one sync
    for _ in range(2):                                  # warm-up + measure
        t0 = time.perf_counter()
        outs = [seq(*[a[i] for a in args]) for i in range(lanes)]
        jax.block_until_ready(outs)
        async_time = time.perf_counter() - t0
    async_steps_per_sec = steps_per_lane * lanes / async_time

    # --- vmapped sweep (rounds 1-2 execution model, for continuity) ---
    sweep = jax.jit(jax.vmap(lane, in_axes=(0, 0, 0, 0, 0)))
    sweep(*args).block_until_ready()                    # compile
    t0 = time.perf_counter()
    sweep(*args).block_until_ready()
    sweep_time = time.perf_counter() - t0
    sweep_steps_per_sec = steps_per_lane * lanes / sweep_time

    print(json.dumps({
        "metric": "unet_tuning_steps_per_sec_per_chip",
        "value": round(async_steps_per_sec, 1),
        "unit": f"steps/s ({platform}, {lanes} lanes x {steps_per_lane} steps,"
                f" seq={seq_steps_per_sec:.1f}/s, vmap={sweep_steps_per_sec:.1f}/s)",
        "vs_baseline": round(async_steps_per_sec / seq_steps_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
