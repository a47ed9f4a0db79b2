"""Device-mesh scaling for the tuning sweep.

The reference has no distributed story at all (SURVEY.md section 2.9: the
only concurrency artifact is a dead joblib path, training.py:290-302).
The TPU-native scaling axis for this workload is the *sweep lane* —
folds x trials x leads are embarrassingly parallel 100k-param trainings —
so the design is pure lane data-parallelism over an ICI mesh:

  * a 1-D Mesh('lanes') over all local devices;
  * lane-major arrays (lanes, ...) sharded on axis 0 via NamedSharding —
    XLA partitions the whole vmapped training program with zero
    communication in the hot loop;
  * cross-lane reductions (global best-trial, mean skill) ride a single
    psum/pmean collective via shard_map at the end.

Tensor/pipeline parallelism are deliberately absent: the model is far too
small to shard (SURVEY.md 2.9), and pretending otherwise would only add
collective latency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LANES = "lanes"


def sweep_mesh(n_devices=None, devices=None) -> Mesh:
    devs = list(devices or jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (LANES,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for lane-major arrays."""
    return NamedSharding(mesh, P(LANES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_lanes(tree, mesh: Mesh):
    """device_put a pytree of lane-major arrays with axis-0 sharded."""
    s = lane_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), s), tree)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated across the mesh (the shared
    x images every lane reads)."""
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), s), tree)


def shard_map_lanes(lane_fn, mesh: Mesh, n_shared: int = 1, local="scan"):
    """SPMD-parallelize a per-lane function over the mesh's lane axis.

    GSPMD cannot auto-partition the grouped convolutions that vmap-over-
    weights produces, so lane parallelism is expressed explicitly:
    shard_map splits the lane-major args across devices and each device
    runs its local lanes itself. The first n_shared args are replicated
    (shared data, e.g. the x images); the rest are lane-major (axis 0
    sharded).

    local: how a device executes its own lanes —
      'scan' (default): lax.scan over the local lane axis — each
        iteration is the PLAIN per-lane program (normal convs), and the
        inner early-exit while_loop stops at that lane's own epoch.
        Measured on the v5e (round-4 lane-regime probe, PERF.md):
        bit-identical to serial per-lane dispatch at equal wall, while
        vmapped local lanes lower to grouped convs costing 1.39x serial
        at just 2 lanes/device on the 64x64 grids (1.80x at 10) — the
        exact per-device regime of a v4-8 mesh sweep.
      'vmap': the rounds-1-3 formulation (local lanes as vmap lanes in
        one program body), kept for measurement comparisons.

    Returns a jitted callable with the same signature as lane_fn but
    accepting stacked lane-major arguments.
    """
    if local not in ("scan", "vmap"):
        raise ValueError(f"local={local!r}")

    def spmd(*args):
        def run_local(*all_args):
            shared, largs = all_args[:n_shared], all_args[n_shared:]
            if local == "vmap":
                return jax.vmap(lambda *la: lane_fn(*shared, *la))(*largs)
            return jax.lax.scan(
                lambda carry, la: (carry, lane_fn(*shared, *la)),
                0, largs)[1]

        in_specs = (P(),) * n_shared + tuple(P(LANES)
                                             for _ in args[n_shared:])
        return jax.shard_map(run_local, mesh=mesh, in_specs=in_specs,
                             out_specs=P(LANES), check_vma=False)(*args)

    return jax.jit(spmd)


def pmean_over_lanes(values, mesh: Mesh):
    """Global mean across the lane axis using an explicit collective —
    the ICI reduction path (psum over the mesh)."""
    @partial(jax.shard_map, mesh=mesh, in_specs=P(LANES), out_specs=P(),
             check_vma=False)
    def _mean(v):
        local = jnp.mean(v, axis=0, keepdims=True)
        return jax.lax.pmean(local, LANES)[0]
    return _mean(values)


def argmin_over_lanes(values, mesh: Mesh):
    """Global argmin across sharded lanes (winner-trial selection on
    device): all-gather the per-shard minima, reduce locally."""
    @partial(jax.shard_map, mesh=mesh, in_specs=P(LANES), out_specs=P(),
             check_vma=False)
    def _argmin(v):
        gathered = jax.lax.all_gather(v, LANES, tiled=True)
        return jnp.argmin(gathered)[None]
    return _argmin(values)[0]
