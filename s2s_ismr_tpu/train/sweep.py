"""The tuning sweep: the reference's nested Python loops collapsed into a
handful of vmapped XLA programs.

Reference behavior (training.py:72-117): per CV fold, iterate
itertools.product(batch_sizes, learning_rates, ct_kernels, n_filters,
n_blocks); each trial rebuilds the U-Net, fits with checkpoint/early-stop,
and the trial with the lowest (best-epoch) val_loss wins the fold —
*first* winner in product order on ties.

TPU-first mapping:
  * static hparams (ct_kernel, n_filters, n_blocks => param shapes;
    batch_size => batch structure) bucket trials into one compiled program
    per bucket;
  * dynamic hparams (learning rate) and the CV fold axis become vmap lanes
    inside each bucket — folds x lrs train simultaneously on the MXU;
  * winner selection replays the reference's product order exactly.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import UNet, UNetConfig
from ..programs import (_ProgramMemo, _avals_key, _compile_with_retry,
                        _fg_compile_idle, _fg_enter, _fg_exit,
                        _program_memo, _topology_key,
                        foreground_compile_priority)
from .engine import TrainSettings, predict, train_fold

__all__ = ["TuningGrid", "Trial", "SweepResult", "enumerate_trials",
           "bucket_trials", "run_unet_sweep", "run_fixed_training",
           "winner_forward", "foreground_compile_priority"]


@dataclass(frozen=True)
class TuningGrid:
    """Mirrors the reference tuning_grid dict (tune_ECMWF_com.py:91-92)."""
    n_blocks: Sequence[int] = (3,)
    n_filters: Sequence[int] = (2, 3)
    ct_kernels: Sequence[Tuple[int, int]] = ((2, 2), (3, 3), (5, 5))
    batch_sizes: Sequence[int] = (16, 32)
    learning_rates: Sequence[float] = (1e-3, 1e-4)
    patience: int = 15


@dataclass(frozen=True)
class Trial:
    index: int                   # position in the reference's product order
    batch_size: int
    lr: float
    ct_kernel: Tuple[int, int]
    filters: int
    n_blocks: int

    def bucket_key(self):
        return (self.batch_size, self.ct_kernel, self.filters, self.n_blocks)

    def hparams(self):
        return {"batch_size": self.batch_size, "lr": self.lr,
                "ct_kernel": self.ct_kernel, "filters": self.filters,
                "blocks": self.n_blocks}


def enumerate_trials(grid: TuningGrid) -> List[Trial]:
    """Exact reference iteration order (training.py:87)."""
    out = []
    for i, (bs, lr, kern, filt, blocks) in enumerate(itertools.product(
            grid.batch_sizes, grid.learning_rates, grid.ct_kernels,
            grid.n_filters, grid.n_blocks)):
        out.append(Trial(i, bs, lr, tuple(kern), filt, blocks))
    return out


def bucket_trials(trials: List[Trial]) -> Dict[tuple, List[Trial]]:
    buckets: Dict[tuple, List[Trial]] = {}
    for t in trials:
        buckets.setdefault(t.bucket_key(), []).append(t)
    return buckets


@dataclass
class SweepResult:
    """Per-fold winners + the full val-loss table for diagnostics."""
    best_val_loss: np.ndarray            # (F,)
    best_trial: List[Trial]              # per fold
    predictions: Any                     # (F, T, H, W, 3) winner eval-mode
    # preds — DEVICE-resident (jnp): downstream RPSS consumes them on
    # device; np.asarray() only where host values are actually needed
    val_loss_table: np.ndarray           # (F, n_trials) in product order
    winner_variables: List[Any]          # per fold: flax variables (host)
    winner_configs: List[UNetConfig]     # per fold
    train_steps: int = 0                 # total optimizer steps executed
    timings: Dict[str, float] = field(default_factory=dict)  # phase seconds


# the program memo, foreground-compile gate, aval keying and compile-retry
# now live in ..programs (shared with the ELR branch's compile-ahead path);
# the names above are re-imported here so existing callers/tests keep
# addressing them as train.sweep attributes


def _memo_key(tag, bucket_key, apool, bn, settings, args, mesh) -> tuple:
    import dataclasses as _dc
    s = _dc.astuple(settings) if settings is not None else None
    return (tag, bucket_key, apool, bn, s, _avals_key(args),
            _topology_key(mesh))


def winner_forward(model, vstack, x):
    """Memoized, retry-wrapped F-lane winner forward — the same vmapped
    program shape the sweep's collect phase compiles, shared by the
    training_type='load' replay path (a fresh jit(lambda) per call would
    pay a remote compile per model per group)."""
    mk = ("winner_forward", model, _avals_key((vstack, x)))
    c = _program_memo.get(mk)
    if c is None:
        c = _compile_with_retry(jax.jit(jax.vmap(
            lambda v, xv: predict(model, v, xv),
            in_axes=(0, None))).lower(vstack, x))
        _program_memo.put(mk, c)
    return c(vstack, x)


def _lane_keys(base_seed, fold_idx, trial_idx):
    """Deterministic per-(fold, trial) PRNG, standing in for the reference's
    reset_random_seeds() + sequential Keras init draws (training.py:43)."""
    k = jax.random.key(base_seed)
    k = jax.random.fold_in(k, fold_idx)
    return jax.random.fold_in(k, trial_idx)


def run_unet_sweep(x, y_oh_folds, train_masks, val_masks,
                   grid: TuningGrid, epochs: int = 100, base_seed: int = 42,
                   apool: bool = True, bn: bool = True,
                   model_factory: Callable[[Trial], Any] | None = None,
                   verbose: bool = False,
                   mesh=None, early_exit: bool = True,
                   output: str = "proba",
                   compile_only: bool = False,
                   lane_dispatch: str = "auto") -> SweepResult:
    """Run the full tuning sweep.

    x:            (T, H, W, C) predictor images (jnp or np)
    y_oh_folds:   (F, T, H, W, 3) per-fold one-hot labels — or, for
                  output='deterministic', (F, T, H, W, 1) raw targets
                  (NaN-masked MSE; deep_nn_models.py:104-105 head)
    train_masks:  (F, T) bool; val_masks: (F, T) bool
    mesh:         optional jax.sharding.Mesh — shards the folds x lrs
                  lane axis over the device mesh via shard_map (lanes are
                  independent SGD chains: zero hot-loop collectives,
                  linear scaling; parallel/mesh.py). Lane count is padded
                  to a device multiple with throwaway replica lanes.
    lane_dispatch: single-device lane execution model —
                  'serial' = one compiled 1-lane program per bucket,
                  dispatched asynchronously per (fold, lr) lane so each
                  lane early-exits at its OWN stop epoch;
                  'vmap'   = folds x lrs as vmap lanes in one program
                  (early_exit runs every lane to the LAST lane's stop).
                  'auto' (default) = serial when mesh is None: measured
                  0.49x the vmapped wall at both production shapes on the
                  v5e (PERF.md round 3) — vmap-over-weights lowers to
                  grouped convs whose per-step cost is SUPER-linear in
                  lane count (20-lane step ≈ 17-26x a 1-lane step), so
                  batching lanes into one program loses to pipelined
                  per-lane dispatch even before the early-exit win.
                  Numerics note: grouped vs plain conv differ in low-order
                  bits, so the two modes' val losses agree only to ~1e-2
                  on TPU; each mode is bit-reproducible run-to-run.
                  Mesh sweeps shard_map the lane axis over devices and
                  lax.scan over each device's LOCAL lanes (round-4 probe:
                  scan iterations are the plain per-lane program —
                  bit-identical to serial dispatch at equal wall — while
                  vmapped local lanes pay the grouped-conv penalty, 1.39x
                  at 2 lanes/device on 64x64; parallel/mesh.py).
    compile_only: trace + compile every bucket program into the process
                  memo and return None WITHOUT executing — the suite
                  runner calls this for config N+1 in a background thread
                  while config N trains on-device, moving the 20-500 s/
                  program remote compiles off the session's critical path
                  (compilation is compile-server work; execution leaves
                  the host idle waiting on the device). Going through
                  this same code path — not a parallel reimplementation —
                  is what guarantees the memo keys match the real run's.
    """
    # compile_only callers may pass ShapeDtypeStruct avals for the big
    # tensors (x, y) — lowering only needs shapes, and a background
    # prefetch must not hold full-size device buffers while the
    # foreground config trains in the same HBM. Masks stay concrete
    # (val_rows below needs their values; they are (F, T) bools).
    is_aval = isinstance(x, jax.ShapeDtypeStruct) or \
        isinstance(y_oh_folds, jax.ShapeDtypeStruct)
    if is_aval and not compile_only:
        raise TypeError("ShapeDtypeStruct inputs are only valid with "
                        "compile_only=True")
    if not is_aval:
        x = jnp.asarray(x)
        y_oh_folds = jnp.asarray(y_oh_folds)
    train_masks = jnp.asarray(train_masks)
    val_masks = jnp.asarray(val_masks)
    F = train_masks.shape[0]

    if lane_dispatch not in ("auto", "serial", "vmap"):
        raise ValueError(f"lane_dispatch={lane_dispatch!r}")
    if lane_dispatch == "serial" and mesh is not None:
        raise ValueError("lane_dispatch='serial' is a single-device "
                         "execution model; mesh sweeps shard the lane "
                         "axis and scan local lanes per device")
    serial = mesh is None and lane_dispatch != "vmap"

    def _lane0(a):
        # one lane's slice of a lane-stacked arg; aval-aware so the
        # compile_only prefetch can lower from ShapeDtypeStructs
        if isinstance(a, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(tuple(a.shape[1:]), a.dtype)
        return a[0]

    trials = enumerate_trials(grid)
    buckets = bucket_trials(trials)
    n_trials = len(trials)

    val_table = np.full((F, n_trials), np.inf, np.float32)
    vars_by_trial: Dict[int, Any] = {}
    total_steps = 0

    # Phase 1: trace every bucket, then COMPILE THEM IN PARALLEL THREADS —
    # compilation is host/compile-server work, so cold-start for a
    # multi-bucket grid drops to ~the slowest single program instead of
    # the sum. Phase 2 dispatches all executions asynchronously (device
    # queues them back-to-back); phase 3 is the only host sync.
    jobs = []
    pred_candidates: Dict[tuple, Any] = {}   # pkey -> (model, stacked avals)
    for key_, bucket in buckets.items():
        bs, kern, filt, blocks = key_
        if model_factory is None:
            cfg = UNetConfig(filters=filt, n_blocks=blocks, ct_kernel=kern,
                             apool=apool, bn=bn, output=output)
            model = UNet(cfg)
        else:
            model = model_factory(bucket[0])
            cfg = getattr(model, "config", None)
        # the deterministic head regresses raw precipitation (NaN-masked
        # MSE); settings.loss feeds the program memo key via astuple, so
        # proba/deterministic programs never alias
        settings = TrainSettings(epochs=epochs, batch_size=bs,
                                 patience=grid.patience,
                                 val_rows=int(np.asarray(val_masks)
                                              .sum(1).max()),
                                 early_exit=early_exit,
                                 loss=("mse" if output == "deterministic"
                                       else "categorical_crossentropy"))
        lrs = jnp.asarray([t.lr for t in bucket], jnp.float32)

        def lane(xv, y_oh, tmask, vmask, lr, key,
                 model=model, settings=settings):
            best, vloss, hist = train_fold(model, xv, y_oh, tmask, vmask, lr,
                                           key, settings)
            # epochs actually run (early_exit leaves NaN past the exit)
            return best, vloss, jnp.sum(jnp.isfinite(hist), dtype=jnp.int32)

        keys_fr = [[_lane_keys(base_seed, f, t.index) for t in bucket]
                   for f in range(F)]
        R = len(bucket)
        extras = None
        if serial:
            # one 1-lane program per bucket (lr/key are traced inputs, so
            # both lrs share it); dispatched per (fold, lr) at execute —
            # smaller to compile than the (F, R)-lane program AND free of
            # the grouped-conv super-linearity + max-stop-epoch barrier
            lanes = jax.jit(lane)
            args = (x, _lane0(y_oh_folds), _lane0(train_masks),
                    _lane0(val_masks), lrs[0], keys_fr[0][0])
            extras = (lrs, keys_fr)
        elif mesh is None:
            keys = jnp.stack([jnp.stack(kf) for kf in keys_fr])
            lanes = jax.jit(jax.vmap(
                jax.vmap(lane, in_axes=(None, None, None, None, 0, 0)),
                in_axes=(None, 0, 0, 0, None, 0)))
            args = (x, y_oh_folds, train_masks, val_masks, lrs, keys)
        else:
            keys = jnp.stack([jnp.stack(kf) for kf in keys_fr])
            lanes, args = _mesh_lanes(model, settings, mesh, x, y_oh_folds,
                                      train_masks, val_masks, lrs, keys)
        # x is an explicit program input (not a closed-over constant), so a
        # compiled bucket program depends only on shapes/statics and can be
        # reused across same-shape sweeps (MME trains one sweep per model;
        # a multi-config session re-runs identical grids) via _program_memo
        memo_key = None if model_factory is not None else _memo_key(
            "train1" if serial else "train", key_, apool, bn, settings,
            args, mesh)
        cached = _program_memo.get(memo_key)
        jobs.append((key_, bucket,
                     cached if cached is not None else lanes.lower(*args),
                     args, memo_key, cached is not None, extras))
        # register this bucket's architecture as a winner-forward candidate:
        # an (F,)-stacked variables aval tree for the vmapped predict program
        pkey = ((kern, filt, blocks) if model_factory is None else key_)
        if pkey not in pred_candidates:
            from functools import partial
            x1 = jax.ShapeDtypeStruct((1,) + tuple(x.shape[1:]), x.dtype)
            var_avals = jax.eval_shape(partial(model.init, train=False),
                                       jax.random.key(0), x1)
            # train_fold's output tree always carries a 'batch_stats'
            # collection (empty dict for BN-less models, engine.py:103,200);
            # model.init omits it for bn=False, and an AOT-compiled call is
            # strict about pytree structure — normalize to the train tree
            var_avals = dict(var_avals)
            var_avals.setdefault("batch_stats", {})
            stacked = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct((F,) + s.shape, s.dtype),
                var_avals)
            pred_candidates[pkey] = (model, var_avals, stacked)

    import time as _time
    from concurrent.futures import ThreadPoolExecutor
    t0 = _time.perf_counter()
    def _compile_job(j):
        key_, bucket, prog, args, memo_key, hit, _extras = j
        if hit:
            return prog                 # memo hit: already a compiled exe
        if compile_only:
            # background prefetch: yield to any foreground sweep's
            # critical-path compile phase (server serializes requests)
            _fg_compile_idle.wait()
        # late re-check + in-flight dedup: the memo was consulted at
        # job-build time, but a concurrent sweep (suite prefetch vs the
        # running config) may have compiled — or be compiling — the same
        # program since; never pay a duplicate remote compile
        exe, fut = _program_memo.begin(memo_key)
        if exe is not None:
            return exe
        if fut is not None:
            return fut.result()
        try:
            c = _compile_with_retry(prog)
        except BaseException as e:
            _program_memo.finish(memo_key, error=e)
            raise
        _program_memo.finish(memo_key, c)
        return c

    if not compile_only:
        _fg_enter()
    try:
        with ThreadPoolExecutor(max_workers=max(1, len(jobs))) as ex:
            compiled = list(ex.map(_compile_job, jobs))
    finally:
        if not compile_only:
            _fg_exit()
    t_compile = _time.perf_counter() - t0
    n_cached = sum(1 for j in jobs if j[5])

    if compile_only:
        return None

    t0 = _time.perf_counter()
    if serial:
        # per-lane async dispatch: ~L enqueues pipeline on the device
        # queue (enqueue is non-blocking; only the final block syncs), and
        # each lane's while_loop exits at its OWN stop epoch instead of
        # the vmapped max-over-lanes
        y_f = [y_oh_folds[f] for f in range(F)]
        tm_f = [train_masks[f] for f in range(F)]
        vm_f = [val_masks[f] for f in range(F)]
        lane_vars: List[Any] = []       # flat, job-major then (f, r)
        lane_vloss: List[Any] = []
        lane_nep: List[Any] = []
        lane_off: List[int] = []
        for c, j in zip(compiled, jobs):
            lrs_b, keys_fr = j[6]
            lane_off.append(len(lane_vloss))
            for f in range(F):
                for r in range(len(j[1])):
                    bv, vl, ne = c(x, y_f[f], tm_f[f], vm_f[f],
                                   lrs_b[r], keys_fr[f][r])
                    lane_vars.append(bv)
                    lane_vloss.append(vl)
                    lane_nep.append(ne)
    else:
        dispatched = [c(*j[3]) for c, j in zip(compiled, jobs)]   # async
    # compile every candidate winner-forward program WHILE the device is
    # busy training — compilation is compile-server work, so by the time
    # winners are known the forward programs are ready (collect previously
    # paid a lazy ~20s remote compile per winning architecture)
    pred_pool = ThreadPoolExecutor(
        max_workers=max(1, len(pred_candidates)) + (2 if serial else 0))

    def _compile_pred(pk):
        m, _va, stacked = pred_candidates[pk]
        mk = None if model_factory is not None else _memo_key(
            "pred", pk, apool, bn, None, (stacked, x), None)
        c = _program_memo.get(mk)
        if c is None:
            c = _compile_with_retry(jax.jit(jax.vmap(
                lambda v, xv, m=m: predict(m, v, xv),
                in_axes=(0, None))).lower(stacked, x))
            _program_memo.put(mk, c)
        return c

    def _compile_stack_tree(pk):
        # stacks F single-lane winner var trees into the (F,)-stacked tree
        # the winner-forward program takes — ONE dispatch instead of a
        # host round trip per tree leaf
        _m, va, _stacked = pred_candidates[pk]
        mk = ("stacktree", F, _avals_key(va))
        c = _program_memo.get(mk)
        if c is None:
            c = _compile_with_retry(jax.jit(
                lambda ts: jax.tree.map(lambda *xs: jnp.stack(xs), *ts)
            ).lower([va] * F))
            _program_memo.put(mk, c)
        return c

    def _compile_scalar_stack(n):
        # stacks the L per-lane (vloss, n_ep) scalars in ONE program: the
        # val table crosses the tunnel as 2 arrays, not 2L round trips
        mk = ("stackscalars", n)
        c = _program_memo.get(mk)
        if c is None:
            vs = [jax.ShapeDtypeStruct((), jnp.float32)] * n
            ns = [jax.ShapeDtypeStruct((), jnp.int32)] * n
            c = _compile_with_retry(jax.jit(
                lambda v, m: (jnp.stack(v), jnp.stack(m))).lower(vs, ns))
            _program_memo.put(mk, c)
        return c

    try:
        pred_futs = {pk: pred_pool.submit(_compile_pred, pk)
                     for pk in pred_candidates}
        if serial:
            stack_futs = {pk: pred_pool.submit(_compile_stack_tree, pk)
                          for pk in pred_candidates}
            scalar_fut = pred_pool.submit(_compile_scalar_stack,
                                          len(lane_vloss))
            jax.block_until_ready(lane_vloss[-1])
        else:
            jax.tree.map(lambda a: a.block_until_ready(), dispatched[-1][1])
        t_execute = _time.perf_counter() - t0
        if mesh is not None:
            dispatched = [_unflatten_lanes(out, F, len(j[1]))
                          for out, j in zip(dispatched, jobs)]
        t0 = _time.perf_counter()

        # Only val losses cross to the host here. Trained variables stay on
        # device; predictions for non-winning trials are never computed at
        # all (the old path ran + transferred every trial's full-T forward —
        # ~1GB of useless host traffic for a 24-trial grid).
        if serial:
            vl_all, ne_all = scalar_fut.result()(lane_vloss, lane_nep)
            vl_all = np.asarray(vl_all)
            ne_all = np.asarray(ne_all)
        for bpos, (key_, bucket, *_) in enumerate(jobs):
            bs, kern, filt, blocks = key_
            R = len(bucket)
            if serial:
                o = lane_off[bpos]
                vloss = vl_all[o:o + F * R].reshape(F, R)
                n_ep_sum = int(ne_all[o:o + F * R].sum())
            else:
                _bv, vloss, n_ep = dispatched[bpos]
                vloss = np.asarray(vloss)        # (F, R)
                n_ep_sum = int(np.asarray(n_ep).sum())
            total_steps += n_ep_sum * (-(-x.shape[0] // bs))
            if verbose:
                print(f"bucket bs={bs} kern={kern} filt={filt} "
                      f"blocks={blocks}: val_loss min={vloss.min():.4f}")
            for r, t in enumerate(bucket):
                val_table[:, t.index] = vloss[:, r]
                vars_by_trial[t.index] = (bpos, r)

        # winner per fold: first strict minimum in product order (reference
        # tie-break via `<`, training.py:108)
        best_idx = np.argmin(val_table, axis=1)  # argmin returns first min
        best_trials = [trials[i] for i in best_idx]
        # collect winners GROUPED by (bucket, forward-program): one batched
        # gather + one vmapped forward + one host transfer per group,
        # instead of per-fold dispatch/transfer rounds (each host sync
        # costs ~27ms through the TPU tunnel; leaf-wise transfers
        # multiplied that by the ~30 tree leaves). The forward program
        # depends only on the architecture shape, not batch_size — group
        # accordingly.
        groups: Dict[tuple, List[tuple]] = {}
        for f in range(F):
            ti = int(best_idx[f])
            bpos, r = vars_by_trial[ti]
            t_ = trials[ti]
            pkey = ((t_.ct_kernel, t_.filters, t_.n_blocks)
                    if model_factory is None else jobs[bpos][0])
            groups.setdefault((bpos, pkey), []).append((f, r, ti))
        vars_by_fold: Dict[int, Any] = {}
        preds_by_fold: Dict[int, np.ndarray] = {}
        for (bpos, pkey), frs in groups.items():
            G = len(frs)
            # pad the gather to the program's static F lanes (repeat lane
            # 0; throwaway forwards are cheap, the compile reuse is not)
            if serial:
                Rb = len(jobs[bpos][1])
                o = lane_off[bpos]
                trees = [lane_vars[o + f * Rb + r] for f, r, _ in frs]
                trees += [trees[0]] * (F - G)
                vstack = stack_futs[pkey].result()(trees)
            else:
                fs = np.asarray([f for f, _, _ in frs]
                                + [frs[0][0]] * (F - G))
                rs = np.asarray([r for _, r, _ in frs]
                                + [frs[0][1]] * (F - G))
                vstack = jax.tree.map(lambda a: a[fs, rs],
                                      dispatched[bpos][0])
            # winner predictions STAY ON DEVICE: the RPSS stage consumes
            # them in-place and only (F, Y, X) skill maps cross the
            # tunnel — materializing (F, T, H, W, 3) here cost the
            # 64x64 configs ~200 s of collect in device->host->device
            # round trips (PERF.md). Forwards also dispatch async across
            # winner groups now (no per-group np.asarray sync).
            preds_g = pred_futs[pkey].result()(vstack, x)
            host_vars = jax.device_get(vstack)
            for i, (f, _, _) in enumerate(frs):
                preds_by_fold[f] = preds_g[i]
                vars_by_fold[f] = jax.tree.map(lambda a, i=i: a[i],
                                               host_vars)
    finally:
        # a failed execute/compile would otherwise leak the pool + any
        # in-flight compile threads for the process lifetime
        pred_pool.shutdown(wait=False, cancel_futures=True)
    winner_vars = [vars_by_fold[f] for f in range(F)]
    predictions = jnp.stack([preds_by_fold[f] for f in range(F)])
    winner_cfgs = [UNetConfig(filters=t.filters, n_blocks=t.n_blocks,
                              ct_kernel=t.ct_kernel, apool=apool, bn=bn,
                              output=output)
                   for t in best_trials]
    return SweepResult(
        best_val_loss=val_table[np.arange(F), best_idx],
        best_trial=best_trials,
        predictions=predictions,
        val_loss_table=val_table,
        winner_variables=winner_vars,
        winner_configs=winner_cfgs,
        train_steps=total_steps,
        timings={"compile_s": round(t_compile, 2),
                 "compile_cached_buckets": n_cached,
                 "execute_s": round(t_execute, 2),
                 "collect_s": round(_time.perf_counter() - t0, 2),
                 "lane_dispatch": ("mesh" if mesh is not None
                                   else "serial" if serial else "vmap")},
    )


def _mesh_lanes(model, settings, mesh, x, y_oh_folds, train_masks,
                val_masks, lrs, keys):
    """Flatten (F, R) into a lane-major axis, pad to a device multiple,
    and shard over the mesh (x replicated, everything else lane-sharded)."""
    from ..parallel import mesh as pmesh

    F, R = keys.shape[:2]
    L = F * R
    n_dev = mesh.devices.size
    pad = (-L) % n_dev

    def lane(xv, y_oh, tmask, vmask, lr, key):
        best, vloss, hist = train_fold(model, xv, y_oh, tmask, vmask, lr,
                                       key, settings)
        return best, vloss, jnp.sum(jnp.isfinite(hist), dtype=jnp.int32)

    def rep0(a):
        # aval-aware lane repeat + pad: compile_only callers pass
        # ShapeDtypeStructs for the big tensors (x, y) so a background
        # prefetch holds no device buffers — sharded avals lower to the
        # identical program (jit.lower accepts sharding-annotated avals)
        if isinstance(a, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct((L + pad,) + tuple(a.shape[1:]),
                                        a.dtype,
                                        sharding=pmesh.lane_sharding(mesh))
        out = jnp.repeat(a, R, axis=0)
        if pad:
            out = jnp.concatenate(
                [out, jnp.broadcast_to(out[:1], (pad,) + out.shape[1:])])
        return jax.device_put(out, pmesh.lane_sharding(mesh))

    y_l = rep0(y_oh_folds)
    tm_l = rep0(train_masks)
    vm_l = rep0(val_masks)
    lr_l = jnp.tile(lrs, F)
    key_l = keys.reshape((L,) + keys.shape[2:])
    if pad:
        tile0 = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
        lr_l, key_l = map(tile0, (lr_l, key_l))
    lr_l, key_l = pmesh.shard_lanes((lr_l, key_l), mesh)
    x_rep = (jax.ShapeDtypeStruct(x.shape, x.dtype,
                                  sharding=pmesh.replicated(mesh))
             if isinstance(x, jax.ShapeDtypeStruct)
             else pmesh.replicate(x, mesh))
    fn = pmesh.shard_map_lanes(lane, mesh, n_shared=1)
    return fn, (x_rep, y_l, tm_l, vm_l, lr_l, key_l)


def _unflatten_lanes(out, F, R):
    """(L_padded, ...) lane-major outputs back to (F, R, ...).

    Materializes to host first: the outputs are consumed as numpy right
    after, and eager reshapes of mesh-sharded arrays proved crash-prone
    on the multi-device CPU client."""
    return jax.tree.map(
        lambda a: np.asarray(a)[:F * R].reshape((F, R) + a.shape[1:]), out)


def run_fixed_training(model, x, y_oh_folds, train_masks, val_masks,
                       lr: float = 1e-3, batch_size: int = 16,
                       epochs: int = 100, patience: int = 10,
                       base_seed: int = 42, early_exit: bool = True,
                       output: str = "proba"):
    """training_type='train' path (training.py:119-125): one configuration,
    all folds vmapped. Returns (val_loss (F,), predictions (F,T,H,W,3),
    variables list).

    The reference's 'train' branch fits with ModelCheckpoint only — no
    EarlyStopping (training.py:119-125 vs the tune branch's :100) — so
    callers replicating it pass early_exit=False (all epochs run,
    best-val weights kept). output='deterministic' regresses raw
    precipitation with NaN-masked MSE like the sweep path."""
    x = jnp.asarray(x)
    settings = TrainSettings(epochs=epochs, batch_size=batch_size,
                             patience=patience, early_exit=early_exit,
                             val_rows=int(np.asarray(val_masks)
                                          .sum(1).max()),
                             loss=("mse" if output == "deterministic"
                                   else "categorical_crossentropy"))
    F = train_masks.shape[0]

    def lane(xv, y_oh, tmask, vmask, lr_, key):
        best, vloss, _ = train_fold(model, xv, y_oh, tmask, vmask,
                                    lr_, key, settings)
        return best, vloss

    keys = jnp.stack([_lane_keys(base_seed, f, 0) for f in range(F)])
    args = (x, jnp.asarray(y_oh_folds), jnp.asarray(train_masks),
            jnp.asarray(val_masks), jnp.full((F,), lr, jnp.float32), keys)
    # memoized like the sweep buckets (x/lr are inputs; model+settings are
    # the statics): cnn/mlp MME configs and repeated same-shape fixed runs
    # reuse one compiled program instead of paying a remote compile each
    mk = ("fixed", model, _memo_key("fixed", None, None, None, settings,
                                    args, None))
    c = _program_memo.get(mk)
    if c is None:
        lanes = jax.jit(jax.vmap(lane, in_axes=(None, 0, 0, 0, 0, 0)))
        c = _compile_with_retry(lanes.lower(*args))
        _program_memo.put(mk, c)
    best_vars, vloss = c(*args)
    # predictions through the SAME F-lane winner_forward program the
    # training_type='load' replay compiles, so a load of these winners is
    # bit-identical to the original run (an in-lane predict would lower
    # the convs inside the larger train program and drift low-order bits)
    preds = winner_forward(model, best_vars, x)
    var_list = [jax.tree.map(lambda a, f=f: np.asarray(a[f]), best_vars)
                for f in range(F)]
    return np.asarray(vloss), np.asarray(preds), var_list
