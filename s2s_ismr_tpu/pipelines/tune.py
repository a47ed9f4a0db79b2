"""The tune pipeline runner — one call = one reference tune_*.py script.

Reference flow (tune_ECMWF_com.py:22-186): data fetch -> ELR branch
(year-bootstrap splits, per-pixel GLM, RPSS netcdfs, maps) -> NN branch
(splits, grid-search tuning, RPSS netcdfs) -> skill mask -> maps +
reliability comparisons -> checkpoint cleanup.

Here each branch is a handful of jitted/vmapped device programs; the host
only moves data, writes netcdfs (same outputs/ layout), and draws figures.
MME configs blend per-model tercile probabilities and renormalize
(training.py:344-350, 622-626).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, replace
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import timeutils
from ..data.bundle import DataBundle
from ..field import Field
from ..io import write_netcdf
from ..ops import elr as elr_ops
from ..ops import metrics, terciles
from ..train import splits
from ..train import sweep as sweep_mod
from ..train.sweep import SweepResult, TuningGrid, run_unet_sweep
from .configs import PipelineConfig


# ----------------------------------------------------------------- data load
def load_bundles(cfg: PipelineConfig, source="synthetic", seed=0,
                 synthetic_step=None, download=True) -> Dict[str, DataBundle]:
    """Fetch one DataBundle per model (synthetic or IRIDL gateway)."""
    if source == "synthetic":
        from ..data import synthetic
        step = synthetic_step or (cfg.regrid or 1.0)
        # native-grid configs (regrid=None) carry explicit point counts;
        # an explicit --step overrides them (smoke runs shrink the grid)
        gshape = None if synthetic_step else cfg.synthetic_grid
        if cfg.is_mme:
            xs, _ = synthetic.synthetic_ensemble(
                models=cfg.models, seed=seed, years=cfg.years,
                season=cfg.season, domain=cfg.domain, step=step,
                lead=cfg.lead(cfg.models[0]), grid_shape=gshape)
            return xs
        return {cfg.models[0]: synthetic.synthetic_hindcast(
            model=cfg.models[0], obs=cfg.obs, years=cfg.years,
            season=cfg.season, domain=cfg.domain, step=step, seed=seed,
            lead=cfg.lead(), grid_shape=gshape)}
    elif source == "iridl":
        from ..data import gateway
        out = {}
        for m in cfg.models:
            x, y = gateway.get_data(
                years=cfg.years, download=download, week=cfg.week, model=m,
                obs=cfg.obs, domain=cfg.domain.as_tuple(), season=cfg.season,
                regrid=cfg.regrid, custom_lead=cfg.lead(m))
            out[m] = gateway.to_bundle(x, y, name=f"{m}_{cfg.obs}")
        if cfg.is_mme:
            out = _align_mme(out)
        return out
    raise ValueError(f"unknown source {source!r}")


def _align_mme(bundles: Dict[str, DataBundle]) -> Dict[str, DataBundle]:
    """T-midpoint alignment across models (tune_MME.py:66-81)."""
    names = list(bundles)
    t1 = bundles[names[0]].t
    t2 = bundles[names[1]].t
    mid = t1 + (t2 - t1) / 2
    out = {}
    for n, b in bundles.items():
        if len(b.t) != len(mid):
            raise ValueError(f"MME model {n} time axis length mismatch")
        from dataclasses import replace
        out[n] = replace(b, t=mid)
    return out


def _apply_pad(cfg: PipelineConfig, b: DataBundle) -> DataBundle:
    """ECMWF full-period 23->24 Y pad with synthetic lat + zero fill
    (tune_ECMWF_full.py:50-57). The reference zero-fills padded y too; we
    pad y with zeros to match its NN labels and rely on the end-of-run
    skill mask exactly as the reference does."""
    if cfg.pad_y_rows == 0:
        return b
    from dataclasses import replace
    py = cfg.pad_y_rows
    x = np.pad(b.x, ((0, 0), (0, 0), (0, py), (0, 0)))
    y = np.pad(b.y, ((0, 0), (0, py), (0, 0)))
    lats = np.concatenate([b.lats, [cfg.pad_lat_value] * py])
    return replace(b, x=x, y=y, lats=lats)


# module-level jits routed through the process program memo
# (programs.memoized_call): JAX's own program cache keys on function
# identity, so a per-call lambda recompiles the same program for every
# config in a suite session (20-500 s each through the remote-compile TPU
# backend) — and jit's cache cannot be warmed by a background thread
# (`.lower().compile()` does not populate it). The memo route compiles
# once per process per input-shape set AND lets the suite's prefetch
# thread compile these from avals while the previous config trains
# (the ELR stage was the round-4 weeks-suite's critical-path floor).
def _elr_fit_impl(y, weeks, train_masks, wm):
    def fold_fit(pm):
        e, p = terciles.rolling_edges(y, weeks, pm, wm)
        return (terciles.elr_targets(y, weeks, e, p),
                terciles.label_terciles(y, weeks, e, p, True))
    return jax.vmap(fold_fit)(train_masks)


_elr_fit_jit = jax.jit(_elr_fit_impl)


def _elr_fit_folds(y, weeks, train_masks, wm, compile_only=False,
                   background=None):
    from ..programs import memoized_call
    return memoized_call("elr_fit_folds", _elr_fit_jit,
                         (y, weeks, train_masks, wm),
                         compile_only=compile_only,
                         background=(compile_only if background is None
                                     else background))


_rpss_folds_jit = jax.jit(jax.vmap(metrics.rpss, in_axes=(None, 0, 0, 0)))


def _rpss_folds_j(climo, preds, labels, masks, compile_only=False,
                  background=None):
    from ..programs import memoized_call
    return memoized_call("rpss_folds", _rpss_folds_jit,
                         (climo, preds, labels, masks),
                         compile_only=compile_only,
                         background=(compile_only if background is None
                                     else background))


# per-fold rolling-tercile fit+label for the NN branch (_nn_setup): the
# same program recompiled per config when it was a per-call vmapped lambda
_fit_label_jit = jax.jit(jax.vmap(
    lambda y, weeks, pm, wm: terciles.fit_and_label(y, weeks, pm, wm, None),
    in_axes=(None, None, 0, None)))


def _fit_label_folds(y, weeks, train_masks, wm, compile_only=False):
    from ..programs import memoized_call
    return memoized_call("fit_label_folds", _fit_label_jit,
                         (y, weeks, train_masks, wm),
                         compile_only=compile_only,
                         background=compile_only)


# -------------------------------------------------------------- ELR branch
@dataclass
class ElrResult:
    rpss_train: Field
    rpss_test: Field
    test_probs: np.ndarray          # (F, T, Y, X, 3)
    labels: np.ndarray              # (F, T, Y, X) degenerate-masked labels
    masks: splits.FoldMasks


def run_elr_branch(cfg: PipelineConfig, bundles, log=print,
                   mesh=None) -> ElrResult:
    names = list(bundles)
    first = bundles[names[0]]
    y_shared = np.mean(np.stack([bundles[n].y for n in names]), axis=0) \
        if cfg.is_mme else first.y
    fm = splits.bootstrap_masks_elr(first.years, cfg.n_bootstraps,
                                    frac_test=cfg.elr_frac_test)
    wm = timeutils.week_window_matrix(1)

    # compile this branch's three programs IN PARALLEL up front (shapes
    # are known before any result is): the remote compile server overlaps
    # requests (measured by the NN parallel bucket pool — cold start pays
    # ~the slowest program, not the sum), but the natural call order here
    # compiled fit -> GLM -> RPSS serially, making the first config's ELR
    # stage the suite's cold floor (719-2,045 s measured r4/r5). All
    # later calls below hit the memo / join the in-flight compiles.
    from concurrent.futures import ThreadPoolExecutor
    F = fm.train.shape[0]
    ys = tuple(y_shared.shape)
    f32 = jnp.float32
    y_av = jax.ShapeDtypeStruct(ys, f32)
    tm = jnp.asarray(fm.train)
    with ThreadPoolExecutor(max_workers=3) as ex:
        # background=False: these ARE the foreground (the pipeline holds
        # compile priority around this stage; waiting on the gate from
        # inside it would deadlock against our own f.result())
        futs = [
            ex.submit(_elr_fit_folds, y_av, first.weeks, tm, wm,
                      compile_only=True, background=False),
            ex.submit(elr_ops.elr_folds, y_av,
                      jax.ShapeDtypeStruct((F, 2) + ys, f32),
                      fm.train, fm.test, y_av, mesh=mesh,
                      compile_only=True, background=False),
            ex.submit(_rpss_folds_j, jax.ShapeDtypeStruct(ys + (3,), f32),
                      jax.ShapeDtypeStruct((F,) + ys + (3,), f32),
                      jax.ShapeDtypeStruct((F,) + ys, f32), tm,
                      compile_only=True, background=False),
        ]
        for f in futs:
            f.result()   # compile errors surface here, not mid-branch

    # all folds fitted in ONE vmapped program (the reference refits the
    # labeler per fold in Python; the per-fold loop here used to cost a
    # compile + host sync per fold)
    targets, labels = _elr_fit_folds(y_shared, first.weeks,
                                     jnp.asarray(fm.train), wm)
    targets = np.asarray(targets)
    labels = np.asarray(labels)

    per_model_probs = []
    for n in names:
        xm = bundles[n].ensemble_mean()
        probs = np.asarray(elr_ops.elr_folds(xm, targets, fm.train, fm.test,
                                             y_shared, mesh=mesh))
        per_model_probs.append(probs)
        log(f"[elr] model {n}: fitted {probs.shape}")
    if cfg.is_mme:
        probs = np.asarray(elr_ops.blend_probabilities(per_model_probs))
    else:
        probs = per_model_probs[0]

    # climo reference from the last-iterated model's predictor, matching the
    # reference's loop-variable quirk (training.py:636-640)
    climo = metrics.climo_forecast(bundles[names[-1]].ensemble_mean())
    # all folds in one jitted program (the eager per-fold loop paid a
    # ~27ms host sync per fold through the TPU tunnel)
    r_tr = np.asarray(_rpss_folds_j(climo, jnp.asarray(probs),
                                    jnp.asarray(labels),
                                    jnp.asarray(fm.train)))
    r_te = np.asarray(_rpss_folds_j(climo, jnp.asarray(probs),
                                    jnp.asarray(labels),
                                    jnp.asarray(fm.test)))
    coords = {"Y": first.lats, "X": first.lons}
    return ElrResult(
        rpss_train=Field(r_tr, ("bootstrap", "Y", "X"), coords, "rpss"),
        rpss_test=Field(r_te, ("bootstrap", "Y", "X"), coords, "rpss"),
        test_probs=probs, labels=labels, masks=fm)


# --------------------------------------------------------------- NN branch
@dataclass
class NNResult:
    rpss_train: Field
    rpss_val: Field
    rpss_test: Field
    predictions: np.ndarray         # (F, T, Y, X, 3) blended winner preds
    labels: np.ndarray              # (F, T, Y, X)
    masks: splits.FoldMasks
    sweeps: Dict[str, SweepResult]
    best_hparams: list
    fixed_winners: Dict[str, tuple] = field(default_factory=dict)
    # per model: (var_list, val_losses, unet_config|None) from fixed
    # (non-grid) training — cnn/mlp, and unet training_type='train'


def _nn_setup(cfg: PipelineConfig, bundles, log):
    """Shared NN-branch preamble: fillna/stacking, year-bootstrap splits,
    per-fold rolling-tercile labels (fit on each fold's train years only,
    preprocessing.py:415)."""
    names = list(bundles)
    filled = {n: b.fillna(0.0) for n, b in bundles.items()}
    if cfg.predictor == "stacked" and cfg.is_mme:
        raise ValueError(
            "predictor='stacked' is not supported for MME configs: each "
            "model tiles T by its own member count, so the cross-model "
            "obs mean is undefined (no reference script combines them "
            "either, training.py:146-238 vs tune_MME.py)")
    if cfg.predictor == "stacked":
        # members become extra batch rows; labels/splits/metrics all run on
        # the tiled MT axis (preprocessing.py:29-35, training.py:146-238)
        filled = {n: b.stacked() for n, b in filled.items()}
    first = filled[names[0]]
    y_shared = np.mean(np.stack([filled[n].y for n in names]), axis=0) \
        if cfg.is_mme else first.y

    fm = splits.bootstrap_masks(first.years, cfg.n_bootstraps,
                                frac_valid=cfg.nn_frac_valid,
                                frac_test=cfg.nn_frac_test)
    for i in range(fm.n_folds):
        log(f"[nn] fold {i + 1}: train={sorted(fm.train_years[i])} "
            f"val={sorted(fm.val_years[i])} test={sorted(fm.test_years[i])}")

    wm = timeutils.week_window_matrix(1)
    lab_folds, edges_folds, present_folds = _fit_label_folds(
        y_shared, first.weeks, jnp.asarray(fm.train), wm)
    y_oh = jnp.nan_to_num(terciles.one_hot_labels(lab_folds), nan=0.0)
    return (names, filled, first, fm, np.asarray(lab_folds), y_oh,
            (edges_folds, present_folds))


def _nn_rpss(filled, names, preds, labels):
    """RPSS of blended predictions vs the reference's constant-1/3 climo
    (last-iterated model's predictor quirk, performance_metrics.py:11-23)."""
    climo = metrics.climo_forecast(filled[names[-1]].ensemble_mean())
    preds_j, labels_j = jnp.asarray(preds), jnp.asarray(labels)

    def _r(mask_set):
        return np.asarray(_rpss_folds_j(climo, preds_j, labels_j,
                                        jnp.asarray(mask_set)))
    return _r


def run_nn_branch(cfg: PipelineConfig, bundles, log=print,
                  timer=None, mesh=None,
                  training_type="tune") -> NNResult:
    names, filled, first, fm, labels, y_oh, edges_pr = \
        _nn_setup(cfg, bundles, log)
    if cfg.output == "deterministic" and cfg.architecture != "unet":
        raise ValueError(
            "output='deterministic' is only available for the U-Net "
            "(deep_nn_models.py:104-105); cnn/mlp have softmax heads")
    if cfg.output == "deterministic" and cfg.predictor == "stacked":
        raise ValueError(
            "output='deterministic' does not compose with "
            "predictor='stacked': stacking tiles the batch axis by member "
            "count while the regression target keeps the raw T axis")
    if cfg.output == "deterministic":
        # deterministic head (deep_nn_models.py:104-105): regress RAW
        # precipitation — from the un-filled bundles, so ocean stays NaN
        # and masked_mse excludes it (fillna(0.0) targets would train the
        # model to predict ocean zeros and dilute the winner-selection
        # val loss with them). Targets are fold-independent; the sweep's
        # lane axis is per-fold, hence the broadcast.
        y_raw = (np.nanmean(np.stack([bundles[m].y for m in names]), 0)
                 if cfg.is_mme else bundles[names[0]].y)
        y_det_tgt = jnp.broadcast_to(
            jnp.asarray(y_raw)[None, ..., None],
            (fm.n_folds,) + y_raw.shape + (1,))

    sweeps: Dict[str, SweepResult] = {}
    hparams_by_model: Dict[str, list] = {}
    fixed_winners: Dict[str, tuple] = {}
    per_model_preds = []
    for n in names:
        x = jnp.asarray(filled[n].predictor_images(cfg.predictor))
        if cfg.architecture == "unet":
            from ..grid import check_divisible
            try:
                check_divisible(x.shape[1], x.shape[2],
                                max(cfg.tuning.n_blocks))
            except ValueError as e:
                raise ValueError(f"model {n}: {e} — choose a domain/step "
                                 f"that yields a divisible grid or pad via "
                                 f"DataBundle.pad_to_grid") from None
        t0 = time.time()
        grid_n = resolve_batch_sizes(cfg.tuning, int(x.shape[0]))
        if cfg.architecture == "unet" and training_type == "tune":
            if cfg.output == "deterministic":
                res = run_unet_sweep(x, y_det_tgt, fm.train, fm.val,
                                     grid_n, epochs=cfg.epochs,
                                     mesh=mesh, output="deterministic")
                # score probabilistically: categorize each fold's precip
                # predictions with that fold's tercile edges (one-hot
                # "probabilities" flow through the unchanged RPSS/MME path)
                res = replace(res, predictions=_deterministic_to_probs(
                    res.predictions, filled[n].weeks, edges_pr))
            else:
                res = run_unet_sweep(x, y_oh, fm.train, fm.val, grid_n,
                                     epochs=cfg.epochs, mesh=mesh)
            log(f"[nn] model {n}: sweep of {res.val_loss_table.shape[1]} "
                f"trials x {fm.n_folds} folds in {time.time() - t0:.1f}s "
                f"{res.timings}; "
                f"winners={[t.hparams() for t in res.best_trial]}")
            sweeps[n] = res
            preds_n = res.predictions
            hparams_by_model[n] = [t.hparams() for t in res.best_trial]
        else:
            # fixed single-configuration training, vmapped over folds:
            # the cnn/mlp branch (training.py:53-64 — the reference's
            # tuning loop only ever rebuilds the U-Net) and
            # training_type='train' for any architecture
            # (training.py:119-125: one config — the first grid entry —
            # no grid, and no EarlyStopping: ModelCheckpoint best-val
            # weights over all epochs)
            from ..train.sweep import run_fixed_training
            g = grid_n
            if cfg.architecture == "unet":
                model, ucfg = _unet_from_grid(cfg)
            else:
                model, ucfg = _make_architecture(cfg.architecture,
                                                 x.shape), None
            lr, bs = g.learning_rates[0], g.batch_sizes[0]
            y_tgt = y_det_tgt if cfg.output == "deterministic" else y_oh
            vloss, preds_n, var_list = run_fixed_training(
                model, x, y_tgt, fm.train, fm.val, lr=lr, batch_size=bs,
                epochs=cfg.epochs, patience=g.patience,
                early_exit=(training_type != "train"),
                output=cfg.output)
            if cfg.output == "deterministic":
                preds_n = _deterministic_to_probs(preds_n, filled[n].weeks,
                                                  edges_pr)
            fixed_winners[n] = (var_list, vloss, ucfg)
            log(f"[nn] model {n}: {cfg.architecture} ({training_type}) x "
                f"{fm.n_folds} folds in {time.time() - t0:.1f}s; "
                f"val_loss={vloss.round(4)}")
            hp = {"architecture": cfg.architecture, "lr": lr,
                  "batch_size": bs}
            if ucfg is not None:
                hp.update(ct_kernel=ucfg.ct_kernel, filters=ucfg.filters,
                          blocks=ucfg.n_blocks)
            hparams_by_model[n] = [hp] * fm.n_folds
        per_model_preds.append(preds_n)
        if timer is not None:
            if n in sweeps:
                timer.count("train_steps", sweeps[n].train_steps)
            else:
                bs_ = grid_n.batch_sizes[0]
                timer.count("train_steps", fm.n_folds * cfg.epochs
                            * (-(-x.shape[0] // bs_)))

    if cfg.is_mme:
        # stays on device like the per-model sweep predictions
        preds = elr_ops.blend_probabilities(per_model_preds)
    else:
        preds = per_model_preds[0]

    _r = _nn_rpss(filled, names, preds, labels)
    coords = {"Y": first.lats, "X": first.lons}
    return NNResult(
        rpss_train=Field(_r(fm.train), ("bootstrap", "Y", "X"), coords, "rpss"),
        rpss_val=Field(_r(fm.val), ("bootstrap", "Y", "X"), coords, "rpss"),
        rpss_test=Field(_r(fm.test), ("bootstrap", "Y", "X"), coords, "rpss"),
        predictions=preds, labels=labels, masks=fm, sweeps=sweeps,
        best_hparams=[
            {n: hparams_by_model[n][f] for n in names}
            for f in range(fm.n_folds)],
        fixed_winners=fixed_winners)


def settings_fingerprint(cfg: PipelineConfig, source, seed,
                         synthetic_step) -> dict:
    """Everything outside the winner weights that changes predictions:
    preprocessing flags + data provenance. Persisted into the winner
    manifest at tune time and validated at load time, so a flag mismatch
    (e.g. tune ran --standardize, load without) raises instead of silently
    replaying different numbers."""
    return {"standardize": bool(cfg.standardize),
            "predictor": cfg.predictor,
            "output": cfg.output,
            "source": source, "seed": seed,
            "synthetic_step": synthetic_step,
            "n_bootstraps": cfg.n_bootstraps,
            "week": cfg.week}


def run_nn_branch_load(cfg: PipelineConfig, bundles, out_root=".",
                       log=print, fingerprint=None) -> NNResult:
    """The reference's training_type="load" (training.py:127-131): rebuild
    each fold's persisted winner checkpoint and predict, skipping the
    tuning sweep entirely. Winners come from a prior tune run's
    models/{dir}{model}_{obs}/{week} tree (the reference deletes that tree
    at end-of-run, tune_ECMWF_com.py:183-186; this framework keeps it)."""
    from ..train import checkpoint
    from ..train.sweep import winner_forward

    names, filled, first, fm, labels, _, edges_pr = \
        _nn_setup(cfg, bundles, log)
    per_model_preds = []
    hparams_by_model: Dict[str, list] = {}
    for n in names:
        mdir = os.path.join(out_root, "models", cfg.out_dir,
                            f"{n}_{cfg.obs}", cfg.week)
        mpath = os.path.join(mdir, f"winners_{cfg.week}.json")
        if not os.path.exists(mpath):
            raise FileNotFoundError(
                f"no winner manifest at {mpath} — run the tune pipeline "
                f"first; training_type='load' replays persisted winners")
        with open(mpath) as fh:
            manifest = {e["fold"]: e for e in json.load(fh)}
        if fingerprint is not None:
            saved_fp = next(iter(manifest.values())).get("fingerprint")
            if saved_fp is not None and saved_fp != fingerprint:
                diffs = {k: (saved_fp.get(k), fingerprint.get(k))
                         for k in set(saved_fp) | set(fingerprint)
                         if saved_fp.get(k) != fingerprint.get(k)}
                raise ValueError(
                    f"winner manifest {mpath} was tuned under different "
                    f"settings than this load run (tune vs load): {diffs} "
                    f"— replay with matching flags or re-tune")
        missing = [f for f in range(fm.n_folds) if f not in manifest]
        if missing:
            raise ValueError(
                f"manifest {mpath} lacks folds {missing} "
                f"(has {sorted(manifest)}); rerun tuning with "
                f"n_bootstraps={cfg.n_bootstraps}")
        x = jnp.asarray(filled[n].predictor_images(cfg.predictor))
        t0 = time.time()
        F = fm.n_folds
        loaded = [checkpoint.load_winner(mdir, cfg.week, f,
                                         architecture=cfg.architecture)
                  for f in range(F)]
        # group folds by winning config and run ONE F-lane vmapped forward
        # per group (lanes padded by repeating the first fold) — the exact
        # program shape the sweep's winner collection uses, so load-mode
        # predictions are bit-identical to the tune run's (a plain unvmapped
        # forward lowers convs differently and drifts in low-order bits)
        groups: Dict[str, list] = {}
        for f in range(F):
            key = json.dumps(manifest[f].get("config")
                             or manifest[f]["hparams"],
                             sort_keys=True, default=str)
            groups.setdefault(key, []).append(f)
        preds_f = [None] * F
        for fs in groups.values():
            model = loaded[fs[0]][0]
            lanes = fs + [fs[0]] * (F - len(fs))
            vstack = jax.tree.map(lambda *a: jnp.stack(a),
                                  *[loaded[f][1] for f in lanes])
            preds_g = np.asarray(winner_forward(model, vstack, x))
            for i, f in enumerate(fs):
                preds_f[f] = preds_g[i]
        log(f"[nn] model {n}: loaded {F} winners "
            f"({len(groups)} architecture groups) from {mdir} "
            f"in {time.time() - t0:.1f}s")
        preds_n = np.stack(preds_f)
        if cfg.output == "deterministic":
            preds_n = _deterministic_to_probs(preds_n, filled[n].weeks,
                                              edges_pr)
        per_model_preds.append(preds_n)
        hparams_by_model[n] = [manifest[f]["hparams"] for f in range(F)]

    if cfg.is_mme:
        preds = np.asarray(elr_ops.blend_probabilities(per_model_preds))
    else:
        preds = per_model_preds[0]

    _r = _nn_rpss(filled, names, preds, labels)
    coords = {"Y": first.lats, "X": first.lons}
    return NNResult(
        rpss_train=Field(_r(fm.train), ("bootstrap", "Y", "X"), coords, "rpss"),
        rpss_val=Field(_r(fm.val), ("bootstrap", "Y", "X"), coords, "rpss"),
        rpss_test=Field(_r(fm.test), ("bootstrap", "Y", "X"), coords, "rpss"),
        predictions=preds, labels=labels, masks=fm, sweeps={},
        best_hparams=[
            {n: hparams_by_model[n][f] for n in names}
            for f in range(fm.n_folds)],
        fixed_winners={})


def resolve_batch_sizes(grid: TuningGrid, T: int) -> TuningGrid:
    """Resolve the batch-size sentinel 0 = 'full' to the actual training-
    set length. Full-batch steps measured 4.3x MXU utilization on the v5e
    (PERF.md) but change SGD semantics (1 step/epoch, no shuffling
    effect), so 'full' is a documented non-parity opt-in via
    `--batch-size full`, never a default."""
    if 0 not in grid.batch_sizes:
        return grid
    seen = []
    for b in (T if b == 0 else b for b in grid.batch_sizes):
        if b not in seen:
            seen.append(b)           # dedupe: T may collide with explicit bs
    return replace(grid, batch_sizes=tuple(seen))


def _prefetch_elr_programs(cfg: PipelineConfig, bundles, log, mesh=None):
    """Compile (never execute) the ELR branch's programs from avals into
    the process memo: the per-fold labeler fit (_elr_fit_folds), the
    pixel-parallel GLM (elr_folds) and the fold-vmapped RPSS — mirroring
    run_elr_branch's exact shapes. Round 4 measured the ELR stage as the
    suite's critical-path floor (2,612 s of the 24-combo weeks session;
    719-2,045 s for a single config in a bad remote-compile window, vs
    ~5.5 s warm) precisely because only the NN buckets were covered by
    the compile-ahead machinery."""
    names = list(bundles)
    first = bundles[names[0]]
    fm = splits.bootstrap_masks_elr(first.years, cfg.n_bootstraps,
                                    frac_test=cfg.elr_frac_test)
    wm = timeutils.week_window_matrix(1)
    F = fm.train.shape[0]
    yshape = tuple(first.y.shape)                       # (T, Y, X)
    f32 = jnp.float32
    y_av = jax.ShapeDtypeStruct(yshape, f32)
    tm = jnp.asarray(fm.train)
    _elr_fit_folds(y_av, first.weeks, tm, wm, compile_only=True)
    elr_ops.elr_folds(
        jax.ShapeDtypeStruct(yshape, f32),              # x ensemble mean
        jax.ShapeDtypeStruct((F, 2) + yshape, f32),     # cumulative targets
        fm.train, fm.test, y_av, mesh=mesh, compile_only=True)
    _rpss_folds_j(jax.ShapeDtypeStruct(yshape + (3,), f32),
                  jax.ShapeDtypeStruct((F,) + yshape + (3,), f32),
                  jax.ShapeDtypeStruct((F,) + yshape, f32),
                  tm, compile_only=True)
    log(f"[prefetch] {cfg.name}: ELR programs compiled")
    return 3


def prefetch_nn_programs(cfg: PipelineConfig, source="synthetic", seed=0,
                         synthetic_step=None, log=print, use_mesh="auto"):
    """Compile (never execute) a config's device programs into the
    process memo, so a `run suite` session can overlap config N+1's
    remote compilation (20-500 s/program on this backend) with config
    N's on-device execution: the ELR branch's fit/GLM/RPSS programs, the
    NN labeling program, and the U-Net bucket programs. Only the SHAPES
    of the inputs reach the compiled programs, so avals/dummy labels
    suffice; everything static — tuning grid, TrainSettings (incl. the
    mask-derived val_rows), pad, predictor/output mode — is reproduced
    exactly as run_elr_branch/run_nn_branch would. Safe to skip on
    failure: the real run compiles whatever is missing."""
    bundles = load_bundles(cfg, source, seed=seed,
                           synthetic_step=synthetic_step)
    bundles = {n: _apply_pad(cfg, b) for n, b in bundles.items()}
    # mirror run_pipeline's mesh choice — a prefetch compiled for the
    # wrong topology has memo keys the real run never looks up
    mesh = None
    if use_mesh and (use_mesh != "auto" or len(jax.devices()) > 1):
        from ..parallel import mesh as pmesh
        mesh = pmesh.sweep_mesh()
    n = _prefetch_elr_programs(cfg, bundles, log, mesh=mesh)
    if cfg.architecture != "unet":
        return n             # cnn/mlp programs are cheap single trials
    names = list(bundles)
    filled = {n_: b.fillna(0.0) for n_, b in bundles.items()}
    if cfg.predictor == "stacked":
        if cfg.is_mme:
            return n                               # rejected by the run
        filled = {n_: b.stacked() for n_, b in filled.items()}
    first = filled[names[0]]
    fm = splits.bootstrap_masks(first.years, cfg.n_bootstraps,
                                frac_valid=cfg.nn_frac_valid,
                                frac_test=cfg.nn_frac_test)
    # the NN branch's per-fold labeling program (same memo route)
    _fit_label_folds(jax.ShapeDtypeStruct(tuple(first.y.shape),
                                          jnp.float32),
                     first.weeks, jnp.asarray(fm.train),
                     timeutils.week_window_matrix(1), compile_only=True)
    # all of a config's models share one grid/T (MME asserts alignment),
    # so one model's shapes compile the programs for every sweep. Only
    # avals of the big tensors are passed — the prefetch runs WHILE the
    # foreground config trains, and must not hold full-size buffers in
    # the same HBM (y alone is F*T*H*W*3 floats on the full grids).
    x_shape = tuple(first.predictor_images(cfg.predictor,
                                           shape_only=True))
    x = jax.ShapeDtypeStruct(x_shape, jnp.float32)
    n_out = 1 if cfg.output == "deterministic" else 3
    y_dummy = jax.ShapeDtypeStruct(
        (fm.n_folds,) + first.y.shape + (n_out,), jnp.float32)
    t0 = time.time()
    run_unet_sweep(x, y_dummy, fm.train, fm.val,
                   resolve_batch_sizes(cfg.tuning, x_shape[0]),
                   epochs=cfg.epochs, output=cfg.output, mesh=mesh,
                   compile_only=True)
    log(f"[prefetch] {cfg.name}: bucket programs compiled in "
        f"{time.time() - t0:.1f}s")
    return n + 2


_det_to_probs_jit = jax.jit(lambda p, w, e, pr: terciles.one_hot_labels(
    jax.vmap(lambda pv, ev, prv: terciles.label_terciles(pv, w, ev, prv)
             )(p, e, pr)))


def _deterministic_to_probs(preds, weeks, edges_pr):
    """Categorize deterministic precip predictions (F, T, H, W, 1) with
    each fold's rolling tercile edges, yielding one-hot (F, T, H, W, 3)
    'probabilities' so deterministic runs score through the exact same
    RPSS/MME machinery as the proba head. (The reference's deterministic
    head, deep_nn_models.py:104-105, dead-ends before any scoring.)
    Routed through the program memo like the other module-level jits."""
    from ..programs import memoized_call
    edges, present = edges_pr
    return np.asarray(memoized_call(
        "det_to_probs", _det_to_probs_jit,
        (jnp.asarray(preds)[..., 0], weeks, edges, present)))


def _make_architecture(arch: str, x_shape):
    from ..models import CNN, MLP
    if arch == "cnn":
        return CNN()
    if arch == "mlp":
        return MLP(spatial_shape=tuple(x_shape[1:3]))
    raise ValueError(f"unknown architecture {arch!r}")


def _unet_from_grid(cfg: PipelineConfig):
    """The training_type='train' U-Net: a SINGLE configuration — the
    first tuning-grid entry, standing in for the reference's
    architecture_params dict (training.py:54-60,119-125; the scripts set
    architecture_params from the same values their grids lead with)."""
    from ..models import UNet, UNetConfig
    from ..train.sweep import enumerate_trials
    t0 = enumerate_trials(cfg.tuning)[0]
    ucfg = UNetConfig(filters=t0.filters, n_blocks=t0.n_blocks,
                      ct_kernel=t0.ct_kernel, output=cfg.output)
    return UNet(ucfg), ucfg


# ------------------------------------------------------------- skill mask
def skill_mask(nn: NNResult, y_raw: np.ndarray) -> np.ndarray:
    """Reference end-of-run mask (tune_ECMWF_com.py:123-133): pixels whose
    fold-0 test labels have < 3 unique classes, or any NaN in raw y."""
    lab0 = nn.labels[0]
    test0 = nn.masks.test[0]
    sel = lab0[test0]
    uniq = np.zeros(lab0.shape[1:], np.int32)
    for k in range(3):
        uniq += (sel == k).any(axis=0)
    mask1 = uniq < 3
    mask2 = np.isnan(y_raw).any(axis=0)
    return mask1 | mask2


# ------------------------------------------------------------------ driver
@dataclass
class TuneOutputs:
    config: PipelineConfig
    elr: ElrResult
    nn: NNResult
    mask: np.ndarray
    paths: Dict[str, str] = field(default_factory=dict)
    figures: Dict[str, str] = field(default_factory=dict)
    elapsed_s: float = 0.0


def run_pipeline(cfg: PipelineConfig, source="synthetic", out_root=".",
                 make_plots=False, save_outputs=True, seed=0,
                 synthetic_step=None, log=print,
                 profile_dir=None, use_mesh="auto",
                 overlap_branches=False,
                 training_type="tune") -> TuneOutputs:
    from ..profiling import StageTimer, trace
    mesh = None
    if use_mesh and (use_mesh != "auto" or len(jax.devices()) > 1):
        from ..parallel import mesh as pmesh
        mesh = pmesh.sweep_mesh()
        log(f"[mesh] sweep lanes sharded over {mesh.devices.size} devices")
    timer = StageTimer()
    t_start = time.time()
    log(f"####### TUNING {'+'.join(cfg.models)} for {cfg.obs} "
        f"{cfg.week} ({cfg.name}) #######")
    with timer.stage("data"):
        bundles = load_bundles(cfg, source, seed=seed,
                               synthetic_step=synthetic_step)
        bundles = {n: _apply_pad(cfg, b) for n, b in bundles.items()}
        if cfg.standardize:
            # bootstrap_splits(standardize=True) semantics (preprocessing.py:
            # 338-343, 452-456): per-pixel affine over full T, before any
            # fillna. Applied once here — both branches receive the same
            # standardized tensors, as in the reference where each split
            # function standardizes the same full x/y. (MME note: reference
            # standardizes the cross-model-mean y; all models share one obs
            # grid per config, so per-bundle standardization is equivalent.)
            bundles = {n: b.standardize() for n, b in bundles.items()}
    first = bundles[list(bundles)[0]]

    # MME blends write under MME_IMD / 2MME_IMD — the reference's
    # filesystem contract between tune scripts and Bar_plot.ipynb
    # (tune_MME.py:47,92-93,135-137); single-model configs keep
    # {model}_{obs}
    out_dir = os.path.join(out_root, "outputs", cfg.out_dir,
                           f"{cfg.result_name}_{cfg.obs}")
    paths = {}

    # The two branches are independent programs over the same bundles, so
    # they CAN run concurrently (NN in a worker thread while ELR runs in
    # the main thread) — results are identical either way. Measured on the
    # 1-CPU v5e host this HURT (ELR 655s vs ~90s: program tracing is
    # host-GIL-bound and the remote compile server serializes, see
    # PERF.md), so it is opt-in for multi-core hosts, and disabled when
    # profiling (the jax profiler trace is a global context).
    if training_type not in ("tune", "train", "load"):
        raise ValueError(f"training_type must be 'tune', 'train' or "
                         f"'load', got {training_type!r}")
    fingerprint = settings_fingerprint(cfg, source, seed, synthetic_step)

    def _save_elr(elr_res):
        # persist ELR results as soon as they exist: the NN stage is the
        # long one, and a failure there must not discard finished work
        if save_outputs:
            for tag, fld in [("train", elr_res.rpss_train),
                             ("test", elr_res.rpss_test)]:
                p = os.path.join(out_dir, f"ELR_rpss_{tag}_{cfg.week}.nc")
                paths[f"elr_{tag}"] = write_netcdf(fld, p)

    if training_type == "load":
        # load mode never trains, so branch overlap buys nothing
        log("########### ELR ###########")
        with trace(profile_dir, log), timer.stage("elr"):
            # hold compile priority: the suite's background prefetch must
            # not crowd the ELR jits off the serialized compile server
            with sweep_mod.foreground_compile_priority():
                elr_res = run_elr_branch(cfg, bundles, log, mesh=mesh)
        _save_elr(elr_res)
        log("########### Neural Network (load) ###########")
        with timer.stage("nn"):
            nn_res = run_nn_branch_load(cfg, bundles, out_root=out_root,
                                        log=log, fingerprint=fingerprint)
    elif overlap_branches and profile_dir is None:
        from concurrent.futures import ThreadPoolExecutor
        log("########### ELR + Neural Network (overlapped) ###########")
        with ThreadPoolExecutor(max_workers=1) as ex:
            with timer.stage("nn"):      # NN wall; the ELR stage overlaps it
                nn_fut = ex.submit(run_nn_branch, cfg, bundles, log,
                                   timer, mesh, training_type)
                with timer.stage("elr"):
                    # hold compile priority: the suite's background prefetch must
                    # not crowd the ELR jits off the serialized compile server
                    with sweep_mod.foreground_compile_priority():
                        elr_res = run_elr_branch(cfg, bundles, log, mesh=mesh)
                _save_elr(elr_res)      # NN may still fail; ELR is on disk
                nn_res = nn_fut.result()
    else:
        log("########### ELR ###########")
        with trace(profile_dir, log), timer.stage("elr"):
            # hold compile priority: the suite's background prefetch must
            # not crowd the ELR jits off the serialized compile server
            with sweep_mod.foreground_compile_priority():
                elr_res = run_elr_branch(cfg, bundles, log, mesh=mesh)
        _save_elr(elr_res)
        log("########### Neural Network ###########")
        with trace(profile_dir and os.path.join(profile_dir, "nn"), log), \
                timer.stage("nn"):
            nn_res = run_nn_branch(cfg, bundles, log, timer=timer,
                                   mesh=mesh, training_type=training_type)
    arch = cfg.architecture

    # persist per-fold winner models (reference saves then DELETES its
    # checkpoints, tune_ECMWF_com.py:183-186 — we keep them so the 'load'
    # training type, realtime forecasting and GradCAM work without
    # retraining). Directory scheme mirrors models/{dir}{model}_{obs}/{week}
    # (tune_ECMWF_com.py:37).
    if save_outputs and (nn_res.sweeps or nn_res.fixed_winners):
        from ..train import checkpoint
        for n in bundles:
            mdir = os.path.join(out_root, "models", cfg.out_dir,
                                f"{n}_{cfg.obs}", cfg.week)
            shp = bundles[n].shape_yx
            c_in = bundles[n].n_m if cfg.predictor == "multi_predictor" else 1
            if n in nn_res.sweeps:
                paths[f"winners_{n}"] = checkpoint.save_sweep_winners(
                    nn_res.sweeps[n], mdir, cfg.week, architecture=arch,
                    input_shape=(1, *shp, c_in), fingerprint=fingerprint)
            elif n in nn_res.fixed_winners:
                var_list, vloss, ucfg = nn_res.fixed_winners[n]
                # the hp actually trained with (resolve_batch_sizes has
                # already replaced a `full` sentinel with T here — the
                # raw cfg.tuning grid would record batch_size=0)
                hp = dict(nn_res.best_hparams[0][n])
                paths[f"winners_{n}"] = checkpoint.save_fixed_winners(
                    var_list, vloss, mdir, cfg.week, architecture=arch,
                    input_shape=(1, *shp, c_in), hparams=hp,
                    fingerprint=fingerprint, config=ucfg)
    if save_outputs:
        for tag, fld in [("train", nn_res.rpss_train),
                         ("val", nn_res.rpss_val),
                         ("test", nn_res.rpss_test)]:
            p = os.path.join(out_dir, f"{arch}_rpss_{tag}_{cfg.week}.nc")
            paths[f"nn_{tag}"] = write_netcdf(fld, p)
        with open(os.path.join(out_dir, f"best_hparams_{cfg.week}.json"),
                  "w") as fh:
            json.dump(nn_res.best_hparams, fh, indent=1, default=str)
        paths["hparams"] = os.path.join(out_dir, f"best_hparams_{cfg.week}.json")

    y_raw = np.mean(np.stack([bundles[n].y for n in bundles]), 0) \
        if cfg.is_mme else first.y
    mask = skill_mask(nn_res, y_raw)

    out = TuneOutputs(config=cfg, elr=elr_res, nn=nn_res, mask=mask,
                      paths=paths, elapsed_s=time.time() - t_start)
    if save_outputs:
        paths["profile"] = timer.dump(
            os.path.join(out_dir, f"profile_{cfg.week}.json"))
    log(f"[profile] {json.dumps(timer.summary())}")

    if make_plots:
        from ..viz import reliability, maps
        figdir = os.path.join(out_root, "figures", cfg.out_dir,
                              f"{cfg.result_name}_{cfg.obs}")
        # the reference overlays shapes/ borders on every RPSS map
        # (plots.py:417-420,477-480); resolve the bundled/reference assets
        shapes_dir = maps.default_shapes_dir(out_root)
        out.figures.update(maps.plot_rpss_panels(
            {"Train": elr_res.rpss_train, "Test": elr_res.rpss_test},
            first.lats, first.lons, figdir,
            f"{cfg.week.replace('-', '')}_RPSS_ELR", shapes_dir=shapes_dir))
        out.figures.update(maps.plot_rpss_panels(
            {"Train": nn_res.rpss_train, "Validation": nn_res.rpss_val,
             "Test": nn_res.rpss_test},
            first.lats, first.lons, figdir,
            f"{cfg.week.replace('-', '')}_RPSS_{arch.upper()}", mask=mask,
            shapes_dir=shapes_dir))
        out.figures.update(reliability.compare_categories(
            nn_res, elr_res, mask, cfg, figdir))

    hh = time.strftime("%H:%M:%S", time.gmtime(out.elapsed_s))
    log(f"####### DONE {cfg.name} in {hh} #######")
    return out
