"""The training engine: one fold+trial = one pure function; everything scans.

The reference trains with Keras model.fit per (fold, trial): shuffled
minibatches, per-epoch val_loss, ModelCheckpoint(best val_loss) +
EarlyStopping(patience, restore_best_weights=True) (training.py:98-116).

TPU-first inversion: there is no Python loop and no callback. A single
jitted program runs `lax.scan` over epochs (inner scan over minibatches)
and tracks the best-validation weights *functionally* in the scan carry,
with the same selection semantics as the Keras callbacks:
  * improvement = strictly lower val_loss (min_delta=0)
  * after `patience` epochs without improvement the fold freezes (later
    epochs cannot change the result — identical to stopping)
  * the returned weights/val-loss are those of the best epoch

Ragged folds become static shapes: the full (T, ...) tensors are shared by
every lane; each lane sees only boolean masks. Batches are index-gathers;
padded slots carry weight 0, and parameter/optimizer/BN updates are gated
per batch so zero-weight batches are true no-ops (Adam would otherwise
drift on zero gradients).

vmap over lanes = folds x learning rates turns the whole hyperparameter
sweep into one XLA program (SURVEY.md section 7 north star).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .losses import categorical_crossentropy, masked_mse

_LOSSES = {"categorical_crossentropy": categorical_crossentropy,
           "mse": masked_mse}


@dataclass(frozen=True)
class TrainSettings:
    """Dynamic-agnostic knobs (batch size & epochs are static; lr is a
    traced per-lane scalar)."""
    epochs: int = 100
    batch_size: int = 16
    patience: int = 10
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-7            # Keras Adam epsilon (not optax's 1e-8)
    val_rows: int | None = None  # static upper bound on validation rows:
    # the per-epoch val loss is evaluated on a compacted (val_rows, ...)
    # gather instead of the full masked T axis — exact same masked-CE
    # value (weights zero any overshoot), ~T/val_rows x cheaper. None =
    # evaluate over full T.
    early_exit: bool = False     # run the epoch loop as lax.while_loop and
    # exit once the lane has stopped (patience exceeded) — the reference's
    # EarlyStopping truly stops training (training.py:100); the scan path
    # instead runs max epochs with the result frozen. Outputs are identical
    # by construction; under vmap the program exits at the LAST lane's stop
    # epoch. vloss history entries past the exit are NaN.
    loss: str = "categorical_crossentropy"   # | 'mse' (deterministic head:
    # the proba head trains on one-hot terciles, the deterministic head on
    # raw precipitation with NaN-masked MSE)
    unroll: int = 1              # lax.scan unroll of the minibatch loop —
    # identical numerics; trades program size (compile time) for fewer
    # per-step dispatch boundaries on op-latency-bound step programs


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def adam(settings: TrainSettings):
    """Keras-default Adam with the learning rate applied outside, so lr can
    be a traced per-lane value under vmap.

    optax.flatten runs the moment updates on ONE concatenated vector
    instead of ~30 tree leaves. Measured on TPU v5e (20-lane sweep):
    identical trajectory, ~2% faster steps, and 7x faster XLA compile
    (141.8s -> 20.9s) — the leaf-wise update chains were what blew up
    compilation."""
    return optax.flatten(optax.scale_by_adam(
        b1=settings.b1, b2=settings.b2, eps=settings.eps, eps_root=0.0))


def train_fold(model, x, y_onehot, train_mask, val_mask, lr, key,
               settings: TrainSettings, init_variables=None):
    """Train one lane; return (best_variables, best_val_loss, history).

    model: flax module with __call__(x, train, sample_weight)
    x:        (T, H, W, C) float32 predictor images (shared across lanes)
    y_onehot: (T, H, W, 3) float32 targets *for this lane's fold*
    train_mask/val_mask: (T,) bool
    lr: scalar float (traced OK)
    key: PRNG key for init + shuffling
    """
    T = x.shape[0]
    bs = settings.batch_size
    n_batches = -(-T // bs)
    pad = n_batches * bs - T

    x_pad = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    y_pad = jnp.pad(y_onehot, ((0, pad),) + ((0, 0),) * (y_onehot.ndim - 1))
    wtrain_pad = jnp.pad(train_mask.astype(jnp.float32), (0, pad))

    key, init_key = jax.random.split(key)
    if init_variables is None:
        init_variables = model.init(init_key, x[:1], train=False)
    params = init_variables["params"]
    batch_stats = init_variables.get("batch_stats", {})

    tx = adam(settings)
    opt_state = tx.init(params)

    loss_impl = _LOSSES[settings.loss]

    def loss_fn(p, stats, xb, yb, wb, dkey):
        out, mutated = model.apply(
            {"params": p, "batch_stats": stats}, xb, train=True,
            sample_weight=wb, mutable=["batch_stats"],
            rngs={"dropout": dkey})
        return loss_impl(out, yb, wb), mutated["batch_stats"]

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def batch_step(carry, batch):
        bidx, dkey = batch
        params, stats, opt_state = carry
        xb = x_pad[bidx]
        yb = y_pad[bidx]
        wb = wtrain_pad[bidx]
        (loss, new_stats), grads = grad_fn(params, stats, xb, yb, wb, dkey)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = jax.tree.map(lambda p, u: p - lr * u, params, updates)
        # gate no-op padded batches AND non-finite steps (failure
        # detection, SURVEY.md section 5: a diverged/NaN batch must not
        # poison the lane — the reference has no guard at all)
        ok = (jnp.sum(wb) > 0) & jnp.isfinite(loss)
        params = _tree_where(ok, new_params, params)
        stats = _tree_where(ok, new_stats, stats)
        opt_state = _tree_where(ok, new_opt, opt_state)
        return (params, stats, opt_state), loss

    if settings.val_rows is not None and settings.val_rows < T:
        # compacted validation set: val rows first (stable argsort), fixed
        # static size; any slot past this lane's true count carries w=0
        vidx = jnp.argsort(jnp.logical_not(val_mask).astype(jnp.int32),
                           stable=True)[:settings.val_rows]
        x_val, y_val = x[vidx], y_onehot[vidx]
        w_val = val_mask[vidx].astype(jnp.float32)
    else:
        x_val, y_val = x, y_onehot
        w_val = val_mask.astype(jnp.float32)

    def val_loss_fn(p, stats):
        out = model.apply({"params": p, "batch_stats": stats}, x_val,
                          train=False)
        return loss_impl(out, y_val, w_val)

    def epoch_step(carry, ekey):
        params, stats, opt_state, best = carry
        ekey, dkey = jax.random.split(ekey)
        dkeys = jax.random.split(dkey, n_batches)   # per-batch dropout rngs
        # Keras shuffle=True: random batch composition each epoch. Stable
        # partition puts train samples first so the real batches are dense.
        perm = jax.random.permutation(ekey, T)
        train_first = jnp.argsort(
            jnp.logical_not(train_mask[perm]).astype(jnp.int32), stable=True)
        idx = perm[train_first]
        if pad:
            # point pad slots at row T: a zero row with weight 0 in *_pad
            idx = jnp.concatenate([idx, jnp.full((pad,), T, idx.dtype)])
        batches = idx.reshape(n_batches, bs)
        (params, stats, opt_state), _ = jax.lax.scan(
            batch_step, (params, stats, opt_state), (batches, dkeys),
            unroll=settings.unroll)

        vloss = val_loss_fn(params, stats)
        best_params, best_stats, best_vloss, wait, stopped = best
        improved = jnp.logical_and(vloss < best_vloss, jnp.logical_not(stopped))
        best_params = _tree_where(improved, params, best_params)
        best_stats = _tree_where(improved, stats, best_stats)
        best_vloss = jnp.where(improved, vloss, best_vloss)
        wait = jnp.where(improved, 0, wait + jnp.logical_not(stopped))
        stopped = jnp.logical_or(stopped, wait >= settings.patience)
        best = (best_params, best_stats, best_vloss, wait, stopped)
        return (params, stats, opt_state, best), vloss

    best0 = (params, batch_stats, jnp.float32(jnp.inf), jnp.int32(0),
             jnp.asarray(False))
    ekeys = jax.random.split(key, settings.epochs)
    if settings.early_exit:
        def cond(c):
            e, _, _, _, best_c, _ = c
            return jnp.logical_and(e < settings.epochs,
                                   jnp.logical_not(best_c[4]))

        def body(c):
            e, p, s, o, best_c, hist = c
            (p, s, o, best_c), vloss = epoch_step((p, s, o, best_c), ekeys[e])
            return (e + 1, p, s, o, best_c, hist.at[e].set(vloss))

        hist0 = jnp.full((settings.epochs,), jnp.nan, jnp.float32)
        carry0 = (jnp.int32(0), params, batch_stats, opt_state, best0, hist0)
        _, _, _, _, best, vloss_hist = jax.lax.while_loop(cond, body, carry0)
    else:
        (_, _, _, best), vloss_hist = jax.lax.scan(
            epoch_step, (params, batch_stats, opt_state, best0), ekeys)
    best_params, best_stats, best_vloss, _, _ = best
    return {"params": best_params, "batch_stats": best_stats}, best_vloss, vloss_hist


def predict(model, variables, x, batch=None):
    """Inference forward over the full T axis (eval mode, running BN)."""
    return model.apply(variables, x, train=False)


def make_lane_trainer(model, settings: TrainSettings) -> Callable[..., Any]:
    """vmap-ready lane function.

    lane inputs: y_onehot (per-fold), train_mask, val_mask, lr, key.
    shared (closed over by caller via partial): x.
    Returns (best_variables, best_val_loss, predictions over full T).
    """
    def lane(x, y_onehot, train_mask, val_mask, lr, key):
        best_vars, best_vloss, hist = train_fold(
            model, x, y_onehot, train_mask, val_mask, lr, key, settings)
        preds = predict(model, best_vars, x)
        return best_vars, best_vloss, preds
    return lane
