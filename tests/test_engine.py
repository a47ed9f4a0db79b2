"""Training-engine behavior tests: learning, best-val selection with
early-stop parity, padded-batch gating, lane vmapping."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s2s_ismr_tpu import timeutils
from s2s_ismr_tpu.data import synthetic
from s2s_ismr_tpu.grid import Domain
from s2s_ismr_tpu.models import UNet, UNetConfig
from s2s_ismr_tpu.ops import terciles
from s2s_ismr_tpu.train import splits
from s2s_ismr_tpu.train.engine import TrainSettings, train_fold, predict
from s2s_ismr_tpu.train.losses import categorical_crossentropy


@pytest.fixture(scope="module")
def setup():
    b = synthetic.synthetic_hindcast(years=(2003, 2012), seed=9, signal=0.8,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    b = b.fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_bootstraps=3)
    wm = timeutils.week_window_matrix(1)
    labels, _, _ = terciles.fit_and_label(b.y, b.weeks, fm.train[0], wm, None)
    y_oh = terciles.one_hot_labels(labels)
    x = jnp.asarray(b.ensemble_mean()[..., None])
    return b, fm, x, jnp.nan_to_num(y_oh, nan=0.0)


SMALL = UNetConfig(filters=1, n_blocks=2)
FAST = TrainSettings(epochs=12, batch_size=16, patience=12)


def test_loss_matches_keras_reduction():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    p = rng.dirichlet(np.ones(3), size=(6, 4, 4)).astype(np.float32)
    oh = np.eye(3, dtype=np.float32)[rng.integers(0, 3, (6, 4, 4))]
    ours = float(categorical_crossentropy(jnp.asarray(p), jnp.asarray(oh)))
    keras_val = float(tf.reduce_mean(
        tf.keras.losses.categorical_crossentropy(oh, p)))
    np.testing.assert_allclose(ours, keras_val, rtol=1e-5)


def test_training_learns(setup):
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    best, best_vloss, hist = jax.jit(
        lambda: train_fold(model, x, y_oh, jnp.asarray(fm.train[0]),
                           jnp.asarray(fm.val[0]), 1e-3,
                           jax.random.key(42), FAST))()
    hist = np.asarray(hist)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 1.02          # val loss does not blow up
    assert float(best_vloss) <= hist.min() + 1e-6
    # best weights reproduce the best val loss
    out = predict(model, best, x)
    w = jnp.asarray(fm.val[0], jnp.float32)
    vloss = float(categorical_crossentropy(out, y_oh, w))
    np.testing.assert_allclose(vloss, float(best_vloss), rtol=1e-5)
    # the model beat climatology CE on validation
    climo = jnp.full_like(out, 1 / 3)
    assert vloss < float(categorical_crossentropy(climo, y_oh, w)) + 0.05


def test_early_stop_freezes_after_patience(setup):
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    st = TrainSettings(epochs=12, batch_size=16, patience=2)
    best, best_vloss, hist = train_fold(
        model, x, y_oh, jnp.asarray(fm.train[0]), jnp.asarray(fm.val[0]),
        1e-3, jax.random.key(0), st)
    hist = np.asarray(hist)
    # replicate the callback bookkeeping in numpy
    bv, wait, stopped = np.inf, 0, False
    for v in hist:
        if stopped:
            continue
        if v < bv:
            bv, wait = v, 0
        else:
            wait += 1
            stopped = wait >= st.patience
    np.testing.assert_allclose(float(best_vloss), bv, rtol=1e-6)


def test_empty_train_mask_is_noop(setup):
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    st = TrainSettings(epochs=2, batch_size=16, patience=5)
    none = jnp.zeros(x.shape[0], bool)
    init = model.init(jax.random.key(7), x[:1], train=False)
    best, best_vloss, _ = train_fold(model, x, y_oh, none,
                                     jnp.asarray(fm.val[0]), 1e-3,
                                     jax.random.key(1), st,
                                     init_variables=init)
    for a, b_ in zip(jax.tree.leaves(init["params"]),
                     jax.tree.leaves(best["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    assert np.isfinite(float(best_vloss))


def test_vmapped_lanes(setup):
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    st = TrainSettings(epochs=3, batch_size=16, patience=3)

    def lane(train_m, val_m, lr, key):
        best, vloss, _ = train_fold(model, x, y_oh, train_m, val_m, lr, key, st)
        return vloss, predict(model, best, x)

    lanes = jax.jit(jax.vmap(lane))
    n = 3
    vloss, preds = lanes(jnp.asarray(fm.train), jnp.asarray(fm.val),
                         jnp.array([1e-3, 1e-3, 1e-4]),
                         jax.random.split(jax.random.key(5), n))
    assert vloss.shape == (n,)
    assert preds.shape == (n,) + x.shape[:-1] + (3,)
    assert np.isfinite(np.asarray(vloss)).all()
    assert np.isfinite(np.asarray(preds)).all()
    np.testing.assert_allclose(np.asarray(preds.sum(-1)), 1.0, atol=1e-4)


def test_fixed_training_mlp_dropout_rng():
    """run_fixed_training must thread dropout rngs (MLP has rate 0.3 —
    Keras deep_nn_models.py:166-186); regression for missing rngs."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.models import MLP
    from s2s_ismr_tpu.train.sweep import run_fixed_training

    rng = np.random.default_rng(0)
    T, H = 24, 8
    x = jnp.asarray(rng.normal(size=(T, H, H, 1)).astype(np.float32))
    y = jax.nn.one_hot(jnp.asarray(rng.integers(0, 3, size=(T, H, H))), 3)
    tmask = np.zeros((1, T), bool); tmask[:, :16] = True
    vmask = ~tmask
    model = MLP(spatial_shape=(H, H))
    vloss, preds, var_list = run_fixed_training(
        model, x, jnp.asarray(y)[None], tmask, vmask,
        lr=1e-3, batch_size=8, epochs=2, patience=2)
    assert np.isfinite(vloss).all()
    assert preds.shape == (1, T, H, H, 3)
    np.testing.assert_allclose(np.asarray(preds).sum(-1), 1.0, atol=1e-5)


def test_nonfinite_batch_guard(setup):
    """A lane driven to divergence (absurd lr) must not poison params:
    non-finite steps are skipped and the returned best weights stay
    finite (failure-detection guard, SURVEY.md section 5)."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.models import UNet, UNetConfig
    from s2s_ismr_tpu.train.engine import TrainSettings, train_fold, predict

    b, fm, x, y_oh = setup
    model = UNet(UNetConfig(filters=1, n_blocks=2))
    st = TrainSettings(epochs=3, batch_size=8, patience=3)
    best, vloss, hist = train_fold(model, x, y_oh,
                                   jnp.asarray(fm.train[0]),
                                   jnp.asarray(fm.val[0]),
                                   jnp.float32(1e12), jax.random.key(0), st)
    leaves = jax.tree.leaves(best["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    preds = predict(model, best, x)
    assert np.isfinite(np.asarray(preds)).all()


def test_val_rows_compaction_exact(setup):
    """val_rows compaction must give the exact same best val loss and
    history as full-T masked evaluation."""
    b, fm, x, y_oh = setup
    tm, vm = jnp.asarray(fm.train[0]), jnp.asarray(fm.val[0])
    st_full = TrainSettings(epochs=4, batch_size=16, patience=4)
    st_fast = TrainSettings(epochs=4, batch_size=16, patience=4,
                            val_rows=int(np.asarray(vm).sum()) + 3)
    model = UNet(SMALL)
    _, v1, h1 = train_fold(model, x, y_oh, tm, vm, jnp.float32(1e-3),
                           jax.random.key(1), st_full)
    _, v2, h2 = train_fold(model, x, y_oh, tm, vm, jnp.float32(1e-3),
                           jax.random.key(1), st_fast)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(v2), float(v1), rtol=1e-6)


def test_early_exit_identical_results(setup):
    """early_exit=True (while_loop, exits at patience like Keras
    EarlyStopping) returns bit-identical best weights/val-loss to the
    fixed-length scan, with NaN history past the exit epoch."""
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    key = jax.random.key(3)
    kw = dict(epochs=14, batch_size=16, patience=2)
    st_scan = TrainSettings(early_exit=False, **kw)
    st_exit = TrainSettings(early_exit=True, **kw)
    tm = jnp.asarray(fm.train[0])
    vm = jnp.asarray(fm.val[0])
    b1, v1, h1 = jax.jit(lambda: train_fold(
        model, x, y_oh, tm, vm, 1e-3, key, st_scan))()
    b2, v2, h2 = jax.jit(lambda: train_fold(
        model, x, y_oh, tm, vm, 1e-3, key, st_exit))()
    assert float(v1) == float(v2)
    for a, c in zip(jax.tree.leaves(b1), jax.tree.leaves(b2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    h1, h2 = np.asarray(h1), np.asarray(h2)
    n_run = int(np.isfinite(h2).sum())
    assert n_run < len(h2), "patience=2 should stop before 14 epochs"
    np.testing.assert_array_equal(h1[:n_run], h2[:n_run])
    assert np.isnan(h2[n_run:]).all()


def test_early_exit_vmapped_lanes(setup):
    """Under vmap the batched while exits at the LAST lane's stop epoch and
    every lane's result matches its scan-mode counterpart."""
    b, fm, x, y_oh = setup
    model = UNet(SMALL)
    kw = dict(epochs=10, batch_size=16, patience=2)
    lrs = jnp.asarray([1e-3, 1e-4], jnp.float32)
    keys = jax.random.split(jax.random.key(5), 2)
    tm = jnp.asarray(fm.train[0])
    vm = jnp.asarray(fm.val[0])

    def run(early_exit):
        st = TrainSettings(early_exit=early_exit, **kw)
        f = jax.vmap(lambda lr, k: train_fold(
            model, x, y_oh, tm, vm, lr, k, st)[1])
        return np.asarray(jax.jit(f)(lrs, keys))

    np.testing.assert_array_equal(run(False), run(True))
