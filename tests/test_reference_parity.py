"""Parity against the ACTUAL reference code, executed where the image allows.

What is executable: /root/reference/utils/deep_nn_models.py imports only
TF/Keras/numpy, so the reference's own model-building code runs here. These
tests drive it directly:
  * forward parity — our flax U-Net's weights injected into the model built
    by the reference's Unet.build_model (deep_nn_models.py:73-136), outputs
    equal to float32 tolerance;
  * loss+gradient parity — same weights, same batch: Keras's compiled loss
    (categorical_crossentropy, training.py:67) and its gradients vs our
    engine's loss_fn/grads;
  * tuned-fold statistical parity — the reference's tuning loop semantics
    (training.py:87-116: rebuild per trial, Adam(lr), fit(shuffle=True,
    EarlyStopping(patience, restore_best_weights=True)), winner = min of
    per-epoch val_loss) transcribed around the reference's own build_model,
    on the same data/splits/labels as our run_unet_sweep, compared on val
    loss and test RPSS.

What is NOT executable, and why: the reference's preprocessing.py,
training.py, performance_metrics.py and plots.py import xarray, xskillscore,
statsmodels and cartopy at module scope; none of those packages exist in
this image (no network, installs forbidden). Those paths are covered by
line-cited transcription oracles elsewhere in the suite
(tests/test_terciles.py ref_rolling_label vs preprocessing.py:53-167,
tests/test_metrics.py vs performance_metrics.py:26-45 + plots.py:13-139,
tests/test_elr.py vs training.py:402-530, tests/test_data_splits.py vs
preprocessing.py:359-381) and by the statsmodels-semantics edge-case tests
in tests/test_elr_edge_cases.py.
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
from tensorflow import keras  # noqa: E402

from s2s_ismr_tpu.models import UNet, UNetConfig  # noqa: E402
from s2s_ismr_tpu.ops import metrics  # noqa: E402
from s2s_ismr_tpu.train.losses import categorical_crossentropy  # noqa: E402

REF_DNN = "/root/reference/utils/deep_nn_models.py"


@pytest.fixture(autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference's deep_nn_models.py from the read-only mount."""
    spec = importlib.util.spec_from_file_location("ref_deep_nn_models",
                                                  REF_DNN)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_deep_nn_models"] = mod
    spec.loader.exec_module(mod)
    return mod


def _our_layer_order(cfg: UNetConfig):
    """(name, kind) sequence in the reference's layer-creation order
    (deep_nn_models.py:82-105: encoder blocks, bottleneck, decoder blocks
    with no BN on the last, 1x1 head)."""
    order = []
    for k in range(1, cfg.n_blocks + 1):
        order += [(f"down{k}_conv1", "conv"), (f"down{k}_conv2", "conv"),
                  (f"down{k}_bn", "bn")]
    order += [("bottleneck_conv1", "conv"), ("bottleneck_conv2", "conv"),
              ("bottleneck_bn", "bn")]
    for k in range(cfg.n_blocks, 0, -1):
        order += [(f"up{k}_convT", "convT"), (f"up{k}_conv1", "conv"),
                  (f"up{k}_conv2", "conv")]
        if k > 1:
            order.append((f"up{k}_bn", "bn"))
    order.append(("head", "conv"))
    return order


def _ref_weight_layers(km):
    """The reference model's Conv/ConvT/BN layers in graph order.
    Conv2DTranspose subclasses Conv2D — test it first."""
    out = []
    for layer in km.layers:
        if isinstance(layer, keras.layers.Conv2DTranspose):
            out.append((layer, "convT"))
        elif isinstance(layer, keras.layers.Conv2D):
            out.append((layer, "conv"))
        elif isinstance(layer, keras.layers.BatchNormalization):
            out.append((layer, "bn"))
    return out


def _inject(variables, cfg, km):
    """Copy our flax variables into the reference-built Keras model."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    ours = _our_layer_order(cfg)
    theirs = _ref_weight_layers(km)
    assert [k for _, k in ours] == [k for _, k in theirs], (
        f"layer sequence mismatch: ours={[k for _, k in ours]} "
        f"reference={[k for _, k in theirs]}")
    for (name, kind), (layer, _) in zip(ours, theirs):
        p = params[name]
        if kind == "conv":
            layer.set_weights([np.asarray(p["conv"]["kernel"]),
                               np.asarray(p["conv"]["bias"])])
        elif kind == "convT":
            layer.set_weights([np.asarray(p["kernel"]),
                               np.asarray(p["bias"])])
        else:
            s = stats[name]
            layer.set_weights([np.asarray(p["scale"]), np.asarray(p["bias"]),
                               np.asarray(s["mean"]), np.asarray(s["var"])])


def _build_ref_unet(ref_models, cfg: UNetConfig, hw):
    return ref_models.Unet(
        "", ct_kernel=cfg.ct_kernel, ct_stride=cfg.ct_stride,
        n_blocks=cfg.n_blocks, filters=cfg.filters,
        train_patches=False, weighted_loss=False,
    ).build_model((hw[0], hw[1], 1), dg_train_weight_target=None)


@pytest.mark.parametrize("cfg", [
    UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3)),
    UNetConfig(filters=2, n_blocks=3, ct_kernel=(5, 5)),
    UNetConfig(filters=3, n_blocks=4, ct_kernel=(2, 2)),
])
def test_reference_built_model_forward_parity(ref_models, cfg):
    """Our forward pass equals the model built by the reference's OWN
    Unet.build_model with identical weights (not a replica)."""
    hw = (16, 16)
    x = np.random.default_rng(7).normal(size=(4, *hw, 1)).astype(np.float32)
    model = UNet(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    y = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    km = _build_ref_unet(ref_models, cfg, hw)
    _inject(variables, cfg, km)
    yk = km(x, training=False).numpy()
    np.testing.assert_allclose(y, yk, atol=3e-5)


def test_reference_loss_and_gradient_parity(ref_models):
    """Same weights + batch: the reference's compiled loss (categorical
    crossentropy on probability outputs, training.py:67) and its gradients
    agree with our engine's loss_fn/value_and_grad to float32 tolerance.
    This pins the entire backward path, not just the forward topology."""
    cfg = UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3))
    hw = (16, 16)
    rng = np.random.default_rng(11)
    x = rng.normal(size=(8, *hw, 1)).astype(np.float32)
    labels = rng.integers(0, 3, size=(8, *hw))
    y_oh = np.eye(3, dtype=np.float32)[labels]

    model = UNet(cfg)
    variables = model.init(jax.random.key(1), jnp.asarray(x), train=False)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x), train=True, mutable=["batch_stats"])
        return categorical_crossentropy(out, jnp.asarray(y_oh))

    loss_ours, grads_ours = jax.value_and_grad(loss_fn)(variables["params"])

    km = _build_ref_unet(ref_models, cfg, hw)
    _inject(variables, cfg, km)
    xt = tf.constant(x)
    yt = tf.constant(y_oh)
    with tf.GradientTape() as tape:
        out = km(xt, training=True)
        loss_ref = tf.reduce_mean(
            keras.losses.categorical_crossentropy(yt, out))
    tvars = km.trainable_variables
    grads_ref = tape.gradient(loss_ref, tvars)

    np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=2e-5)

    # match gradient tensors by (shape, checking conv kernels): build the
    # reference grad lookup keyed by variable path
    ref_by_name = {v.path if hasattr(v, "path") else v.name: g.numpy()
                   for v, g in zip(tvars, grads_ref)}
    ours = _our_layer_order(cfg)
    theirs = _ref_weight_layers(km)
    checked = 0
    for (name, kind), (layer, _) in zip(ours, theirs):
        if kind != "conv":
            continue
        g_ref = None
        for v, g in zip(tvars, grads_ref):
            if v is layer.trainable_variables[0]:
                g_ref = g.numpy()
        g_ours = np.asarray(grads_ours[name]["conv"]["kernel"])
        np.testing.assert_allclose(g_ours, g_ref, atol=2e-4,
                                   err_msg=f"grad mismatch at {name}")
        checked += 1
    assert checked >= 7
    del ref_by_name


def _ref_fit_trial(ref_models, cfg, x_tr, y_tr, x_val, y_val, lr, bs,
                   epochs, patience, seed):
    """One reference tuning trial, exactly training.py:87-116 semantics:
    fresh build, Adam(lr), categorical CE, fit(shuffle=True) with
    EarlyStopping(patience, restore_best_weights=True); trial val_loss =
    min over epochs (ModelCheckpoint keeps the best-epoch model)."""
    keras.utils.set_random_seed(seed)      # reset_random_seeds, training.py:23-27
    km = _build_ref_unet(ref_models, cfg, x_tr.shape[1:3])
    km.compile(optimizer=keras.optimizers.Adam(learning_rate=lr),
               loss="categorical_crossentropy")
    early = keras.callbacks.EarlyStopping(
        monitor="val_loss", patience=patience, restore_best_weights=True)
    hist = km.fit(x=x_tr, y=y_tr, validation_data=(x_val, y_val),
                  epochs=epochs, batch_size=bs, callbacks=[early],
                  shuffle=True, verbose=0)
    return km, float(min(hist.history["val_loss"]))


def _parity_data(n_folds):
    """Shared synthetic record + per-fold labels for the statistical
    parity tests (same data, labels and splits on both sides)."""
    from s2s_ismr_tpu.data import synthetic
    from s2s_ismr_tpu.grid import Domain
    from s2s_ismr_tpu.ops import terciles
    from s2s_ismr_tpu import timeutils
    from s2s_ismr_tpu.train import splits

    b = synthetic.synthetic_hindcast(years=(2003, 2014), seed=3,
                                     domain=Domain(67, 98, 7, 38), step=2.0)
    b = b.fillna(0.0)
    fm = splits.bootstrap_masks(b.years, n_folds)
    wm = timeutils.week_window_matrix(1)
    lab_f, _, _ = jax.vmap(lambda pm: terciles.fit_and_label(
        jnp.asarray(b.y), jnp.asarray(b.weeks), pm, wm, None))(
        jnp.asarray(fm.train))
    lab_f = np.asarray(lab_f)
    y_oh = np.nan_to_num(np.asarray(terciles.one_hot_labels(
        jnp.asarray(lab_f))), nan=0.0).astype(np.float32)
    x = np.asarray(b.ensemble_mean())[..., None].astype(np.float32)
    climo = metrics.climo_forecast(jnp.asarray(b.ensemble_mean()))

    def rpss_mean(preds, lab, mask):
        r = np.asarray(metrics.rpss(climo, jnp.asarray(preds),
                                    jnp.asarray(lab), jnp.asarray(mask)))
        return float(np.nanmean(r))

    return b, fm, lab_f, y_oh, x, rpss_mean


@pytest.mark.slow
def test_reference_tuned_fold_statistical_parity(ref_models):
    """Distribution-level skill parity over 3 FOLDS x 2 SEEDS: the
    reference's tuning loop (its own build_model + Keras fit/callback
    semantics, training.py:87-116) vs run_unet_sweep on identical data,
    labels and splits. SGD paths differ (Keras shuffling/init draws vs
    ours), so agreement is statistical — but with 6 (fold, seed) cells
    per side the MEANS must agree tightly, which a lr/loss/init
    regression would break where the old single-fold wide band did not.

    Bands are pinned from a measured run of this exact protocol
    (2026-08-18, this host): ref vloss mean 0.9317 (std 0.0099), ours
    0.9138 (std 0.0161), |Δmean| 0.0179, per-cell |Δvloss| max 0.0361;
    ref fold-mean RPSS 0.2167 (std 0.0092), ours 0.2376 (std 0.0182),
    |Δmean| 0.0208, per-cell |ΔRPSS| max 0.0512. Bands are ~2-3x those
    gaps — the old single-fold test allowed |Δvloss| 0.12 / |ΔRPSS| 0.15
    on one cell; this one caps the mean of six cells at 0.05 / 0.06."""
    from s2s_ismr_tpu.train.sweep import TuningGrid, run_unet_sweep

    F, seeds, epochs = 3, (42, 7), 30
    b, fm, lab_f, y_oh, x, rpss_mean = _parity_data(F)
    grid = TuningGrid(n_blocks=(3,), n_filters=(2,), ct_kernels=((3, 3),),
                      batch_sizes=(16,), learning_rates=(1e-3, 1e-4),
                      patience=10)

    # ---- reference side: its own build_model inside the training.py loop
    ref_v = np.zeros((len(seeds), F))
    ref_r = np.zeros((len(seeds), F))
    n_t = len(grid.learning_rates)
    ref_vt = np.zeros((len(seeds), F, n_t))    # full per-trial val table
    for si, seed in enumerate(seeds):
        for f in range(F):
            tr, va, te = fm.train[f], fm.val[f], fm.test[f]
            best_ref, best_vloss_ref = None, np.inf
            for ti, lr in enumerate(grid.learning_rates):
                km, vloss = _ref_fit_trial(
                    ref_models,
                    UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3)),
                    x[tr], y_oh[f][tr], x[va], y_oh[f][va], lr=lr, bs=16,
                    epochs=epochs, patience=grid.patience, seed=seed)
                ref_vt[si, f, ti] = vloss
                if vloss < best_vloss_ref:   # first-min, training.py:108
                    best_ref, best_vloss_ref = km, vloss
            ref_v[si, f] = best_vloss_ref
            ref_r[si, f] = rpss_mean(best_ref.predict(x, verbose=0),
                                     lab_f[f], te)
    ref_w = ref_vt.argmin(-1)                  # winning trial per cell

    # ---- our side: one vmapped sweep per seed over the same arrays
    ours_v = np.zeros((len(seeds), F))
    ours_r = np.zeros((len(seeds), F))
    ours_vt = np.zeros((len(seeds), F, n_t))
    for si, seed in enumerate(seeds):
        res = run_unet_sweep(jnp.asarray(x), jnp.asarray(y_oh),
                             fm.train, fm.val, grid, epochs=epochs,
                             base_seed=seed)
        ours_v[si] = res.best_val_loss
        ours_vt[si] = res.val_loss_table
        for f in range(F):
            ours_r[si, f] = rpss_mean(np.asarray(res.predictions[f]),
                                      lab_f[f], fm.test[f])
    ours_w = ours_vt.argmin(-1)
    print("\n[winner-parity] ref_vt:", np.round(ref_vt, 4).tolist())
    print("[winner-parity] ours_vt:", np.round(ours_vt, 4).tolist())
    print("[winner-parity] ref_w:", ref_w.tolist(),
          "ours_w:", ours_w.tolist())

    climo_ce = np.log(3.0)
    # every cell learned the signal (under the 1/3-1/3-1/3 entropy floor)
    assert (ref_v < climo_ce - 0.1).all(), ref_v
    assert (ours_v < climo_ce - 0.1).all(), ours_v
    # distribution agreement: mean of six cells within ~3x the measured
    # gap (0.0179); a lr/loss/init regression moves this by >> 0.05
    assert abs(ours_v.mean() - ref_v.mean()) < 0.05, \
        (ours_v.mean(), ref_v.mean())
    # and no single (fold, seed) cell drifts far (measured max 0.0361)
    assert np.abs(ours_v - ref_v).max() < 0.08, np.abs(ours_v - ref_v)

    # test-RPSS agreement (metric itself golden-tested in test_metrics)
    assert (ref_r > 0.12).all() and (ours_r > 0.12).all(), (ref_r, ours_r)
    assert abs(ours_r.mean() - ref_r.mean()) < 0.06, \
        (ours_r.mean(), ref_r.mean())
    assert np.abs(ours_r - ref_r).max() < 0.11, np.abs(ours_r - ref_r)

    # winner-IDENTITY parity (VERDICT r3 item 7): which trial wins each
    # (seed, fold) cell — the one selection-semantics regression the
    # val-loss/RPSS bands could miss (e.g. a flipped improvement
    # comparison keeps losses in-band but inverts winners). Measured
    # 2026-08-19 (this host, printed tables above): agreement 4/6; the
    # reference's OWN winners flip across its seeds in close cells
    # (ref_w [[0,1,0],[1,0,0]]), and both disagreeing cells had the two
    # lrs' val losses within 0.018 on at least one side — per-cell
    # identity is SGD-path noise where the gap is small. Bands, all
    # satisfied by the measurement with headroom:
    # (a) DECISIVE cells — both sides' trial gap > 0.03 (~2x the
    #     measured cross-side drift) — must agree on the winner;
    # (b) agreement rate >= 3/6 (measured 4/6);
    # (c) marginal winner counts within 2 of 6 (measured 4 vs 4; an
    #     inverted comparison flips every decisive cell and fails (a)).
    gap_ref = np.abs(ref_vt[..., 0] - ref_vt[..., 1])
    gap_ours = np.abs(ours_vt[..., 0] - ours_vt[..., 1])
    decisive = (gap_ref > 0.03) & (gap_ours > 0.03)
    assert (ref_w[decisive] == ours_w[decisive]).all(), \
        (ref_w.tolist(), ours_w.tolist(), gap_ref.tolist(),
         gap_ours.tolist())
    assert int((ref_w == ours_w).sum()) >= 3, \
        (ref_w.tolist(), ours_w.tolist())
    marg_diff = abs(int((ref_w == 0).sum()) - int((ours_w == 0).sum()))
    assert marg_diff <= 2, (ref_w.tolist(), ours_w.tolist())


@pytest.mark.slow
def test_reference_cnn_fixed_training_parity(ref_models):
    """CNN fixed-training parity: the reference's 'train' branch for its
    CNN (training.py:53-64,119-125 — compile Adam+CE, fit with
    ModelCheckpoint best-val only, no EarlyStopping) vs run_fixed_training
    (early_exit=False) on identical data/labels/splits, 3 folds.

    The reference CNN is built with output_channels=3 here: its DEFAULT
    is 1 (deep_nn_models.py:188), and training.py:62 doesn't override it,
    so the reference's own CNN branch crashes in Keras 3 on the (H, W, 3)
    one-hot targets (verified in this image) — 3 channels is the only
    usable intent, and what our models/cnn.py defaults to (documented
    there). Bands pinned from a measured run (2026-08-18, this host):
    ref vloss [0.9323, 0.9347, 0.9349] vs ours [0.9425, 0.9388, 0.9344]
    (|Δmean| 0.0046, per-fold max 0.0102); fold-mean RPSS [0.2089,
    0.1995, 0.1900] vs [0.1892, 0.2000, 0.1968] (|Δmean| 0.0042,
    per-fold max 0.0197). Bands are ~3-6x those gaps."""
    from s2s_ismr_tpu.models import CNN
    from s2s_ismr_tpu.train.sweep import run_fixed_training

    F, epochs = 3, 30
    b, fm, lab_f, y_oh, x, rpss_mean = _parity_data(F)
    hw = x.shape[1:3]

    ref_v = np.zeros(F)
    ref_r = np.zeros(F)
    for f in range(F):
        tr, va, te = fm.train[f], fm.val[f], fm.test[f]
        keras.utils.set_random_seed(42)
        km = ref_models.CNN(input_shape=(hw[0], hw[1], 1),
                            output_channels=3)
        km.compile(optimizer=keras.optimizers.Adam(learning_rate=1e-3),
                   loss="categorical_crossentropy")
        hist = km.fit(x=x[tr], y=y_oh[f][tr],
                      validation_data=(x[va], y_oh[f][va]), epochs=epochs,
                      batch_size=16, shuffle=True, verbose=0)
        ref_v[f] = float(min(hist.history["val_loss"]))
        ref_r[f] = rpss_mean(km.predict(x, verbose=0), lab_f[f], te)

    vl, preds, _ = run_fixed_training(CNN(), x, y_oh, fm.train, fm.val,
                                      lr=1e-3, batch_size=16, epochs=epochs,
                                      early_exit=False)
    ours_r = np.array([rpss_mean(preds[f], lab_f[f], fm.test[f])
                       for f in range(F)])

    climo_ce = np.log(3.0)
    assert (ref_v < climo_ce - 0.1).all(), ref_v
    assert (vl < climo_ce - 0.1).all(), vl
    assert abs(vl.mean() - ref_v.mean()) < 0.03, (vl.mean(), ref_v.mean())
    assert np.abs(vl - ref_v).max() < 0.06, np.abs(vl - ref_v)
    assert (ref_r > 0.12).all() and (ours_r > 0.12).all(), (ref_r, ours_r)
    assert abs(ours_r.mean() - ref_r.mean()) < 0.03, \
        (ours_r.mean(), ref_r.mean())
    assert np.abs(ours_r - ref_r).max() < 0.06, np.abs(ours_r - ref_r)
