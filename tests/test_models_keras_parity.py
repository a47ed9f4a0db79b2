"""Golden parity tests: flax models vs Keras with identical weights.

The reference's skill numbers come from Keras defaults (glorot-uniform,
SAME padding, gradient-of-conv transpose, BN momentum 0.99 / eps 1e-3).
These tests inject OUR initialized weights into Keras replicas of the
reference topology (deep_nn_models.py:73-163) and require forward-pass
agreement to float32 tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
from tensorflow import keras  # noqa: E402

from s2s_ismr_tpu.models import UNet, UNetConfig  # noqa: E402
from s2s_ismr_tpu.models.layers import BatchNorm, Conv2DTranspose  # noqa: E402


@pytest.fixture(autouse=True)
def _tf_cpu():
    tf.config.set_visible_devices([], "GPU")


def test_conv_transpose_matches_keras():
    rng = np.random.default_rng(0)
    for ksize in [(2, 2), (3, 3), (5, 5)]:
        x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
        model = Conv2DTranspose(features=6, kernel_size=ksize, strides=(2, 2))
        variables = model.init(jax.random.key(0), jnp.asarray(x))
        y = np.asarray(model.apply(variables, jnp.asarray(x)))

        klayer = keras.layers.Conv2DTranspose(6, ksize, strides=(2, 2),
                                              padding="same")
        klayer.build((None, 8, 8, 4))
        kern = np.asarray(variables["params"]["kernel"])  # (kh,kw,out,in)
        bias = np.asarray(variables["params"]["bias"])
        klayer.set_weights([kern, bias])
        yk = klayer(x).numpy()
        assert y.shape == yk.shape == (2, 16, 16, 6), ksize
        np.testing.assert_allclose(y, yk, atol=1e-5, err_msg=str(ksize))


def test_batchnorm_matches_keras_train_and_infer():
    rng = np.random.default_rng(1)
    x1 = rng.normal(2.0, 3.0, size=(8, 6, 6, 5)).astype(np.float32)
    x2 = rng.normal(-1.0, 0.5, size=(8, 6, 6, 5)).astype(np.float32)

    bn = BatchNorm()
    variables = bn.init(jax.random.key(0), jnp.asarray(x1), train=False)

    kbn = keras.layers.BatchNormalization()  # defaults: momentum .99 eps 1e-3
    kbn.build((None, 6, 6, 5))

    state = variables
    for x in (x1, x2):
        y, mut = bn.apply(state, jnp.asarray(x), train=True,
                          mutable=["batch_stats"])
        state = {"params": state["params"], "batch_stats": mut["batch_stats"]}
        yk = kbn(x, training=True).numpy()
        np.testing.assert_allclose(np.asarray(y), yk, atol=1e-4)

    # running averages must agree, and inference outputs too
    np.testing.assert_allclose(np.asarray(state["batch_stats"]["mean"]),
                               kbn.moving_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["batch_stats"]["var"]),
                               kbn.moving_variance.numpy(), atol=1e-5)
    y_inf = bn.apply(state, jnp.asarray(x1), train=False)
    yk_inf = kbn(x1, training=False).numpy()
    np.testing.assert_allclose(np.asarray(y_inf), yk_inf, atol=1e-4)


def test_batchnorm_sample_weights_ignore_padding():
    rng = np.random.default_rng(2)
    real = rng.normal(size=(6, 4, 4, 3)).astype(np.float32)
    padded = np.concatenate([real, np.zeros((4, 4, 4, 3), np.float32)])
    w = np.array([1.0] * 6 + [0.0] * 4, np.float32)

    bn = BatchNorm()
    v = bn.init(jax.random.key(0), jnp.asarray(real), train=False)
    y_real, m1 = bn.apply(v, jnp.asarray(real), train=True,
                          mutable=["batch_stats"])
    y_pad, m2 = bn.apply(v, jnp.asarray(padded), train=True,
                         sample_weight=jnp.asarray(w), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y_pad)[:6], np.asarray(y_real),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m1["batch_stats"]["mean"]),
                               np.asarray(m2["batch_stats"]["mean"]), atol=1e-6)


def _keras_unet(cfg: UNetConfig, hw):
    """Keras replica of the reference U-Net topology for parity checking."""
    inp = keras.Input(shape=(hw[0], hw[1], 1))
    h = inp
    skips = []
    for k in range(1, cfg.n_blocks + 1):
        w = cfg.block_width(k)
        h = keras.layers.Conv2D(w, 3, activation="elu", padding="same",
                                name=f"down{k}_conv1")(h)
        h = keras.layers.Conv2D(w, 3, activation="elu", padding="same",
                                name=f"down{k}_conv2")(h)
        h = keras.layers.BatchNormalization(name=f"down{k}_bn")(h)
        skips.append(h)
        h = keras.layers.AveragePooling2D(2)(h)
    wb = cfg.filters * 4 * 2 ** cfg.n_blocks
    h = keras.layers.Conv2D(wb, 3, activation="elu", padding="same",
                            name="bottleneck_conv1")(h)
    h = keras.layers.Conv2D(wb, 3, activation="elu", padding="same",
                            name="bottleneck_conv2")(h)
    h = keras.layers.BatchNormalization(name="bottleneck_bn")(h)
    for k in range(cfg.n_blocks, 0, -1):
        w = cfg.block_width(k)
        h = keras.layers.Conv2DTranspose(w, cfg.ct_kernel, strides=cfg.ct_stride,
                                         padding="same", name=f"up{k}_convT")(h)
        h = keras.layers.Concatenate()([skips[k - 1], h])
        h = keras.layers.Conv2D(w, 3, activation="elu", padding="same",
                                name=f"up{k}_conv1")(h)
        h = keras.layers.Conv2D(w, 3, activation="elu", padding="same",
                                name=f"up{k}_conv2")(h)
        if k > 1:
            h = keras.layers.BatchNormalization(name=f"up{k}_bn")(h)
    out = keras.layers.Conv2D(3, 1, activation="softmax", name="head")(h)
    return keras.Model(inp, out)


@pytest.mark.parametrize("cfg", [
    UNetConfig(filters=2, n_blocks=3, ct_kernel=(3, 3)),
    UNetConfig(filters=3, n_blocks=2, ct_kernel=(2, 2)),
])
def test_unet_forward_matches_keras(cfg):
    hw = (16, 16)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, *hw, 1)).astype(np.float32)

    model = UNet(cfg)
    variables = model.init(jax.random.key(0), jnp.asarray(x), train=False)
    y = np.asarray(model.apply(variables, jnp.asarray(x), train=False))

    km = _keras_unet(cfg, hw)
    params = variables["params"]
    for name, p in params.items():
        klayer = km.get_layer(name)
        if "convT" in name:
            klayer.set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
        elif "bn" in name:
            stats = variables["batch_stats"][name]
            klayer.set_weights([np.asarray(p["scale"]), np.asarray(p["bias"]),
                                np.asarray(stats["mean"]), np.asarray(stats["var"])])
        else:
            klayer.set_weights([np.asarray(p["conv"]["kernel"]),
                                np.asarray(p["conv"]["bias"])])
    yk = km(x, training=False).numpy()
    assert y.shape == yk.shape == (4, *hw, 3)
    np.testing.assert_allclose(y, yk, atol=2e-5)
    # probabilities sum to 1
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)


def test_unet_divisibility_guard():
    from s2s_ismr_tpu.models.unet import check_input
    with pytest.raises(ValueError):
        check_input(UNetConfig(n_blocks=3), 23, 24)
    check_input(UNetConfig(n_blocks=3), 24, 24)


def test_cnn_and_mlp_shapes():
    from s2s_ismr_tpu.models import CNN, MLP
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 1)).astype(np.float32)
    cnn = CNN()
    v = cnn.init(jax.random.key(0), jnp.asarray(x))
    y = np.asarray(cnn.apply(v, jnp.asarray(x)))
    assert y.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-5)

    mlp = MLP(spatial_shape=(16, 16))
    v = mlp.init(jax.random.key(0), jnp.asarray(x[..., 0]), train=False)
    y = np.asarray(mlp.apply(v, jnp.asarray(x[..., 0]), train=False))
    assert y.shape == (2, 16, 16, 3)
    np.testing.assert_allclose(y.sum(-1), 1.0, atol=1e-4)


def test_bf16_compute_close_to_f32(rng):
    """compute_dtype='bfloat16' keeps f32 params and stays close to the
    f32 forward (mixed-precision path, PERF.md)."""
    import jax
    import jax.numpy as jnp
    from s2s_ismr_tpu.models import UNet, UNetConfig
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    m32 = UNet(UNetConfig(filters=2, n_blocks=2, compute_dtype="float32"))
    m16 = UNet(UNetConfig(filters=2, n_blocks=2, compute_dtype="bfloat16"))
    variables = m32.init(jax.random.key(0), x, train=False)
    leaves = jax.tree.leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    o32 = m32.apply(variables, x, train=False)
    o16 = m16.apply(variables, x, train=False)
    assert o16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(o16), np.asarray(o32), atol=0.03)
    np.testing.assert_allclose(np.asarray(o16).sum(-1), 1.0, atol=1e-3)
