"""Pallas fused conv kernel: parity with the XLA conv path.

Off-TPU the kernel runs in Pallas interpreter mode (kernels/conv.py), so
these tests exercise the exact code path the TPU compiles, on tiny shapes
to keep the interpreter fast.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from s2s_ismr_tpu.kernels import conv3x3_bias_act, fused_conv_supported
from s2s_ismr_tpu.models import UNet, UNetConfig


def _ref_conv(x, w, b, act):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    return jax.nn.elu(y) if act == "elu" else y


@pytest.mark.parametrize("act", ["elu", "none"])
def test_forward_matches_xla(rng, act):
    x = jnp.asarray(rng.normal(size=(3, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 5)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(5,)).astype(np.float32) * 0.1)
    out = conv3x3_bias_act(x, w, b, act)
    np.testing.assert_allclose(out, _ref_conv(x, w, b, act),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))

    g1 = jax.grad(lambda *a: jnp.sum(conv3x3_bias_act(*a, "elu") * g),
                  argnums=(0, 1, 2))(x, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(_ref_conv(*a, "elu") * g),
                  argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(a, e, rtol=1e-4, atol=1e-5)


def test_vmap_lane_axis(rng):
    """The sweep vmaps lanes over params; the kernel must batch."""
    x = jnp.asarray(rng.normal(size=(2, 2, 8, 8, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(2, 3, 3, 2, 3)).astype(np.float32))
    b = jnp.zeros((2, 3), jnp.float32)
    out = jax.vmap(lambda x, w, b: conv3x3_bias_act(x, w, b, "elu"))(x, w, b)
    exp = jax.vmap(lambda x, w, b: _ref_conv(x, w, b, "elu"))(x, w, b)
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-5)


def test_supported_gate():
    assert fused_conv_supported(32, 32, 1, 8)
    assert fused_conv_supported(8, 8, 16, 32)
    assert not fused_conv_supported(4, 4, 32, 64)     # tiny W -> XLA path
    assert not fused_conv_supported(8, 12, 8, 8)      # W not sublane-aligned


def test_unet_backend_parity(rng):
    """Same params, both backends, same output — checkpoints interchange."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    m_x = UNet(UNetConfig(filters=1, n_blocks=2, conv_backend="xla"))
    m_p = UNet(UNetConfig(filters=1, n_blocks=2, conv_backend="pallas"))
    variables = m_x.init(jax.random.key(0), x, train=False)
    out_x = m_x.apply(variables, x, train=False)
    out_p = m_p.apply(variables, x, train=False)
    np.testing.assert_allclose(out_p, out_x, rtol=1e-5, atol=1e-6)
