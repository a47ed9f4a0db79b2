"""Test harness: force an 8-device virtual CPU mesh before jax imports.

The reference has no tests at all (SURVEY.md section 4); this suite is the
framework's own strategy: golden tests for labeling/metrics against numpy/
pandas re-derivations, Keras-parity goldens against TF (available in the
image), determinism tests for fold splits, and mesh/sharding exercises on
a virtual multi-device CPU backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# keep TF (used for golden tests) quiet and off any accelerator
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import jax  # noqa: E402

# In this image the 'axon' TPU plugin ignores the JAX_PLATFORMS env var;
# only the config flag reliably forces the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
