"""Test harness configuration.

Tests run JAX on CPU with 8 virtual devices so the same shard_map /
collective code paths exercised on a TPU pod slice run here (SURVEY §4).
Must be set before jax is imported anywhere.
"""

import os
import sys

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a remote
# TPU plugin (e.g. axon) whose tunnel can hang; the test suite is defined
# to run on the virtual 8-device CPU backend unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment may register an out-of-process TPU plugin whose platform
# wins default-device selection even under JAX_PLATFORMS=cpu; tests must
# compile/run locally on the virtual 8-device CPU backend, so pin it.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_mesh(shape, axis_names):
    """Mesh over the virtual CPU devices (explicitly, never the default
    backend — see pin above)."""
    devs = np.array(jax.devices("cpu")[: int(np.prod(shape))]).reshape(shape)
    return jax.sharding.Mesh(devs, axis_names)

from intfftk_tpu.config import FFTConfig  # noqa: E402
from intfftk_tpu.golden.stimulus import chirp_stimulus, random_stimulus  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def make_cfg(**kw) -> FFTConfig:
    return FFTConfig(**kw)


MODES = [("unscaled", "truncate"), ("scaled", "truncate"), ("scaled", "round")]
