"""Test harness configuration.

Tests run JAX on CPU with 8 virtual devices so the same shard_map /
collective code paths exercised on a TPU pod slice run here (SURVEY §4).
Must be set before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from intfftk_tpu.config import FFTConfig  # noqa: E402
from intfftk_tpu.golden.stimulus import chirp_stimulus, random_stimulus  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)


def make_cfg(**kw) -> FFTConfig:
    return FFTConfig(**kw)


MODES = [("unscaled", "truncate"), ("scaled", "truncate"), ("scaled", "round")]
