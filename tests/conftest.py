"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax import.

Multi-chip sharding is validated on a faked 8-device CPU mesh (SURVEY.md §4
"Implication for the rebuild"); real-TPU behavior is exercised by bench.py and the
driver's dryrun_multichip.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU harness pins JAX_PLATFORMS in the interpreter environment, so the
# env var alone is not enough — override through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
