"""Test configuration: force JAX onto 8 virtual CPU devices so multi-chip
sharding (pjit over a Mesh) is exercised without TPU hardware, per the
multi-device test strategy SURVEY.md §4 calls for (the reference had none)."""

import os

# Tests run on CPU by default (override the session's platform, e.g. axon/TPU)
# so the 8-device virtual mesh works; set AVSR_TEST_TPU=1 to test on real TPU.
# NOTE: the axon PJRT plugin ignores the JAX_PLATFORMS env var, so the config
# knob is set programmatically before any jax import in test modules.
if not os.environ.get("AVSR_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
