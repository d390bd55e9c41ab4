"""Test configuration: run on CPU with 8 virtual devices (multi-chip sharding
tests without TPU hardware) and float64 enabled (dense oracles need the
precision headroom the reference got from torch.double).

Note: the environment's axon TPU plugin overrides the JAX_PLATFORMS env var,
so the platform is forced through jax.config before any array op runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the suite is compile-dominated
from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache(os.path.join(os.path.dirname(__file__), "..", ".jax_cache_tests"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
