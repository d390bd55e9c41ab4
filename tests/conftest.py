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


# ---------------------------------------------------------------------------
# Fast lane: `pytest -m 'not slow'` is the inner-loop suite (< ~5 min on the
# 1-CPU box); the full suite (~16 min) is the pre-commit / CI lane.  Modules
# listed here are wholly slow (live-torch-reference parity, the 2-process
# cluster test, 8-device sharded FFT / mp training, end-to-end experiment
# drivers); SLOW_TESTS adds the individually expensive tests of mixed
# modules (>= ~6 s measured, `pytest --durations=40`).
# ---------------------------------------------------------------------------
SLOW_MODULES = {
    "test_multihost",
    "test_mp_train",
    "test_mp",
    "test_fft_sharded",
    "test_natgrad_trajectory",
    "test_reference_parity",
    "test_derivative_parity",
    "test_svgp_derivative",
    "test_experiments",
    "test_fit_guards",
    "test_mxu3d",
    "test_paper_artifacts",
}
SLOW_TESTS = {
    "test_batch_predict_matches_direct",
    "test_theta2_warmstart_removes_transient",
    "test_inv_matmul_grad_rhs",
    "test_gram_solve_is_whiten_alias",
    "test_inv_matmul_grad_hyperparams_fd",
    "test_factored_inconsistency_fallback_f32",
    "test_hyper_grads_match_fd",
    "test_integrated_obs_pipeline",
    "test_fft_path_hyperparam_gradcheck",
    "test_matmul_spectrum_hyperparam_gradcheck",
    "test_sandwich_gradients_match_einsum_operator",
    "test_planes_solver_matches_standard_pcg",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES or item.originalname in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
