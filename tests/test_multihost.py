"""Multi-host (multi-process) path: a REAL 2-process jax.distributed CPU
cluster (4 devices each, 8 global), exercising initialize / global_mesh /
process-local global_batch / cross-process psum / dp_batch_solve AND the
dp x grid model-parallel mp_batch_solve (dp spanning the processes, grid
sharding each process's local devices), compared against the
single-process solvers.

The reference has no distributed story at all (`ziggy/svi_gp.py:182-184`
is single-device); this pins the TPU-native multi-host addition end to end.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def cluster_result(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "tests", "multihost_worker.py"),
             f"127.0.0.1:{port}", "2", str(pid), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-3000:]}"
    return np.load(os.path.join(outdir, "result.npz"))


def test_cluster_spans_processes(cluster_result):
    assert int(cluster_result["nprocs"]) == 2
    assert int(cluster_result["ndev"]) == 8


def test_multihost_dp_batch_solve_matches_single_process(cluster_result):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models.hipgp import HIPGP

    # matches the worker's N: NOT divisible by the 2 processes, so the
    # worker's global arrays carry one pad row masked by row_weights
    N = 241
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N, 2))
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
    s = np.full(N, 0.1)
    grids = [jnp.linspace(-1.0, 1.0, 8, dtype=jnp.float64)] * 2
    model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                  ell_init=0.3, noise2_init=0.01)
    new = model.batch_solve(
        model.init_state(), jnp.asarray(x), jnp.asarray(y), jnp.asarray(s),
        batch_size=-1, maxiter_cg=50,
    )
    np.testing.assert_allclose(
        cluster_result["theta1"], np.asarray(new.theta1), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        cluster_result["theta2"], np.asarray(new.theta2), rtol=1e-8, atol=1e-10
    )


def test_multihost_mp_batch_solve_matches_single_process(cluster_result):
    """dp x grid across processes: the worker's model-parallel solve (dp
    spanning the two processes, the whitened state sharded over each
    process's 4 local devices) must match the single-process solver."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from hipgp_tpu.kernels import SqExp
    from hipgp_tpu.models.hipgp import HIPGP

    N = 241
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (N, 2))
    y = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, 1])
    s = np.full(N, 0.1)
    grids = [jnp.linspace(-1.0, 1.0, 9, dtype=jnp.float64)] * 2
    model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                  ell_init=0.3, noise2_init=0.01, grid_shards=4)
    ref, ref_elbo = model.batch_solve(
        model.init_state(), jnp.asarray(x), jnp.asarray(y), jnp.asarray(s),
        batch_size=64, maxiter_cg=50, compute_elbo=True,
        mean_solver="cg", mean_solver_maxiter=300, mean_solver_tol=1e-12,
    )
    np.testing.assert_allclose(
        cluster_result["mp_theta1"], np.asarray(ref.theta1),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        cluster_result["mp_theta2"], np.asarray(ref.theta2),
        rtol=1e-7, atol=1e-9,
    )
    np.testing.assert_allclose(
        float(cluster_result["mp_elbo"]), float(ref_elbo), rtol=1e-6
    )
