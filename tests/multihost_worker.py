"""Worker for tests/test_multihost.py: one of N processes in a real
jax.distributed CPU cluster.  Runs a cross-process psum barrier and a
multi-host data-parallel HIP-GP batch_solve on process-local data shards,
then (on the coordinator) writes results for the test to compare against
the single-process oracle.

Invoked as:
  python multihost_worker.py <coordinator> <num_procs> <pid> <outdir>
with JAX_PLATFORMS=cpu and xla_force_host_platform_device_count set by the
parent (each process contributes its own local CPU devices).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

coordinator, nprocs, pid, outdir = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from hipgp_tpu.parallel import multihost

multihost.initialize(coordinator, num_processes=nprocs, process_id=pid)

import numpy as np
import jax.numpy as jnp

assert jax.process_count() == nprocs, jax.process_count()
ndev = len(jax.devices())

# 1. cross-process psum barrier/agreement
total = multihost.sync_global(1.0)
assert total == float(ndev), (total, ndev)

# 2. multi-host DP batch_solve on process-local shards
from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models.hipgp import HIPGP
from hipgp_tpu.parallel.dp import dp_batch_solve

# N NOT divisible by nprocs: exercises the uneven-block padding contract
# (process_slice equal ceil-blocks + global_batch pad + row_weights mask)
N = 241
rng = np.random.default_rng(0)
x_all = rng.uniform(-1, 1, (N, 2))
y_all = np.sin(3 * x_all[:, 0]) * np.cos(2 * x_all[:, 1])
s_all = np.full(N, 0.1)

mesh = multihost.global_mesh(("dp",))
sl = multihost.process_slice(N)

grids = [jnp.linspace(-1.0, 1.0, 8, dtype=jnp.float64)] * 2
model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field", ell_init=0.3,
              noise2_init=0.01)
state = model.init_state()

xg = multihost.global_batch(mesh, x_all[sl], n_global=N)
yg = multihost.global_batch(mesh, y_all[sl], n_global=N)
sg = multihost.global_batch(mesh, s_all[sl], n_global=N, fill=1.0)
wg = multihost.global_row_weights(mesh, N)

new = dp_batch_solve(model, state, xg, yg, sg, mesh, maxiter_cg=50,
                     row_weights=wg)

# 3. multi-host MODEL-PARALLEL batch_solve: dp spans the two processes
# (collectives ride DCN), the whitened state shards over each process's
# local devices (grid axis on ICI).  Inputs are host-local replicated
# arrays — the internal jit/shard_map commits them to the global mesh.
from hipgp_tpu.parallel import mp_batch_solve

ndev_local = ndev // nprocs
mesh_mp = multihost.global_mesh(("dp", "grid"), shape=(nprocs, ndev_local))

grids9 = [jnp.linspace(-1.0, 1.0, 9, dtype=jnp.float64)] * 2
model_mp = HIPGP(SqExp(), grids9, num_obs=N, family="mean-field",
                 ell_init=0.3, noise2_init=0.01, grid_shards=ndev_local)
st_mp, mp_elbo = mp_batch_solve(
    model_mp, model_mp.init_state(),
    jnp.asarray(x_all), jnp.asarray(y_all), jnp.asarray(s_all), mesh_mp,
    batch_size=64, maxiter_cg=50, mean_solver_maxiter=300,
    mean_solver_tol=1e-12, compute_elbo=True,
)

from jax.experimental import multihost_utils

# collective gather (must run on every process); coordinator persists
t1_mp = np.asarray(multihost_utils.process_allgather(st_mp.theta1,
                                                     tiled=True))
t2_mp = np.asarray(multihost_utils.process_allgather(st_mp.theta2,
                                                     tiled=True))

if multihost.on_coordinator():
    # fully-addressable process-0 copy for the oracle comparison
    t1 = np.asarray(jax.device_get(new.theta1))
    t2 = np.asarray(jax.device_get(new.theta2))
    np.savez(os.path.join(outdir, "result.npz"), theta1=t1, theta2=t2,
             ndev=ndev, nprocs=jax.process_count(),
             mp_theta1=t1_mp, mp_theta2=t2_mp, mp_elbo=float(mp_elbo))
print(f"proc {pid} OK ({ndev} global devices)", flush=True)
