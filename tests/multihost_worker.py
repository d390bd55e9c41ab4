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

if multihost.on_coordinator():
    # fully-addressable process-0 copy for the oracle comparison
    t1 = np.asarray(jax.device_get(new.theta1))
    t2 = np.asarray(jax.device_get(new.theta2))
    np.savez(os.path.join(outdir, "result.npz"), theta1=t1, theta2=t2,
             ndev=ndev, nprocs=jax.process_count())
print(f"proc {pid} OK ({ndev} global devices)", flush=True)
