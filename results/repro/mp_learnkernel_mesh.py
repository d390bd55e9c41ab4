"""Hyperparameter learning through the grid-sharded whitening on a mesh
(RESULTS sec. 7 / verdict item: learn-kernel on the 8-device mesh).

mp_svigp_fit with learn_kernel: natgrad on (theta1, theta2) + Adam on
(log_sig2, log_ell), hyper gradients flowing through the SHARDED whitening
solve (implicit diff through `local_whiten_diff` + the all_to_all
transform) — each device holds only its 1/n_grid shard of the whitened
state and the kn stack.

Run (CPU, 8 virtual devices): python results/repro/mp_learnkernel_mesh.py
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hipgp_tpu.experiments.synthetic_data import make_two_dim_data
from hipgp_tpu.infer import FitConfig
from hipgp_tpu.kernels import Matern
from hipgp_tpu.models import HIPGP
from hipgp_tpu.parallel import mp_predict, mp_svigp_fit

NG = 4           # grid shards
DP = 2           # data shards
GRID_N = 64      # 64^2 inducing -> M' = 128^2 = 16,384; 4,096 per shard
N = 8000

data = make_two_dim_data(Nobs=N, Ntest=1000, noise_std=0.1,
                         function_complexity="medium", seed=42)
x, y = jnp.asarray(data["xobs"], jnp.float32), jnp.asarray(data["yobs"], jnp.float32)
s = jnp.full((N,), 0.1, jnp.float32)

model = HIPGP(Matern(2.5), [jnp.linspace(0.0, 1.0, GRID_N)] * 2,
              num_obs=N, family="mean-field", ell_init=0.08,
              sig2_init=0.5, noise2_init=0.01, learn_kernel=True,
              grid_shards=NG, dtype=jnp.float32)
state = model.init_state()
mesh = Mesh(np.array(jax.devices()).reshape(DP, NG), ("dp", "grid"))
print(f"mesh {dict(mesh.shape)}  M={model.M} M'={model.Mprime} "
      f"(per-shard {model.Mprime // NG})", flush=True)

cfg = FitConfig(epochs=8, batch_size=500, lr=5e-3, maxiter_cg=20,
                learn_kernel=True, kernel_lr=2e-2)
t0 = time.time()
st, rep = mp_svigp_fit(model, state, x, y, s, cfg, mesh, verbose=True,
                       theta2_warmstart=True, natgrad_safe_lr="clamp")
wall = time.time() - t0

xt = jnp.asarray(data["xtest"], jnp.float32)
ft = np.asarray(data["ftest"]).reshape(-1)
mu, _ = mp_predict(model, st, xt, mesh, maxiter_cg=50)
rmse = float(np.sqrt(np.mean((np.asarray(mu) - ft) ** 2)))
print(f"wall {wall:.1f}s  epochs {cfg.epochs}  "
      f"elbos {[round(e, 4) for e in rep['epoch_elbos']]}")
print(f"learned: sig2 {float(jnp.exp(st.log_sig2)):.4f} "
      f"(init 0.5)  ell {float(jnp.exp(st.log_ell)):.4f} (init 0.08)")
print(f"post-RMSE {rmse:.4f} vs noise 0.1")
