"""Timing probe for the paper-scale dust-map run (RESULTS sec. 14).

Measures the per-stage costs at M = 64x64x32 = 131k with integrated
observations so the full run_domain protocol (N >= 100k) can be sized to
the TPU-foreground dispatch budget before launching it.

Run on TPU:  python results/repro/domain14_probe.py [nx nz bsz]
"""
import sys
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP
from hipgp_tpu.utils.timing import chain_time

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 32
bsz = int(sys.argv[3]) if len(sys.argv) > 3 else 512

print(f"devices={jax.devices()}  import+cache {time.time()-t0:.1f}s")

grids = [np.linspace(-1, 1, nx), np.linspace(-1, 1, nx),
         np.linspace(-0.5, 0.5, nz)]
t0 = time.time()
model = HIPGP(SqExp(), grids, num_obs=100_000, family="mean-field",
              ell_init=0.2, support_integrated_obs=True)
print(f"model build (incl. dblquad table) {time.time()-t0:.1f}s  "
      f"M={model.M} M'={model.Mprime} edims={model.edims}")

state = model.init_state()
t0 = time.time()
spec = jax.block_until_ready(model.spectrum(state))
print(f"spectrum build {time.time()-t0:.1f}s")

rs = np.random.RandomState(0)
x = jnp.asarray(rs.uniform(-0.9, 0.9, (bsz, 3)), jnp.float32)

# --- make_grams (analytic k_semi) ---
mg = jax.jit(lambda xb: model.make_grams(state, xb, True, "analytic"))
dt, (Knm, Knn) = chain_time(mg, x)
print(f"make_grams bsz={bsz}: {dt*1e3:.1f} ms   Knm {Knm.shape}")

# --- whiten-20 (compute_kn) ---
wh = jax.jit(lambda K: model.compute_kn(state, K, maxiter_cg=20, spec=spec))
t0 = time.time()
kn = jax.block_until_ready(wh(Knm))
print(f"whiten compile+first {time.time()-t0:.1f}s  kn {kn.shape}")
dt, _ = chain_time(wh, Knm)
print(f"whiten-20 bsz={bsz}: {dt*1e3:.1f} ms")

# --- one sweep batch via the matfree stage fns ---
cfg = (20, True, "analytic", 10, 100_000)
fns = model._matfree_stage_fns(cfg)
nbp = 4  # batches per probe dispatch
xp = jnp.asarray(rs.uniform(-0.9, 0.9, (nbp, bsz, 3)), jnp.float32)
yp = jnp.asarray(rs.standard_normal((nbp, bsz)), jnp.float32)
w = jnp.ones((nbp, bsz), jnp.float32)
keys = jax.random.split(jax.random.PRNGKey(0), nbp)
nsp = 0.1 * jnp.ones((nbp, bsz), jnp.float32)

zero = lambda: jnp.zeros((), jnp.float32)
lam0 = jax.tree.map(
    jnp.zeros_like,
    model.get_lam(jnp.zeros((1,), jnp.float32),
                  jnp.zeros((1, model.Mprime), jnp.float32),
                  add_identity=False))
carry0 = (lam0, jnp.zeros((model.M,), jnp.float32),
          zero(), zero(), zero(), zero())

def fresh_carry(nudge):
    # fresh (donated) carry per rep; the nudge changes the input data so
    # the tunnel cannot serve a cached dispatch
    return (jax.tree.map(lambda a: a + nudge, lam0),
            jnp.zeros((model.M,), jnp.float32) + nudge,
            zero(), zero(), zero(), zero())


t0 = time.time()
out = jax.block_until_ready(
    fns["sweep"](fresh_carry(0.0), state, spec, xp, yp, w, keys, nsp))
print(f"sweep[{nbp}] compile+first {time.time()-t0:.1f}s")
reps = 3
dts = []
for i in range(reps + 2):
    c = fresh_carry(1e-6 * (i + 1) * jnp.sum(out[1]) * 0)
    t0 = time.perf_counter()
    out = jax.block_until_ready(
        fns["sweep"](c, state, spec, xp, yp, w, keys, nsp))
    dts.append(time.perf_counter() - t0)
dt = min(dts[2:])
print(f"sweep per-batch (bsz={bsz}): {dt/nbp*1e3:.1f} ms   (reps {dts})")

# --- one a_mv chunk (mean-CG data matvec, no whiten) ---
v = jnp.asarray(rs.standard_normal(model.M), jnp.float32)
t0 = time.time()
acc = jax.block_until_ready(
    fns["a_mv"](jnp.zeros_like(v), state, xp, w, keys, nsp, v))
print(f"a_mv[{nbp}] compile+first {time.time()-t0:.1f}s")
dts = []
prev = acc
for i in range(5):
    vv = v + jnp.sum(prev) * 0
    t0 = time.perf_counter()
    prev = jax.block_until_ready(
        fns["a_mv"](jnp.zeros_like(vv), state, xp, w, keys, nsp, vv))
    dts.append(time.perf_counter() - t0)
print(f"a_mv per-batch (bsz={bsz}): {min(dts[2:])/nbp*1e3:.1f} ms   (reps {dts})")

# --- K matvec + Cinv (per mean-CG iteration fixed cost) ---
dt, _ = chain_time(lambda vv: fns["kv"](spec, vv), v, reps=3, warmup=2)
print(f"kv (K matvec, M): {dt*1e3:.1f} ms")

# --- natgrad step cost: elbo_and_grads on one batch ---
yb = jnp.asarray(rs.standard_normal(bsz), jnp.float32)
sb = 0.1 * jnp.ones((bsz,), jnp.float32)


def ng(xb):
    elbo, g = model.elbo_and_grads(
        state, xb, yb, sb, maxiter_cg=20, integrated_obs=True,
        semi_integrated_estimator="analytic")
    return elbo, g


ngj = jax.jit(ng)
t0 = time.time()
out = jax.block_until_ready(ngj(x))
print(f"natgrad elbo_and_grads compile+first {time.time()-t0:.1f}s")
dt, _ = chain_time(ngj, x, reps=3, warmup=2)
print(f"natgrad step (bsz={bsz}): {dt*1e3:.1f} ms")
