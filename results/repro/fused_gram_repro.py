"""Minimal repro hunt: jit around the FULL gram-mean-solver batch_solve.

Usage: python fused_gram_repro.py <stage> <M_side> [N]
stages:
  full   - jit(model.batch_solve(..., mean_solver='gram', compute_elbo=True))
  nelbo  - same without the ELBO recompute pass
  accum  - only the scan that accumulates (lam, b, A, bm)
  solve  - accumulate eagerly, jit only the K+A PCG + RT + finalize
"""
import sys
import numpy as np

from hipgp_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP

stage = sys.argv[1]
mside = int(sys.argv[2])
N = int(sys.argv[3]) if len(sys.argv) > 3 else 32768
import os
KERN = os.environ.get("REPRO_KERNEL", "Mat32")
MAXIT = int(os.environ.get("REPRO_MAXITER", "20"))
ELL = float(os.environ.get("REPRO_ELL", "0.1"))

# matched to the originally-crashing 3droad protocol: Mat32, ell=0.1 on a
# [-2,2]^2 standardized domain, sig2=0.1, noise 0.15, bsz 1024, maxiter 20
from hipgp_tpu.kernels import Matern
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-2.0, 2.0, (N, 2)), jnp.float32)
y = jnp.asarray(rng.standard_normal(N), jnp.float32)
s = jnp.full((N,), 0.15, jnp.float32)

kern = SqExp() if KERN == "SqExp" else Matern(1.5)
model = HIPGP(kern, [jnp.linspace(-2., 2., mside, dtype=jnp.float32)] * 2,
              num_obs=N, family="mean-field", ell_init=ELL,
              sig2_init=0.1, noise2_init=0.15**2)
state = model.init_state()
print(f"stage={stage} M={model.M} Mp={model.Mprime} N={N}", flush=True)

if stage in ("full", "nelbo"):
    def f(st):
        return model.batch_solve(
            st, x, y, s, batch_size=1024, maxiter_cg=MAXIT,
            mean_solver="gram", compute_elbo=(stage == "full"),
        )
    out = jax.block_until_ready(jax.jit(f)(state))
    print("OK", flush=True)
elif stage == "eager":
    out = model.batch_solve(state, x, y, s, batch_size=1024, maxiter_cg=MAXIT,
                            mean_solver="gram", compute_elbo=True)
    jax.block_until_ready(out)
    print("OK", flush=True)
elif stage == "accum":
    # just the accumulation scan: spectrum + kn + lam/b/A/bm sums
    spec = model.spectrum(state)
    from hipgp_tpu.ops import whiten
    params = model.kernel_params(state)
    bsz = 1024
    nb = N // bsz
    xb = x.reshape(nb, bsz, 2); yb = y.reshape(nb, bsz); sb = s.reshape(nb, bsz)
    @jax.jit
    def accum(xb, yb, sb):
        def step(carry, inp):
            lam, b, A, bm = carry
            xl, yl, sl = inp
            ivar = 1.0 / (sl * sl)
            Knm = model.kernel(xl, model.xinduce, params)
            kn = whiten(spec, Knm, maxiter=MAXIT)
            lam = lam + jnp.sum(ivar[:, None] * kn * kn, 0)
            b = b + kn.T @ (ivar * yl)
            A = A + jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar)
            bm = bm + Knm.T @ (ivar * yl)
            return (lam, b, A, bm), None
        init = (jnp.zeros(model.Mprime), jnp.zeros(model.Mprime),
                jnp.zeros((model.M, model.M)), jnp.zeros(model.M))
        (lam, b, A, bm), _ = jax.lax.scan(step, init, (xb, yb, sb))
        return lam, b, A, bm
    out = jax.block_until_ready(accum(xb, yb, sb))
    print("OK", flush=True)
