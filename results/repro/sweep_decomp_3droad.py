"""Decompose the one-sweep gram solver's per-batch cost at 3droad scale.

Chained steady-state timings (utils/timing.chain_time) of the pieces of
`HIPGP._gram_stage_fns.sweep`'s scan body at the 3droad protocol shape
(M = 128x128, M' = 65,536, batch 1024, Mat32, maxiter_cg = 20):

  * compute_kn  — the truncated-PCG whitening (42 circulant applies)
  * one circulant apply (matmul_by_K) at the same shape
  * the HIGHEST A-Gram einsum (bi,bj,b->ij at 1024 x 16384)
  * the same einsum at HIGH (candidate cost cut, accuracy measured below)
  * make_grams' Knm kernel evaluation

Run foreground on the real chip: `python results/repro/sweep_decomp_3droad.py`.
"""
import numpy as np

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from hipgp_tpu.kernels import Matern
from hipgp_tpu.models import HIPGP
from hipgp_tpu.ops import make_spectrum, matmul_by_K
from hipgp_tpu.utils.timing import chain_time

M1 = 128
B = 1024
MAXITER = 20
dtype = jnp.float32

kern = Matern(1.5)
grids = [jnp.linspace(0.0, 1.0, M1, dtype=dtype)] * 2
model = HIPGP(kern, grids, num_obs=278_000, family="mean-field",
              ell_init=0.1, sig2_init=0.1, noise2_init=0.0225, dtype=dtype)
state = model.init_state()

rng = np.random.default_rng(0)
xb = jnp.asarray(rng.uniform(0.0, 1.0, (B, 2)), dtype)

kfun = lambda a, b: kern(a, b, (0.1, 0.1))
spec = jax.jit(lambda: make_spectrum(grids, kfun, jitter=model.jitter))()
spec = jax.block_until_ready(spec)
print("spec dims", spec.dims, "edims", spec.edims, "M", spec.M,
      "Mprime", model.Mprime)

# --- Knm kernel evaluation -------------------------------------------------
knm_fn = jax.jit(lambda x: model.make_grams(state, x, False, "analytic", 10,
                                            None)[0])
t, Knm = chain_time(knm_fn, xb, reps=5, warmup=3)
print(f"knm_eval_ms          {t*1e3:8.2f}")

# --- one circulant apply at the sweep shape --------------------------------
v = jnp.asarray(rng.standard_normal((B, spec.M)), dtype)
apply_fn = jax.jit(lambda v: matmul_by_K(spec, v))
t, _ = chain_time(apply_fn, v, reps=5, warmup=3)
print(f"apply_ms             {t*1e3:8.2f}")

# --- compute_kn: the 20-iteration whitening (42 applies + skeleton) --------
kn_fn = jax.jit(lambda Knm: model.compute_kn(state, Knm, maxiter_cg=MAXITER,
                                             spec=spec))
t, kn = chain_time(kn_fn, Knm, reps=5, warmup=3)
print(f"compute_kn_ms        {t*1e3:8.2f}   (42 applies -> skeleton = "
      f"{t*1e3 - 42 * 0:.1f} incl.)")

# --- the A-Gram einsum, HIGHEST vs HIGH ------------------------------------
ivar = jnp.asarray(rng.uniform(10.0, 30.0, (B,)), dtype)


def a_update(Knm, prec):
    return jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar, precision=prec)


for name, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                   ("HIGH", jax.lax.Precision.HIGH)):
    fn = jax.jit(lambda Knm, p=prec: a_update(Knm, p))
    t, A = chain_time(fn, Knm, reps=5, warmup=3)
    print(f"a_einsum_{name:8s}   {t*1e3:8.2f}")

# accuracy of HIGH vs HIGHEST A (f64 oracle impossible on-chip; HIGHEST is
# the shipped truth)
A_hi = jax.jit(lambda K: a_update(K, jax.lax.Precision.HIGHEST))(Knm)
A_h = jax.jit(lambda K: a_update(K, jax.lax.Precision.HIGH))(Knm)
rel = float(jnp.max(jnp.abs(A_h - A_hi)) / jnp.max(jnp.abs(A_hi)))
print(f"a_high_vs_highest_rel {rel:.3e}")

# --- bm einsum ---------------------------------------------------------------
yb = jnp.asarray(rng.standard_normal(B), dtype)
bm_fn = jax.jit(lambda Knm: jnp.einsum("bi,b->i", Knm, ivar * yb,
                                       precision=jax.lax.Precision.HIGHEST))
t, _ = chain_time(bm_fn, Knm, reps=5, warmup=3)
print(f"bm_einsum_ms         {t*1e3:8.2f}")

# --- lambda + scalars (cheap, but confirm) ----------------------------------
lam_fn = jax.jit(lambda kn: model.get_lam(ivar, kn, bscale=1.0,
                                          add_identity=False))
t, _ = chain_time(lam_fn, kn, reps=5, warmup=3)
print(f"get_lam_ms           {t*1e3:8.2f}")
