"""TPU drive of the fused 3-D sandwich PCG (ops/mxu3d.py) vs the einsum path.

Usage: python results/repro/mxu3d_drive.py [nx nz B maxiter]
Prints per-solve wall-clock for fused vs einsum whiten and the relative
deviation between the two solutions (same operator, different schedule).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops import make_spectrum, whiten
from hipgp_tpu.ops import bttb
from hipgp_tpu.utils.jaxcache import enable_compilation_cache
from hipgp_tpu.utils.timing import chain_time

enable_compilation_cache()

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 32
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
maxiter = int(sys.argv[4]) if len(sys.argv) > 4 else 20

print(f"backend={jax.default_backend()} nx={nx} nz={nz} B={B} maxiter={maxiter}")
ell = 0.1
grids = [jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) for n in (nx, nx, nz)]
kf = lambda a, b: jnp.exp(
    -0.5 * jnp.sum(((a[:, None, :] - b[None, :, :]) / ell) ** 2, -1))
spec = make_spectrum(grids, kf, jitter=1e-3)
print("dims", spec.dims, "edims", spec.edims, "M", spec.M)

b = jnp.asarray(np.random.default_rng(0).standard_normal((B, spec.M)),
                jnp.float32)


def run(use_fused):
    bttb.USE_MXU3D_PCG = use_fused
    fn = jax.jit(lambda v: whiten(spec, v, maxiter=maxiter, fixed_iters=True))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(b))
    print(f"  first call (compile) {time.perf_counter() - t0:.1f}s")
    dt, out = chain_time(fn, b)
    return dt, out


t_f, kn_f = run(True)
print(f"fused  whiten-{maxiter}: {t_f * 1e3:8.2f} ms  finite={bool(jnp.all(jnp.isfinite(kn_f)))}")
t_e, kn_e = run(False)
print(f"einsum whiten-{maxiter}: {t_e * 1e3:8.2f} ms")
rel = float(jnp.linalg.norm(kn_f - kn_e) / jnp.linalg.norm(kn_e))
print(f"speedup {t_e / t_f:.2f}x   rel dev fused vs einsum {rel:.2e}")
bttb.USE_MXU3D_PCG = True
