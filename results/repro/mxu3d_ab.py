"""On-chip A/B of mxu3d wp-kernel variants: merged-middle x samples-per-block.

Usage: python results/repro/mxu3d_ab.py [nx nz B maxiter]
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.ops import make_spectrum, whiten
from hipgp_tpu.ops import mxu2d
from hipgp_tpu.ops.mxu2d import _get_sandwich_wp
from hipgp_tpu.utils.jaxcache import enable_compilation_cache
from hipgp_tpu.utils.timing import chain_time

enable_compilation_cache()

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 32
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
maxiter = int(sys.argv[4]) if len(sys.argv) > 4 else 20

ell = 0.1
grids = [jnp.linspace(0.0, 1.0, n, dtype=jnp.float32) for n in (nx, nx, nz)]
kf = lambda a, b: jnp.exp(
    -0.5 * jnp.sum(((a[:, None, :] - b[None, :, :]) / ell) ** 2, -1))
spec = make_spectrum(grids, kf, jitter=1e-3)
print(f"backend={jax.default_backend()} dims={spec.dims} edims={spec.edims} "
      f"B={B} maxiter={maxiter}")

b = jnp.asarray(np.random.default_rng(0).standard_normal((B, spec.M)),
                jnp.float32)

_orig = (mxu2d.WP_MERGED_MIDDLE, mxu2d.WP_SAMPLES_PER_BLOCK)
ref = None
for merged in (False, True):
    for S in (8, 16, 32):
        mxu2d.WP_MERGED_MIDDLE = merged
        mxu2d.WP_SAMPLES_PER_BLOCK = S
        _get_sandwich_wp.cache_clear()
        fn = jax.jit(lambda v: whiten(spec, v, maxiter=maxiter,
                                      fixed_iters=True))
        try:
            dt, out = chain_time(fn, b)
        except Exception as e:  # noqa: BLE001 — report per-variant failures
            print(f"merged={merged} S={S:3d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        if ref is None:
            ref = out
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        print(f"merged={merged} S={S:3d}: {dt * 1e3:8.2f} ms  rel={rel:.1e}")

mxu2d.WP_MERGED_MIDDLE, mxu2d.WP_SAMPLES_PER_BLOCK = _orig
