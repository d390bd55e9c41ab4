"""On-chip probe of the fused cropped 2-D sandwich PCG (ops/mxu2d.py).

Measures, at the 3droad sweep shape (M = 128x128, batch 1024) and the
paper shape (M = 125x125, batch 256):
  * one fused apply vs the einsum-chain apply
  * whiten-20 (compute_kn core) through the new solver vs the old path
  * f32 accuracy vs the einsum chain (both at their shipped policies)
"""
import numpy as np

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp

from hipgp_tpu.kernels import Matern
from hipgp_tpu.ops import bttb, make_spectrum, matmul_by_K, whiten
from hipgp_tpu.ops.bttb import _full_weights
from hipgp_tpu.ops.mxu2d import sandwich_apply, sandwich_apply_selfdot
from hipgp_tpu.utils.timing import chain_time

kern = Matern(1.5)
rng = np.random.default_rng(0)


def probe(m, B, maxiter=20):
    dims = (m, m)
    grids = [jnp.linspace(0.0, 1.0, m, dtype=jnp.float32)] * 2
    kfun = lambda a, b: kern(a, b, (0.1, 0.1))
    spec = jax.block_until_ready(
        jax.jit(lambda: make_spectrum(grids, kfun, jitter=1e-3))()
    )
    print(f"--- M={m}x{m} B={B} edims={spec.edims}")
    v = jnp.asarray(rng.standard_normal((B, spec.M)), jnp.float32)
    w = _full_weights(spec.eigs, spec.edims[-1])

    # einsum-chain apply
    t, want = chain_time(jax.jit(lambda v: matmul_by_K(spec, v)), v, reps=5)
    print(f"apply_einsum_ms   {t*1e3:8.2f}")

    # fused apply
    x3 = v.reshape((B,) + spec.dims)
    f = jax.jit(lambda x: sandwich_apply(x, w, spec.dims, spec.edims))
    t, got = chain_time(f, x3, reps=5)
    rel = float(jnp.max(jnp.abs(got.reshape(B, -1) - want))
                / jnp.max(jnp.abs(want)))
    print(f"apply_fused_ms    {t*1e3:8.2f}   rel_vs_einsum {rel:.2e}")

    # fused apply + selfdot
    fsd = jax.jit(
        lambda x: sandwich_apply_selfdot(x, w, spec.dims, spec.edims)[0]
    )
    t, _ = chain_time(fsd, x3, reps=5)
    print(f"apply_selfdot_ms  {t*1e3:8.2f}")

    # whiten-20 old path (einsum PCG)
    bttb.USE_MXU2D_PCG = False
    f_old = jax.jit(lambda v: whiten(spec, v, maxiter=maxiter, tol=0.0))
    t, kn_old = chain_time(f_old, v, reps=5)
    print(f"whiten{maxiter}_einsum_ms {t*1e3:8.2f}")

    # whiten-20 fused path
    bttb.USE_MXU2D_PCG = True
    f_new = jax.jit(lambda v: whiten(spec, v, maxiter=maxiter, tol=0.0))
    t, kn_new = chain_time(f_new, v, reps=5)
    rel = float(jnp.max(jnp.abs(kn_new - kn_old)) / jnp.max(jnp.abs(kn_old)))
    print(f"whiten{maxiter}_fused_ms  {t*1e3:8.2f}   rel_vs_einsum {rel:.2e}")


probe(128, 1024)
probe(125, 256)
