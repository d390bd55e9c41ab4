"""Per-stage roofline decomposition of the fused 3-D whiten (RESULTS sec. 14).

The driver measures whiten-20 at M = 64x64x32, batch 64 at 97.6 ms fused vs
212.3 ms einsum (2.17x), while the 2-D analogue reaches 2.8x.  This probe
breaks the fused solve into its stages (all chained, steady state):

  outer2      the two outer-axis einsum contractions alone
  wp          the weight-plane-batched 2-D kernel alone (on the (B, L0,
              d1, d2) intermediate)
  apply       one full fused sandwich apply (outer + wp + outer)
  applyx20    20 barrier-free chained applies (the PCG apply floor)
  whiten20    the real fused PCG whiten (adds CG glue + scalar gates)
  einsum20    the einsum-chain whiten at the same shape

and prints an HBM-traffic model per stage.

Run on TPU: python results/repro/mxu3d_decomp.py [nx nz B]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.ops import bttb
from hipgp_tpu.ops.bttb import _full_weights, make_spectrum
from hipgp_tpu.ops.mxu2d import sandwich_apply_wp
from hipgp_tpu.ops.mxu3d import best_perm, sandwich_apply_3d_selfdot
from hipgp_tpu.ops.solve import whiten
from hipgp_tpu.utils.timing import chain_time

nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 32
B = int(sys.argv[3]) if len(sys.argv) > 3 else 64
ITERS = 20
dtype = jnp.float32

grids = [jnp.linspace(0, 1, nx, dtype), jnp.linspace(0, 1, nx, dtype),
         jnp.linspace(0, 0.5, nz, dtype)]
kf = lambda a, b: SqExp()(a, b, (1.0, 0.2))
spec = make_spectrum(grids, kf, jitter=1e-3)
dims, edims = spec.dims, spec.edims
perm = best_perm(edims)
pdims = tuple(dims[a] for a in perm)
pedims = tuple(edims[a] for a in perm)
M = spec.M
print(f"dims {dims} edims {edims} perm {perm} M={M} B={B}", flush=True)

rng = np.random.default_rng(0)
wfull = jnp.transpose(_full_weights(spec.eigs, edims[-1]), perm)
x0 = jnp.asarray(rng.standard_normal((B,) + pdims), dtype)

from hipgp_tpu.ops import mxu3d

mxu3d.USE_WP3 = False  # stage decomposition below measures the wp pipeline


def t(label, f, x, iters=1, reps=5):
    jf = jax.jit(f)
    t0 = time.time()
    jax.block_until_ready(jf(x))
    c = time.time() - t0
    s, out = chain_time(jf, x, reps=reps)
    print(f"{label:14s} {s / iters * 1e3:8.3f} ms   (compile {c:.1f}s)",
          flush=True)
    return s / iters * 1e3, out


def chained(label, step, x, iters=ITERS):
    """Chained scan of `step` (same-shape in/out), per-step ms."""

    def loop(x):
        y, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None,
                            length=iters)
        return y

    ms, _ = t(label, loop, x, iters=iters)
    return ms


# --- chained applies (the PCG apply floor) ----------------------------
def one_apply(x):
    y, d = sandwich_apply_3d_selfdot(x, wfull, pdims, pedims)
    return y + 0 * d[:, None, None, None]


chainx_ms = chained("applyx20", one_apply, x0)

# --- the outer einsum pair alone (chained) ----------------------------
from hipgp_tpu.ops.bttb import _real_fourier_basis
from hipgp_tpu.ops.mxu3d import _outer_contract

L0 = pedims[0]
Q0 = _real_fourier_basis(L0, dtype)


def outer_pair(x):
    u = _outer_contract(x, Q0[: pdims[0]])
    return _outer_contract(u, Q0[: pdims[0]].T)


outer_ms = chained("outer_pair", outer_pair, x0)

# --- the full-width analysis+synthesis (keeps L0 axis, chained) -------
u0 = jnp.asarray(rng.standard_normal((B, L0) + pdims[1:]), dtype)


def wp_dot(u):
    y, d = sandwich_apply_wp(u, wfull, pdims[1:], pedims[1:], selfdot=True)
    return y + 0 * d[:, None, None, None]


wpd_ms = chained("wp_selfdot", wp_dot, u0)


def wp_plain(u):
    return sandwich_apply_wp(u, wfull, pdims[1:], pedims[1:])


wp_ms = chained("wp_kernel", wp_plain, u0)

# --- wp3 (whole-sample fused) ------------------------------------------
wp3_ms = None
if mxu3d._wp3_ok(pdims, pedims, dtype):
    mxu3d.USE_WP3 = True
    wp3_ms = chained("wp3_applyx20", one_apply, x0)

# --- the real whitens -------------------------------------------------
b0 = jnp.asarray(rng.standard_normal((B, M)), dtype)


def wh(b):
    return whiten(spec, b, maxiter=ITERS, tol=0.0, fixed_iters=True)


wh_ms, _ = t("whiten20", wh, b0, iters=1)

if wp3_ms is not None:
    mxu3d.USE_WP3 = False
    whwp_ms, _ = t("whiten20_wp", wh, b0, iters=1)
    mxu3d.USE_WP3 = True

bttb.USE_MXU3D_PCG = False


def wh_e(b):
    return whiten(spec, b, maxiter=ITERS, tol=0.0, fixed_iters=True)


whe_ms, _ = t("einsum20", wh_e, b0, iters=1)
bttb.USE_MXU3D_PCG = True

# --- traffic model ----------------------------------------------------
GB = 1 << 30
bytes_vol = B * np.prod(pdims) * 4
bytes_int = B * L0 * np.prod(pdims[1:]) * 4
print(f"\noriginal volume {bytes_vol / GB:.3f} GB; (B,L0,d1,d2) intermediate "
      f"{bytes_int / GB:.3f} GB")
print(f"apply = outer_pair {outer_ms:.2f} + wp {wpd_ms:.2f} "
      f"= {outer_ms + wpd_ms:.2f} vs measured chained {chainx_ms:.2f} ms")
applies = 2 * ITERS + 1  # init precond + (matvec + precond) per iter
ap = wp3_ms if wp3_ms is not None else chainx_ms
print(f"whiten20 {wh_ms:.1f} ms = {applies} applies x {ap:.2f} "
      f"({applies * ap:.1f}) + glue {wh_ms - applies * ap:.1f} ms")
if wp3_ms is not None:
    print(f"whiten20_wp {whwp_ms:.1f} ms -> wp3 speedup {whwp_ms / wh_ms:.2f}x")
print(f"einsum20 {whe_ms:.1f} ms -> fused speedup {whe_ms / wh_ms:.2f}x")
