"""The mp (grid-sharded) cost model, measured on the real chip (RESULTS).

What the verdict asks for: the per-apply overhead of the sharded whiten vs
the single-device paths ON THE CHIP (1x1 'grid' mesh — same code path,
same collectives lowering, zero actual communication), the all_to_all
byte counts per transform direction, and the predicted scaling at
n_grid in {2, 4, 8}.

Also documents the fused-kernel cliff: the mxu2d/mxu3d fused PCG kernels
are single-device — under mp the whiten runs the sharded per-axis
transform path, so the mp whiten on ONE device is slower than the fused
single-device solve by exactly the kernel win.

Run on TPU: python results/repro/mp_cost_model.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from hipgp_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from hipgp_tpu.kernels import Matern
from hipgp_tpu.ops import bttb
from hipgp_tpu.ops.bttb import make_spectrum
from hipgp_tpu.ops.solve import whiten
from hipgp_tpu.parallel.fft_sharded import sharded_gram_solve
from hipgp_tpu.utils.timing import chain_time

ITERS = 20
dtype = jnp.float32


def t(label, f, x, reps=5):
    jf = jax.jit(f)
    t0 = time.time()
    jax.block_until_ready(jf(x))
    c = time.time() - t0
    s, _ = chain_time(jf, x, reps=reps)
    print(f"  {label:28s} {s * 1e3:9.2f} ms  (compile {c:.1f}s)", flush=True)
    return s * 1e3


mesh = Mesh(np.array(jax.devices()).reshape(1), ("grid",))

for nx, B, label in [(128, 256, "3droad M=128^2"), (125, 256, "paper M=125^2")]:
    grids = [jnp.linspace(0, 1, nx, dtype)] * 2
    kf = lambda a, b: Matern(2.5)(a, b, (1.0, 0.05))
    spec = make_spectrum(grids, kf, jitter=1e-3)
    M, Mp = spec.M, int(np.prod(spec.edims))
    rng = np.random.default_rng(0)
    b0 = jnp.asarray(rng.standard_normal((B, M)), dtype)
    print(f"{label}: edims {spec.edims}  M'={Mp}  B={B}", flush=True)

    fused = t("single-device fused whiten",
              lambda b: whiten(spec, b, maxiter=ITERS, tol=0.0,
                               fixed_iters=True), b0)

    bttb.USE_MXU2D_PCG = False
    bttb.USE_MXU3D_PCG = False
    einsum = t("single-device einsum whiten",
               lambda b: whiten(spec, b, maxiter=ITERS, tol=0.0,
                                fixed_iters=True), b0)
    bttb.USE_MXU2D_PCG = True
    bttb.USE_MXU3D_PCG = True

    mp1 = t("mp whiten (1x1 grid mesh)",
            lambda b: sharded_gram_solve(spec, b, mesh, maxiter=ITERS,
                                         tol=0.0), b0)

    # --- analytic all_to_all bytes + scaling prediction ----------------
    # Per circulant apply (local_circulant_apply): one all_to_all PAIR —
    # the complex expanded state crosses the mesh twice.  Per PCG
    # iteration: 2 applies (K and C^{-1}) = 4 all_to_alls; the whiten adds
    # the R^T apply (2 more) once.
    state_bytes = B * Mp * 8  # complex64 expanded state (global)
    n_a2a = ITERS * 4 + 2
    print(f"  all_to_all: {n_a2a} x {state_bytes / 2**20:.0f} MiB global "
          f"state per whiten-{ITERS}")
    for n in (2, 4, 8):
        # per-device egress per all_to_all: (n-1)/n of its local shard
        egress = state_bytes / n * (n - 1) / n
        # v5e: 4 ICI links x ~45 GB/s usable each way; ring all_to_all
        # effective ~ 1 link of bandwidth for the bisection-limited case
        ici_bw = 45e9
        comm_ms = n_a2a * egress / ici_bw * 1e3
        comp_ms = mp1 / n
        print(f"  predicted n_grid={n}: compute {comp_ms:7.1f} + comm "
              f"{comm_ms:6.1f} = {comp_ms + comm_ms:7.1f} ms "
              f"(vs 1-dev fused {fused:.1f})")
    print(f"  mp-vs-einsum overhead (same transforms, shard_map + masks): "
          f"{mp1 / einsum:.2f}x; fused-kernel cliff under mp: "
          f"{mp1 / fused:.2f}x", flush=True)
