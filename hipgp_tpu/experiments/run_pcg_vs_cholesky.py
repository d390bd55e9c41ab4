"""Paper section 5.2 — whitening-solve wall-clock: PCG+FFT vs Cholesky.

Parity reference: `experiments-hip-gp/run_pcg_vs_cholesky.py` — time
K^{-1/2}v over 1-D inducing grids M in {1e3, 5e3, 1e4, 5e4, 1e5, 5e5, 1e6}
for four kernels; Cholesky is skipped for M >= 5e4 (O(M^3) blows up), exactly
as the reference does (`:69,134`).  Emits
wall_clock_time_summary_pcg_vs_cholesky_{kernel}.csv per kernel.

Timing chains inputs between reps so the runtime cannot cache identical
dispatches.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..kernels import kernel_from_name
from ..ops import cholesky_whiten, dense_gram, gram_solve, make_spectrum

CHOLESKY_MAX_M = 50_000


def time_fn(f, x, reps=5, warmup=3):
    """Chained-input steady-state timing (shared impl, utils/timing.py)."""
    from ..utils.timing import chain_time

    secs, _ = chain_time(f, x, reps=reps, warmup=warmup)
    return secs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[1000, 5000, 10_000, 50_000, 100_000, 500_000, 1_000_000])
    p.add_argument("--kernels", nargs="+",
                   default=["SqExp", "Mat12", "Mat32", "Mat52"])
    p.add_argument("--bsz", type=int, default=8)
    p.add_argument("--maxiter-cg", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--sig2", type=float, default=0.1)
    p.add_argument("--ell-spacings", type=float, default=1.0,
                   help="lengthscale in units of grid spacings (reference: 1)")
    p.add_argument("--output-dir", default="./output-pcg-vs-cholesky")
    p.add_argument("--f64", action="store_true")
    args = p.parse_args(argv)

    from ..utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.float64 if args.f64 else jnp.float32
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    all_results = {}
    for kname in args.kernels:
        kern = kernel_from_name(kname)
        rows = []
        for M in args.sizes:
            # reference protocol: sig2=0.1, ell = one grid spacing
            # (`run_pcg_vs_cholesky.py:89` in the reference); --ell-spacings
            # scales it for harder-conditioning variants
            ell = args.ell_spacings / M
            kfun = lambda a, b: kern(a, b, (args.sig2, ell))
            grid = jnp.linspace(0.0, 1.0, M, dtype=dtype)
            v = jnp.asarray(rng.standard_normal((args.bsz, M)), dtype)

            @jax.jit
            def pcg_path(v):
                spec = make_spectrum([grid], kfun, jitter=1e-3)
                return gram_solve(spec, v, maxiter=args.maxiter_cg, tol=0.0,
                                  fixed_iters=True)

            t_pcg = time_fn(pcg_path, v, reps=args.reps)

            t_chol = np.nan
            if M < CHOLESKY_MAX_M:
                @jax.jit
                def chol_path(v):
                    K = dense_gram([grid], kfun, jitter=1e-3)
                    return cholesky_whiten(K, v)

                t_chol = time_fn(chol_path, v, reps=args.reps)

            rows.append({"M": M, "pcg_fft_sec": t_pcg, "cholesky_sec": t_chol})
            print(f"{kname} M={M:>8d}: pcg {t_pcg*1e3:9.2f} ms   "
                  f"cholesky {t_chol*1e3 if np.isfinite(t_chol) else float('nan'):9.2f} ms",
                  flush=True)
        df = pd.DataFrame(rows)
        df.to_csv(
            os.path.join(
                args.output_dir,
                f"wall_clock_time_summary_pcg_vs_cholesky_{kname}.csv",
            ),
            index=False,
        )
        all_results[kname] = df
    return all_results


if __name__ == "__main__":
    main()
