"""Appendix C.1 — preconditioner efficiency r_pcg = PCG iters / CG iters.

Parity reference: `experiments-hip-gp/preconditioner-analysis.ipynb`
(cells 3-5): for 1-D grids of M in {10..500}, each kernel, ell in
{0.05, 0.5}, count iterations to tolerance for CG and circulant-PCG and
report the ratio.  Emits r_pcg.csv.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..kernels import kernel_from_name
from ..ops import make_spectrum, matmul_by_Cinv, matmul_by_K, pcg_result


def iters_to_tol(spec, b, tol, maxiter, precond: bool):
    pc = (lambda v: matmul_by_Cinv(spec, v)) if precond else None
    res = pcg_result(lambda v: matmul_by_K(spec, v), b, precond=pc,
                     maxiter=maxiter, tol=tol)
    return int(res.iters)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[10, 25, 50, 100, 250, 500])
    p.add_argument("--kernels", nargs="+",
                   default=["SqExp", "Mat12", "Mat32", "Mat52"])
    p.add_argument("--ells", type=float, nargs="+", default=[0.05, 0.5])
    p.add_argument("--tol", type=float, default=1e-6)
    p.add_argument("--maxiter", type=int, default=2000)
    p.add_argument("--bsz", type=int, default=4)
    p.add_argument("--output-dir", default="./output-precond")
    p.add_argument("--f64", action="store_true")
    args = p.parse_args(argv)

    dtype = jnp.float64 if args.f64 else jnp.float32
    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    rows = []
    for kname in args.kernels:
        kern = kernel_from_name(kname)
        for ell in args.ells:
            for M in args.sizes:
                grid = jnp.linspace(0.0, 1.0, M, dtype=dtype)
                spec = make_spectrum(
                    [grid], lambda a, b: kern(a, b, (1.0, ell)), jitter=1e-3
                )
                b = jnp.asarray(rng.standard_normal((args.bsz, M)), dtype)
                it_cg = iters_to_tol(spec, b, args.tol, args.maxiter, False)
                it_pcg = iters_to_tol(spec, b, args.tol, args.maxiter, True)
                rows.append({
                    "kernel": kname, "ell": ell, "M": M,
                    "cg_iters": it_cg, "pcg_iters": it_pcg,
                    "r_pcg": it_pcg / max(it_cg, 1),
                })
                print(rows[-1])
    df = pd.DataFrame(rows)
    df.to_csv(os.path.join(args.output_dir, "r_pcg.csv"), index=False)
    return df


if __name__ == "__main__":
    main()
