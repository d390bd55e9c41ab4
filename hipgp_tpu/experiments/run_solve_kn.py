"""Paper section 5.1 — CG vs PCG convergence on K_n solves.

Parity reference: `experiments-hip-gp/run_solve_kn_experiment.py` — for each
inducing-grid size, solve K d = Knm rows with plain CG and with the
circulant-preconditioned CG, tracing iterate RMSE/MAE against the converged
solution; emit per-grid trace CSVs and comparison plots.

Usage: python -m hipgp_tpu.experiments.run_solve_kn [--gridsizes 25 50 100]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..kernels import kernel_from_name
from ..ops import make_spectrum, matmul_by_Cinv, matmul_by_K, pcg_trace


def run_one(gridsize: int, kernel_name: str, ell: float, num_iters: int,
            bsz: int, seed: int, dtype):
    kern = kernel_from_name(kernel_name)
    grids = [jnp.linspace(0.0, 1.0, gridsize, dtype=dtype)] * 2
    kfun = lambda a, b: kern(a, b, (1.0, ell))
    spec = make_spectrum(grids, kfun, jitter=1e-3)

    rng = np.random.default_rng(seed)
    xbatch = jnp.asarray(rng.uniform(0, 1, (bsz, 2)), dtype)
    mesh = jnp.meshgrid(*grids, indexing="ij")
    xinduce = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
    Knm = kern(xbatch, xinduce, (1.0, ell))  # (bsz, M)

    mv = lambda v: matmul_by_K(spec, v)
    pc = lambda v: matmul_by_Cinv(spec, v)

    # converged reference solution (long PCG run)
    @jax.jit
    def reference_solve(b):
        x, _ = pcg_trace(mv, b, precond=pc, num_iters=min(4 * num_iters, 4000))
        return x

    x_star = reference_solve(Knm)

    def metric(xk):
        err = xk - x_star
        return {
            "rmse": jnp.sqrt(jnp.mean(err**2)),
            "mae": jnp.mean(jnp.abs(err)),
        }

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def traced(b, precond: bool):
        pcond = pc if precond else None
        _, traces = pcg_trace(mv, b, precond=pcond, num_iters=num_iters,
                              metric_fn=metric)
        return traces

    out = {}
    for name, use_pc in [("cg", False), ("pcg", True)]:
        tr = jax.device_get(traced(Knm, use_pc))
        out[name] = pd.DataFrame({
            "iter": np.arange(num_iters),
            "rmse": tr["metric"]["rmse"],
            "mae": tr["metric"]["mae"],
            "resnorm": tr["resnorm"].max(axis=-1),
        })
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--gridsizes", type=int, nargs="+", default=[25, 50, 100])
    p.add_argument("--kernel", default="Mat52")
    p.add_argument("--ell", type=float, default=0.05)
    p.add_argument("--num-iters", type=int, default=2000)
    p.add_argument("--bsz", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--f64", action="store_true")
    p.add_argument("--output-dir", default="./output-solve-kn")
    p.add_argument("--no-plots", action="store_true")
    args = p.parse_args(argv)

    dtype = jnp.float64 if args.f64 else jnp.float32
    os.makedirs(args.output_dir, exist_ok=True)

    results = {}
    for g in args.gridsizes:
        print(f"grid {g}x{g} ...")
        res = run_one(g, args.kernel, args.ell, args.num_iters, args.bsz,
                      args.seed, dtype)
        for name, df in res.items():
            df.to_csv(
                os.path.join(args.output_dir, f"{name}-trace-grid{g}.csv"),
                index=False,
            )
        results[g] = res
        r_cg = res["cg"]["rmse"].values
        r_pcg = res["pcg"]["rmse"].values
        tol = max(r_cg.min(), 1e-12) * 10
        it_cg = int(np.argmax(r_cg < tol)) if (r_cg < tol).any() else args.num_iters
        it_pcg = int(np.argmax(r_pcg < tol)) if (r_pcg < tol).any() else args.num_iters
        print(f"  iters to rmse<{tol:.1e}: cg={it_cg} pcg={it_pcg}")

    if not args.no_plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        for stat in ("rmse", "mae"):
            fig, ax = plt.subplots(figsize=(7, 5))
            for g, res in results.items():
                frac = np.arange(args.num_iters) / args.num_iters
                ax.semilogy(frac, res["cg"][stat], "--", label=f"CG {g}x{g}")
                ax.semilogy(frac, res["pcg"][stat], "-", label=f"PCG {g}x{g}")
            ax.set_xlabel("fraction of CG iterations")
            ax.set_ylabel(stat)
            ax.legend()
            fig.savefig(
                os.path.join(args.output_dir, f"cg-pcg-comparison-{stat}.pdf"),
                bbox_inches="tight",
            )
            plt.close(fig)
    return results


if __name__ == "__main__":
    main()
