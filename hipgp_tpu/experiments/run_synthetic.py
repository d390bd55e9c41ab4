"""Paper synthetic 2-D regression experiment.

Parity reference: `experiments-hip-gp/run_synthetic_experiment.py` — random
sin/tanh MLP surface (simple/medium/hard), N=20k default, inducing grid
M=125^2, sweep over variational families, per-model artifact dirs +
errordf-summary.csv.

Usage: python -m hipgp_tpu.experiments.run_synthetic --nobs 2000 --num-inducing 32
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..infer import FitConfig
from .harness import fit_predict_and_save
from .synthetic_data import make_two_dim_data


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nobs", type=int, default=20_000)
    p.add_argument("--ntest", type=int, default=2000)
    p.add_argument("--noise-std", type=float, default=0.01)
    p.add_argument("--function-complexity", default="medium",
                   choices=["simple", "medium", "hard"])
    p.add_argument("--num-inducing", type=int, default=125,
                   help="inducing grid points per dimension")
    p.add_argument("--gridnum", type=int, default=64,
                   help="evaluation grid points per dimension")
    p.add_argument("--models", nargs="+", default=["mean-field"],
                   choices=["mean-field", "block-diagonal", "full-rank", "SVGP"])
    p.add_argument("--kernel", default="SqExp")
    p.add_argument("--ell", type=float, default=0.05)
    p.add_argument("--fit-method", default="natgrad",
                   choices=["natgrad", "full-batch"])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--theta2-warmstart", action="store_true",
                   help="one Lambda-only sweep initializes theta2 before SVI")
    p.add_argument("--no-schedule-lr", action="store_true",
                   help="constant natgrad lr (the reference run script's default)")
    p.add_argument("--maxiter-cg", type=int, default=10)
    p.add_argument("--xblock-size", type=int, default=5)
    p.add_argument("--integrated-obs", action="store_true")
    p.add_argument("--ell-sweep", type=float, nargs=3, metavar=("MIN", "MAX", "STEP"),
                   default=None,
                   help="grid-search the lengthscale by batch-solve ELBO "
                        "before fitting (the reference's ell annealing)")
    p.add_argument("--mean-solver", default="dense", choices=["dense", "cg", "gram", "factored"])
    p.add_argument("--parallel", default=None, choices=["dp", "mp"],
                   help="fit over a device mesh: 'dp' shards batch rows, "
                        "'mp' also shards the whitened state over 'grid' "
                        "(mean-field only); default mesh spans all devices")
    p.add_argument("--output-dir", default="./output-synthetic")
    p.add_argument("--f64", action="store_true")
    args = p.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    d = make_two_dim_data(
        Nobs=args.nobs, Ntest=args.ntest, noise_std=args.noise_std,
        function_complexity=args.function_complexity,
        do_integrated=args.integrated_obs, gridnum=args.gridnum,
    )
    yobs = d["aobs"] if args.integrated_obs else d["yobs"]

    grids = [np.linspace(-1, 1, args.num_inducing)] * 2
    cfg = FitConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        maxiter_cg=args.maxiter_cg, integrated_obs=args.integrated_obs,
        schedule_lr=not args.no_schedule_lr,
    )

    ell = args.ell
    if args.ell_sweep is not None:
        from ..experiments.harness import make_model as _mk
        from ..infer import ell_fit

        probe = _mk("mean-field", args.kernel, grids, num_obs=len(d["xobs"]),
                    sig2_init=float(np.var(yobs)), ell_init=args.ell,
                    noise2_init=args.noise_std**2,
                    support_integrated_obs=args.integrated_obs,
                    dtype=jnp.float64 if args.f64 else jnp.float32)
        _, best_ell, ells, elbos = ell_fit(
            probe, probe.init_state(), d["xobs"], yobs, d["sobs"],
            ell_min=args.ell_sweep[0], ell_max=args.ell_sweep[1],
            ell_step_size=args.ell_sweep[2],
            batch_solve_bsz=args.batch_size, maxiter_cg=args.maxiter_cg,
            integrated_obs=args.integrated_obs,
        )
        ell = best_ell
        pd.DataFrame({"ell": ells, "elbo": elbos}).to_csv(
            os.path.join(args.output_dir, "ell_sweep.csv"), index=False)
        print(f"ell sweep selected ell = {ell}")

    summaries = []
    for model_class in args.models:
        name = f"{model_class}-{args.kernel}"
        print(f"=== {name} ===")
        model, state, report = fit_predict_and_save(
            name=name,
            xobs=d["xobs"], yobs=yobs, sobs=d["sobs"],
            xinduce_grids=grids,
            model_class=model_class,
            kernel=args.kernel,
            sig2_init="marginal",
            ell_init=ell,
            noise2_init=args.noise_std**2,
            block_sizes=(args.xblock_size, args.xblock_size),
            fit_method=args.fit_method,
            fit_config=cfg,
            maxiter_cg=args.maxiter_cg,
            mean_solver=args.mean_solver,
            theta2_warmstart=args.theta2_warmstart,
            xtest=d["xtest"], ftest=d["ftest"], etest=d["etest"],
            xgrid=d["xgrid"], fgrid=d["fgrid"],
            grid_shape=d["grid_shape"], grid_extent=d["grid_extent"],
            output_dir=args.output_dir,
            parallel=args.parallel,
            dtype=jnp.float64 if args.f64 else jnp.float32,
        )
        ndf = pd.read_csv(
            os.path.join(args.output_dir, name, "noise_reduction.csv"),
            index_col=0,
        )
        row = {"model": name, **{k: float(v) for k, v in ndf["fobs"].items()}}
        summaries.append(row)
        print(pd.Series(row))

    sdf = pd.DataFrame(summaries)
    sdf.to_csv(os.path.join(args.output_dir, "errordf-summary.csv"), index=False)
    print(sdf)
    return sdf


if __name__ == "__main__":
    main()
