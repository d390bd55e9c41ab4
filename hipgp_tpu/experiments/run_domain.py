"""Paper section 5.5 — interstellar-dust map from line-of-sight integrals.

Parity reference: `experiments-hip-gp/run_domain_experiment.py` +
`ziggy/misc/experiment_util_domain.py`: observations are integrated
extinctions e(x) = ||x|| int_0^1 rho(a x) da along rays from the origin to
each star, with heteroscedastic noise; the model fits the latent 3-D density
rho on an nx x nx x nz inducing grid and is evaluated on both the latent
field and integrated predictions.

Data: `--data-path` reads the reference's space-separated format
(x y z extinction extinction_err per row, `experiment_util_domain.py:20-27`).
Without a file, a synthetic dust field (anisotropic Gaussian blobs) is
generated so the full pipeline runs end-to-end.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from ..infer import FitConfig
from .harness import fit_predict_and_save
from .synthetic_data import integrated_obs


def load_domain_data(path: str):
    """(x (N,3), e, e_err, density-or-None) from the reference's
    space-separated named-column table (`experiment_util_domain.py:20-27`)."""
    import pandas as pd

    data = pd.read_table(path, sep=r"\s+")
    x = data[["x", "y", "z"]].values
    e = data["e"].values
    e_err = data["e_err"].values
    density = data["density"].values if "density" in data.columns else None
    return x, e, e_err, density


def synthetic_dust_field(seed: int = 0, nblobs: int = 6,
                         blob_min: float = 0.1, blob_max: float = 0.3):
    """Positive 3-D density: mixture of anisotropic Gaussian blobs.

    ``nblobs``/``blob_min``/``blob_max`` set the field's structure scale —
    paper-scale grids only demonstrate their resolution on fields with
    structure finer than the coarse grids can represent (RESULTS
    sec. 14c's refinement study)."""
    rs = np.random.RandomState(seed)
    centers = rs.uniform(-0.6, 0.6, (nblobs, 3))
    scales = rs.uniform(blob_min, blob_max, (nblobs, 3))
    weights = rs.uniform(0.5, 1.5, nblobs)

    def rho(pts):
        pts = np.atleast_2d(pts)
        out = np.zeros(len(pts))
        for c, s, w in zip(centers, scales, weights):
            out += w * np.exp(-0.5 * np.sum(((pts - c) / s) ** 2, axis=-1))
        return out

    return rho


def make_synthetic_domain_data(n: int, noise_std: float, seed: int = 0,
                               nblobs: int = 6, blob_min: float = 0.1,
                               blob_max: float = 0.3):
    rs = np.random.RandomState(seed)
    rho = synthetic_dust_field(seed, nblobs, blob_min, blob_max)
    # stars distributed in a ball, away from the origin
    x = rs.uniform(-1.0, 1.0, (4 * n, 3))
    x = x[np.linalg.norm(x, axis=1) > 0.15][:n]
    e = integrated_obs(x, rho)
    # synthetic heteroscedastic noise sobs ~ U[s/2, 3s/2]
    # (`experiment_util_domain.py:86-88`)
    sobs = rs.uniform(noise_std / 2, 3 * noise_std / 2, len(x))
    a = e + sobs * rs.standard_normal(len(x))
    return x, a, e, sobs, rho


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default=None,
                   help="reference-format table (named columns x y z e e_err"
                        " [density]); synthetic if absent")
    p.add_argument("--dataset", default="small-sim",
                   choices=["small-sim", "big-sim", "gaia"],
                   help="sim: synthetic noise added to e; gaia: real errors")
    p.add_argument("--nobs", type=int, default=5000)
    p.add_argument("--noise-std", type=float, default=0.1)
    p.add_argument("--nblobs", type=int, default=6,
                   help="synthetic field: number of Gaussian blobs")
    p.add_argument("--blob-min", type=float, default=0.1,
                   help="synthetic field: min blob scale")
    p.add_argument("--blob-max", type=float, default=0.3,
                   help="synthetic field: max blob scale")
    p.add_argument("--nx", type=int, default=16, help="inducing pts per xy dim")
    p.add_argument("--nz", type=int, default=8, help="inducing pts in z")
    p.add_argument("--model-class", default="mean-field")
    p.add_argument("--xblock-size", type=int, default=2,
                   help="block family: block edge along x/y"
                        " (`run_domain_experiment.py:107-108`)")
    p.add_argument("--zblock-size", type=int, default=2,
                   help="block family: block edge along z")
    p.add_argument("--kernel", default="SqExp")
    p.add_argument("--ell", type=float, default=0.2)
    p.add_argument("--fit-method", default="full-batch",
                   choices=["natgrad", "full-batch"])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--maxiter-cg", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-2,
                   help="natgrad step size (`run_domain_experiment.py:63`)")
    p.add_argument("--mean-solver", default="dense",
                   choices=["dense", "cg", "gram", "factored", "matfree"],
                   help="full-batch mean solve; 'gram' beyond M' ~ 16k,"
                        " 'matfree' beyond M ~ 40k (no M x M resident)")
    p.add_argument("--mean-solver-maxiter", type=int, default=200)
    p.add_argument("--mean-solver-tol", type=float, default=1e-8)
    p.add_argument("--parallel", default=None, choices=["dp", "mp"],
                   help="fit over the device mesh (dp: data, mp: grid)")
    p.add_argument("--ntest", type=int, default=500)
    p.add_argument("--eval-grid", type=int, default=20,
                   help="xy eval grid size at the z=0 slice")
    p.add_argument("--snapshot", default=None,
                   help="latte-format npz SPH snapshot: build the ground-truth"
                        " density grid by native deposition (yt-free parity"
                        " with genDustDensity, experiment_util_domain.py:301)")
    p.add_argument("--deposit-method", default="sph", choices=["sph", "cic"])
    p.add_argument("--output-dir", default="./output-domain")
    p.add_argument("--eval-only-state", default=None,
                   help="restore this state.npz and skip the fit"
                        " (crash recovery / re-evaluation)")
    p.add_argument("--f64", action="store_true")
    args = p.parse_args(argv)

    if args.data_path and os.path.exists(args.data_path):
        rs = np.random.RandomState(0)
        x, e, e_err, density = load_domain_data(args.data_path)
        if args.dataset == "gaia":
            # real catalogue: measured extinctions with systematic floor
            sobs = e_err + 0.1
            a = e
            e_true = e
        else:
            # simulation: synthetic heteroscedastic noise U[s/2, 3s/2]
            # (`experiment_util_domain.py:86-88`)
            sobs = rs.rand(len(e)) * args.noise_std + args.noise_std / 2
            a = e + rs.randn(len(e)) * sobs
            e_true = e
        rho = None
        density_all = density
        # shuffle (the reference shuffles before splitting)
        perm = rs.permutation(len(x))
        x, a, e_true, sobs = x[perm], a[perm], e_true[perm], sobs[perm]
        if density_all is not None:
            density_all = density_all[perm]
    else:
        print("no --data-path: generating synthetic dust field")
        x, a, e_true, sobs, rho = make_synthetic_domain_data(
            args.nobs + args.ntest, args.noise_std,
            nblobs=args.nblobs, blob_min=args.blob_min,
            blob_max=args.blob_max,
        )
        density_all = None

    # train/test split
    ntr = len(x) - args.ntest
    xobs, aobs, sobs_tr = x[:ntr], a[:ntr], sobs[:ntr]
    xtest, etest = x[ntr:], (e_true[ntr:] if e_true is not None else None)
    if rho is not None:
        ftest = rho(xtest)
    elif density_all is not None:
        ftest = density_all[ntr:]  # shipped latent density at test points
    else:
        ftest = None

    lo, hi = x.min(axis=0), x.max(axis=0)
    grids = [np.linspace(lo[0], hi[0], args.nx),
             np.linspace(lo[1], hi[1], args.nx),
             np.linspace(lo[2], hi[2], args.nz)]

    # latent-field eval grid on the central-z slice
    gx_lo, gx_hi = lo[0] * 0.9, hi[0] * 0.9
    gy_lo, gy_hi = lo[1] * 0.9, hi[1] * 0.9
    g1 = np.linspace(gx_lo, gx_hi, args.eval_grid)
    g2 = np.linspace(gy_lo, gy_hi, args.eval_grid)
    gx, gy = np.meshgrid(g1, g2, indexing="ij")
    zmid = float((lo[2] + hi[2]) / 2)
    xgrid = np.column_stack([gx.ravel(), gy.ravel(), np.full(gx.size, zmid)])
    fgrid = rho(xgrid) if rho is not None else None

    if fgrid is None and args.snapshot and os.path.exists(args.snapshot):
        # ground-truth density by native SPH/CIC deposition of the snapshot
        # (yt-free genDustDensity, `experiment_util_domain.py:301-367`)
        from .dust_density import gen_dust_density

        nz_slab = max(args.nz, 2)
        cube = gen_dust_density(
            x, args.eval_grid, args.eval_grid, nz_slab,
            snapshot_path=args.snapshot, method=args.deposit_method,
        )
        # the deposition grid spans [-max|x|, max|x|]^3; sample the slab
        # containing the eval slice and the eval-grid xy cells
        scales = np.max(np.abs(x), axis=0)
        def _cell(coords, scale, n):
            return np.clip(((coords + scale) / (2 * scale) * n).astype(int), 0, n - 1)
        iz = _cell(np.array([zmid]), scales[2], nz_slab)[0]
        ixs = _cell(xgrid[:, 0], scales[0], args.eval_grid)
        iys = _cell(xgrid[:, 1], scales[1], args.eval_grid)
        fgrid = cube[ixs, iys, iz]

    cfg = FitConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        maxiter_cg=args.maxiter_cg, integrated_obs=True, lr=args.lr,
        semi_integrated_estimator="analytic" if args.kernel == "SqExp" else "mc-biased",
    )

    model, state, report = fit_predict_and_save(
        name=f"domain-{args.model_class}",
        xobs=xobs, yobs=aobs, sobs=sobs_tr,
        xinduce_grids=grids,
        model_class=args.model_class,
        block_sizes=(
            (args.xblock_size, args.xblock_size, args.zblock_size)
            if args.model_class.startswith("block") else None
        ),
        kernel=args.kernel,
        ell_init=args.ell,
        fit_method=args.fit_method,
        fit_config=cfg,
        maxiter_cg=args.maxiter_cg,
        batch_solve_bsz=args.batch_size,
        mean_solver=args.mean_solver,
        mean_solver_maxiter=args.mean_solver_maxiter,
        mean_solver_tol=args.mean_solver_tol,
        # natgrad at paper-scale 3-D grids sits near the stability limit
        # (RESULTS sec. 12): warm-start theta2 and clamp to the safe lr
        theta2_warmstart=args.fit_method == "natgrad",
        natgrad_safe_lr="clamp",
        parallel=args.parallel,
        xtest=xtest, etest=etest, ftest=ftest,
        xgrid=xgrid, fgrid=fgrid,
        grid_shape=(args.eval_grid, args.eval_grid),
        grid_extent=(gx_lo, gx_hi, gy_lo, gy_hi),
        output_dir=args.output_dir,
        dtype=jnp.float64 if args.f64 else jnp.float32,
        eval_only_state=args.eval_only_state,
    )
    return model, state, report


if __name__ == "__main__":
    main()
