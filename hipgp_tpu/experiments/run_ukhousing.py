"""Paper section 5.4 — UK housing: log flat prices over lat/lon.

Parity reference: `experiments-hip-gp/run_ukhousing_experiment.py` +
`uk_housing_data.py`: 2018 flat transactions, mean-centered log-price,
postcode joined to lat/lon, region of interest (-5.7, 1.8) x (50, 55.5),
~161k train / 20k test; per-point noise std estimated by local linear
regressions in random boxes (`uk_housing_data.py:113-143`).

Data: `--data-path` reads a prepared CSV with columns lon, lat, log_price
(the reference's raw land-registry join is reproduced by
:func:`prepare_uk_housing_csv` given the two raw files).  Without data, a
synthetic price surface over the same ROI exercises the identical pipeline.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..infer import FitConfig
from .harness import fit_predict_and_save

ROI = (-5.7, 1.8, 50.0, 55.5)  # lon_lo, lon_hi, lat_lo, lat_hi


def prepare_uk_housing_csv(price_csv: str, postcode_csv: str, out_csv: str):
    """Join raw land-registry prices with a postcode->lat/lon table.

    Reproduces the reference's raw pipeline (`uk_housing_data.py:73-99`
    load_uk_pricing_data + the flat filter at :56): price in col 1,
    postcode col 3, property type col 4 ('F' = flat kept); left-merge on
    postcode; drop rows with missing lon/lat, price < 1000, or
    latitude > 65 (the reference's outlier filter, :96-98).
    postcode_csv: header row with postcode, latitude, longitude columns.
    """
    prices = pd.read_csv(price_csv, header=None)
    prices = prices[prices[4] == "F"]
    prices = prices[[1, 3]]
    prices.columns = ["price", "postcode"]
    pc = pd.read_csv(postcode_csv)
    pc.columns = [c.lower() for c in pc.columns]
    merged = prices.merge(pc, on="postcode", how="left")
    bad = (
        merged["longitude"].isnull()
        | (merged["price"] < 1000)
        | (merged["latitude"] > 65)
    )
    merged = merged[~bad]
    merged["log_price"] = np.log(merged["price"])
    merged[["longitude", "latitude", "log_price"]].to_csv(out_csv, index=False)
    return out_csv


def load_prepared_csv(path: str):
    """ROI filter + mean-center a prepared CSV (the reference's
    `UKHousingData.__init__` protocol, `uk_housing_data.py:46-64`).

    Returns (x (N,2) lon/lat, y (N,) mean-centered log-price).
    """
    df = pd.read_csv(path)
    x = df[["longitude", "latitude"]].values
    y = df["log_price"].values
    m = (
        (x[:, 0] > ROI[0]) & (x[:, 0] < ROI[1])
        & (x[:, 1] > ROI[2]) & (x[:, 1] < ROI[3])
    )
    x, y = x[m], y[m]
    return x, y - y.mean()


def local_noise_estimate(x, y, num_boxes: int = 500, box_frac: float = 0.02,
                         seed: int = 0):
    """Per-point noise std via residuals of local linear fits in random boxes
    (`uk_housing_data.py:113-143`).  Points not covered get the median."""
    rs = np.random.RandomState(seed)
    lo = x.min(axis=0)
    hi = x.max(axis=0)
    span = (hi - lo) * box_frac
    sig = np.full(len(x), np.nan)
    for _ in range(num_boxes):
        c = rs.uniform(lo, hi)
        mask = np.all(np.abs(x - c) < span, axis=1)
        if mask.sum() < 10:
            continue
        xb = np.column_stack([x[mask], np.ones(mask.sum())])
        coef, *_ = np.linalg.lstsq(xb, y[mask], rcond=None)
        resid = y[mask] - xb @ coef
        sig[mask] = np.std(resid)
    med = np.nanmedian(sig) if np.isfinite(sig).any() else np.std(y)
    sig[~np.isfinite(sig)] = med
    return np.maximum(sig, 1e-3)


def synthetic_housing_data(n: int, seed: int = 0):
    rs = np.random.RandomState(seed)
    lon = rs.uniform(ROI[0], ROI[1], n)
    lat = rs.uniform(ROI[2], ROI[3], n)
    x = np.column_stack([lon, lat])
    # smooth log-price surface: city bumps + gradient
    centers = np.array([[-0.1, 51.5], [-2.2, 53.5], [-1.9, 52.5], [-3.2, 55.9]])
    f = 0.05 * (lat - 52)
    for c in centers:
        f = f + 0.8 * np.exp(-0.5 * np.sum((x - c) ** 2, axis=1) / 0.3**2)
    y = f + 0.3 * rs.standard_normal(n)
    return x, y, f


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-path", default=None,
                   help="CSV with longitude, latitude, log_price")
    p.add_argument("--nobs", type=int, default=20_000,
                   help="synthetic N when no data file")
    p.add_argument("--ntest", type=int, default=2000)
    p.add_argument("--num-inducing-x", type=int, default=64)
    p.add_argument("--num-inducing-y", type=int, default=48)
    p.add_argument("--model-class", default="mean-field")
    p.add_argument("--kernel", default="Mat52")
    p.add_argument("--ell", type=float, default=0.1)
    p.add_argument("--sig2-init", type=float, default=-1.0,
                   help="marginal-variance init; <=0 uses the empirical "
                        "distance-slope regression (reference default, "
                        "`run_ukhousing_experiment.py:49`)")
    p.add_argument("--fit-method", default="full-batch",
                   choices=["natgrad", "full-batch"])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--maxiter-cg", type=int, default=20)
    p.add_argument("--mean-solver", default="dense",
                   choices=["dense", "cg", "gram", "factored", "matfree"])
    p.add_argument("--parallel", default=None, choices=["dp", "mp"],
                   help="fit over the device mesh (dp: data, mp: grid)")
    p.add_argument("--output-dir", default="./output-ukhousing")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    ftrue = None
    if args.data_path and os.path.exists(args.data_path):
        x, y = load_prepared_csv(args.data_path)
        fte = None
    else:
        print("no --data-path: generating synthetic UK-housing-like data")
        x, y, ftrue_vals = synthetic_housing_data(args.nobs + args.ntest, args.seed)
        y = y - y.mean()
        fte = ftrue_vals - ftrue_vals.mean()

    rs = np.random.RandomState(args.seed)
    perm = rs.permutation(len(x))
    x, y = x[perm], y[perm]
    if fte is not None:
        fte = fte[perm]

    sobs = local_noise_estimate(x, y)
    ntr = len(x) - args.ntest
    xobs, yobs, str_ = x[:ntr], y[:ntr], sobs[:ntr]
    xtest, ytest = x[ntr:], y[ntr:]
    ftest = fte[ntr:] if fte is not None else ytest

    grids = [
        np.linspace(ROI[0], ROI[1], args.num_inducing_x),
        np.linspace(ROI[2], ROI[3], args.num_inducing_y),
    ]
    cfg = FitConfig(epochs=args.epochs, batch_size=args.batch_size,
                    maxiter_cg=args.maxiter_cg)

    return fit_predict_and_save(
        name=f"ukhousing-{args.model_class}",
        xobs=xobs, yobs=yobs, sobs=str_,
        xinduce_grids=grids,
        model_class=args.model_class,
        kernel=args.kernel,
        sig2_init=(args.sig2_init if args.sig2_init > 0 else "empirical"),
        ell_init=args.ell,
        fit_method=args.fit_method,
        fit_config=cfg,
        maxiter_cg=args.maxiter_cg,
        mean_solver=args.mean_solver,
        parallel=args.parallel,
        batch_solve_bsz=args.batch_size,
        xtest=xtest, ftest=ftest,
        output_dir=args.output_dir,
    )


if __name__ == "__main__":
    main()
