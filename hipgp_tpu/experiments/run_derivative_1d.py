"""Paper section 5.3 — 1-D GP with derivative observations.

Parity reference: `experiments-hip-gp/run_exact_gp_1d_derivative.py` +
`GP-with-Derivatives.ipynb`: a random-MLP 1-D function observed through
nlatent function values and nprime derivative values; Adam loop on
(log_sig2, log_ell) through batch_solve + ELBO; final posterior compared to
the exact joint GP in both latent and derivative domains.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from ..models.derivative_gp import (
    compute_elbo,
    exact_gp_prediction,
    posterior_prediction,
    svgp_batch_solve,
)
from .synthetic_data import make_one_dim_function


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--nlatent", type=int, default=1000)
    p.add_argument("--nprime", type=int, default=10)
    p.add_argument("--num-inducing", type=int, default=128)
    p.add_argument("--noise-std", type=float, default=0.05)
    p.add_argument("--deriv-noise-std", type=float, default=None,
                   help="derivative-observation noise std (defaults to "
                        "--noise-std; the notebook uses 0.2 vs 0.05)")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--maxiter-cg", type=int, default=50)
    p.add_argument("--whitened-type", default="ziggy",
                   choices=["ziggy", "cholesky"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="./output-derivative-1d")
    p.add_argument("--f64", action="store_true")
    p.add_argument("--compare", action="store_true",
                   help="run the notebook's model comparison (cells 30-41 of"
                        " GP-with-Derivatives.ipynb): {ziggy, cholesky} x"
                        " {with, without derivative obs} + the exact joint GP")
    args = p.parse_args(argv)

    dtype = jnp.float64 if args.f64 else jnp.float32
    os.makedirs(args.output_dir, exist_ok=True)

    f, fprime = make_one_dim_function(seed=args.seed)
    rng = np.random.default_rng(args.seed)
    x = np.sort(rng.uniform(0.0, 2.0, args.nlatent))
    xp = np.sort(rng.uniform(0.0, 2.0, args.nprime))
    y = f(x) + args.noise_std * rng.standard_normal(args.nlatent)
    nsp_val = args.deriv_noise_std if args.deriv_noise_std is not None else args.noise_std
    yp = fprime(xp) + nsp_val * rng.standard_normal(args.nprime)

    x_j = jnp.asarray(x, dtype)
    y_j = jnp.asarray(y, dtype)
    xp_j = jnp.asarray(xp, dtype)
    yp_j = jnp.asarray(yp, dtype)
    u = jnp.linspace(-0.1, 2.1, args.num_inducing, dtype=dtype)
    ns = args.noise_std
    nsp = nsp_val

    xtest = jnp.linspace(0.05, 1.95, 200, dtype=dtype)

    def fit_and_eval(whitened_type, xp_use, yp_use):
        """Adam on (log_sig2, log_ell) through the closed-form solve + ELBO
        (reference run_exact_gp_1d_derivative.py:101-118), then posterior
        RMSE in both domains."""
        def loss(params):
            sig2 = jnp.exp(params["log_sig2"])
            ell = jnp.exp(params["log_ell"])
            m, S = svgp_batch_solve(
                u, xp_use, yp_use, x_j, y_j, sig2, ell, nsp, ns,
                whitened_type=whitened_type, maxiter=args.maxiter_cg,
            )
            e = compute_elbo(
                u, m, S, xp_use, yp_use, x_j, y_j, sig2, ell, nsp, ns,
                whitened_type=whitened_type, maxiter=args.maxiter_cg,
            )
            return -e / 1e4

        params = {"log_sig2": jnp.asarray(0.0, dtype),
                  "log_ell": jnp.log(jnp.asarray(0.2, dtype))}
        opt = optax.adam(args.lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss)(p)
            upd, s = opt.update(g, s, p)
            return l, optax.apply_updates(p, upd), s

        trace = []
        for i in range(args.steps):
            l, params, opt_state = step(params, opt_state)
            trace.append(float(l))
            if i % 10 == 0:
                print(f"step {i:4d}: loss {float(l):.6f} "
                      f"sig2 {float(jnp.exp(params['log_sig2'])):.4f} "
                      f"ell {float(jnp.exp(params['log_ell'])):.4f}")

        sig2 = float(jnp.exp(params["log_sig2"]))
        ell = float(jnp.exp(params["log_ell"]))
        m, S = svgp_batch_solve(
            u, xp_use, yp_use, x_j, y_j, sig2, ell, nsp, ns,
            whitened_type=whitened_type, maxiter=4 * args.maxiter_cg,
        )
        rows = {}
        for domain, truth in [("latent", f), ("prime", fprime)]:
            mu, s2 = posterior_prediction(
                xtest, u, m, S, sig2, ell, domain=domain,
                whitened_type=whitened_type, maxiter=4 * args.maxiter_cg,
            )
            t = truth(np.asarray(xtest))
            rows[f"{domain}_rmse"] = float(np.sqrt(np.mean((np.asarray(mu) - t) ** 2)))
            rows[f"{domain}_meansig"] = float(np.mean(np.sqrt(np.maximum(np.asarray(s2), 0))))
        rows["sig2"] = sig2
        rows["ell"] = ell
        return rows, trace

    def exact_rows(xp_use, yp_use, sig2, ell):
        """Exact joint-GP oracle (latent domain) at the given hyperparameters."""
        mu, _ = exact_gp_prediction(
            xtest, xp_use, yp_use, x_j, y_j, sig2, ell, nsp, ns
        )
        return {"latent_rmse": float(
            np.sqrt(np.mean((np.asarray(mu) - f(np.asarray(xtest))) ** 2))
        )}

    if args.compare:
        # the notebook's comparison (GP-with-Derivatives.ipynb cells 30-41):
        # hipgp (ziggy) vs cholesky-whitened SVGP, each with and without the
        # derivative observations, plus the exact joint GP oracle
        records = []
        empty = (xp_j[:0], yp_j[:0])
        for wt in ("ziggy", "cholesky"):
            for use_derivs in (True, False):
                xp_use, yp_use = (xp_j, yp_j) if use_derivs else empty
                rows, _ = fit_and_eval(wt, xp_use, yp_use)
                records.append({"model": wt, "derivative_obs": use_derivs, **rows})
        for use_derivs in (True, False):
            xp_use, yp_use = (xp_j, yp_j) if use_derivs else empty
            last = [r for r in records if r["derivative_obs"] == use_derivs][0]
            rows = exact_rows(xp_use, yp_use, last["sig2"], last["ell"])
            records.append({"model": "exact-gp", "derivative_obs": use_derivs, **rows})
        df = pd.DataFrame(records)
        df.to_csv(os.path.join(args.output_dir, "derivative-comparison.csv"),
                  index=False)
        print(df.to_string())
        return df

    rows, trace = fit_and_eval(args.whitened_type, xp_j, yp_j)
    mu_ex, _ = exact_gp_prediction(
        xtest, xp_j, yp_j, x_j, y_j, rows["sig2"], rows["ell"], nsp, ns
    )
    rows["vs_exact_gp_rmse"] = float(
        np.sqrt(np.mean((np.asarray(mu_ex) - f(np.asarray(xtest))) ** 2))
    )
    df = pd.DataFrame([rows])
    df.to_csv(os.path.join(args.output_dir, "derivative-1d-summary.csv"), index=False)
    np.save(os.path.join(args.output_dir, "loss_trace.npy"), np.asarray(trace))
    print(df.T)
    return df


if __name__ == "__main__":
    main()
