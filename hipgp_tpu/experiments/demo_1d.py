"""Self-contained 1-D fit-and-plot demo.

Parity reference: the `__main__` demo in `ziggy/svgp.py:382-471` — a 1-D
function observed with noise, fit by the dense SVGP baseline AND by HIP-GP
on a 1-D inducing grid, with a comparison plot.

Usage: python -m hipgp_tpu.experiments.demo_1d [--n 500] [--out demo1d.png]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--num-inducing", type=int, default=50)
    p.add_argument("--noise-std", type=float, default=0.2)
    p.add_argument("--out", default="demo1d.png")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..kernels import SqExp
    from ..models import HIPGP, SVGP

    rng = np.random.default_rng(args.seed)
    f = lambda t: np.sin(6 * t) * np.exp(-0.5 * t) + 0.5 * np.cos(12 * t)
    x = np.sort(rng.uniform(0, 2, args.n))
    y = f(x) + args.noise_std * rng.standard_normal(args.n)
    s = np.full(args.n, args.noise_std)
    xt = np.linspace(0, 2, 300)

    grid = jnp.linspace(-0.1, 2.1, args.num_inducing)
    results = {}

    svgp = SVGP(SqExp(), grid[:, None], num_obs=args.n, whitened=True,
                sig2_init=1.0, ell_init=0.15, jitter=1e-5)
    st = svgp.batch_solve(svgp.init_state(), jnp.asarray(x)[:, None],
                          jnp.asarray(y), jnp.asarray(s))
    results["SVGP (dense)"] = svgp.predict(st, jnp.asarray(xt)[:, None])

    hip = HIPGP(SqExp(), [grid], num_obs=args.n, family="mean-field",
                whitened_type="ziggy", sig2_init=1.0, ell_init=0.15,
                noise2_init=args.noise_std**2, jitter=1e-5)
    sth = hip.batch_solve(hip.init_state(), jnp.asarray(x)[:, None],
                          jnp.asarray(y), jnp.asarray(s), maxiter_cg=100)
    results["HIP-GP (mean-field)"] = hip.predict(
        sth, jnp.asarray(xt)[:, None], maxiter_cg=100
    )

    for name, (mu, sig) in results.items():
        rmse = float(np.sqrt(np.mean((np.asarray(mu) - f(xt)) ** 2)))
        print(f"{name}: test rmse {rmse:.4f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.scatter(x, y, s=4, c="grey", alpha=0.4, label="observations")
    ax.plot(xt, f(xt), "k--", lw=1.5, label="truth")
    for name, (mu, sig) in results.items():
        mu, sig = np.asarray(mu), np.asarray(sig)
        (line,) = ax.plot(xt, mu, lw=1.5, label=name)
        ax.fill_between(xt, mu - 2 * sig, mu + 2 * sig, alpha=0.15,
                        color=line.get_color())
    ax.legend()
    fig.savefig(args.out, bbox_inches="tight")
    print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
