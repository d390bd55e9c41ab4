"""Natgrad ELBO/RMSE trajectory parity vs the LIVE reference.

Runs the reference's own natural-gradient settings
(`experiments-hip-gp/run_synthetic_experiment.py`: SGD lr=1e-2, batch 200,
shuffle=False, optional per-batch StepLR 0.99, maxiter_cg=20, cold
expectation-family init) on the SAME synthetic data with the SAME theta1
draw, three ways:

  * ``ref``  — the actual ziggy ``MeanFieldToeplitzGP`` + the
    `ziggy/svi_gp.py:282-388` loop semantics, executed live on CPU torch
    via the `ref_compat` API shims (f64);
  * ``jax``  — this framework's ``svigp_fit`` (f64 on CPU for a clean
    arithmetic comparison, f32 on TPU for the paper-scale run);
  * ``chol`` — the cholesky-whitened twin (exact kn, no truncated PCG) as
    the truncation-free control.

Per epoch it records the reference's logged quantity (mean per-batch ELBO
estimate, `svi_gp.py:338`) and test RMSE, writes one CSV per mode into
``--output-dir``, and in ``compare`` mode prints aligned trajectories with
max deviations.

Reduced scale (default N=2000, M=16^2) is where torch comfortably runs;
``--paper`` switches to N=20k, M=125^2 (reference scale — jax modes only;
the torch reference cannot fit this through natgrad on one CPU in useful
time, and its CUDA path targets a 16 GB V100).
"""
from __future__ import annotations

import argparse
import csv
import json
import math
import os
import time

import numpy as np

from .synthetic_data import make_two_dim_data


def _theta1_init(mprime: int, seed: int) -> np.ndarray:
    """Shared xavier_normal_((M',1)) draw: std = sqrt(2/(M'+1))."""
    rng = np.random.default_rng(seed)
    return math.sqrt(2.0 / (mprime + 1)) * rng.standard_normal(mprime)


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a).reshape(-1) - np.asarray(b).reshape(-1)) ** 2)))


_COV_SIGS = (0.5, 1.0, 2.0, 3.0)


def _coverage_cols(mu, sig, ftruth):
    """{cov0.5, cov1, cov2, cov3}: fraction of test points with
    |f_true - mu| < s * sig — the reference's zscore_to_coverage_vec
    (`ziggy/misc/experiment_util.py:696-737`), recorded per epoch."""
    z = (np.asarray(ftruth).reshape(-1) - np.asarray(mu).reshape(-1)) \
        / np.asarray(sig).reshape(-1)
    return {f"cov{s:g}": float(np.mean(np.abs(z) < s)) for s in _COV_SIGS}


def run_ref(data, args):
    """Live reference natgrad: mirrors `ziggy/svi_gp.py:282-388` exactly
    (SGD on theta, per-batch StepLR, shuffle=False, cold init)."""
    from .ref_compat import import_ziggy

    import_ziggy()
    import torch
    from ziggy import kernels as zk
    from ziggy.hipgp import (BlockToeplitzGP, FullRankToeplitzGP,
                             MeanFieldToeplitzGP)

    torch.manual_seed(args.seed)
    grids = [torch.linspace(-1.0, 1.0, args.m1, dtype=torch.double)
             for _ in range(2)]
    kw = dict(num_obs=args.nobs, sig2_init=args.sig2, ell_init=args.ell,
              noise2_init=args.noise ** 2, learn_kernel=args.learn_kernel,
              learn_noise=False, dtype=torch.double)
    fam = getattr(args, "family", "mean-field")
    if fam == "mean-field":
        mod = MeanFieldToeplitzGP(zk.SqExp(), grids, **kw)
    elif fam == "block":
        mod = BlockToeplitzGP(zk.SqExp(), grids,
                              xblock_size=args.xblock_size, **kw)
    else:
        mod = FullRankToeplitzGP(zk.SqExp(), grids, **kw)
    if fam != "full-rank":  # full-rank initializes theta1 = zeros
        mod.global_theta1.data[:] = torch.tensor(
            _theta1_init(mod.Mprime, args.seed), dtype=torch.double
        )[:, None]

    x = torch.tensor(data["xobs"], dtype=torch.double)
    y = torch.tensor(data["yobs"], dtype=torch.double)[:, None]
    s = torch.tensor(data["sobs"], dtype=torch.double)[:, None]
    xt = torch.tensor(data["xtest"], dtype=torch.double)

    opt = torch.optim.SGD([mod.global_theta1, mod.global_theta2], lr=args.lr)
    hopt = (torch.optim.Adam([mod.log_ell, mod.log_sig2], lr=args.kernel_lr)
            if args.learn_kernel else None)
    sched = (torch.optim.lr_scheduler.StepLR(opt, step_size=1, gamma=args.step_decay)
             if args.schedule_lr else None)
    nb = -(-args.nobs // args.batch_size)
    rows = []
    for epoch in range(args.epochs):
        t0 = time.time()
        elbos = []
        for b in range(nb):  # DataLoader(shuffle=False) order
            sl = slice(b * args.batch_size, min((b + 1) * args.batch_size, args.nobs))
            opt.zero_grad()
            if hopt is not None:
                hopt.zero_grad()
            lval = mod.elbo_and_grad(
                xbatch=x[sl], ybatch=y[sl], noise_std_batch=s[sl],
                maxiter_cg=args.maxiter_cg,
            )
            if hopt is not None:  # `ziggy/svi_gp.py:322-326`: hyper Adam
                (-lval).backward()  # step precedes the natgrad SGD step
                hopt.step()
            opt.step()
            if sched is not None:
                sched.step()
            elbos.append(float(lval))
        with torch.no_grad():
            mu, sig = mod.predict(xt, maxiter_cg=args.predict_maxiter_cg)
        row = {
            "epoch": epoch, "elbo": float(np.mean(elbos)),
            "rmse": _rmse(mu.squeeze(-1).numpy(), data["ftest"]),
            "secs": time.time() - t0,
            **_coverage_cols(mu.squeeze(-1).numpy(), sig.squeeze(-1).numpy(),
                             data["ftest"]),
        }
        if args.learn_kernel:
            row["sig2"] = float(torch.exp(mod.log_sig2))
            row["ell"] = float(torch.exp(mod.log_ell))
        rows.append(row)
        print("ref", rows[-1], flush=True)
    return rows


def run_jax(data, args, whitened_type="ziggy", tag="jax"):
    """Same protocol through svigp_fit (+ the cholesky-whitened control)."""
    import jax

    if not args.paper:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        from ..utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
    import jax.numpy as jnp

    from ..infer.fit import FitConfig, batch_predict, svigp_fit
    from ..kernels import SqExp
    from ..models.hipgp import HIPGP

    dt = jnp.float32 if args.paper else jnp.float64
    grids = [jnp.linspace(-1.0, 1.0, args.m1, dtype=dt) for _ in range(2)]
    fam = getattr(args, "family", "mean-field")
    model = HIPGP(
        SqExp(), grids, num_obs=args.nobs, family=fam,
        xblock_size=args.xblock_size,
        whitened_type=whitened_type, sig2_init=args.sig2, ell_init=args.ell,
        noise2_init=args.noise ** 2,
    )
    state = model.init_state()
    if fam != "full-rank":  # full-rank initializes theta1 = zeros
        state = state.replace(
            theta1=jnp.asarray(_theta1_init(model.Mprime, args.seed), dt)
        )

    x = jnp.asarray(data["xobs"], dt)
    y = jnp.asarray(data["yobs"], dt)
    s = jnp.asarray(data["sobs"], dt)
    xt = jnp.asarray(data["xtest"], dt)

    cfg = FitConfig(
        epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
        schedule_lr=args.schedule_lr, step_decay=args.step_decay,
        maxiter_cg=args.maxiter_cg, shuffle=False, seed=args.seed,
        learn_kernel=args.learn_kernel, kernel_lr=args.kernel_lr,
        epoch_log_interval=0,
    )
    rows = []

    def cb(epoch, model_, state_, trace):
        t0 = time.time()
        mu, sig = batch_predict(
            model_, state_, xt, maxiter_cg=args.predict_maxiter_cg
        )
        nb = -(-args.nobs // args.batch_size)
        row = {
            "epoch": epoch,
            "elbo": float(np.mean(trace[-nb:])),
            "rmse": _rmse(mu, data["ftest"]),
            "secs": time.time() - t0,
            **_coverage_cols(mu, sig, data["ftest"]),
        }
        if args.learn_kernel:
            import jax.numpy as _jnp

            row["sig2"] = float(_jnp.exp(state_.log_sig2))
            row["ell"] = float(_jnp.exp(_jnp.atleast_1d(state_.log_ell))[0])
        rows.append(row)
        print(tag, rows[-1], flush=True)

    _, rep = svigp_fit(model, state, x, y, s, cfg, epoch_callback=cb,
                       verbose=False, theta2_warmstart=args.warmstart,
                       natgrad_safe_lr=getattr(args, "safe_lr", "warn"))
    if rep.get("natgrad_rho") is not None:
        print(f"{tag} natgrad rho={rep['natgrad_rho']:.1f} "
              f"lr_crit={rep['natgrad_lr_crit']:.3g} "
              f"lr_used={rep['lr_used']:.3g}", flush=True)
    return rows


def _induce_grid(m1, to_jax=True):
    import numpy as _np

    g = _np.linspace(-1.0, 1.0, m1)
    xx, yy = _np.meshgrid(g, g, indexing="ij")
    return _np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def run_ref_svgp(data, args):
    """Live reference dense SVGP natgrad (`ziggy/svgp.py`, f64 — it asserts
    doubles) under the same `svi_gp.py` loop semantics."""
    from .ref_compat import import_ziggy

    import_ziggy()
    import torch
    from ziggy import kernels as zk
    from ziggy.svgp import SVGP as RefSVGP

    torch.manual_seed(args.seed)
    xind = torch.tensor(_induce_grid(args.m1), dtype=torch.double)
    # whitened=True: the reference's unwhitened kn path hardcodes .cuda()
    # (`ziggy/svgp.py:124`, its known device bug) — the whitened branch is
    # the CPU-safe reference mode, mirrored on the jax side.
    mod = RefSVGP(zk.SqExp(), xind, num_obs=args.nobs, sig2_init=args.sig2,
                  ell_init=args.ell, learn_kernel=False, whitened=True,
                  dtype=torch.double)

    # minimal fix for the reference bug at `ziggy/svgp.py:297`:
    # elbo_and_grad calls _make_kn_vectors(Knm) bare and unpacks (kn, Kmm),
    # but the default is return_Kmm=False.  Only the bare call (None
    # sentinel) gets the tuple; the explicit return_Kmm=False call sites
    # (:150, :199, :257) keep their single-return contract.
    orig_mkv = mod._make_kn_vectors

    def _mkv(Knm, Kmm=None, return_Kmm=None):
        if return_Kmm is None:
            return orig_mkv(Knm, Kmm=Kmm, return_Kmm=True)
        return orig_mkv(Knm, Kmm=Kmm, return_Kmm=return_Kmm)

    mod._make_kn_vectors = _mkv

    x = torch.tensor(data["xobs"], dtype=torch.double)
    y = torch.tensor(data["yobs"], dtype=torch.double)[:, None]
    s = torch.tensor(data["sobs"], dtype=torch.double)[:, None]
    xt = torch.tensor(data["xtest"], dtype=torch.double)

    opt = torch.optim.SGD([mod.global_theta1, mod.global_theta2], lr=args.lr)
    sched = (torch.optim.lr_scheduler.StepLR(opt, step_size=1,
                                             gamma=args.step_decay)
             if args.schedule_lr else None)
    nb = -(-args.nobs // args.batch_size)
    rows = []
    for epoch in range(args.epochs):
        t0 = time.time()
        elbos = []
        for b in range(nb):
            sl = slice(b * args.batch_size,
                       min((b + 1) * args.batch_size, args.nobs))
            opt.zero_grad()
            lval = mod.elbo_and_grad(x[sl], y[sl], s[sl])
            opt.step()
            if sched is not None:
                sched.step()
            elbos.append(float(lval))
        with torch.no_grad():
            mu, _ = mod.predict(xt)
        rows.append({
            "epoch": epoch, "elbo": float(np.mean(elbos)),
            "rmse": _rmse(mu.squeeze(-1).numpy(), data["ftest"]),
            "secs": time.time() - t0,
        })
        print("ref-svgp", rows[-1], flush=True)
    return rows


def run_jax_svgp(data, args):
    """Same dense-SVGP protocol through svigp_fit (f64 CPU, as the
    reference requires doubles).

    Two documented reference quirks are mirrored for comparability:
    * `ziggy/svgp.py:356-357` scales the natural gradient by 1000/N before
      SGD (a hard-coded rescale our SVGP deliberately drops) — reproduced
      here by scaling the learning rate;
    * `ziggy/svgp.py:318-326` omits the Gaussian normalizer
      -0.5 ln(2 pi sigma^2) from the per-point data term (its own HIPGP
      includes it) — our reported ELBO is shifted into the reference's
      convention.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ..infer.fit import FitConfig, batch_predict, svigp_fit
    from ..kernels import SqExp
    from ..models.svgp import SVGP

    dt = jnp.float64
    model = SVGP(SqExp(), jnp.asarray(_induce_grid(args.m1), dt),
                 num_obs=args.nobs, sig2_init=args.sig2, ell_init=args.ell,
                 whitened=True)
    state = model.init_state()

    normalizer = float(np.mean(np.log(data["sobs"])) + 0.5 * np.log(2 * np.pi))

    cfg = FitConfig(
        epochs=args.epochs, batch_size=args.batch_size,
        lr=args.lr * 1000.0 / args.nobs,
        schedule_lr=args.schedule_lr, step_decay=args.step_decay,
        maxiter_cg=args.maxiter_cg, shuffle=False, seed=args.seed,
        epoch_log_interval=0,
    )
    rows = []

    def cb(epoch, model_, state_, trace):
        t0 = time.time()
        mu, _ = batch_predict(model_, state_, jnp.asarray(data["xtest"], dt))
        nb = -(-args.nobs // args.batch_size)
        rows.append({
            "epoch": epoch,
            "elbo": float(np.mean(trace[-nb:])) + normalizer,
            "rmse": _rmse(mu, data["ftest"]),
            "secs": time.time() - t0,
        })
        print("jax-svgp", rows[-1], flush=True)

    svigp_fit(model, state, jnp.asarray(data["xobs"], dt),
              jnp.asarray(data["yobs"], dt), jnp.asarray(data["sobs"], dt),
              cfg, epoch_callback=cb, verbose=False)
    return rows


def run_solve(data, args):
    """Closed-form mean-field optimum at the SAME hypers — the natgrad
    trajectory's asymptote (gap target for RESULTS §12)."""
    import jax

    if not args.paper:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    else:
        from ..utils.jaxcache import enable_compilation_cache

        enable_compilation_cache()
    import jax.numpy as jnp

    from ..infer.fit import batch_predict
    from ..kernels import SqExp
    from ..models.hipgp import HIPGP

    dt = jnp.float32 if args.paper else jnp.float64
    grids = [jnp.linspace(-1.0, 1.0, args.m1, dtype=dt) for _ in range(2)]
    model = HIPGP(
        SqExp(), grids, num_obs=args.nobs, family="mean-field",
        sig2_init=args.sig2, ell_init=args.ell, noise2_init=args.noise ** 2,
    )
    t0 = time.time()
    new = model.batch_solve(
        model.init_state(), jnp.asarray(data["xobs"], dt),
        jnp.asarray(data["yobs"], dt), jnp.asarray(data["sobs"], dt),
        batch_size=5000, maxiter_cg=args.maxiter_cg,
        mean_solver="gram" if args.paper else "dense",
    )
    mu, sig = batch_predict(
        model, new, jnp.asarray(data["xtest"], dt), batch_size=1000,
        maxiter_cg=args.predict_maxiter_cg,
    )
    row = {"epoch": -1, "elbo": float("nan"),
           "rmse": _rmse(mu, data["ftest"]), "secs": time.time() - t0,
           **_coverage_cols(mu, sig, data["ftest"])}
    print("solve", row, flush=True)
    return [row]


def _write(rows, path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print("wrote", path)


def _read(path):
    with open(path) as f:
        return [
            {k: float(v) for k, v in r.items()} for r in csv.DictReader(f)
        ]


def compare(args):
    out = {}
    pairs = [("ref.csv", ("jax", "chol"))]
    if os.path.exists(os.path.join(args.output_dir, "ref-svgp.csv")):
        pairs.append(("ref-svgp.csv", ("jax-svgp",)))
    for refname, tags in pairs:
        _compare_one(args, out, refname, tags)
    with open(os.path.join(args.output_dir, "compare.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


def _compare_one(args, out, refname, tags):
    refpath = os.path.join(args.output_dir, refname)
    if not os.path.exists(refpath):
        return
    ref = _read(refpath)
    for tag in tags:
        p = os.path.join(args.output_dir, f"{tag}.csv")
        if not os.path.exists(p):
            continue
        got = _read(p)
        n = min(len(ref), len(got))
        delbo = [abs(ref[i]["elbo"] - got[i]["elbo"]) for i in range(n)]
        drmse = [abs(ref[i]["rmse"] - got[i]["rmse"]) for i in range(n)]
        out[tag] = {
            "epochs": n,
            "max_abs_elbo_dev": max(delbo),
            "max_abs_rmse_dev": max(drmse),
            "final_elbo": (ref[n - 1]["elbo"], got[n - 1]["elbo"]),
            "final_rmse": (ref[n - 1]["rmse"], got[n - 1]["rmse"]),
        }
        if "cov1" in ref[0] and "cov1" in got[0]:
            for s in _COV_SIGS:
                c = f"cov{s:g}"
                out[tag][f"max_abs_{c}_dev"] = max(
                    abs(ref[i][c] - got[i][c]) for i in range(n))
                out[tag][f"final_{c}"] = (ref[n - 1][c], got[n - 1][c])
        if "ell" in ref[0] and "ell" in got[0]:
            out[tag]["max_abs_ell_dev"] = max(
                abs(ref[i]["ell"] - got[i]["ell"]) for i in range(n))
            out[tag]["max_abs_sig2_dev"] = max(
                abs(ref[i]["sig2"] - got[i]["sig2"]) for i in range(n))
            out[tag]["final_ell"] = (ref[n - 1]["ell"], got[n - 1]["ell"])
            out[tag]["final_sig2"] = (ref[n - 1]["sig2"], got[n - 1]["sig2"])
        print(tag, json.dumps(out[tag], indent=1), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modes", nargs="+",
                   default=["ref", "jax", "chol", "compare"],
                   choices=["ref", "jax", "chol", "solve", "ref-svgp", "jax-svgp", "compare"])
    p.add_argument("--nobs", type=int, default=2000)
    p.add_argument("--ntest", type=int, default=1000)
    p.add_argument("--m1", type=int, default=16)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--schedule-lr", action="store_true")
    p.add_argument("--step-decay", type=float, default=0.99)
    p.add_argument("--maxiter-cg", type=int, default=20)
    p.add_argument("--predict-maxiter-cg", type=int, default=50)
    p.add_argument("--learn-kernel", action="store_true")
    p.add_argument("--kernel-lr", type=float, default=1e-3)
    p.add_argument("--family", default="mean-field",
                   choices=["mean-field", "block", "full-rank"])
    p.add_argument("--xblock-size", type=int, default=5)
    p.add_argument("--ell", type=float, default=0.2)
    p.add_argument("--sig2", type=float, default=None,
                   help="default: var(y) - noise^2, the reference's rule")
    p.add_argument("--noise", type=float, default=0.1)
    p.add_argument("--gridnum", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--warmstart", action="store_true",
                   help="theta2 warm start (jax modes; beyond-reference)")
    p.add_argument("--safe-lr", default="warn",
                   choices=["warn", "clamp", "off"],
                   help="natgrad stability policy (infer.svigp_fit "
                        "natgrad_safe_lr; needs --warmstart)")
    p.add_argument("--paper", action="store_true",
                   help="N=20k, M=125^2 on the default jax backend (TPU)")
    p.add_argument("--output-dir", default="results/natgrad-trajectory")
    args = p.parse_args(argv)

    if args.paper:
        args.nobs, args.m1 = 20000, 125
        args.modes = [m for m in args.modes if m not in ("ref", "compare")]

    data = make_two_dim_data(
        Nobs=args.nobs, Ntest=args.ntest, noise_std=args.noise,
        gridnum=args.gridnum, seed=args.seed,
    )
    if args.sig2 is None:
        args.sig2 = float(np.var(data["yobs"]) - args.noise ** 2)
        print(f"sig2 from data: {args.sig2:.4f}")

    if "ref" in args.modes:
        _write(run_ref(data, args), os.path.join(args.output_dir, "ref.csv"))
    if "jax" in args.modes:
        _write(run_jax(data, args, "ziggy", "jax"),
               os.path.join(args.output_dir, "jax.csv"))
    if "solve" in args.modes:
        _write(run_solve(data, args), os.path.join(args.output_dir, "solve.csv"))
    if "ref-svgp" in args.modes:
        _write(run_ref_svgp(data, args),
               os.path.join(args.output_dir, "ref-svgp.csv"))
    if "jax-svgp" in args.modes:
        _write(run_jax_svgp(data, args),
               os.path.join(args.output_dir, "jax-svgp.csv"))
    if "chol" in args.modes:
        _write(run_jax(data, args, "cholesky", "chol"),
               os.path.join(args.output_dir, "chol.csv"))
    if "compare" in args.modes:
        compare(args)


if __name__ == "__main__":
    main()
