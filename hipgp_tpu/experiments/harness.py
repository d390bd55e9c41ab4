"""Experiment harness: fit, predict, evaluate, and persist one run.

Parity reference: `ziggy/misc/experiment_util.py:13-233`
(svigp_fit_predict_and_save) + `:744-972` (standard_epoch_callback), rebuilt
around the pure model/infer layers: a typed config, npz checkpoints with
true resume support, prediction archives, metrics CSVs matching the
reference's schemas (noise_reduction.csv, coverage_table.csv,
time_report.csv, elbo trace), and figures.
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from .. import viz
from ..infer import FitConfig, batch_predict, svigp_fit
from ..kernels import kernel_from_name
from ..models import HIPGP, SVGP
from ..utils import checkpoint as ckpt
from ..utils import metrics

__all__ = ["fit_predict_and_save", "make_model", "evaluate_and_save"]


def make_model(
    model_class: str,
    kernel_name: str,
    xinduce_grids: Sequence[np.ndarray],
    num_obs: int,
    sig2_init: float,
    ell_init: float,
    noise2_init: float = 1.0,
    init_Svar: float = 1.0,
    whitened_type: str = "ziggy",
    learn_kernel: bool = False,
    learn_noise: bool = False,
    jitter: float = 1e-3,
    block_sizes: Optional[Sequence[int]] = None,
    support_integrated_obs: bool = False,
    grid_shards: Optional[int] = None,
    dtype=jnp.float32,
):
    """Model factory matching the reference CLI contract
    (`experiment_util.py:104-165`): model_class in {'mean-field',
    'block-diagonal[-*]', 'full-rank', 'SVGP'}.

    ``grid_shards``: pad the circulant embedding so the whitened state
    shards evenly over an n-way 'grid' mesh axis (model parallelism)."""
    kern = kernel_from_name(kernel_name)
    grids = [jnp.asarray(g, dtype) for g in xinduce_grids]
    common = dict(
        num_obs=num_obs,
        sig2_init=sig2_init,
        ell_init=ell_init,
        noise2_init=noise2_init,
        init_Svar=init_Svar,
        whitened_type=whitened_type,
        learn_kernel=learn_kernel,
        learn_noise=learn_noise,
        jitter=jitter,
        support_integrated_obs=support_integrated_obs,
        grid_shards=grid_shards,
        dtype=dtype,
    )
    if model_class == "mean-field":
        return HIPGP(kern, grids, family="mean-field", **common)
    if model_class.startswith("block-diagonal") or model_class == "block":
        return HIPGP(kern, grids, family="block", block_sizes=block_sizes, **common)
    if model_class == "full-rank":
        # reference uses the 'standard' parameterization for full-rank
        return HIPGP(
            kern, grids, family="full-rank", parameterization="standard", **common
        )
    if model_class == "SVGP":
        mesh = jnp.meshgrid(*grids, indexing="ij")
        xinduce = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
        return SVGP(
            kern,
            xinduce,
            num_obs=num_obs,
            whitened=False,
            sig2_init=sig2_init,
            ell_init=ell_init,
            init_Svar=init_Svar,
            jitter=jitter,
            support_integrated_obs=support_integrated_obs,
            dtype=dtype,
        )
    raise ValueError(
        f"model_class={model_class!r}; choose mean-field | block-diagonal | "
        "full-rank | SVGP"
    )


def empirical_sig2_init(xobs: np.ndarray, yobs: np.ndarray) -> float:
    """Distance-slope regression init for the marginal variance
    (`experiment_util.py:71-76`).

    The reference formula degenerates when y has no |x| trend (slope ~ 0
    squares to a near-zero prior variance, which collapses the posterior
    mean to zero — observed sig2 = 1.5e-9 on the UK-housing surrogate
    surface).  Clamp to a var(y)-relative range and warn, since var(y) is
    the right scale when the regression is uninformative."""
    dobs = np.sqrt(np.sum(np.asarray(xobs) ** 2, axis=-1))
    y = np.asarray(yobs).reshape(-1, 1)
    slope, *_ = np.linalg.lstsq(dobs[:, None], y, rcond=None)
    sig2 = float(slope[0, 0] ** 2)
    vy = float(np.var(np.asarray(yobs)))
    lo, hi = 1e-3 * vy, 1e2 * vy
    if not (lo <= sig2 <= hi):
        import warnings

        fallback = vy if vy > 0 else 1.0
        warnings.warn(
            f"empirical sig2 init {sig2:.3e} is degenerate relative to "
            f"var(y) = {vy:.3e}; falling back to var(y) = {fallback:.3e} — "
            "pass an explicit sig2_init to override",
            RuntimeWarning,
        )
        return float(fallback)
    return sig2


def evaluate_and_save(
    odir: str,
    model,
    state,
    *,
    xtest=None, ftest=None, etest=None,
    xvalid=None, fvalid=None, evalid=None,
    xgrid=None, fgrid=None, egrid=None,
    do_integrated_predictions: bool = False,
    predict_maxiter_cg: int = 50,
    predict_ksemi_method: str = "analytic",
    predict_ksemi_samps: int = 200,
    elbo_trace=None,
    hyper_traces: Optional[Dict] = None,
    data_noise_std: Optional[float] = None,
    train_elbo: Optional[float] = None,
    # larger than the reference's 100/10-point chunks (`svi_gp.py:78-97`):
    # each chunk is one device dispatch (~45 ms through the TPU tunnel), so
    # big-test-set evaluation is dispatch-bound below ~4k points per chunk
    predict_batch_size: int = 4096,
    make_plots: bool = True,
    grid_shape=None,
    grid_extent=None,
    predict_fn: Optional[Callable] = None,
):
    """The standard epoch callback: checkpoint, predict on
    valid/test/grid (latent + optionally integrated), write metrics CSVs and
    figures.  Returns (pdict, eval_times).

    ``predict_fn(x, integrated_obs=...) -> (mu, sig)`` overrides the default
    single-device ``batch_predict`` — the hook the parallel harness paths
    use (e.g. `mp_predict` keeping the kn contractions grid-sharded)."""
    os.makedirs(odir, exist_ok=True)
    ckpt.save_checkpoint(odir, state)
    if elbo_trace is not None:
        np.save(os.path.join(odir, "elbo_trace.npy"), np.asarray(elbo_trace))
        if make_plots:
            viz.plot_elbo_trace(elbo_trace, os.path.join(odir, "elbo.jpg"))
    for nm, tr in (hyper_traces or {}).items():
        if tr:
            np.save(os.path.join(odir, f"{nm}_trace.npy"), np.asarray(tr))

    pdict: Dict[str, np.ndarray] = {}
    times: Dict[str, float] = {}

    def _predict(x, integrated_obs=False):
        if predict_fn is not None:
            return predict_fn(x, integrated_obs=integrated_obs)
        kw = {}
        if integrated_obs:
            kw = dict(
                integrated_obs=True,
                semi_integrated_estimator=predict_ksemi_method,
                semi_integrated_samps=predict_ksemi_samps,
            )
        return batch_predict(
            model, state, x, batch_size=predict_batch_size,
            maxiter_cg=predict_maxiter_cg, **kw,
        )

    def run_predictions(tag, x, f_true, e_true):
        if x is None:
            return
        x = jnp.asarray(x, model.dtype)
        t0 = time.time()
        fmu, fsig = _predict(x)
        times[f"f{tag}_eval"] = time.time() - t0
        pdict[f"fmu_{tag}"] = np.asarray(fmu)
        pdict[f"fsig_{tag}"] = np.asarray(fsig)
        if f_true is not None:
            pdict[f"f{tag}"] = np.asarray(f_true).reshape(-1)
        if do_integrated_predictions:
            t0 = time.time()
            emu, esig = _predict(x, integrated_obs=True)
            times[f"e{tag}_eval"] = time.time() - t0
            pdict[f"emu_{tag}"] = np.asarray(emu)
            pdict[f"esig_{tag}"] = np.asarray(esig)
            if e_true is not None:
                pdict[f"e{tag}"] = np.asarray(e_true).reshape(-1)

    run_predictions("valid", xvalid, fvalid, evalid)
    run_predictions("test", xtest, ftest, etest)
    run_predictions("grid", xgrid, fgrid, egrid)

    ckpt.save_predictions(os.path.join(odir, "predictions.npz"), pdict)

    # metrics CSVs (reference: errordf-summary.csv, noise_reduction.csv,
    # coverage_table.csv)
    if "ftest" in pdict:
        df = metrics.error_frame({"model": pdict}, data_type="test")
        df.describe().to_csv(os.path.join(odir, "errordf-summary.csv"))
        if data_noise_std is not None:
            ndf = metrics.noise_comparison_frame(
                pdict, data_noise_std,
                integrated_obs=do_integrated_predictions and "etest" in pdict,
                train_elbo=train_elbo,
                eval_valid="fvalid" in pdict,
            )
            ndf.to_csv(os.path.join(odir, "noise_reduction.csv"))
        z = {"model": np.asarray(df["f zscore"])}
        if do_integrated_predictions and "etest" in pdict:
            z["model e"] = np.asarray(df["e zscore"])
        metrics.coverage_table(z).to_csv(os.path.join(odir, "coverage_table.csv"))
        if make_plots:
            viz.plot_zscore_histogram(
                z["model"], path=os.path.join(odir, "f-zscore-histogram.pdf")
            )
            viz.plot_qq(z, path=os.path.join(odir, "qq.pdf"))

    if (
        make_plots
        and do_integrated_predictions
        and xtest is not None
        and np.ndim(xtest) == 2
        and np.shape(xtest)[1] == 3
        and "etest" in pdict
    ):
        # dust-map 3-D/2-D posterior scatter figures
        # (`experiments-hip-gp/exp_utils.py:74-252`)
        zmid = float(np.median(np.asarray(xtest)[:, 2]))
        viz.plot_domain_result(
            odir,
            {"xtest": np.asarray(xtest), "etest": pdict["etest"],
             "emu_test": pdict["emu_test"], "esig_test": pdict["esig_test"]},
            slice_center=zmid,
            slice_halfwidth=0.05 * (np.ptp(np.asarray(xtest)[:, 2]) + 1e-12),
        )

    if make_plots and "fmu_grid" in pdict and grid_shape is not None:
        extent = grid_extent or (0, 1, 0, 1)
        viz.plot_posterior_grid(
            pdict["fmu_grid"], pdict["fsig_grid"], grid_shape, extent,
            path=os.path.join(odir, "posterior-grid.jpg"),
        )
        if fgrid is not None:
            viz.plot_comparison(
                np.asarray(fgrid).reshape(grid_shape),
                pdict["fmu_grid"].reshape(grid_shape),
                extent,
                path=os.path.join(odir, "comparison-grid.jpg"),
            )
    return pdict, times


def fit_predict_and_save(
    name: str,
    xobs, yobs, sobs,
    xinduce_grids,
    model_class: str = "mean-field",
    kernel: str = "SqExp",
    sig2_init="empirical",
    ell_init: float = 0.05,
    noise2_init: float = 1.0,
    init_Svar: float = 1.0,
    whitened_type: str = "ziggy",
    block_sizes: Optional[Sequence[int]] = None,
    jitter: float = 1e-3,
    fit_method: str = "natgrad",
    fit_config: Optional[FitConfig] = None,
    batch_solve_bsz: int = -1,
    maxiter_cg: int = 10,
    mean_solver: str = "dense",
    mean_solver_maxiter: int = 200,
    mean_solver_tol: float = 1e-8,
    theta2_warmstart: bool = False,
    natgrad_safe_lr: str = "warn",
    xtest=None, etest=None, ftest=None,
    xvalid=None, evalid=None, fvalid=None,
    xgrid=None, egrid=None, fgrid=None,
    grid_shape=None, grid_extent=None,
    output_dir: str = "./model-output/",
    eval_epochs: int = 0,
    eval_epoch_plots: bool = False,
    parallel: Optional[str] = None,
    mesh=None,
    grid_shards: Optional[int] = None,
    dtype=jnp.float32,
    eval_only_state: Optional[str] = None,
):
    """Fit + evaluate one model, persisting all artifacts under
    ``output_dir/name`` — the single entry point every experiment driver
    calls (reference `experiment_util.py:13-233`).

    ``eval_epochs=k`` (k > 0) runs the full evaluation (checkpoint,
    predictions, metrics CSVs) every k-th epoch into
    ``odir/epoch_output/epoch_N/`` — the reference's
    ``standard_epoch_callback`` behavior (`experiment_util.py:744-972`) —
    producing per-epoch RMSE/coverage trajectories; per-epoch wall-clock
    lands as one row per epoch in ``time_report.csv``
    (`ziggy/svi_gp.py:426-440`).

    ``parallel`` routes the fit over a device mesh (the capability the
    reference's single-device harness lacks):

    * 'dp' — exact data parallelism: natgrad fits run `svigp_fit` with
      batch rows committed to a 'dp' mesh axis; full-batch solves run
      `dp_batch_solve`.  Any model/family.  Default mesh: all devices.
    * 'mp' — model parallelism (mean-field/block HIPGP): the whitened
      state, whitening solve, and every kn contraction shard over a 'grid'
      axis,
      composed with 'dp' over rows (`mp_svigp_fit` / `mp_batch_solve` /
      `mp_predict`).  Default mesh: (1, n_devices) ('dp', 'grid').
      The model is built with matching `grid_shards` padding.

    Pass ``mesh`` to control the shape (axis names must be 'dp' / 'grid').

    Returns (model, state, report).
    """
    if parallel not in (None, "dp", "mp"):
        raise ValueError(f"parallel={parallel!r}; choose None | 'dp' | 'mp'")
    mp_ok = model_class == "mean-field" or model_class.startswith("block")
    if parallel == "mp" and not mp_ok:
        raise ValueError(
            "parallel='mp' supports the mean-field and block families"
        )
    if parallel and mesh is None:
        import jax
        from jax.sharding import Mesh as _Mesh

        devs = np.array(jax.devices())
        if parallel == "dp":
            mesh = _Mesh(devs, ("dp",))
        else:
            mesh = _Mesh(devs.reshape(1, -1), ("dp", "grid"))

    odir = os.path.join(output_dir, name)
    os.makedirs(odir, exist_ok=True)

    xobs = np.asarray(xobs)
    yobs = np.asarray(yobs).reshape(-1)
    sobs = None if sobs is None else np.asarray(sobs).reshape(-1)

    if sig2_init == "empirical":
        # distance-slope heuristic — appropriate when y grows with ||x||
        # (the dust line-integral geometry, `experiment_util.py:71-76`)
        sig2_init = empirical_sig2_init(xobs, yobs)
    elif sig2_init == "marginal":
        # var(y) - mean noise^2 (`run_synthetic_experiment.py:186-188`)
        nvar = 0.0 if sobs is None else float(np.mean(np.asarray(sobs) ** 2))
        sig2_init = max(float(np.var(yobs)) - nvar, 1e-3)

    cfg = fit_config or FitConfig()
    cfg = dataclasses.replace(cfg, maxiter_cg=maxiter_cg)
    integrated = cfg.integrated_obs
    # analytic semi-integrated covariances exist only for SqExp; fall back
    # to the MC estimator otherwise (reference `ziggy/svi_gp.py:225-231`)
    if integrated and kernel != "SqExp":
        if cfg.semi_integrated_estimator == "analytic":
            cfg = dataclasses.replace(
                cfg,
                semi_integrated_estimator="mc-biased",
                predict_ksemi_method="mc-biased",
            )

    model = make_model(
        model_class, kernel, xinduce_grids,
        num_obs=len(xobs),
        sig2_init=float(sig2_init),
        ell_init=ell_init,
        noise2_init=noise2_init,
        init_Svar=init_Svar,
        whitened_type=whitened_type,
        learn_kernel=cfg.learn_kernel,
        learn_noise=cfg.learn_noise,
        jitter=jitter,
        block_sizes=block_sizes,
        support_integrated_obs=integrated,
        # mp REQUIRES the shard padding; otherwise honor the caller's value
        # (e.g. building the identical padded model for single-device
        # comparison runs — padding changes M', hence the init, never K)
        grid_shards=(int(mesh.shape["grid"]) if parallel == "mp"
                     else grid_shards),
        dtype=dtype,
    )
    state = model.init_state() if hasattr(model, "init_state") else None

    predict_fn_of = lambda state_: None
    if parallel == "mp":
        from ..parallel import mp_predict

        def predict_fn_of(state_):
            def pf(x, integrated_obs=False):
                kw = {}
                if integrated_obs:
                    kw = dict(
                        integrated_obs=True,
                        semi_integrated_estimator=cfg.predict_ksemi_method,
                        semi_integrated_samps=cfg.predict_ksemi_samps,
                    )
                return mp_predict(
                    model, state_, jnp.asarray(x, model.dtype), mesh,
                    maxiter_cg=cfg.predict_maxiter_cg, **kw,
                )

            return pf

    with open(os.path.join(odir, "fit_params.json"), "w") as f:
        json.dump(
            {
                "model_class": model_class, "kernel": kernel,
                "sig2_init": float(sig2_init), "ell_init": float(ell_init),
                "whitened_type": whitened_type, "fit_method": fit_method,
                "parallel": parallel or "none",
                "mesh_shape": (dict(mesh.shape) if mesh is not None else None),
                **{k: v for k, v in dataclasses.asdict(cfg).items()
                   if isinstance(v, (int, float, str, bool))},
            },
            f, indent=2,
        )

    report: Dict = {}
    epoch_eval_rows = []
    epoch_callback = None
    if eval_epochs and fit_method == "natgrad":
        every = int(eval_epochs)

        def epoch_callback(epoch, model_, state_, trace):
            if (epoch + 1) % every and epoch != cfg.epochs - 1:
                return
            edir = os.path.join(odir, "epoch_output", f"epoch_{epoch}")
            t0 = time.time()
            _, etimes = evaluate_and_save(
                edir, model_, state_,
                xtest=xtest, ftest=ftest, etest=etest,
                xvalid=xvalid, fvalid=fvalid, evalid=evalid,
                xgrid=xgrid, fgrid=fgrid, egrid=egrid,
                do_integrated_predictions=integrated,
                predict_maxiter_cg=cfg.predict_maxiter_cg,
                predict_ksemi_method=cfg.predict_ksemi_method,
                predict_ksemi_samps=cfg.predict_ksemi_samps,
                elbo_trace=trace,
                data_noise_std=None if sobs is None else float(np.mean(sobs)),
                grid_shape=grid_shape,
                grid_extent=grid_extent,
                make_plots=eval_epoch_plots,
                predict_fn=predict_fn_of(state_),
            )
            epoch_eval_rows.append(
                {"epoch": epoch, "eval_total": time.time() - t0, **etimes}
            )

    t_start = time.time()
    if eval_only_state is not None:
        # crash recovery: restore a saved state (e.g. after an eval-phase
        # OOM) and skip the fit — evaluation + artifacts only
        state = ckpt.load_pytree(eval_only_state, state)
        report = {"elbo_trace": None, "epoch_elbos": []}
        train_elbo = None
        fit_method = "eval-only"
    elif fit_method == "natgrad":
        if parallel == "mp":
            from ..parallel import mp_svigp_fit

            state, report = mp_svigp_fit(
                model, state, xobs, yobs, sobs, cfg, mesh,
                verbose=True,
                theta2_warmstart=theta2_warmstart,
                natgrad_safe_lr=natgrad_safe_lr,
                epoch_callback=epoch_callback,
            )
        elif parallel == "dp":
            from ..parallel import make_dp_data_shard_fn, round_batch_to_mesh

            cfg_dp = round_batch_to_mesh(cfg, mesh, len(xobs))
            state, report = svigp_fit(
                model, state, xobs, yobs, sobs, cfg_dp,
                verbose=True,
                theta2_warmstart=theta2_warmstart,
                natgrad_safe_lr=natgrad_safe_lr,
                epoch_callback=epoch_callback,
                data_shard_fn=make_dp_data_shard_fn(mesh),
            )
        else:
            state, report = svigp_fit(
                model, state, xobs, yobs, sobs, cfg,
                verbose=True,
                theta2_warmstart=theta2_warmstart,
                natgrad_safe_lr=natgrad_safe_lr,
                epoch_callback=epoch_callback,
            )
        train_elbo = report["epoch_elbos"][-1] if report["epoch_elbos"] else None
    elif fit_method == "full-batch":
        import jax

        xj = jnp.asarray(xobs, model.dtype)
        yj = jnp.asarray(yobs, model.dtype)
        sj = None if sobs is None else jnp.asarray(sobs, model.dtype)

        if parallel == "mp":
            from ..parallel import mp_batch_solve, mp_shard_state

            state, elbo = mp_batch_solve(
                model, mp_shard_state(state, mesh), xj, yj, sj, mesh,
                batch_size=(batch_solve_bsz if batch_solve_bsz > 0
                            else len(xobs)),
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated,
                semi_integrated_estimator=cfg.semi_integrated_estimator,
                semi_integrated_samps=cfg.num_semi_mc_samples,
                compute_elbo=True,
                # mp has no dense M'^2 path; 'gram'/'factored' map through,
                # anything else takes the sharded-kn CG mean solve
                mean_solver=(mean_solver if mean_solver in ("gram", "factored")
                             else "cg"),
            )
        elif parallel == "dp":
            from ..parallel import dp_batch_solve

            state, elbo = dp_batch_solve(
                model, state, xj, yj, sj, mesh,
                batch_size=batch_solve_bsz,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated,
                semi_integrated_estimator=cfg.semi_integrated_estimator,
                semi_integrated_samps=cfg.num_semi_mc_samples,
                compute_elbo=True,
            )
        else:
            def solve_fn(st):
                return model.batch_solve(
                    st, xj, yj, sj,
                    batch_size=batch_solve_bsz,
                    maxiter_cg=maxiter_cg,
                    integrated_obs=integrated,
                    semi_integrated_estimator=cfg.semi_integrated_estimator,
                    semi_integrated_samps=cfg.num_semi_mc_samples,
                    compute_elbo=True,
                    **({"mean_solver": mean_solver,
                        "mean_solver_maxiter": mean_solver_maxiter,
                        "mean_solver_tol": mean_solver_tol}
                       if getattr(model, "family", None) in ("mean-field", "block")
                       else {}),
                )

            # the gram path runs EAGER — see infer.fit.prefer_eager_batch_solve
            # for the measured root cause (fused-program slowdown + worker
            # watchdog kill at M=128^2; repro results/repro/fused_gram_repro.py)
            from ..infer import prefer_eager_batch_solve

            if prefer_eager_batch_solve(mean_solver):
                state, elbo = solve_fn(state)
            else:
                state, elbo = jax.jit(solve_fn)(state)
        train_elbo = float(elbo)
        report = {"elbo_trace": [train_elbo], "epoch_elbos": [train_elbo]}
        print(f"batch solve elbo = {train_elbo:.5f}")
    else:
        raise ValueError(f"fit_method={fit_method!r}")
    fitting_time = time.time() - t_start

    pdict, eval_times = evaluate_and_save(
        odir, model, state,
        xtest=xtest, ftest=ftest, etest=etest,
        xvalid=xvalid, fvalid=fvalid, evalid=evalid,
        xgrid=xgrid, fgrid=fgrid, egrid=egrid,
        do_integrated_predictions=integrated,
        predict_maxiter_cg=cfg.predict_maxiter_cg,
        predict_ksemi_method=cfg.predict_ksemi_method,
        predict_ksemi_samps=cfg.predict_ksemi_samps,
        elbo_trace=report.get("elbo_trace"),
        hyper_traces={
            "sig2": report.get("sig2_trace"),
            "ell": report.get("ell_trace"),
            "noisesq": report.get("noise2_trace"),
        },
        data_noise_std=None if sobs is None else float(np.mean(sobs)),
        train_elbo=train_elbo,
        grid_shape=grid_shape,
        grid_extent=grid_extent,
        predict_fn=predict_fn_of(state),
    )

    trow = {"fitting": fitting_time, **eval_times}
    # one row per epoch (fit + eval wall-clock, reference time_report.csv
    # schema `ziggy/svi_gp.py:426-440`) followed by the run-total row
    rows = []
    epoch_times = report.get("epoch_times") or []
    eval_by_epoch = {r["epoch"]: r for r in epoch_eval_rows}
    for i, ft in enumerate(epoch_times):
        row = {"epoch": i, "fitting": ft}
        row.update(
            {k: v for k, v in eval_by_epoch.get(i, {}).items() if k != "epoch"}
        )
        rows.append(row)
    rows.append({"epoch": "total", **trow})
    pd.DataFrame(rows).to_csv(os.path.join(odir, "time_report.csv"), index=False)
    report["time_report"] = trow
    report["epoch_eval_rows"] = epoch_eval_rows
    report["pdict"] = pdict
    return model, state, report
