"""SVI training loop: jit-compiled natural-gradient epochs.

Parity reference: `ziggy/svi_gp.py:172-442` (svigp_fit) — rebuilt as one
jitted ``lax.scan`` over batches per epoch instead of a host Python loop:
SGD (with per-step exponential decay, matching the reference's StepLR) on the
natural parameters, Adam on the log-hyperparameters, both as one
``optax.multi_transform`` over the state pytree.

Data is padded to a whole number of batches and masked (the reference's
DataLoader keeps ragged last batches; padding keeps shapes static for XLA).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["FitConfig", "svigp_fit", "ell_fit", "batch_predict",
           "predictive_variance_correction", "make_train_step",
           "prepare_batches", "prefer_eager_batch_solve",
           "natgrad_stability_rho"]


def prefer_eager_batch_solve(mean_solver: str) -> bool:
    """True when ``model.batch_solve`` should run eagerly (per-stage
    compilation) instead of under one outer ``jax.jit``.

    Root cause, measured on v5e (repro: ``results/repro/fused_gram_repro.py``):
    fusing the gram-mean-solver's accumulate + K+A PCG + ELBO-recompute
    passes into ONE XLA program at M=128^2 (M'=65k), N=278k executes 3-6x
    slower than per-stage dispatch (2-5 min vs ~47 s) and, once
    ``maxiter_cg`` pushes the single-dispatch wall time further (20 vs 10),
    the runtime kills the worker with ``UNAVAILABLE: TPU device error``
    (kernel-independent; completes without the ELBO pass or at
    maxiter_cg<=10).  The per-stage path is already internally jitted
    (``lax.scan`` accumulation, PCG while-loops), so eager execution costs
    only a handful of dispatch latencies and avoids both the pathology and
    the minutes-long whole-program compile.  The 'factored' solver shares
    the staged structure (accumulate / factor / whiten / mean solve) and
    runs eager for the same reason.  'matfree' is eager BY CONSTRUCTION:
    its mean CG is a host-driven loop of bounded matvec dispatches.
    """
    return mean_solver in ("gram", "factored", "matfree")


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Flat, typed training configuration (replaces the reference's
    fit_kwargs dict with .get() defaults, `ziggy/svi_gp.py:182-221`)."""

    fit_method: str = "natgrad"
    epochs: int = 50
    batch_size: int = 256
    lr: float = 1e-2
    schedule_lr: bool = True
    step_decay: float = 0.99
    learn_kernel: bool = False
    learn_noise: bool = False
    kernel_lr: float = 1e-3
    maxiter_cg: int = 5
    integrated_obs: bool = False
    semi_integrated_estimator: str = "analytic"
    num_semi_mc_samples: int = 10
    predict_maxiter_cg: int = 50
    predict_ksemi_method: str = "analytic"
    predict_ksemi_samps: int = 200
    batch_log_interval: int = 0  # >0: print every k-th batch ELBO
    epoch_log_interval: int = 1
    only_eval_last_epoch: bool = False
    shuffle: bool = False  # reference uses shuffle=False
    seed: int = 0
    # Fail loudly when an epoch's mean ELBO goes NaN/Inf instead of grinding
    # out non-finite epochs to the end (the reference's behavior).
    error_on_nonfinite: bool = True


# Bound the number of scanned batches per device dispatch: the TPU runtime
# watchdog kills ANY single dispatch that runs minutes (RESULTS sec. 9 — the
# gram sweep hit it at M=192^2; a paper-scale 3-D natgrad epoch is ~2.4 min
# in one dispatch).  Chunking a sequential scan at the host is bit-identical.
# The batch cap is additionally work-bounded (bsz * M' * maxiter units, the
# same calibration as models.hipgp.GRAM_SWEEP_WORK_BUDGET): a 64-batch
# paper-scale dispatch at maxiter_cg=60 measured ~135 s and was killed.
FIT_MAX_BATCHES_PER_DISPATCH = 64
FIT_WORK_BUDGET = 5e11


def _dispatch_chunks(nb: int, model=None, bsz: int = 0, maxiter: int = 1):
    c = FIT_MAX_BATCHES_PER_DISPATCH
    Mp = int(getattr(model, "Mprime", 0) or 0)
    if Mp and bsz:
        w = max(1, Mp * int(bsz) * max(int(maxiter), 1))
        c = min(c, max(1, int(FIT_WORK_BUDGET // w)))
    c = max(1, min(nb, c))
    return [slice(i, min(i + c, nb)) for i in range(0, nb, c)]


def prepare_batches(x, y, noise_std, batch_size):
    """Pad to a batch multiple and reshape to (nb, bsz, ...) + weights."""
    N = x.shape[0]
    y = y.reshape(-1)
    bsz = min(batch_size, N) if batch_size > 0 else N
    nb = -(-N // bsz)
    pad = nb * bsz - N

    def p(a, fill=0.0):
        if pad == 0:
            return a
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)

    xb = p(x).reshape(nb, bsz, -1)
    yb = p(y).reshape(nb, bsz)
    w = p(jnp.ones((N,), x.dtype)).reshape(nb, bsz)
    sb = None
    if noise_std is not None:
        sb = p(noise_std.reshape(-1), fill=1.0).reshape(nb, bsz)
    return xb, yb, sb, w


def _label_pytree(state):
    """theta leaves -> 'theta'; hyper leaves -> 'hyper'."""
    return type(state)(
        **{
            f.name: ("theta" if f.name.startswith("theta") else "hyper")
            for f in dataclasses.fields(state)
        }
    )


def make_optimizer(state, config: FitConfig):
    if config.schedule_lr:
        sched = optax.exponential_decay(
            init_value=config.lr, transition_steps=1, decay_rate=config.step_decay
        )
    else:
        sched = config.lr
    theta_opt = optax.sgd(sched)

    learn_hyper = config.learn_kernel or config.learn_noise
    hyper_opt = optax.adam(config.kernel_lr) if learn_hyper else optax.set_to_zero()
    opt = optax.multi_transform(
        {"theta": theta_opt, "hyper": hyper_opt}, _label_pytree(state)
    )
    return opt


def natgrad_stability_rho(kn, ivar, state, model, bscale, iters: int = 30):
    """Top eigenvalue rho of the warm-metric-preconditioned batch precision
    for the natural-gradient iteration, by power iteration.

    The linearized theta1 natgrad recursion is ``eta1 <- (I - lr * B S) eta1
    + const`` with ``B = bscale * kn^T diag(ivar) kn + I`` (one batch's
    implied precision) and ``S`` the current variational covariance (the
    metric) — after ``theta2_warmstart`` this is the inverse of the
    full-data FAMILY-SHAPED precision.  Stability requires ``lr < 2 / rho``
    with ``rho = lambda_max(B S)``.  The family keeps only part of the
    curvature (diagonal for mean-field, block-diagonal for block), so
    under strong correlation (lengthscale spanning many grid spacings) the
    collective top eigenvalue of B exceeds the retained part by orders of
    magnitude and rho >> 1: the documented ell=0.2, M=125^2 divergence
    (RESULTS sec. 12) is exactly this — measured rho = 715 gives lr_crit
    = 2.8e-3, bracketing the observed stable/divergent lrs (2e-3 / 1e-2) —
    NOT an f32 or eigenvalue-clamp effect (the clamp never engages there:
    min circulant eig = jitter at both precisions).

    ``B S`` is similar to the SPD ``S^{1/2} B S^{1/2}``, so plain power
    iteration with a norm-ratio Rayleigh estimate converges to the real
    positive lambda_max.  S is applied through the model's own family
    dispatch (diag / block_diag_multiply / dense).  Cost: ``2 * iters``
    (bsz, M') matvecs — negligible next to the theta2_warmstart sweep
    that precedes it.
    """
    _, S = model.standard_params(state)
    run = _rho_stage_fn(model, iters)
    return float(run(kn, ivar, S, jnp.asarray(bscale, kn.dtype)))


def _rho_stage_fn(model, iters: int):
    """Memoized jitted power-iteration stage for `natgrad_stability_rho`.

    Same staging rationale as the model's `_gram_stage_fns`: all traced
    values (kn, ivar, S, bscale) are ARGUMENTS, so the compile persists in
    the on-disk cache and is reused across hyperparameter values and
    repeat fits; a per-call `@jax.jit` closure would re-trace and re-link
    every fit and embed S/bscale as HLO constants.  Only the family
    dispatch (static) and the block-index gather (structural, per-model)
    live in the closure; the callable is memoized on the model instance.
    """
    cache = model.__dict__.setdefault("_rho_jit_cache", {})
    if iters in cache:
        return cache[iters]
    family = model.family

    @jax.jit
    def run(kn, ivar, S, bscale):
        if family == "mean-field":
            apply_S = lambda v: S * v
        elif family == "block":
            apply_S = lambda v: model.block_diag_multiply(S, v[None, :])[0]
        else:
            apply_S = lambda v: S @ v

        def mv(v):
            u = apply_S(v)
            return bscale * (kn.T @ (ivar * (kn @ u))) + u

        def body(_, carry):
            z, _ = carry
            q = mv(z)
            rho = jnp.linalg.norm(q) / jnp.linalg.norm(z)
            return q / jnp.linalg.norm(q), rho

        z0 = jnp.sin(jnp.arange(kn.shape[-1], dtype=kn.dtype) * 0.73) + 0.1
        z0 = z0 / jnp.linalg.norm(z0)
        _, rho = jax.lax.fori_loop(0, iters, body, (z0, jnp.zeros((), kn.dtype)))
        return rho

    cache[iters] = run
    return run


def _batch_kn_ivar(model, state, xl, sl, wl, config, kn_fn=None):
    """(kn, ivar) for one prepared batch — the warmstart sweep's kn path."""
    if kn_fn is not None:
        kn, _ = kn_fn(state, xl, None)
    else:
        spec = model.spectrum(state) if model.whitened_type == "ziggy" else None
        Knm, _ = model.make_grams(
            state, xl, config.integrated_obs,
            config.semi_integrated_estimator, config.num_semi_mc_samples,
        )
        kn = model.compute_kn(state, Knm, maxiter_cg=config.maxiter_cg,
                              spec=spec)
    ivar = (wl / (sl * sl) if sl is not None
            else wl * jnp.exp(-state.log_noise2))
    return kn, ivar


def make_train_step(model, config: FitConfig, opt, kn_fn=None):
    """One jitted epoch: scan over (nb, bsz, ...) batches.

    Hyper-gradient masking: elbo_and_grads returns -d(elbo) for all three
    log-hyperparameters; leaves the config says not to learn are zeroed.

    ``kn_fn``: optional whitening override threaded into
    ``model.elbo_and_grads`` — the model-parallel layer passes its
    grid-sharded solve here (`parallel.mp.mp_svigp_fit`).
    """
    learn_hyper = config.learn_kernel or config.learn_noise

    def zero_frozen(g):
        z = lambda a: jnp.zeros_like(a)
        if not config.learn_kernel:
            g = g.replace(log_sig2=z(g.log_sig2), log_ell=z(g.log_ell))
        if not config.learn_noise and hasattr(g, "log_noise2"):
            g = g.replace(log_noise2=z(g.log_noise2))
        return g

    def batch_step(carry, inp):
        state, opt_state, key = carry
        xb, yb, sb, wb = inp
        key, sub = jax.random.split(key)
        elbo, grads = model.elbo_and_grads(
            state, xb, yb, sb,
            maxiter_cg=config.maxiter_cg,
            integrated_obs=config.integrated_obs,
            semi_integrated_estimator=config.semi_integrated_estimator,
            semi_integrated_samps=config.num_semi_mc_samples,
            key=sub,
            weights=wb,
            compute_hyper_grads=learn_hyper,
            kn_fn=kn_fn,
        )
        grads = zero_frozen(grads)
        updates, opt_state = opt.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return (state, opt_state, key), elbo

    @jax.jit
    def epoch_step(state, opt_state, key, xb, yb, sb, wb):
        if sb is None:
            def bs(c, i):
                x_, y_, w_ = i
                return batch_step(c, (x_, y_, None, w_))

            (state, opt_state, key), elbos = jax.lax.scan(
                bs, (state, opt_state, key), (xb, yb, wb)
            )
        else:
            (state, opt_state, key), elbos = jax.lax.scan(
                batch_step, (state, opt_state, key), (xb, yb, sb, wb)
            )
        return state, opt_state, key, elbos

    return epoch_step


def svigp_fit(
    model,
    state,
    xtrain,
    ytrain,
    noise_std_train,
    config: FitConfig,
    epoch_callback: Optional[Callable] = None,
    verbose: bool = True,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    theta2_warmstart: bool = False,
    natgrad_safe_lr: str = "warn",
    kn_fn=None,
    data_shard_fn: Optional[Callable] = None,
):
    """Fit variational (and optionally hyper) parameters.

    ``kn_fn`` / ``data_shard_fn``: hooks for the model-parallel layer —
    the whitening-solve override (see ``make_train_step``) and an optional
    placement function applied to the prepared (xb, yb, sb, w) batch arrays
    (e.g. committing the row axis to a 'dp' mesh axis so each device feeds
    only its shard).

    ``natgrad_safe_lr``: 'warn' (default) | 'clamp' | 'off'.  With
    ``theta2_warmstart`` on a natgrad fit (any family), the warm metric
    enables a cheap power-iteration estimate of the step-size stability
    limit ``lr_crit = 2/rho`` (see :func:`natgrad_stability_rho`): under
    strong correlation the family's partial (diag/block) metric underestimates the
    collective curvature and the natural-gradient recursion diverges
    geometrically for lr above it (the reference has the same instability
    and no guard).  'warn' raises a ``UserWarning`` when ``config.lr``
    exceeds ``0.5 * lr_crit``; 'clamp' lowers the natural-parameter lr to
    that value instead (hyper lr untouched).  The estimate, limit, and lr
    actually used are recorded in the report (``natgrad_rho``,
    ``natgrad_lr_crit``, ``lr_used``).

    Returns (state, report) where report carries the per-batch ELBO trace,
    hyperparameter traces, and per-epoch wall-clock (the reference's
    time_report.csv content, `ziggy/svi_gp.py:426-440`).

    Deviation from the reference: epochs run as one jitted lax.scan, so
    there is no per-BATCH host callback (the reference's ``batch_callback``);
    per-epoch callbacks and opt-in per-batch ELBO logging
    (``batch_log_interval``) cover the reference's uses.

    Checkpoint/resume (absent from the reference, which only ever saves):
    with ``checkpoint_dir`` + ``checkpoint_every=k``, the full training
    state (model state, optimizer state, epoch) is persisted every k epochs;
    ``resume=True`` restores it and continues from the saved epoch.
    """
    # When learning the noise, per-point noise is ignored (reference drops
    # noise from the dataset in that case, `ziggy/svi_gp.py:236-241`).
    noise = None if config.learn_noise else noise_std_train
    xb, yb, sb, w = prepare_batches(
        jnp.asarray(xtrain, model.dtype),
        jnp.asarray(ytrain, model.dtype),
        None if noise is None else jnp.asarray(noise, model.dtype),
        config.batch_size,
    )

    if data_shard_fn is not None:
        xb, yb, sb, w = data_shard_fn(xb, yb, sb, w)

    opt = make_optimizer(state, config)
    key = jax.random.PRNGKey(config.seed)

    start_epoch = 0
    restored = False
    if resume and checkpoint_dir is not None:
        import os

        from ..utils import checkpoint as _ckpt

        if os.path.exists(os.path.join(checkpoint_dir, "state.npz")):
            state, restored_opt, start_epoch = _ckpt.restore_checkpoint(
                checkpoint_dir, state, opt.init(state)
            )
            restored = True
            opt_state = restored_opt if restored_opt is not None else opt.init(state)
            if verbose:
                print(f"resumed from {checkpoint_dir} at epoch {start_epoch}")

    if theta2_warmstart and not restored and hasattr(model, "get_lam"):
        # One Lambda-only sweep sets theta2 ~ -(Lambda+I)/2 before SVI.
        # The raw natural-gradient iteration overshoots badly while theta2
        # (the metric) is still at its init — the reference suffers the same
        # transient (ELBO dives orders of magnitude before recovering); a
        # warm metric removes it at the cost of one data pass.  Skipped on
        # resume: the restored theta2 would immediately overwrite it.
        state = _theta2_warmstart(model, state, xb, yb, sb, w, config,
                                  kn_fn=kn_fn)
        warmstarted = True
    else:
        warmstarted = False

    natgrad_rho = natgrad_lr_crit = None
    lr_used = config.lr
    if (
        natgrad_safe_lr != "off"
        and warmstarted
        and config.fit_method == "natgrad"
        and getattr(model, "family", None) in ("mean-field", "block",
                                               "full-rank")
    ):
        if natgrad_safe_lr not in ("warn", "clamp"):
            raise ValueError(f"natgrad_safe_lr={natgrad_safe_lr!r}: "
                             "expected 'warn', 'clamp', or 'off'")
        kn0, ivar0 = _batch_kn_ivar(
            model, state, xb[0], None if sb is None else sb[0], w[0],
            config, kn_fn=kn_fn,
        )
        bscale = model.N / xb.shape[1]
        natgrad_rho = natgrad_stability_rho(kn0, ivar0, state, model, bscale)
        natgrad_lr_crit = 2.0 / natgrad_rho
        if config.lr > 0.5 * natgrad_lr_crit:
            msg = (
                f"natgrad lr={config.lr:g} exceeds half the estimated "
                f"natgrad stability limit lr_crit=2/rho={natgrad_lr_crit:.3g} "
                f"(rho={natgrad_rho:.1f}): the variational-family metric "
                "underestimates the collective curvature at this "
                "lengthscale/grid and the natural-gradient iteration "
                "diverges geometrically above lr_crit (RESULTS sec. 12)."
            )
            if natgrad_safe_lr == "clamp":
                lr_used = 0.5 * natgrad_lr_crit
                config = dataclasses.replace(config, lr=lr_used)
                opt = make_optimizer(state, config)
                if verbose:
                    print(f"natgrad_safe_lr: clamping lr to {lr_used:.3g} — "
                          + msg)
            else:
                import warnings

                warnings.warn(
                    msg + " Pass natgrad_safe_lr='clamp' to lower it "
                    "automatically, or reduce config.lr.",
                    UserWarning, stacklevel=2,
                )
    if not restored:
        opt_state = opt.init(state)
    epoch_step = make_train_step(model, config, opt, kn_fn=kn_fn)

    # pre-shuffle support: one permutation per epoch over the raw rows
    # (the reference's DataLoader shuffle; its experiments use shuffle=False)
    if config.shuffle:
        x_raw = jnp.asarray(xtrain, model.dtype)
        y_raw = jnp.asarray(ytrain, model.dtype).reshape(-1)
        s_raw = None if noise is None else jnp.asarray(noise, model.dtype).reshape(-1)
        shuffle_rng = np.random.default_rng(config.seed)

    trace = []
    sig2_trace, ell_trace, noise2_trace = [], [], []
    epoch_times = []
    epoch_elbos = []
    for epoch in range(start_epoch, config.epochs):
        if config.shuffle:
            perm = shuffle_rng.permutation(x_raw.shape[0])
            xb, yb, sb, w = prepare_batches(
                x_raw[perm], y_raw[perm],
                None if s_raw is None else s_raw[perm],
                config.batch_size,
            )
            if data_shard_fn is not None:
                xb, yb, sb, w = data_shard_fn(xb, yb, sb, w)
        t0 = time.time()
        elbo_parts = []
        for sl in _dispatch_chunks(xb.shape[0], model, xb.shape[1],
                                   config.maxiter_cg):
            state, opt_state, key, e = epoch_step(
                state, opt_state, key, xb[sl], yb[sl],
                None if sb is None else sb[sl], w[sl],
            )
            elbo_parts.append(e)
        elbos = jax.block_until_ready(jnp.concatenate(elbo_parts))
        dt = time.time() - t0
        epoch_times.append(dt)
        elbos_np = np.asarray(elbos)
        trace.extend(elbos_np.tolist())
        epoch_elbos.append(float(elbos_np.mean()))
        if config.error_on_nonfinite and not np.isfinite(epoch_elbos[-1]):
            hint = (
                f" (estimated stability limit lr_crit={natgrad_lr_crit:.3g}, "
                f"lr used={lr_used:g})" if natgrad_lr_crit is not None else ""
            )
            raise RuntimeError(
                f"epoch {epoch} mean ELBO is non-finite "
                f"({epoch_elbos[-1]}){hint}. For natgrad fits this usually "
                "means the lr is above the natural-gradient "
                "stability limit at this lengthscale/grid — rerun with "
                "theta2_warmstart=True and natgrad_safe_lr='clamp', lower "
                "config.lr, or use the closed-form batch_solve (RESULTS "
                "sec. 12). Set config.error_on_nonfinite=False to grind on "
                "(the reference's behavior)."
            )
        if config.learn_kernel:
            sig2_trace.append(float(jnp.exp(state.log_sig2)))
            ell_trace.append(float(jnp.exp(jnp.atleast_1d(state.log_ell))[0]))
        if config.learn_noise:
            noise2_trace.append(float(jnp.exp(state.log_noise2)))
        if verbose and config.batch_log_interval > 0:
            for bi in range(0, len(elbos_np), config.batch_log_interval):
                print(f"  ... batch {bi}/{len(elbos_np)}: elbo {elbos_np[bi]:.4f}")
        if verbose and config.epoch_log_interval and epoch % config.epoch_log_interval == 0:
            print(f"epoch {epoch:4d}: elbo {epoch_elbos[-1]:.4f} ({dt:.2f}s)")
        if epoch_callback is not None:
            if (not config.only_eval_last_epoch) or epoch == config.epochs - 1:
                epoch_callback(epoch, model, state, trace)
        if (
            checkpoint_dir is not None
            and checkpoint_every
            and (epoch + 1) % checkpoint_every == 0
        ):
            from ..utils import checkpoint as _ckpt

            _ckpt.save_checkpoint(checkpoint_dir, state, opt_state, step=epoch + 1)

    report = {
        "elbo_trace": trace,
        "epoch_elbos": epoch_elbos,
        "epoch_times": epoch_times,
        "sig2_trace": sig2_trace,
        "ell_trace": ell_trace,
        "noise2_trace": noise2_trace,
        "natgrad_rho": natgrad_rho,
        "natgrad_lr_crit": natgrad_lr_crit,
        "lr_used": lr_used,
    }
    return state, report


def _theta2_warmstart(model, state, xb, yb, sb, w, config, kn_fn=None):
    """theta2 <- -(Lambda + I)/2 from one Lambda-only pass over the data.

    The pass runs in chunks of at most ``FIT_MAX_BATCHES_PER_DISPATCH``
    batches per device dispatch (same watchdog bound as the epoch scan);
    chunking the sequential accumulation is bit-identical."""
    spec = (
        model.spectrum(state)
        if model.whitened_type == "ziggy" and kn_fn is None
        else None
    )

    @jax.jit
    def chunk_sweep(lam_acc, state, spec, xc, yc, wc, sc):
        def step(lam_acc, inp):
            xl, yl, wl, sl = inp
            ivar = wl / (sl * sl) if sl is not None else wl * jnp.exp(-state.log_noise2)
            if kn_fn is not None:
                kn, _ = kn_fn(state, xl, None)
            else:
                Knm, _ = model.make_grams(
                    state, xl, config.integrated_obs,
                    config.semi_integrated_estimator, config.num_semi_mc_samples,
                )
                kn = model.compute_kn(state, Knm, maxiter_cg=config.maxiter_cg,
                                      spec=spec)
            return lam_acc + model.get_lam(ivar, kn, add_identity=False), None

        if sc is None:
            lam_acc, _ = jax.lax.scan(lambda c, i: step(c, (*i, None)),
                                      lam_acc, (xc, yc, wc))
        else:
            lam_acc, _ = jax.lax.scan(step, lam_acc, (xc, yc, wc, sc))
        return lam_acc

    lam = jax.tree.map(
        jnp.zeros_like,
        model.get_lam(jnp.ones((1,), model.dtype),
                      jnp.zeros((1, model.Mprime), model.dtype)),
    )
    for sl in _dispatch_chunks(xb.shape[0], model, xb.shape[1],
                               config.maxiter_cg):
        lam = chunk_sweep(lam, state, spec, xb[sl], yb[sl], w[sl],
                          None if sb is None else sb[sl])
    lam = lam + model.get_lam(
        jnp.zeros((1,), model.dtype),
        jnp.zeros((1, model.Mprime), model.dtype), add_identity=True,
    )
    return state.replace(theta2=-0.5 * lam)


def ell_fit(
    model,
    state,
    xobs,
    yobs,
    sobs,
    ell_min: float,
    ell_max: float,
    ell_step_size: float,
    batch_solve_bsz: int = -1,
    maxiter_cg: int = 10,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    verbose: bool = True,
    parallel: Optional[str] = None,
    mesh=None,
    **solve_kwargs,
):
    """Grid-search the lengthscale by closed-form batch_solve ELBO
    (`ziggy/svi_gp.py:131-169`).  One compile; ell is a traced argument.

    ``parallel``: route each candidate's solve over a device mesh —
    'dp' shards the data sweep (`dp_batch_solve`, any family), 'mp'
    shards the whitened state and solve over a 'grid' axis
    (`mp_batch_solve`, mean-field/block; the model must be built with
    matching ``grid_shards``).  Default mesh as in the harness: all
    devices on 'dp', or a (1, n_devices) ('dp', 'grid') mesh for 'mp'.

    Returns (best_state, best_ell, ell_list, elbo_list).
    """
    x = jnp.asarray(xobs, model.dtype)
    y = jnp.asarray(yobs, model.dtype)
    s = jnp.asarray(sobs, model.dtype) if sobs is not None else None

    if parallel not in (None, "dp", "mp"):
        raise ValueError(f"parallel={parallel!r}; choose None | 'dp' | 'mp'")
    if parallel and mesh is None:
        from jax.sharding import Mesh as _Mesh

        devs = np.array(jax.devices())
        mesh = (_Mesh(devs, ("dp",)) if parallel == "dp"
                else _Mesh(devs.reshape(1, -1), ("dp", "grid")))

    if parallel == "dp":
        from ..parallel import dp_batch_solve

        def solve_at(log_ell):
            st = state.replace(log_ell=jnp.asarray(log_ell, model.dtype))
            return dp_batch_solve(
                model, st, x, y, s, mesh,
                batch_size=batch_solve_bsz,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                compute_elbo=True,
            )
    elif parallel == "mp":
        from ..parallel import mp_batch_solve, mp_shard_state

        sharded = mp_shard_state(state, mesh)

        def solve_at(log_ell):
            st = sharded.replace(log_ell=jnp.asarray(log_ell, model.dtype))
            return mp_batch_solve(
                model, st, x, y, s, mesh,
                batch_size=(batch_solve_bsz if batch_solve_bsz > 0
                            else x.shape[0]),
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                compute_elbo=True,
                **({"mean_solver": solve_kwargs["mean_solver"]}
                   if solve_kwargs.get("mean_solver") in ("gram", "factored")
                   else {}),
            )
    else:

        def solve_at_eager(log_ell):
            st = state.replace(log_ell=jnp.asarray(log_ell, model.dtype))
            return model.batch_solve(
                st, x, y, s,
                batch_size=batch_solve_bsz,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                compute_elbo=True,
                **solve_kwargs,
            )

        if prefer_eager_batch_solve(solve_kwargs.get("mean_solver", "dense")):
            solve_at = solve_at_eager
        else:
            solve_at = jax.jit(solve_at_eager)

    ells = np.arange(ell_min, ell_max + ell_step_size, ell_step_size)
    best = (-np.inf, None, None)
    elbo_list = []
    for ell in ells:
        st, elbo = solve_at(float(np.log(ell)))
        elbo_f = float(elbo)
        elbo_list.append(elbo_f)
        if verbose:
            print(f"ell={ell:.4f} elbo={elbo_f:.5f}")
        if elbo_f > best[0]:
            best = (elbo_f, float(ell), jax.tree.map(lambda a: a, st))
    return best[2], best[1], list(map(float, ells)), elbo_list


# HBM budget for one predict chunk's whitened kn (bsz, M') buffer; the
# PCG state and the block family's gather/apply buffers are accounted as
# multiples of it.  At paper-scale 3-D grids (M' = 1M) the harness default
# chunk of 4096 rows would need ~16 GB for kn alone (measured OOM: the
# block predict at 2000 rows wanted 24.4 of 15.75 GB).
PREDICT_CHUNK_BUDGET_BYTES = 2 << 30


def batch_predict(model, state, x, batch_size: int = 100, **predict_kwargs):
    """Chunked prediction (`ziggy/svi_gp.py:78-97`): pad to a batch multiple,
    one compiled predict reused across chunks.  The chunk size is clamped
    so the (bsz, M') buffers fit the HBM budget at large grids."""
    x = jnp.asarray(x, model.dtype)
    N = x.shape[0]
    Mp = int(getattr(model, "Mprime", 0) or 0)
    if Mp:
        per_row = 4 * Mp * (2 if getattr(model, "family", "") == "block" else 1)
        batch_size = max(1, min(batch_size, PREDICT_CHUNK_BUDGET_BYTES // per_row))
    bsz = min(batch_size, N)
    nb = -(-N // bsz)
    pad = nb * bsz - N
    xp = jnp.pad(x, [(0, pad), (0, 0)]) if pad else x
    chunks = xp.reshape(nb, bsz, -1)

    pfun = jax.jit(lambda xb: model.predict(state, xb, **predict_kwargs))
    mus, sigs = [], []
    for i in range(nb):
        mu, sig = pfun(chunks[i])
        mus.append(mu)
        sigs.append(sig)
    mu = jnp.concatenate(mus)[:N]
    sig = jnp.concatenate(sigs)[:N]
    return mu, sig


def predictive_variance_correction(model, state, xobs, aobs, sobs, **kwargs):
    """Post-hoc predictive-std rescale factor
    (`ziggy/svi_gp.py:119-128`): sqrt((sum d^2 - sum s^2) / sum fsig^2)."""
    fmu, fsig = batch_predict(model, state, xobs, **kwargs)
    deltas = jnp.asarray(aobs).reshape(-1) - fmu
    num = jnp.sum(deltas**2) - jnp.sum(jnp.asarray(sobs).reshape(-1) ** 2)
    return float(jnp.sqrt(jnp.maximum(num, 0.0) / jnp.sum(fsig**2)))
