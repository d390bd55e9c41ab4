"""Exact data parallelism over a device mesh.

HIP-GP's information-form quantities are *sums over data points*:
  Lambda = sum_n kn_n kn_n^T / s_n^2,   b = sum_n y_n kn_n / s_n^2,
and the natural gradient's batch terms likewise.  Sharding the batch over a
'dp' mesh axis and psum-ing the accumulators is therefore exact (not an
approximation) — the TPU-native replacement for the reference's sequential
single-device batch loop (`ziggy/hipgp.py:302-325`).

Two styles, both provided:
* ``dp_batch_solve`` — explicit `shard_map` + `psum` over the model's
  ``accumulate_lam_b`` unit, with a host-side scan over macro-batches.
* ``make_dp_train_step`` — sharding-annotated jit: batch inputs carry a
  P('dp') sharding, outputs replicated; XLA inserts the all-reduces.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["dp_batch_solve", "make_dp_train_step", "dp_elbo_and_grads",
           "make_dp_data_shard_fn", "round_batch_to_mesh"]


def make_dp_data_shard_fn(mesh: Mesh, axis: str = "dp"):
    """`infer.svigp_fit(data_shard_fn=...)` hook: commit the prepared
    (nb, bsz, ...) batch arrays with rows sharded over ``axis`` so the jitted
    epoch scan feeds each device only its shard (XLA then inserts the
    all-reduces for every over-batch contraction — exact data parallelism
    with the full svigp_fit feature set: callbacks, warmstart, resume)."""

    def data_shard_fn(xb, yb, sb, w):
        put = lambda a, s: (
            None if a is None else jax.device_put(a, NamedSharding(mesh, s))
        )
        return (
            put(xb, P(None, axis, None)),
            put(yb, P(None, axis)),
            put(sb, P(None, axis)),
            put(w, P(None, axis)),
        )

    return data_shard_fn


def round_batch_to_mesh(config, mesh: Mesh, n_rows: int, axis: str = "dp"):
    """Round config.batch_size up to a multiple of the mesh axis size so
    batch rows shard evenly (padding rows carry zero weight)."""
    import dataclasses

    n = mesh.shape[axis]
    bsz = config.batch_size if config.batch_size > 0 else n_rows
    bsz = min(bsz, n_rows)
    bsz = -(-bsz // n) * n
    if bsz != config.batch_size:
        config = dataclasses.replace(config, batch_size=bsz)
    return config


def _pad_to(n_target, *arrays, fills):
    out = []
    for a, fill in zip(arrays, fills):
        if a is None:
            out.append(None)
            continue
        pad = n_target - a.shape[0]
        if pad:
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            a = jnp.pad(a, width, constant_values=fill)
        out.append(a)
    return out


def dp_batch_solve(
    model,
    state,
    xobs: jnp.ndarray,
    yobs: jnp.ndarray,
    noise_std: Optional[jnp.ndarray],
    mesh: Mesh,
    batch_size: int = -1,
    maxiter_cg: int = 10,
    integrated_obs: bool = False,
    semi_integrated_estimator: str = "analytic",
    semi_integrated_samps: int = 10,
    axis: str = "dp",
    row_weights: Optional[jnp.ndarray] = None,
    compute_elbo: bool = False,
):
    """Closed-form batch_solve with the data dimension sharded over ``axis``.

    Each device accumulates (Lambda, b, big) over its shard with the exact
    same ``accumulate_lam_b`` unit the single-chip path uses, psums across
    the mesh, and finalizes on replicated accumulators.

    ``row_weights``: optional (N,) 0/1 mask of REAL rows — pass
    ``multihost.global_row_weights(...)`` when the inputs were assembled by
    ``multihost.global_batch`` with pad rows (N not divisible by nprocs).

    ``compute_elbo``: run a second sharded sweep evaluating the bound at the
    optimum (the reference's optional recompute pass,
    `ziggy/hipgp.py:347-368`) — returns ``(new_state, elbo)``.
    """
    ndev = mesh.shape[axis]
    N = xobs.shape[0]
    y = yobs.reshape(-1)
    ns = None if noise_std is None else noise_std.reshape(-1)

    # per-device micro-batch size
    if batch_size == -1 or batch_size >= N:
        per_dev = -(-N // ndev)
    else:
        per_dev = -(-batch_size // ndev)
    chunk = per_dev * ndev
    nsteps = -(-N // chunk)
    total = nsteps * chunk

    if row_weights is not None:
        w = row_weights.reshape(-1).astype(model.dtype)
    else:
        w = jnp.ones((N,), model.dtype)

    spec_b = P(None, axis)  # (step, data) with data sharded
    spec_bx = P(None, axis, None)

    addressable = all(
        getattr(a, "is_fully_addressable", True)
        for a in (xobs, y, ns, row_weights) if a is not None
    )
    if addressable:
        x_p, y_p, w_p, ns_p = _pad_to(
            total, xobs, y, w, ns, fills=(0.0, 0.0, 0.0, 1.0)
        )
        x_p = x_p.reshape(nsteps, chunk, -1)
        y_p = y_p.reshape(nsteps, chunk)
        w_p = w_p.reshape(nsteps, chunk)
        ns_p = None if ns_p is None else ns_p.reshape(nsteps, chunk)
    else:
        # multi-host: inputs are global (process-spanning) arrays — eager
        # pad/reshape would require full addressability, so stage the prep
        # through jit with explicit output shardings instead
        def _prep(spec, fill, trailing):
            shape = (nsteps, chunk) + trailing
            return jax.jit(
                lambda a: jnp.pad(
                    a,
                    [(0, total - N)] + [(0, 0)] * (a.ndim - 1),
                    constant_values=fill,
                ).reshape(shape),
                out_shardings=NamedSharding(mesh, spec),
            )

        x_p = _prep(spec_bx, 0.0, (xobs.shape[-1],))(xobs)
        y_p = _prep(spec_b, 0.0, ())(y)
        w_p = _prep(spec_b, 0.0, ())(w)
        ns_p = None if ns is None else _prep(spec_b, 1.0, ())(ns)

    def local_accum(state, xb, yb, wb, nsb):
        # xb: (nsteps, chunk/ndev, D) local shard
        def step(carry, inp):
            lam_a, b_a, big_a = carry
            xl, yl, wl, nsl = inp
            if nsl is not None:
                ivar = wl / (nsl * nsl)
            else:
                ivar = wl * jnp.exp(-state.log_noise2)
            lam, b, big = model.accumulate_lam_b(
                state, xl, yl, ivar,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
            )
            lam_a = lam_a + lam
            b_a = b_a + b
            if big is not None:
                big_a = big_a + big
            return (lam_a, b_a, big_a), None

        Mp = model.Mprime
        lam0 = jax.tree.map(
            jnp.zeros_like,
            model.get_lam(jnp.ones((1,), model.dtype), jnp.zeros((1, Mp), model.dtype)),
        )
        b0 = jnp.zeros((Mp,), model.dtype)
        big0 = jnp.zeros(
            (Mp, Mp) if model.family != "full-rank" else (1, 1), model.dtype
        )
        # the carry becomes device-varying once it absorbs sharded data;
        # mark the (replicated) init as varying so the scan types line up
        lam0, b0, big0 = jax.lax.pcast((lam0, b0, big0), (axis,), to="varying")
        if nsb is None:
            (lam, b, big), _ = jax.lax.scan(
                lambda c, i: step(c, (*i, None)), (lam0, b0, big0), (xb, yb, wb)
            )
        else:
            (lam, b, big), _ = jax.lax.scan(
                step, (lam0, b0, big0), (xb, yb, wb, nsb)
            )
        # exact cross-device reduction of the information-form sums
        lam, b, big = jax.lax.psum((lam, b, big), axis)
        return lam, b, big

    if ns_p is None:
        fn = shard_map(
            lambda st, xb, yb, wb: local_accum(st, xb, yb, wb, None),
            mesh=mesh,
            in_specs=(P(), spec_bx, spec_b, spec_b),
            out_specs=(P(), P(), P()),
            check_vma=False,  # replicated spectrum x varying batch inside
        )                     # custom_linear_solve trips the strict checker
        lam, b, big = jax.jit(fn)(state, x_p, y_p, w_p)
    else:
        fn = shard_map(
            local_accum,
            mesh=mesh,
            in_specs=(P(), spec_bx, spec_b, spec_b, spec_b),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        lam, b, big = jax.jit(fn)(state, x_p, y_p, w_p, ns_p)

    big = None if model.family == "full-rank" else big
    new_state = model.finalize_from_lam_b(state, lam, b, big)
    if not compute_elbo:
        return new_state

    qm, qS = model.standard_params(new_state)
    N_real = jnp.sum(w)  # row_weights mask excludes pad rows
    spec = (
        model.spectrum(new_state) if model.whitened_type == "ziggy" else None
    )

    def local_an(xb, yb, wb, nsb):
        def step(acc, inp):
            xl, yl, wl, nsl = inp
            Knm, Knn_diag = model.make_grams(
                new_state, xl, integrated_obs, semi_integrated_estimator,
                semi_integrated_samps,
            )
            kn = model.compute_kn(new_state, Knm, maxiter_cg=maxiter_cg,
                                  spec=spec)
            an = model.batch_an(new_state, yl, nsl, kn, Knn_diag, qm, qS)
            return acc + jnp.sum(an * wl), None

        acc0 = jax.lax.pcast(jnp.zeros((), model.dtype), (axis,), to="varying")
        if nsb is None:
            acc, _ = jax.lax.scan(
                lambda c, i: step(c, (*i, None)), acc0, (xb, yb, wb)
            )
        else:
            acc, _ = jax.lax.scan(step, acc0, (xb, yb, wb, nsb))
        return jax.lax.psum(acc, axis)

    if ns_p is None:
        an_fn = shard_map(
            lambda xb, yb, wb: local_an(xb, yb, wb, None),
            mesh=mesh, in_specs=(spec_bx, spec_b, spec_b), out_specs=P(),
            check_vma=False,
        )
        total_an = jax.jit(an_fn)(x_p, y_p, w_p)
    else:
        an_fn = shard_map(
            local_an, mesh=mesh,
            in_specs=(spec_bx, spec_b, spec_b, spec_b), out_specs=P(),
            check_vma=False,
        )
        total_an = jax.jit(an_fn)(x_p, y_p, w_p, ns_p)
    elbo = total_an / N_real - model.kl_to_prior(qm, qS) / model.N
    return new_state, elbo


def dp_elbo_and_grads(model, mesh, axis: str = "dp", **elbo_kwargs):
    """A jitted (state, x, y, noise_std, weights) -> (elbo, grads) with the
    batch dimension sharded over the mesh; XLA inserts the all-reduces for
    every over-batch contraction in the ELBO and natural gradient."""
    batch_sharding = NamedSharding(mesh, P(axis))
    batch_sharding_x = NamedSharding(mesh, P(axis, None))
    rep = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        in_shardings=(rep, batch_sharding_x, batch_sharding, batch_sharding,
                      batch_sharding),
        out_shardings=(rep, rep),
    )
    def step(state, x, y, noise_std, weights):
        return model.elbo_and_grads(
            state, x, y, noise_std, weights=weights, **elbo_kwargs
        )

    return step


def make_dp_train_step(model, config, opt, mesh, axis: str = "dp",
                       has_noise: bool = True):
    """Data-parallel variant of `infer.make_train_step`: one optimizer step
    on a batch whose rows are sharded across the mesh.

    ``has_noise=False`` builds a step without a per-point noise input: the
    model's own log_noise2 drives the likelihood (and can be learned) —
    substituting a noise of 1.0 would silently change the posterior.
    """
    learn_hyper = config.learn_kernel or config.learn_noise

    def zero_frozen(g):
        z = jnp.zeros_like
        if not config.learn_kernel:
            g = g.replace(log_sig2=z(g.log_sig2), log_ell=z(g.log_ell))
        if not config.learn_noise and hasattr(g, "log_noise2"):
            g = g.replace(log_noise2=z(g.log_noise2))
        return g

    rep = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))
    bshx = NamedSharding(mesh, P(axis, None))

    def body(state, opt_state, xb, yb, sb, wb):
        elbo, grads = model.elbo_and_grads(
            state, xb, yb, sb,
            maxiter_cg=config.maxiter_cg,
            integrated_obs=config.integrated_obs,
            semi_integrated_estimator=config.semi_integrated_estimator,
            semi_integrated_samps=config.num_semi_mc_samples,
            weights=wb,
            compute_hyper_grads=learn_hyper,
        )
        grads = zero_frozen(grads)
        updates, opt_state = opt.update(grads, opt_state, state)
        state = optax.apply_updates(state, updates)
        return state, opt_state, elbo

    if has_noise:
        @partial(
            jax.jit,
            in_shardings=(rep, rep, bshx, bsh, bsh, bsh),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
        def train_step(state, opt_state, xb, yb, sb, wb):
            return body(state, opt_state, xb, yb, sb, wb)
    else:
        @partial(
            jax.jit,
            in_shardings=(rep, rep, bshx, bsh, bsh),
            out_shardings=(rep, rep, rep),
            donate_argnums=(0, 1),
        )
        def train_step(state, opt_state, xb, yb, wb):
            return body(state, opt_state, xb, yb, None, wb)

    return train_step


def dp_svigp_fit(model, state, xtrain, ytrain, noise_std_train, config, mesh,
                 axis: str = "dp", verbose: bool = True):
    """Data-parallel svigp_fit: per-epoch host loop over macro-batches whose
    rows are sharded across the mesh.  Returns (state, report) matching
    `infer.svigp_fit`."""
    import time

    from ..infer.fit import make_optimizer, prepare_batches

    xb, yb, sb, w = prepare_batches(
        jnp.asarray(xtrain, model.dtype),
        jnp.asarray(ytrain, model.dtype),
        None if config.learn_noise or noise_std_train is None
        else jnp.asarray(noise_std_train, model.dtype),
        config.batch_size,
    )
    nb = xb.shape[0]
    # the jitted step donates its state buffers; keep the caller's copy alive
    state = jax.tree.map(lambda a: a + 0, state)
    opt = make_optimizer(state, config)
    opt_state = opt.init(state)
    step = make_dp_train_step(model, config, opt, mesh, axis=axis,
                              has_noise=sb is not None)

    trace, epoch_elbos, epoch_times = [], [], []
    for epoch in range(config.epochs):
        t0 = time.time()
        elbos = []
        for i in range(nb):
            if sb is not None:
                state, opt_state, elbo = step(state, opt_state, xb[i], yb[i],
                                              sb[i], w[i])
            else:
                state, opt_state, elbo = step(state, opt_state, xb[i], yb[i],
                                              w[i])
            elbos.append(elbo)
        jax.block_until_ready(state.theta1)
        elbos = [float(e) for e in elbos]
        trace.extend(elbos)
        epoch_elbos.append(sum(elbos) / len(elbos))
        epoch_times.append(time.time() - t0)
        if (getattr(config, "error_on_nonfinite", True)
                and not np.isfinite(epoch_elbos[-1])):
            raise RuntimeError(
                f"[dp] epoch {epoch} mean ELBO is non-finite "
                f"({epoch_elbos[-1]}) — same guidance as infer.svigp_fit: "
                "lower the natgrad lr (mean-field stability limit, RESULTS "
                "sec. 12) or use batch_solve; set "
                "config.error_on_nonfinite=False to grind on."
            )
        if verbose:
            print(f"[dp] epoch {epoch}: elbo {epoch_elbos[-1]:.4f} "
                  f"({epoch_times[-1]:.2f}s)")
    return state, {"elbo_trace": trace, "epoch_elbos": epoch_elbos,
                   "epoch_times": epoch_times}
