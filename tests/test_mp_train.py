"""Model-parallel natural-gradient TRAINING vs the single-device loop.

The round-2 gap (VERDICT item 1): a model whose whitened state exceeds one
chip could be solved once (`mp_batch_solve`) but not trained.  These tests
pin the grid-sharded natgrad step — `make_mp_kn_fn` threading the sharded
whitening solve through the UNCHANGED `elbo_and_grads` natgrad/hyper-grad
code — against `infer.svigp_fit` on an 8-CPU ('dp', 'grid') mesh in f64.

Parity reference: `ziggy/svi_gp.py:282-388` (the minibatch natgrad loop) +
`ziggy/hipgp.py:194-276` (elbo_and_grad), distributed.  Tolerances follow
test_mp.py: the truncated PCG whitening runs on a ~1e6-conditioned clamped
spectrum, so sharded-reduction-order perturbations surface at ~1e-6..1e-5
relative (NOT f64 eps) — same magnitude the closed-form mp solve shows.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hipgp_tpu.infer.fit import FitConfig, svigp_fit
from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP
from hipgp_tpu.parallel import (
    make_mp_kn_fn,
    mp_elbo_and_grads,
    mp_predict,
    mp_shard_state,
    mp_svigp_fit,
)


def _mesh(ndp, ng):
    devs = np.array(jax.devices()[: ndp * ng]).reshape(ndp, ng)
    return Mesh(devs, ("dp", "grid"))


def _data(N=300, seed=0, dim=2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.95, (N, dim))
    f = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, -1])
    s = rng.uniform(0.05, 0.15, N)
    y = f + s * rng.standard_normal(N)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)


def _model(N, ng, grids=None, **kw):
    grids = grids or [jnp.linspace(0.0, 1.0, 11)] * 2
    return HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                 ell_init=0.15, noise2_init=0.01, grid_shards=ng,
                 dtype=jnp.float64, **kw)


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-300)


def test_mp_elbo_and_natgrad_match_single_device():
    x, y, s = _data()
    ng = 4
    model = _model(len(x), ng)
    state = model.init_state()

    elbo_ref, g_ref = model.elbo_and_grads(
        state, x[:100], y[:100], s[:100], maxiter_cg=30
    )
    mesh = _mesh(2, ng)
    elbo_mp, g_mp = jax.jit(
        lambda st: mp_elbo_and_grads(
            model, st, x[:100], y[:100], s[:100], mesh=mesh, maxiter_cg=30
        )
    )(mp_shard_state(state, mesh))

    np.testing.assert_allclose(float(elbo_mp), float(elbo_ref), rtol=1e-4)
    assert _rel(g_mp.theta1, g_ref.theta1) < 1e-5
    assert _rel(g_mp.theta2, g_ref.theta2) < 1e-5


def test_mp_hyper_grads_match_single_device():
    """Hyperparameter gradients THROUGH the sharded whitening solve (the
    implicit-diff custom_linear_solve path of `local_whiten_diff`)."""
    x, y, s = _data()
    ng = 4
    model = _model(len(x), ng)
    state = model.init_state()

    _, g_ref = model.elbo_and_grads(
        state, x[:100], y[:100], s[:100], maxiter_cg=30,
        compute_hyper_grads=True,
    )
    mesh = _mesh(2, ng)
    _, g_mp = jax.jit(
        lambda st: mp_elbo_and_grads(
            model, st, x[:100], y[:100], s[:100], mesh=mesh, maxiter_cg=30,
            compute_hyper_grads=True,
        )
    )(mp_shard_state(state, mesh))

    np.testing.assert_allclose(float(g_mp.log_sig2), float(g_ref.log_sig2),
                               rtol=1e-4)
    np.testing.assert_allclose(float(g_mp.log_ell), float(g_ref.log_ell),
                               rtol=1e-3)


def test_mp_natgrad_trajectory_matches_single_device():
    """Three warm-started natgrad epochs WITH hyperparameter learning: the
    full mp training loop (sharded state, sharded data, optax updates on
    shards) tracks the single-device trajectory epoch by epoch."""
    x, y, s = _data()
    ng = 4
    model = _model(len(x), ng)
    state = model.init_state()
    cfg = FitConfig(epochs=3, batch_size=100, lr=0.01, maxiter_cg=30,
                    learn_kernel=True, kernel_lr=1e-3)

    st_ref, rep_ref = svigp_fit(model, state, x, y, s, cfg, verbose=False,
                                theta2_warmstart=True)
    mesh = _mesh(2, ng)
    st_mp, rep_mp = mp_svigp_fit(model, state, x, y, s, cfg, mesh,
                                 verbose=False, theta2_warmstart=True)

    np.testing.assert_allclose(rep_mp["epoch_elbos"], rep_ref["epoch_elbos"],
                               rtol=1e-5)
    assert _rel(st_mp.theta1, st_ref.theta1) < 1e-5
    assert _rel(st_mp.theta2, st_ref.theta2) < 1e-5
    np.testing.assert_allclose(float(st_mp.log_ell), float(st_ref.log_ell),
                               rtol=1e-6)
    # the trained sharded state drives the sharded predict directly
    xq, _, _ = _data(N=64, seed=7)
    mu_ref, _ = model.predict(st_ref, xq, maxiter_cg=30)
    mu, _ = mp_predict(model, st_mp, xq, mesh, maxiter_cg=30)
    # atol: the ~1e-5-relative trained-theta1 difference lands as ~1e-5
    # absolute on near-zero posterior means
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-4, atol=5e-5)


def test_mp_fit_uneven_batch_and_no_noise():
    """Batch size not divisible by n_dp (rounded up internally) and the
    learned-noise path (no per-point noise input)."""
    x, y, _ = _data(N=250)
    ng = 4
    model = _model(len(x), ng, learn_noise=True)
    state = model.init_state()
    cfg = FitConfig(epochs=2, batch_size=91, lr=0.01, maxiter_cg=20,
                    learn_noise=True, kernel_lr=1e-3)

    st_ref, rep_ref = svigp_fit(
        model, state, x, y, None,
        dataclasses.replace(cfg, batch_size=92),  # 92 = 91 rounded to dp=2
        verbose=False,
    )
    mesh = _mesh(2, ng)
    st_mp, rep_mp = mp_svigp_fit(model, state, x, y, None, cfg, mesh,
                                 verbose=False)
    np.testing.assert_allclose(rep_mp["epoch_elbos"], rep_ref["epoch_elbos"],
                               rtol=1e-5)
    assert _rel(st_mp.theta1, st_ref.theta1) < 1e-5
    np.testing.assert_allclose(float(st_mp.log_noise2),
                               float(st_ref.log_noise2), rtol=1e-6)


def test_mp_kn_fn_1d_four_step():
    """kn_fn on a 1-D grid: the sharded four-step FFT under the whitening
    solve, vs the single-device compute_kn."""
    x, y, s = _data(N=120, dim=1)
    ng = 4
    grids = [jnp.linspace(0.0, 1.0, 40)]
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.08, noise2_init=0.01, grid_shards=ng,
                  dtype=jnp.float64)
    state = model.init_state()
    mesh = _mesh(2, ng)
    kn_fn = make_mp_kn_fn(model, mesh, maxiter_cg=60)
    kn, knn = jax.jit(lambda st: kn_fn(st, x[:40], None))(state)

    Knm, Knn_ref = model.make_grams(state, x[:40])
    kn_ref = model.compute_kn(state, Knm, maxiter_cg=60)
    np.testing.assert_allclose(np.asarray(kn), np.asarray(kn_ref),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(knn), np.asarray(Knn_ref))


def test_mp_block_natgrad_trajectory_matches_single_device():
    """Block family through the mp training loop: the block natgrad branch
    (`ziggy/hipgp.py:527-690`) runs on grid-sharded global arrays — theta2
    (num_blocks, bs, bs) sharded along the block axis, block gathers handled
    by XLA's sharding propagation over the sharded kn."""
    x, y, s = _data()
    ng = 4
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 11)] * 2, num_obs=len(x),
                  family="block", block_sizes=(5, 4), ell_init=0.15,
                  noise2_init=0.01, grid_shards=ng, dtype=jnp.float64)
    state = model.init_state()
    cfg = FitConfig(epochs=2, batch_size=100, lr=0.01, maxiter_cg=30)

    st_ref, rep_ref = svigp_fit(model, state, x, y, s, cfg, verbose=False,
                                theta2_warmstart=True)
    mesh = _mesh(2, ng)
    st_mp, rep_mp = mp_svigp_fit(model, state, x, y, s, cfg, mesh,
                                 verbose=False, theta2_warmstart=True)
    np.testing.assert_allclose(rep_mp["epoch_elbos"], rep_ref["epoch_elbos"],
                               rtol=1e-5)
    assert _rel(st_mp.theta1, st_ref.theta1) < 1e-5
    assert _rel(st_mp.theta2, st_ref.theta2) < 1e-5
    xq, _, _ = _data(N=64, seed=7)
    # predict-time PCG must be CONVERGED for this comparison: truncated
    # iterates differ between sharded and single-device reduction orders,
    # and sig^2 amplifies that where Knn - kn.kn nearly cancels (CLAUDE.md
    # solver-variant comparison rule)
    mu_ref, sig_ref = model.predict(st_ref, xq, maxiter_cg=300)
    mu, sig = mp_predict(model, st_mp, xq, mesh, maxiter_cg=300)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=1e-4, atol=5e-5)


def test_mp_fit_sharded_spectrum_matches_host():
    """spectrum_mode='sharded' through the TRAINING loop: the in-graph
    per-shard spectrum build (`local_spectrum_weights`) is differentiable,
    so hyperparameter learning works without any device materializing all
    M' eigenvalues."""
    x, y, s = _data()
    ng = 4
    model = _model(len(x), ng)
    state = model.init_state()
    cfg = FitConfig(epochs=2, batch_size=100, lr=0.01, maxiter_cg=30,
                    learn_kernel=True, kernel_lr=1e-3)
    mesh = _mesh(2, ng)
    st_h, rep_h = mp_svigp_fit(model, state, x, y, s, cfg, mesh,
                               verbose=False, theta2_warmstart=True)
    st_s, rep_s = mp_svigp_fit(model, state, x, y, s, cfg, mesh,
                               verbose=False, theta2_warmstart=True,
                               spectrum_mode="sharded")
    # host/sharded spectra agree to ~1e-15; the truncated-PCG whitening
    # plus two natgrad epochs amplify that to ~1e-5 on the trajectory
    np.testing.assert_allclose(rep_s["epoch_elbos"], rep_h["epoch_elbos"],
                               rtol=1e-4)
    assert _rel(st_s.theta1, st_h.theta1) < 1e-4
    np.testing.assert_allclose(float(st_s.log_ell), float(st_h.log_ell),
                               rtol=1e-6)
