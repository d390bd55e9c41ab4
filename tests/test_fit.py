"""Training loop: svigp_fit, ell_fit, batch_predict."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.infer import (
    FitConfig,
    batch_predict,
    ell_fit,
    predictive_variance_correction,
    svigp_fit,
)
from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP


def make_problem(n=300, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.95, (n, 2))
    f = np.sin(4 * x[:, 0]) * np.cos(3 * x[:, 1])
    y = f + noise * rng.standard_normal(n)
    s = np.full(n, noise)
    grids = [jnp.linspace(0.0, 1.0, 10)] * 2
    model = HIPGP(SqExp(), grids, num_obs=n, family="mean-field",
                  whitened_type="ziggy", ell_init=0.15, noise2_init=noise**2)
    return model, x, y, s, f


def test_svigp_fit_improves_elbo_and_fits():
    model, x, y, s, f = make_problem()
    cfg = FitConfig(epochs=8, batch_size=64, lr=0.02, maxiter_cg=30,
                    step_decay=0.995)
    state, report = svigp_fit(model, model.init_state(), x, y, s, cfg,
                              verbose=False)
    assert report["epoch_elbos"][-1] > report["epoch_elbos"][0]
    mu, sig = batch_predict(model, state, x, batch_size=100, maxiter_cg=50)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - f) ** 2)))
    assert rmse < 0.25
    assert len(report["elbo_trace"]) == 8 * (300 // 64 + 1)
    assert len(report["epoch_times"]) == 8


def test_svigp_fit_learns_hyperparams():
    model, x, y, s, f = make_problem()
    cfg = FitConfig(epochs=4, batch_size=100, lr=0.02, maxiter_cg=30,
                    learn_kernel=True, kernel_lr=5e-2)
    st0 = model.init_state()
    state, report = svigp_fit(model, st0, x, y, s, cfg, verbose=False)
    # hyperparameters moved and were traced
    assert len(report["ell_trace"]) == 4
    assert abs(float(state.log_ell) - float(st0.log_ell)) > 1e-4


def test_ell_fit_selects_reasonable_lengthscale():
    model, x, y, s, f = make_problem()
    best_state, best_ell, ells, elbos = ell_fit(
        model, model.init_state(), x, y, s,
        ell_min=0.05, ell_max=0.4, ell_step_size=0.05,
        batch_solve_bsz=100, maxiter_cg=50, verbose=False,
    )
    assert 0.05 <= best_ell <= 0.4
    assert max(elbos) == elbos[ells.index(best_ell)]
    # solved state should fit well
    mu, _ = batch_predict(model, best_state, x, batch_size=100, maxiter_cg=50)
    assert float(np.sqrt(np.mean((np.asarray(mu) - f) ** 2))) < 0.2


def test_batch_predict_matches_direct():
    model, x, y, s, _ = make_problem(n=123)
    state = model.batch_solve(model.init_state(), jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(s), maxiter_cg=60)
    mu_b, sig_b = batch_predict(model, state, x, batch_size=40, maxiter_cg=60)
    mu_d, sig_d = model.predict(state, jnp.asarray(x), maxiter_cg=60)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_d), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_d), rtol=1e-6, atol=1e-8)


def test_predictive_variance_correction_positive():
    model, x, y, s, f = make_problem()
    state = model.batch_solve(model.init_state(), jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(s), maxiter_cg=50)
    c = predictive_variance_correction(model, state, x, y, s, maxiter_cg=50)
    assert np.isfinite(c) and c >= 0


def test_theta2_warmstart_removes_transient():
    """Warm-started natgrad's first-epoch ELBO vastly exceeds the cold
    start's, and the fit is at least as good."""
    model, x, y, s, f = make_problem(n=400, noise=0.05)
    cfg = FitConfig(epochs=4, batch_size=100, lr=0.05, maxiter_cg=30,
                    schedule_lr=False)
    st = model.init_state()
    _, rep_cold = svigp_fit(model, st, x, y, s, cfg, verbose=False)
    _, rep_warm = svigp_fit(model, st, x, y, s, cfg, verbose=False,
                            theta2_warmstart=True)
    assert rep_warm["epoch_elbos"][0] > rep_cold["epoch_elbos"][0]
    assert rep_warm["epoch_elbos"][-1] >= rep_cold["epoch_elbos"][-1] - 1e-3


def test_shuffle_changes_batches_but_still_fits():
    model, x, y, s, f = make_problem(n=300)
    cfg = FitConfig(epochs=4, batch_size=64, lr=0.02, maxiter_cg=30,
                    shuffle=True)
    state, report = svigp_fit(model, model.init_state(), x, y, s, cfg,
                              verbose=False)
    assert report["epoch_elbos"][-1] > report["epoch_elbos"][0]


def test_svgp_requires_noise():
    from hipgp_tpu.models import SVGP
    from hipgp_tpu.kernels import SqExp

    xi = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (9, 2)))
    m = SVGP(SqExp(), xi, num_obs=10)
    st = m.init_state()
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (10, 2)))
    y = jnp.zeros(10)
    with pytest.raises(ValueError, match="noise"):
        m.elbo_and_grads(st, x, y, None)


def test_prefer_eager_batch_solve_policy():
    """The gram mean solver must route through per-stage (eager) execution:
    the fused program is slower and gets watchdog-killed at scale on TPU
    (RESULTS section 9; repro results/repro/fused_gram_repro.py)."""
    from hipgp_tpu.infer import prefer_eager_batch_solve

    assert prefer_eager_batch_solve("gram")
    assert not prefer_eager_batch_solve("dense")
    assert not prefer_eager_batch_solve("cg")
