"""Natural-gradient stability guard + non-finite fail-loud (RESULTS sec. 12).

The mean-field natgrad recursion diverges geometrically when the lr exceeds
2/rho, rho = lambda_max(B S) — the batch precision B measured against the
warm diagonal metric S.  Under strong correlation (ell spanning many grid
spacings) rho >> 1 because mean-field keeps only the diagonal curvature;
the reference (`ziggy/svi_gp.py:282-388`) has the same instability and no
guard, grinding out NaN epochs (it is NOT an f32/eigenvalue-clamp effect:
at the documented ell=0.2, M=125^2 config the clamp never engages — min
circulant eig == jitter in both precisions — and the divergence reproduces
in f64).  Config here: m=48, ell=0.35 on [-1,1]^2 (~8 spacings), measured
rho ~ 380 => lr_crit ~ 5e-3, so the reference-default lr=1e-2 diverges and
the clamped lr converges.
"""
import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.infer.fit import FitConfig, svigp_fit
from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP


def _setup(ell=0.35, m=48, N=512, dt=jnp.float32):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N, 2)), dt)
    f = np.sin(3 * np.asarray(x[:, 0])) * np.cos(2 * np.asarray(x[:, 1]))
    y = jnp.asarray(f + 0.1 * rng.standard_normal(N), dt)
    s = jnp.full((N,), 0.1, dt)
    model = HIPGP(SqExp(), [jnp.linspace(-1, 1, m, dtype=dt)] * 2,
                  num_obs=N, family="mean-field", ell_init=ell,
                  sig2_init=0.5, noise2_init=0.01, dtype=dt)
    return model, x, y, s


def test_unstable_lr_warns_and_reports_limit():
    model, x, y, s = _setup()
    cfg = FitConfig(epochs=1, batch_size=128, lr=1e-2, schedule_lr=False,
                    maxiter_cg=20)
    with pytest.warns(UserWarning, match="stability limit"):
        _, rep = svigp_fit(model, model.init_state(), x, y, s, cfg,
                           theta2_warmstart=True, natgrad_safe_lr="warn",
                           verbose=False)
    assert rep["natgrad_rho"] is not None
    # measured rho ~ 380 at this config; the estimate must put lr_crit
    # strictly between the observed stable (2.6e-3) and divergent (1e-2) lrs
    assert 2.6e-3 < rep["natgrad_lr_crit"] < 1e-2


def test_clamp_completes_and_improves():
    model, x, y, s = _setup()
    cfg = FitConfig(epochs=3, batch_size=128, lr=1e-2, schedule_lr=False,
                    maxiter_cg=20)
    state, rep = svigp_fit(model, model.init_state(), x, y, s, cfg,
                           theta2_warmstart=True, natgrad_safe_lr="clamp",
                           verbose=False)
    assert rep["lr_used"] < 1e-2
    assert np.isfinite(np.asarray(state.theta1)).all()
    assert np.isfinite(rep["epoch_elbos"]).all()
    assert rep["epoch_elbos"][-1] > rep["epoch_elbos"][0]


def test_benign_config_does_not_warn():
    # ell = 2.3 grid spacings: weak correlation, rho small, lr=1e-2 safe
    model, x, y, s = _setup(ell=0.1)
    cfg = FitConfig(epochs=1, batch_size=128, lr=1e-2, schedule_lr=False,
                    maxiter_cg=20)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _, rep = svigp_fit(model, model.init_state(), x, y, s, cfg,
                           theta2_warmstart=True, natgrad_safe_lr="warn",
                           verbose=False)
    assert rep["natgrad_lr_crit"] > 1e-2


def test_nonfinite_epoch_raises():
    model, x, y, s = _setup()
    y = y.at[7].set(jnp.nan)
    cfg = FitConfig(epochs=2, batch_size=128, lr=1e-3, schedule_lr=False,
                    maxiter_cg=10)
    with pytest.raises(RuntimeError, match="non-finite"):
        svigp_fit(model, model.init_state(), x, y, s, cfg,
                  natgrad_safe_lr="off", verbose=False)


def test_nonfinite_optout_grinds_on():
    model, x, y, s = _setup()
    y = y.at[7].set(jnp.nan)
    cfg = FitConfig(epochs=1, batch_size=128, lr=1e-3, schedule_lr=False,
                    maxiter_cg=10, error_on_nonfinite=False)
    _, rep = svigp_fit(model, model.init_state(), x, y, s, cfg,
                       natgrad_safe_lr="off", verbose=False)
    assert not np.isfinite(rep["epoch_elbos"][-1])


def test_dp_nonfinite_epoch_raises():
    from hipgp_tpu.parallel import make_mesh
    from hipgp_tpu.parallel.dp import dp_svigp_fit

    model, x, y, s = _setup(ell=0.1, m=16, N=256)
    y = y.at[3].set(jnp.nan)
    cfg = FitConfig(epochs=1, batch_size=64, lr=1e-3, schedule_lr=False,
                    maxiter_cg=5)
    with pytest.raises(RuntimeError, match="non-finite"):
        dp_svigp_fit(model, model.init_state(), x, y, s, cfg, make_mesh(),
                     verbose=False)


def test_block_family_stability_estimate():
    """The rho estimate generalizes to the block family (S applied through
    block_diag_multiply): same strongly-correlated config, block metric
    retains more curvature than mean-field so rho is no larger; the
    clamped fit completes finite."""
    rng = np.random.default_rng(0)
    N, m, dt = 512, 48, jnp.float32
    x = jnp.asarray(rng.uniform(-1, 1, (N, 2)), dt)
    f = np.sin(3 * np.asarray(x[:, 0])) * np.cos(2 * np.asarray(x[:, 1]))
    y = jnp.asarray(f + 0.1 * rng.standard_normal(N), dt)
    s = jnp.full((N,), 0.1, dt)
    model = HIPGP(SqExp(), [jnp.linspace(-1, 1, m, dtype=dt)] * 2,
                  num_obs=N, family="block", xblock_size=2, ell_init=0.35,
                  sig2_init=0.5, noise2_init=0.01, dtype=dt)
    cfg = FitConfig(epochs=1, batch_size=128, lr=1e-2, schedule_lr=False,
                    maxiter_cg=20)
    state, rep = svigp_fit(model, model.init_state(), x, y, s, cfg,
                           theta2_warmstart=True, natgrad_safe_lr="clamp",
                           verbose=False)
    assert rep["natgrad_rho"] is not None and rep["natgrad_rho"] > 1.0
    assert np.isfinite(np.asarray(state.theta1)).all()
