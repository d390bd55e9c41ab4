"""Dense SVGP baseline + 1-D derivative-observation GPs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import SVGP, HIPGP
from hipgp_tpu.models.derivative_gp import (
    compute_elbo,
    derivative_prediction,
    exact_gp_prediction,
    posterior_prediction,
    svgp_batch_solve,
)


def data_2d(n=50, noise=0.2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.95, (n, 2))
    f = np.sin(4 * x[:, 0]) + np.cos(3 * x[:, 1])
    y = f + noise * rng.standard_normal(n)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(np.full(n, noise)), f


def grid_inducing(m=7):
    g = np.linspace(0, 1, m)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    return jnp.asarray(np.column_stack([xx.ravel(), yy.ravel()]))


def test_svgp_whitened_vs_unwhitened_same_posterior():
    """The whitened and unwhitened parameterizations describe the same
    posterior: predictions agree."""
    x, y, s, _ = data_2d()
    xi = grid_inducing()
    kw = dict(num_obs=50, sig2_init=1.0, ell_init=0.25, jitter=1e-5)
    mw = SVGP(SqExp(), xi, whitened=True, **kw)
    mu_ = SVGP(SqExp(), xi, whitened=False, **kw)
    sw = mw.batch_solve(mw.init_state(), x, y, s)
    su = mu_.batch_solve(mu_.init_state(), x, y, s)
    pw = mw.predict(sw, x)
    pu = mu_.predict(su, x)
    np.testing.assert_allclose(np.asarray(pw[0]), np.asarray(pu[0]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pw[1]), np.asarray(pu[1]), rtol=1e-4, atol=1e-6)


def test_svgp_matches_hipgp_fullrank_cholesky():
    """SVGP whitened == HIPGP full-rank cholesky: same math, two code paths."""
    x, y, s, _ = data_2d()
    grids = [jnp.linspace(0.0, 1.0, 7)] * 2
    hip = HIPGP(SqExp(), grids, num_obs=50, family="full-rank",
                whitened_type="cholesky", ell_init=0.25, jitter=1e-5)
    svgp = SVGP(SqExp(), hip.xinduce, num_obs=50, whitened=True,
                ell_init=0.25, jitter=1e-5)
    sh = hip.batch_solve(hip.init_state(), x, y, s)
    ss = svgp.batch_solve(svgp.init_state(), x, y, s)
    ph = hip.predict(sh, x)
    ps = svgp.predict(ss, x)
    np.testing.assert_allclose(np.asarray(ph[0]), np.asarray(ps[0]), rtol=1e-6, atol=1e-9)


def test_svgp_natgrad_step_hits_batch_solve():
    x, y, s, _ = data_2d()
    xi = grid_inducing()
    m = SVGP(SqExp(), xi, num_obs=50, whitened=True, ell_init=0.25)
    st = m.init_state()
    _, g = m.elbo_and_grads(st, x, y, s)
    stepped = st.replace(theta1=st.theta1 - g.theta1, theta2=st.theta2 - g.theta2)
    solved = m.batch_solve(st, x, y, s)
    np.testing.assert_allclose(np.asarray(stepped.theta1), np.asarray(solved.theta1), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stepped.theta2), np.asarray(solved.theta2), rtol=1e-7, atol=1e-9)


def test_svgp_kernel_grads_finite():
    x, y, s, _ = data_2d()
    xi = grid_inducing()
    m = SVGP(SqExp(), xi, num_obs=50, whitened=True, ell_init=0.25)
    st = m.init_state()
    elbo, g = m.elbo_and_grads(st, x, y, s, compute_kernel_grads=True)
    assert np.isfinite(float(g.log_ell)) and np.isfinite(float(g.log_sig2))
    assert abs(float(g.log_ell)) > 0


# ---------------------------------------------------------------------------
# derivative observations (1-D)
# ---------------------------------------------------------------------------


def deriv_data(seed=0, nl=40, npr=15, noise=0.05):
    rng = np.random.default_rng(seed)
    f = lambda t: np.sin(3 * t) * np.exp(-0.2 * t)
    fp = lambda t: 3 * np.cos(3 * t) * np.exp(-0.2 * t) - 0.2 * np.sin(3 * t) * np.exp(-0.2 * t)
    x = np.sort(rng.uniform(0, 2, nl))
    xp = np.sort(rng.uniform(0, 2, npr))
    y = f(x) + noise * rng.standard_normal(nl)
    yp = fp(xp) + noise * rng.standard_normal(npr)
    return (jnp.asarray(x), jnp.asarray(y), jnp.asarray(xp), jnp.asarray(yp), f, fp)


SIG2, ELL = 1.0, 0.4
NOISE = 0.05


def test_exact_gp_learns_function_from_both_obs():
    x, y, xp, yp, f, _ = deriv_data()
    xtest = jnp.linspace(0.1, 1.9, 50)
    mu, s2 = exact_gp_prediction(xtest, xp, yp, x, y, SIG2, ELL, NOISE, NOISE)
    rmse = float(jnp.sqrt(jnp.mean((mu - jnp.asarray(f(np.asarray(xtest)))) ** 2)))
    assert rmse < 0.08
    assert np.all(np.asarray(s2) > 0)


def test_exact_gp_derivative_only_recovers_shape():
    """With derivative obs only, f is identified up to a constant — compare
    centered predictions."""
    x, y, xp, yp, f, _ = deriv_data(npr=40)
    xtest = jnp.linspace(0.1, 1.9, 50)
    mu, _ = derivative_prediction(xp, yp, xtest, SIG2, ELL)
    ft = f(np.asarray(xtest))
    mu_c = np.asarray(mu[0]) if isinstance(mu, tuple) else np.asarray(mu)
    mu_c = mu_c - mu_c.mean()
    assert np.sqrt(np.mean((mu_c - (ft - ft.mean())) ** 2)) < 0.15


@pytest.mark.parametrize("whitened_type", ["cholesky", "ziggy"])
def test_svgp_batch_solve_derivative_obs(whitened_type):
    """Inducing-point posterior from mixed obs approaches the exact GP."""
    x, y, xp, yp, f, fp = deriv_data()
    u = jnp.linspace(-0.1, 2.1, 64)
    m, S = svgp_batch_solve(
        u, xp, yp, x, y, SIG2, ELL, NOISE, NOISE,
        whitened_type=whitened_type, maxiter=300, tol=1e-12,
    )
    xtest = jnp.linspace(0.1, 1.9, 40)
    mu, s2 = posterior_prediction(
        x=xtest, u=u, m=m, S=S, sig2=SIG2, ell=ELL,
        whitened_type=whitened_type, maxiter=300, tol=1e-12,
    )
    mu_ex, _ = exact_gp_prediction(xtest, xp, yp, x, y, SIG2, ELL, NOISE, NOISE)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ex), atol=0.05)
    # derivative-domain predictions track f'
    mup, _ = posterior_prediction(
        x=xtest, u=u, m=m, S=S, sig2=SIG2, ell=ELL, domain="prime",
        whitened_type=whitened_type, maxiter=300, tol=1e-12,
    )
    assert float(jnp.sqrt(jnp.mean((mup - jnp.asarray(fp(np.asarray(xtest)))) ** 2))) < 0.25


def test_derivative_elbo_differentiable_and_peaks_near_truth():
    """ELBO is differentiable in (sig2, ell) through the whitened solve and
    prefers the data-generating lengthscale region."""
    x, y, xp, yp, _, _ = deriv_data()
    u = jnp.linspace(-0.1, 2.1, 48)

    def elbo_of(log_ell):
        ell = jnp.exp(log_ell)
        m, S = svgp_batch_solve(u, xp, yp, x, y, SIG2, ell, NOISE, NOISE,
                                whitened_type="cholesky")
        return compute_elbo(u, m, S, xp, yp, x, y, SIG2, ell, NOISE, NOISE,
                            whitened_type="cholesky")

    g = jax.grad(elbo_of)(jnp.log(0.4))
    assert np.isfinite(float(g))
    e_small = float(elbo_of(jnp.log(0.02)))
    e_mid = float(elbo_of(jnp.log(0.4)))
    assert e_mid > e_small
