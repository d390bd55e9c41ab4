"""Kernel layer: stationary forms, inter-domain cross-covariances vs
quadrature oracles, derivative kernels vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import (
    DoublyDiagInterpolator,
    Gneiting,
    Matern,
    SqExp,
    k_doubly_diag_quad,
    k_semi_mc,
    k_semi_quad,
    k_semi_sqexp,
    kernel_from_name,
)
from hipgp_tpu.kernels.derivatives import (
    grad_cross_cov,
    grad_grad_cov,
    sqexp_k,
    sqexp_kprime,
    sqexp_kprime_double,
)

PARAMS = (1.7, 0.4)


def _pts(rng, n, d=2):
    return jnp.asarray(rng.uniform(-1.0, 1.0, (n, d)))


def test_sqexp_basic(rng):
    k = SqExp()
    x, y = _pts(rng, 4), _pts(rng, 5)
    K = k(x, y, PARAMS)
    assert K.shape == (4, 5)
    # symmetry + diag
    Kxx = k(x, x, PARAMS)
    np.testing.assert_allclose(np.asarray(Kxx), np.asarray(Kxx.T), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(jnp.diag(Kxx)), np.asarray(k.diag(x, PARAMS)))


def test_sqexp_ard(rng):
    k = SqExp()
    x, y = _pts(rng, 3), _pts(rng, 3)
    ell = jnp.asarray([0.3, 0.8])
    K = k(x, y, (1.0, ell))
    d = (x[:, None, :] - y[None, :, :]) / ell
    want = jnp.exp(-0.5 * jnp.sum(d * d, -1))
    np.testing.assert_allclose(np.asarray(K), np.asarray(want), rtol=1e-12)


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_known_values(nu):
    k = Matern(nu)
    x = jnp.asarray([[0.0]])
    y = jnp.asarray([[0.0], [0.5]])
    K = np.asarray(k(x, y, (2.0, 0.5)))
    np.testing.assert_allclose(K[0, 0], 2.0, rtol=1e-6)
    d = 0.5 / 0.5
    if nu == 0.5:
        want = 2.0 * np.exp(-d)
    elif nu == 1.5:
        want = 2.0 * (1 + np.sqrt(3) * d) * np.exp(-np.sqrt(3) * d)
    else:
        want = 2.0 * (1 + np.sqrt(5) * d + 5.0 / 3.0 * d * d) * np.exp(-np.sqrt(5) * d)
    np.testing.assert_allclose(K[0, 1], want, rtol=1e-6)


def test_gneiting_compact_support(rng):
    k = Gneiting()
    x = jnp.zeros((1, 2))
    y = jnp.asarray([[0.0, 0.0], [2.0, 0.0]])  # second point beyond support
    K = np.asarray(k(x, y, (1.0, 1.0)))
    np.testing.assert_allclose(K[0, 0], 1.0, rtol=1e-6)
    assert K[0, 1] == 0.0


def test_kernel_factory():
    assert isinstance(kernel_from_name("Mat32"), Matern)
    assert kernel_from_name("Mat32").nu == 1.5
    assert isinstance(kernel_from_name("SqExp"), SqExp)
    with pytest.raises(ValueError):
        kernel_from_name("nope")


def test_k_semi_sqexp_vs_quadrature(rng):
    """Analytic semi-integrated SqExp matches high-order quadrature."""
    k = SqExp()
    xp = _pts(rng, 4)
    xi = _pts(rng, 3) + 1.5  # keep rays away from degenerate 0
    got = k_semi_sqexp(xp, xi, PARAMS)
    want = k_semi_quad(lambda a, b: np.asarray(k(jnp.asarray(a), jnp.asarray(b), PARAMS)),
                       np.asarray(xp), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-10)


def test_k_semi_mc_converges_to_quadrature(rng):
    k = Matern(1.5)
    xp = _pts(rng, 3)
    xi = _pts(rng, 2) + 1.2
    want = k_semi_quad(lambda a, b: np.asarray(k(jnp.asarray(a), jnp.asarray(b), PARAMS)),
                       np.asarray(xp), np.asarray(xi))
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    ests = jnp.stack([k_semi_mc(kk, k, xp, xi, PARAMS, npts=64) for kk in keys])
    np.testing.assert_allclose(np.asarray(jnp.mean(ests, 0)), want, rtol=2e-2)


def test_doubly_diag_interpolator_vs_quadrature(rng):
    k = SqExp()
    interp = DoublyDiagInterpolator(k, N=200, dmax=8.0)
    x = _pts(rng, 5) + 1.0
    got = np.asarray(interp(x, PARAMS))
    want = k_doubly_diag_quad(
        lambda a, b: np.asarray(k(jnp.asarray(a), jnp.asarray(b), PARAMS)), np.asarray(x)
    )
    # coarse near the origin where g(d) is quadratic: linear-interp error
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_doubly_diag_scaling_invariance():
    """K~(x,x; sig2, ell) = sig2 ell^2 g(||x||/ell): interpolator scaling law
    equals direct quadrature at non-unit params."""
    k = SqExp()
    interp = DoublyDiagInterpolator(k, N=300, dmax=10.0)
    x = jnp.asarray([[0.7, 0.4]])
    for sig2, ell in [(2.0, 0.5), (0.5, 1.3)]:
        got = float(interp(x, (sig2, ell))[0])
        want = k_doubly_diag_quad(
            lambda a, b: np.asarray(k(jnp.asarray(a), jnp.asarray(b), (sig2, ell))),
            np.asarray(x),
        )[0]
        np.testing.assert_allclose(got, want, rtol=2e-3)


def test_doubly_diag_ard_matches_quadrature(rng):
    """ARD oracle: with ell a (D,) vector, the interpolator's per-point scale
    ||x||^2/||x/ell||^2 must reproduce direct 2-D quadrature of the ARD kernel
    (exact reduction k(ax,bx) = k1(|a-b| ||x/ell||))."""
    k = SqExp()
    interp = DoublyDiagInterpolator(k, N=300, dmax=10.0)
    ell = jnp.asarray([0.3, 0.9])
    sig2 = 1.7
    x = _pts(rng, 6) + 0.5
    got = np.asarray(interp(x, (sig2, ell)))
    want = k_doubly_diag_quad(
        lambda a, b: np.asarray(k(jnp.asarray(a), jnp.asarray(b), (sig2, ell))),
        np.asarray(x),
    )
    np.testing.assert_allclose(got, want, rtol=2e-2)


def test_sqexp_derivative_closed_forms_match_autodiff(rng):
    sig2, ell = 1.3, 0.6
    x = jnp.asarray(rng.uniform(-1, 1, 4))
    y = jnp.asarray(rng.uniform(-1, 1, 5))

    def kscalar(a, b, params):
        s2, l = params
        return s2 * jnp.exp(-0.5 * (a - b) ** 2 / l**2)

    np.testing.assert_allclose(
        np.asarray(sqexp_kprime(x, y, sig2, ell)),
        np.asarray(grad_cross_cov(kscalar, x, y, (sig2, ell))),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sqexp_kprime_double(x, y, sig2, ell)),
        np.asarray(grad_grad_cov(kscalar, x, y, (sig2, ell))),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sqexp_k(x, y, sig2, ell)),
        np.asarray(SqExp()(x[:, None], y[:, None], (sig2, ell))),
        rtol=1e-12,
    )
