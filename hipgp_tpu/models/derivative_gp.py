"""1-D GPs with derivative observations (functional API).

Parity reference: `ziggy/exact_gp_1d_derivatives.py` — mixed derivative +
function observations of a 1-D SqExp GP: exact joint-GP prediction oracle,
inducing-point batch solve (cholesky- or circulant-whitened), posterior
prediction in the latent or derivative domain, and the ELBO used for
hyperparameter learning.

Deviations: batching is left to jit/vmap (no host batch loops); the
derivative-branch ELBO uses the correct prior diagonal Cov(f'(x), f'(x)) =
sig2/ell^2 (the reference passes sig2 for both branches,
`ziggy/exact_gp_1d_derivatives.py:305,338`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels import SqExp
from ..kernels.derivatives import (
    sqexp_k,
    sqexp_k_diag,
    sqexp_kprime,
    sqexp_kprime_double,
    sqexp_kprime_double_diag,
)
from ..ops import make_spectrum, matmul_by_RT, spd_inverse, whiten
from ..utils import stats

__all__ = [
    "exact_gp_prediction",
    "derivative_prediction",
    "latent_from_derivative_prediction",
    "svgp_batch_solve",
    "posterior_prediction",
    "compute_elbo",
]


def _whiten_kn(u, Knm, sig2, ell, whitened_type, maxiter, tol, jitter):
    """kn (n, M'): whitened cross-covariances over the 1-D inducing grid u."""
    if whitened_type == "cholesky":
        Kuu = sqexp_k(u, u, sig2, ell) + jitter * jnp.eye(u.shape[0], dtype=u.dtype)
        L = jnp.linalg.cholesky(Kuu)
        return jax.scipy.linalg.solve_triangular(L, Knm.T, lower=True).T
    kern = SqExp()
    spec = make_spectrum([u], lambda a, b: kern(a, b, (sig2, ell)), jitter=jitter)
    return whiten(spec, Knm, maxiter=maxiter, tol=tol)


def exact_gp_prediction(
    xtest, xprime, yprime, xlatent, ylatent, sig2, ell,
    derivative_obs_noise_std, obs_noise_std,
):
    """Dense joint-GP oracle over mixed observations
    (`ziggy/exact_gp_1d_derivatives.py:209-261`).

    Builds [[K'' + s'^2 I, K'], [K'^T, K + s^2 I]] and predicts the latent
    f at xtest.  Returns (mu (ntest,), sig2* (ntest,)).
    """
    blocks_row = []
    ys = []
    ktest_cols = []
    if xprime is not None:
        npr = xprime.shape[0]
        Kpp = sqexp_kprime_double(xprime, xprime, sig2, ell)
        Kpp = Kpp + derivative_obs_noise_std**2 * jnp.eye(npr, dtype=Kpp.dtype)
        ys.append(yprime.reshape(-1))
        ktest_cols.append(sqexp_kprime(xprime, xtest, sig2, ell).T)  # (ntest, npr)
    if xlatent is not None:
        nl = xlatent.shape[0]
        Kll = sqexp_k(xlatent, xlatent, sig2, ell)
        Kll = Kll + obs_noise_std**2 * jnp.eye(nl, dtype=Kll.dtype)
        ys.append(ylatent.reshape(-1))
        ktest_cols.append(sqexp_k(xlatent, xtest, sig2, ell).T)  # (ntest, nl)

    if xprime is not None and xlatent is not None:
        corr = sqexp_kprime(xprime, xlatent, sig2, ell)
        K = jnp.block([[Kpp, corr], [corr.T, Kll]])
    elif xprime is not None:
        K = Kpp
    else:
        K = Kll

    ytot = jnp.concatenate(ys)
    ktest = jnp.concatenate(ktest_cols, axis=1)  # (ntest, ntotal)

    alpha = jnp.linalg.solve(K, ytot)
    mu = ktest @ alpha
    v = jnp.linalg.solve(K, ktest.T)  # (ntotal, ntest)
    sig2_star = sig2 - jnp.sum(ktest.T * v, axis=0)
    return mu, sig2_star


def derivative_prediction(xprime, yprime, x, sig2, ell, jitter=1e-4):
    """Predict latent f at x from derivative observations alone
    (`ziggy/exact_gp_1d_derivatives.py:41-58`)."""
    npr = xprime.shape[0]
    Kpp = sqexp_kprime_double(xprime, xprime, sig2, ell) + jitter * jnp.eye(
        npr, dtype=xprime.dtype
    )
    Kpx = sqexp_kprime(xprime, x, sig2, ell)  # (npr, n)
    Kxx = sqexp_k(x, x, sig2, ell)
    mu = Kpx.T @ jnp.linalg.solve(Kpp, yprime.reshape(-1))
    cov = Kxx - Kpx.T @ jnp.linalg.solve(Kpp, Kpx)
    return mu, cov


def latent_from_derivative_prediction(x, y, xprime, sig2, ell, jitter=1e-4):
    """Predict f' at xprime from function observations
    (`ziggy/exact_gp_1d_derivatives.py:61-76`)."""
    n = x.shape[0]
    Kxx = sqexp_k(x, x, sig2, ell) + jitter * jnp.eye(n, dtype=x.dtype)
    Kpx = sqexp_kprime(xprime, x, sig2, ell)  # (npr, n)
    Kpp = sqexp_kprime_double(xprime, xprime, sig2, ell)
    mu = Kpx @ jnp.linalg.solve(Kxx, y.reshape(-1))
    cov = Kpp - Kpx @ jnp.linalg.solve(Kxx, Kpx.T)
    return mu, cov


def svgp_batch_solve(
    u, xprime, yprime, x, y, sig2, ell,
    derivative_obs_noise_std, obs_noise_std,
    whitened_type: str = "ziggy",
    maxiter: int = 20,
    tol: float = 1e-8,
    jitter: float = 1e-4,
):
    """Closed-form optimal q over 1-D inducing grid u from mixed observations
    (`ziggy/exact_gp_1d_derivatives.py:77-155`).  Returns (m (M',), S (M',M')).
    """
    M = u.shape[0]
    from ..ops.bttb import embedded_dims
    Mp = embedded_dims((M,))[0] if whitened_type == "ziggy" else M
    Lam = jnp.eye(Mp, dtype=u.dtype)
    b = jnp.zeros((Mp,), u.dtype)

    def accumulate(Lam, b, Knm, yb, noise_std):
        kn = _whiten_kn(u, Knm, sig2, ell, whitened_type, maxiter, tol, jitter)
        ivar = 1.0 / noise_std**2
        Lam = Lam + ivar * (kn.T @ kn)
        b = b + ivar * (kn.T @ yb.reshape(-1))
        return Lam, b

    if xprime is not None:
        Knm = sqexp_kprime(xprime, u, sig2, ell)
        Lam, b = accumulate(Lam, b, Knm, yprime, derivative_obs_noise_std)
    if x is not None:
        Knm = sqexp_k(x, u, sig2, ell)
        Lam, b = accumulate(Lam, b, Knm, y, obs_noise_std)

    S = spd_inverse(Lam)
    m = S @ b
    return m, S


def posterior_prediction(
    x, u, m, S, sig2, ell,
    domain: str = "latent",
    whitened_type: str = "ziggy",
    maxiter: int = 20,
    tol: float = 1e-8,
    jitter: float = 1e-4,
):
    """Posterior (mu, sig2*) at x in the 'latent' (f) or 'prime' (f') domain
    (`ziggy/exact_gp_1d_derivatives.py:158-206`)."""
    if domain == "latent":
        Knm = sqexp_k(x, u, sig2, ell)
        Knn = sqexp_k_diag(x, sig2, ell)
    elif domain == "prime":
        Knm = sqexp_kprime(x, u, sig2, ell)
        Knn = sqexp_kprime_double_diag(x, sig2, ell)
    else:
        raise ValueError(f"unknown domain {domain!r}")
    kn = _whiten_kn(u, Knm, sig2, ell, whitened_type, maxiter, tol, jitter)
    mu = kn @ m
    sig2_star = Knn - jnp.sum(kn * kn, axis=-1) + jnp.sum((kn @ S) * kn, axis=-1)
    return mu, sig2_star


def _an(m, S, Knn_diag, kn, y, noise_std):
    knt_kn = jnp.sum(kn * kn, axis=-1)
    knt_m = kn @ m
    knSkn = jnp.sum((kn @ S) * kn, axis=-1)
    ivar = 1.0 / noise_std**2
    mse = (knt_m - y.reshape(-1)) ** 2
    variance = Knn_diag - knt_kn + knSkn
    return (
        -0.5 * ivar * (mse + variance)
        - jnp.log(noise_std)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )


def compute_elbo(
    u, m, S, xprime, yprime, x, y, sig2, ell,
    derivative_obs_noise_std, obs_noise_std,
    whitened_type: str = "ziggy",
    maxiter: int = 20,
    tol: float = 1e-8,
    jitter: float = 1e-4,
):
    """ELBO over mixed observations, differentiable in (sig2, ell)
    (`ziggy/exact_gp_1d_derivatives.py:265-339`)."""
    elbo = 0.0
    if xprime is not None:
        Knm = sqexp_kprime(xprime, u, sig2, ell)
        kn = _whiten_kn(u, Knm, sig2, ell, whitened_type, maxiter, tol, jitter)
        Knn = sqexp_kprime_double_diag(xprime, sig2, ell)
        elbo = elbo + jnp.sum(_an(m, S, Knn, kn, yprime, derivative_obs_noise_std))
    if x is not None:
        Knm = sqexp_k(x, u, sig2, ell)
        kn = _whiten_kn(u, Knm, sig2, ell, whitened_type, maxiter, tol, jitter)
        Knn = sqexp_k_diag(x, sig2, ell)
        elbo = elbo + jnp.sum(_an(m, S, Knn, kn, y, obs_noise_std))
    return elbo - stats.kl_to_standard(m, S)
