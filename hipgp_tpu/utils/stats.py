"""Gaussian KL divergences and density helpers (pure jnp).

Parity reference: `ziggy/misc/stats.py`.  Used by the three variational
families (diag / block / full-rank KL to the standard-normal whitened prior)
and by the dense SVGP baseline.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "diag_kl_to_standard",
    "kl_to_standard",
    "block_kl_to_standard",
    "kl_mvn",
    "kl_mvn_chol",
    "normal_logpdf",
    "normal_cdf",
    "gamma_lnpdf",
    "gamma_lnpdf_lnx",
    "gamma_moments",
    "gamma_params",
]

LN2PI = math.log(2.0 * math.pi)


def diag_kl_to_standard(m: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """KL( N(m, diag(S)) || N(0, I) ).  m, S: (D, 1) or (D,)."""
    m = m.reshape(-1)
    S = S.reshape(-1)
    return 0.5 * (jnp.sum(S) + jnp.sum(m * m) - jnp.sum(jnp.log(S)) - m.shape[0])


def _spd_logdet(S: jnp.ndarray) -> jnp.ndarray:
    """log det of an SPD matrix via Cholesky.

    TPU note: jnp.linalg.slogdet lowers to a blocked LU custom call that
    exhausts scoped VMEM beyond ~16k x 16k; Cholesky scales."""
    L = jnp.linalg.cholesky(S)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))


def kl_to_standard(m: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """KL( N(m, S) || N(0, I) ) for dense SPD S."""
    m = m.reshape(-1)
    return 0.5 * (jnp.trace(S) + jnp.sum(m * m) - _spd_logdet(S) - m.shape[0])


def block_kl_to_standard(m: jnp.ndarray, blk_S: jnp.ndarray, chol_jitter: float = 1e-4) -> jnp.ndarray:
    """KL( N(m, blockdiag(blk_S)) || N(0, I) ).

    blk_S: (num_blocks, bs, bs).  Log-determinant via batched Cholesky with a
    small jitter, as in the reference (`ziggy/misc/stats.py:15-29`).
    """
    nb, bs, _ = blk_S.shape
    I = jnp.eye(bs, dtype=blk_S.dtype)
    chol = jnp.linalg.cholesky(blk_S + chol_jitter * I)
    lndet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)))
    trace = jnp.sum(jnp.diagonal(blk_S, axis1=-2, axis2=-1))
    m = m.reshape(-1)
    return 0.5 * (trace + jnp.sum(m * m) - lndet - nb * bs)


def kl_mvn(m0, S0, m1, S1):
    """KL( N(m0,S0) || N(m1,S1) ), dense SPD covariances (Cholesky solves)."""
    from ..ops.solve import spd_solve

    k = S0.shape[-1]
    S1_inv_S0 = spd_solve(S1, S0)
    diff = (m1 - m0).reshape(-1, 1)
    quad = jnp.sum(diff * spd_solve(S1, diff))
    return 0.5 * (
        jnp.trace(S1_inv_S0) + quad - k + _spd_logdet(S1) - _spd_logdet(S0)
    )


def kl_mvn_chol(m0, cS0, m1, cS1):
    """KL between MVNs given lower-triangular Cholesky factors."""
    k = cS0.shape[-1]
    lndet0 = 2.0 * jnp.sum(jnp.log(jnp.diagonal(cS0)))
    lndet1 = 2.0 * jnp.sum(jnp.log(jnp.diagonal(cS1)))
    diff = (m1 - m0).reshape(-1, 1)
    sqrt_mahal = jax.scipy.linalg.solve_triangular(cS1, diff, lower=True)
    quad = jnp.sum(sqrt_mahal**2)
    tr = jax.scipy.linalg.solve_triangular(cS1, cS0, lower=True)
    trace = jnp.sum(tr * tr)
    return 0.5 * (lndet1 - lndet0 + quad + trace - k)


def normal_logpdf(y, loc, scale):
    return -0.5 * LN2PI - jnp.log(scale) - 0.5 * ((y - loc) / scale) ** 2


def normal_cdf(x, loc, scale):
    return 0.5 * (1.0 + jax.scipy.special.erf((x - loc) / (scale * math.sqrt(2.0))))


def gamma_lnpdf(x, alpha, beta):
    """Unnormalized log Gamma(alpha, beta) density (shape / inverse-scale)."""
    return (alpha + 1.0) * jnp.log(x) - beta * x


def gamma_lnpdf_lnx(lnx, alpha, beta):
    """Unnormalized log Gamma density of exp(lnx) (log-space observations)."""
    return (alpha + 1.0) * lnx - beta * jnp.exp(lnx)


def gamma_moments(alpha, beta):
    return alpha / beta, alpha / beta**2


def gamma_params(mean, var):
    beta = mean / var
    alpha = mean * beta
    return alpha, beta
