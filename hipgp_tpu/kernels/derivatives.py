"""Derivative-observation cross-covariances.

Closed forms for the 1-D squared-exponential (parity reference
`ziggy/exact_gp_1d_derivatives.py:9-38`) plus *generic* derivative
cross-covariances for any base kernel via ``jax.grad`` — free in JAX where
the reference had to hand-derive each form.

Conventions (x: derivative-observation inputs, y: function inputs):
  k(x, y)               Cov(f(x),  f(y))
  kprime(x, y)          Cov(f'(x), f(y))   = d/dx k(x, y)
  kprime_double(x, y)   Cov(f'(x), f'(y))  = d^2/dx dy k(x, y)
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "sqexp_k",
    "sqexp_kprime",
    "sqexp_kprime_double",
    "sqexp_k_diag",
    "sqexp_kprime_double_diag",
    "grad_cross_cov",
    "grad_grad_cov",
]


def sqexp_k(x: jnp.ndarray, y: jnp.ndarray, sig2, ell) -> jnp.ndarray:
    """1-D SqExp Gram: x (N,), y (M,) -> (N, M)."""
    diff = x[:, None] - y[None, :]
    return sig2 * jnp.exp(-0.5 * diff**2 / ell**2)


def sqexp_kprime(x: jnp.ndarray, y: jnp.ndarray, sig2, ell) -> jnp.ndarray:
    """Cov(f'(x), f(y)) = -(x-y)/ell^2 * k(x,y)."""
    diff = x[:, None] - y[None, :]
    return -diff / (ell**2) * sqexp_k(x, y, sig2, ell)


def sqexp_kprime_double(x: jnp.ndarray, y: jnp.ndarray, sig2, ell) -> jnp.ndarray:
    """Cov(f'(x), f'(y)) = k(x,y)/ell^2 * (1 - (x-y)^2/ell^2)."""
    diff = x[:, None] - y[None, :]
    ell2 = ell**2
    return sqexp_k(x, y, sig2, ell) / ell2 * (1.0 - diff**2 / ell2)


def sqexp_k_diag(x: jnp.ndarray, sig2, ell) -> jnp.ndarray:
    return sig2 * jnp.ones_like(x)


def sqexp_kprime_double_diag(x: jnp.ndarray, sig2, ell) -> jnp.ndarray:
    return (sig2 / ell**2) * jnp.ones_like(x)


# ---------------------------------------------------------------------------
# Generic derivative cross-covariances for arbitrary scalar kernels
# ---------------------------------------------------------------------------


def grad_cross_cov(kscalar: Callable, x: jnp.ndarray, y: jnp.ndarray, params):
    """Cov(f'(x_i), f(y_j)) = d/dx kscalar(x, y) for a scalar kernel
    ``kscalar(x, y, params) -> scalar`` on 1-D inputs; returns (N, M)."""
    dk = jax.grad(kscalar, argnums=0)
    return jax.vmap(lambda xi: jax.vmap(lambda yj: dk(xi, yj, params))(y))(x)


def grad_grad_cov(kscalar: Callable, x: jnp.ndarray, y: jnp.ndarray, params):
    """Cov(f'(x_i), f'(y_j)) = d^2/dx dy kscalar(x, y); returns (N, M)."""
    ddk = jax.grad(jax.grad(kscalar, argnums=0), argnums=1)
    return jax.vmap(lambda xi: jax.vmap(lambda yj: ddk(xi, yj, params))(y))(x)
