"""Differentiable structured solves.

``inv_matmul``: K^{-1} B through PCG, made differentiable with
``lax.custom_linear_solve`` — the JAX-native replacement for the reference's
hand-rolled autograd Function (`ziggy/misc/_inv_matmul.py`) and its vendored
Toeplitz derivative quadratic form (`ziggy/misc/gpt_toeplitz.py:169-209`).
Implicit differentiation gives the adjoint solve for the RHS gradient and
routes the operator gradient through the (differentiable) FFT matvec, so
kernel-hyperparameter gradients through the solve come for free and remain
exact regardless of how the forward iteration was truncated.

``whiten``: kn = R^T K^{-1} v — the central HIP-GP primitive
(`ziggy/hipgp.py:117-146` `compute_kn`, 'ziggy' branch).

``gram_solve``: K^{-1/2} v = R^T K^{-1} v for the whitening-solve benchmark
(`ziggy/misc/toeplitz_expanded.py:17-58`).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .bttb import BTTBSpectrum, matmul_by_Cinv, matmul_by_K, matmul_by_RT
from .cg import pcg, pcg_scan

__all__ = ["inv_matmul", "whiten", "gram_solve", "cholesky_whiten",
           "spd_solve", "spd_inverse"]


def spd_solve(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric positive-definite A via Cholesky.

    TPU note: XLA's LU path (`jnp.linalg.solve`) uses a blocked custom call
    that exhausts scoped VMEM beyond ~10k x 10k; the Cholesky + two
    triangular-solve route scales.  Supports leading batch dims on A/b.
    """
    L = jnp.linalg.cholesky(A)
    if b.ndim == A.ndim - 1:
        b = b[..., None]
        squeeze = True
    else:
        squeeze = False
    y = jax.scipy.linalg.solve_triangular(L, b, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0] if squeeze else x


def spd_inverse(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a symmetric positive-definite matrix (batched) via Cholesky."""
    I = jnp.broadcast_to(
        jnp.eye(A.shape[-1], dtype=A.dtype), A.shape
    )
    return spd_solve(A, I)


def inv_matmul(
    spec: BTTBSpectrum,
    rhs: jnp.ndarray,
    *,
    maxiter: int = 20,
    tol: float = 1e-8,
    do_precond: bool = True,
    fixed_iters: bool = False,
) -> jnp.ndarray:
    """K^{-1} @ rhs with rhs of shape (..., M), differentiable in spec & rhs.

    ``fixed_iters=True`` swaps the early-exit while-loop for a static
    ``lax.scan`` (shape-stable; marginally better for small maxiter where the
    early-exit test never fires anyway — train-time maxiter_cg is 5-20 in the
    reference protocols).
    """

    def solver(matvec, b):
        precond = (lambda v: matmul_by_Cinv(spec, v)) if do_precond else None
        if fixed_iters:
            return pcg_scan(matvec, b, precond=precond, num_iters=maxiter)
        return pcg(matvec, b, precond=precond, maxiter=maxiter, tol=tol)

    # symmetric=True: K is SPD, so the transpose solve reuses the same PCG.
    # custom_linear_solve differentiates implicitly: dx = K^{-1}(db - dK x),
    # with dK applied through the FFT matvec's own VJP.
    return lax.custom_linear_solve(
        lambda v: matmul_by_K(spec, v), rhs, solver, symmetric=True
    )


def whiten(
    spec: BTTBSpectrum,
    Knm: jnp.ndarray,
    *,
    maxiter: int = 20,
    tol: float = 1e-8,
    do_precond: bool = True,
    fixed_iters: bool = False,
) -> jnp.ndarray:
    """kn = R^T K^{-1} Knm: (..., M) -> (..., M') whitened cross-covariances."""
    d = inv_matmul(
        spec,
        Knm,
        maxiter=maxiter,
        tol=tol,
        do_precond=do_precond,
        fixed_iters=fixed_iters,
    )
    return matmul_by_RT(spec, d)


# gram_solve is the benchmark-facing alias: K^{-1/2} v in the expanded basis.
gram_solve = whiten


def cholesky_whiten(Kmm: jnp.ndarray, Knm: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Dense-oracle whitening: kn = L^{-1} Kmn with K = L L^T.

    The 'cholesky' ``whitened_type`` branch of the reference
    (`ziggy/hipgp.py:132-137`); O(M^3) — used as the exact twin in tests and
    for the learn-kernel paths that require it.
    Knm: (..., M); returns (..., M).
    """
    if jitter:
        Kmm = Kmm + jitter * jnp.eye(Kmm.shape[-1], dtype=Kmm.dtype)
    L = jnp.linalg.cholesky(Kmm)
    # Solve L kn^T = Knm^T  (lower triangular).
    sol = jax.scipy.linalg.solve_triangular(L, jnp.swapaxes(Knm, -1, -2), lower=True)
    return jnp.swapaxes(sol, -1, -2)
