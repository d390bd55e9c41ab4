"""Golub-Kahan bidiagonalization with full reorthogonalization, via ``lax.scan``.

An alternative whitening solver kept as an option (the reference ships it
orphaned: `ziggy/misc/bidiag.py`, referenced only from the pcg-vs-cholesky
benchmark docstring).  Given matvecs for A (N -> M) and A* (M -> N) with
K = A* A, it builds column-orthonormal U (M x J), V (N x J) and an upper
bidiagonal B = U* A V (diagonal ``alphas``, superdiagonal ``betas`` — the
v-started Golub-Kahan variant), then ``bidiag_solve`` forms
c = V (B B^T)^{-1} (alpha_1 ||b|| e_1) through the batched tridiagonal solver
(B B^T is symmetric tridiagonal: diag alpha_k^2 + beta_k^2, off-diagonal
alpha_{k+1} beta_k).

TPU-first deviations from the reference: fixed iteration count J (static
shapes — no data-dependent early exit under jit) and exactly one full
reorthogonalization pass per vector (classical CGS2-style; the reference's
adaptive up-to-10x re-pass loop is host-driven and data-dependent).
Batched over the trailing axis of ``b``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax.numpy as jnp
from jax import lax

from .tridiag import tridiagonal_solve

__all__ = ["golub_kahan_bidiag", "bidiag_solve", "BidiagFactors"]

MatVec = Callable[[jnp.ndarray], jnp.ndarray]


class BidiagFactors(NamedTuple):
    U: jnp.ndarray  # (J, M, bsz)
    V: jnp.ndarray  # (J, N, bsz)
    alphas: jnp.ndarray  # (J, bsz)
    betas: jnp.ndarray  # (J, bsz)


def _norm(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(x * x, axis=0))


def _reorth(basis: jnp.ndarray, mask: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Remove components of w along masked rows of basis: w -= Q (Q^T w).

    basis: (J, dim, bsz); mask: (J,) 0/1 selecting the filled rows;
    w: (dim, bsz).
    """
    coeffs = jnp.einsum("jdb,db->jb", basis, w) * mask[:, None]
    return w - jnp.einsum("jdb,jb->db", basis, coeffs)


def golub_kahan_bidiag(
    A_matvec: MatVec,
    Astar_matvec: MatVec,
    b: jnp.ndarray,
    num_iters: int,
) -> BidiagFactors:
    """Run J = num_iters Golub-Kahan steps started from v_1 = b / ||b||."""
    N, bsz = b.shape
    m_probe = A_matvec(b)
    M = m_probe.shape[0]
    dtype = b.dtype

    v0 = b / _norm(b)[None, :]
    U0 = jnp.zeros((num_iters, M, bsz), dtype)
    V0 = jnp.zeros((num_iters, N, bsz), dtype).at[0].set(v0)

    def step(carry, k):
        U, V, alphas, betas, vk, uk_prev, beta_prev = carry
        mask_u = (jnp.arange(num_iters) < k).astype(dtype)
        mask_v = (jnp.arange(num_iters) <= k).astype(dtype)

        u = A_matvec(vk) - beta_prev[None, :] * uk_prev
        u = _reorth(U, mask_u, u)
        alpha = _norm(u)
        u = u / jnp.where(alpha > 0, alpha, 1.0)[None, :]
        U = U.at[k].set(u)
        alphas = alphas.at[k].set(alpha)

        w = Astar_matvec(u) - alpha[None, :] * vk
        w = _reorth(V, mask_v, w)
        beta = _norm(w)
        v_next = w / jnp.where(beta > 0, beta, 1.0)[None, :]
        betas = betas.at[k].set(beta)
        V = lax.cond(
            k + 1 < num_iters,
            lambda V: V.at[jnp.minimum(k + 1, num_iters - 1)].set(v_next),
            lambda V: V,
            V,
        )
        return (U, V, alphas, betas, v_next, u, beta), None

    alphas0 = jnp.zeros((num_iters, bsz), dtype)
    betas0 = jnp.zeros((num_iters, bsz), dtype)
    carry = (U0, V0, alphas0, betas0, v0, jnp.zeros((M, bsz), dtype), jnp.zeros((bsz,), dtype))
    (U, V, alphas, betas, *_), _ = lax.scan(step, carry, jnp.arange(num_iters))
    return BidiagFactors(U=U, V=V, alphas=alphas, betas=betas)


def bidiag_solve(
    A_matvec: MatVec,
    Astar_matvec: MatVec,
    b: jnp.ndarray,
    num_iters: int,
) -> jnp.ndarray:
    """Whitening-style solve c = V (B B^T)^{-1} alpha_1 ||b|| e_1.

    b: (N, bsz) -> c: (N, bsz).  Parity contract:
    `ziggy/misc/bidiag.py:126-148` (bidiag_solve).
    """
    factors = golub_kahan_bidiag(A_matvec, Astar_matvec, b, num_iters)
    V, alphas, betas = factors.V, factors.alphas, factors.betas  # (J,N,bsz),(J,bsz)

    diag = alphas**2 + betas**2  # (J, bsz)
    offdiag = alphas[1:] * betas[:-1]  # (J-1, bsz)

    rhs = jnp.zeros_like(diag).at[0].set(alphas[0] * _norm(b))
    d = tridiagonal_solve(diag, offdiag, rhs)  # (J, bsz)
    return jnp.einsum("jnb,jb->nb", V, d)
