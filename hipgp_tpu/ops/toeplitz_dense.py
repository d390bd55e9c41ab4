"""Dense Toeplitz constructors and the general 1-D FFT Toeplitz matvec.

Parity reference: the live parts of the vendored gpytorch utilities
(`ziggy/misc/gpt_toeplitz.py:11-154`): dense (non-)symmetric Toeplitz
construction and the circulant-embedding matvec for a general (c, r)
Toeplitz matrix.  The derivative quadratic form (`:169-209`) is NOT rebuilt:
hyperparameter gradients flow through `lax.custom_linear_solve` implicit
differentiation instead.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "toeplitz",
    "sym_toeplitz",
    "toeplitz_getitem",
    "toeplitz_matmul",
    "sym_toeplitz_matmul",
]


def toeplitz_getitem(c: jnp.ndarray, r: jnp.ndarray, i, j) -> jnp.ndarray:
    """T[i, j] of the (c, r) Toeplitz matrix without materializing it
    (parity: `ziggy/misc/gpt_toeplitz.py:65-93`).  i, j may be arrays."""
    i = jnp.asarray(i)
    j = jnp.asarray(j)
    d = i - j
    return jnp.where(d >= 0, c[jnp.abs(d)], r[jnp.abs(d)])


def toeplitz(c: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Dense Toeplitz matrix from first column c and first row r
    (c[0] == r[0])."""
    n = c.shape[0]
    m = r.shape[0]
    i = jnp.arange(n)[:, None]
    j = jnp.arange(m)[None, :]
    d = i - j
    # d >= 0 -> c[d]; d < 0 -> r[-d]
    return jnp.where(d >= 0, c[jnp.maximum(d, 0)], r[jnp.maximum(-d, 0)])


def sym_toeplitz(c: jnp.ndarray) -> jnp.ndarray:
    """Dense symmetric Toeplitz matrix from its first column."""
    return toeplitz(c, c)


def toeplitz_matmul(c: jnp.ndarray, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """T(c, r) @ v by circulant FFT embedding; v: (..., m) -> (..., n).

    Embeds the n x m Toeplitz into a circulant of length n + m (general,
    not necessarily symmetric), one rfft/irfft pair per call.
    """
    n, m = c.shape[0], r.shape[0]
    L = n + m
    # circulant first column: [c_0..c_{n-1}, 0, r_{m-1}..r_1]
    col = jnp.concatenate([c, jnp.zeros((1,), c.dtype), r[1:][::-1]])
    fcol = jnp.fft.rfft(col)
    vpad = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, L - m)])
    out = jnp.fft.irfft(jnp.fft.rfft(vpad, axis=-1) * fcol, n=L, axis=-1)
    return out[..., :n]


def sym_toeplitz_matmul(c: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return toeplitz_matmul(c, c, v)
