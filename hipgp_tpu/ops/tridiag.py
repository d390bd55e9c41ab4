"""Batched symmetric tridiagonal (Thomas) solver as two ``lax.scan`` sweeps.

Parity reference: `ziggy/misc/tridiagonal_solve.py` (sequential Python loop
over rows there; here the recurrence is a scan so XLA compiles one fused loop,
batched over the trailing axis).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["tridiagonal_solve"]


def tridiagonal_solve(d: jnp.ndarray, c: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for symmetric tridiagonal A.

    Args:
      d: (N, ...) main diagonal.
      c: (N-1, ...) off-diagonal (symmetric: both upper and lower).
      b: (N, ...) right-hand side(s).

    Returns x of shape (N, ...).  N must be >= 1.
    """
    n = d.shape[0]
    if n == 1:
        return b / d

    # Forward elimination: p_k = d_k - c_{k-1}^2 / p_{k-1},
    #                      y_k = (b_k - c_{k-1} y_{k-1}) / p_k.
    def fwd(carry, inputs):
        p_prev, y_prev = carry
        dk, ck_prev, bk = inputs
        pk = dk - ck_prev * (ck_prev / p_prev)
        yk = (bk - ck_prev * y_prev) / pk
        return (pk, yk), (pk, yk)

    p0 = d[0]
    y0 = b[0] / p0
    (_, _), (ps, ys) = lax.scan(fwd, (p0, y0), (d[1:], c, b[1:]))
    ps = jnp.concatenate([p0[None], ps], axis=0)
    ys = jnp.concatenate([y0[None], ys], axis=0)

    # Back substitution: x_k = y_k - (c_k / p_k) x_{k+1}.
    q = c / ps[:-1]

    def bwd(x_next, inputs):
        yk, qk = inputs
        xk = yk - qk * x_next
        return xk, xk

    x_last = ys[-1]
    _, xs_rev = lax.scan(bwd, x_last, (ys[:-1], q), reverse=True)
    return jnp.concatenate([xs_rev, x_last[None]], axis=0)
