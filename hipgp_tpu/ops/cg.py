"""Batched preconditioned conjugate gradients, compiled as XLA loops.

Three variants over matrix-free SPD operators:

* ``pcg``        — tolerance-based early exit via ``lax.while_loop`` (the
                   production solver; one fused loop body, no host sync).
* ``pcg_scan``   — fixed iteration count via ``lax.scan`` (jit-stable shape
                   for benchmarking; XLA unrolls/pipelines the FFT matvecs).
* ``pcg_trace``  — fixed iteration count, additionally collects a user metric
                   of every iterate (residual curves for the convergence
                   experiments).

Batch convention: vectors live on the *last* axis, arbitrary leading batch
dims; all reductions are over the last axis (the reference keeps two separate
solvers for the two batch layouts, `ziggy/misc/cg.py:5-41` / `:44-80` — here a
single layout suffices because callers reshape for free under XLA).

Semantics parity with the reference CG (`ziggy/misc/cg.py`): same update
order, same all-batch ``||r||_2 < tol`` early-exit test, same implicit
``x0 = 0`` start.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pcg", "pcg_scan", "pcg_trace", "PCGResult"]

MatVec = Callable[[jnp.ndarray], jnp.ndarray]


class PCGResult(NamedTuple):
    x: jnp.ndarray
    iters: jnp.ndarray  # scalar int32 — iterations actually run
    resnorm: jnp.ndarray  # (...,) final ||r||_2 per batch element


def _dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def pcg(
    matvec: MatVec,
    b: jnp.ndarray,
    precond: Optional[MatVec] = None,
    maxiter: int = 20,
    tol: float = 1e-10,
    x0: Optional[jnp.ndarray] = None,
    dot_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Solve A x = b with (preconditioned) CG; returns x with b's shape."""
    return pcg_result(matvec, b, precond, maxiter, tol, x0, dot_fn).x


def pcg_result(
    matvec: MatVec,
    b: jnp.ndarray,
    precond: Optional[MatVec] = None,
    maxiter: int = 20,
    tol: float = 1e-10,
    x0: Optional[jnp.ndarray] = None,
    dot_fn: Optional[Callable] = None,
) -> PCGResult:
    """Like :func:`pcg` but also reports iteration count and residual norms.

    ``dot_fn(a, b) -> (batch,)`` overrides the inner product (reduction over
    the last axis by default) — the hook for sharded operands, where the
    reduction needs a ``psum`` over the mesh axis.
    """
    _dot_l = dot_fn if dot_fn is not None else _dot
    if precond is None:
        precond = lambda r: r

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = _dot_l(r, z)
    rr = _dot_l(r, r)

    tol_sq = jnp.asarray(tol, b.dtype) ** 2

    def cond(carry):
        k, _x, _r, _z, _p, _rz, rr = carry
        return jnp.logical_and(k < maxiter, jnp.any(rr >= tol_sq))

    def body(carry):
        k, x, r, z, p, rz, _rr = carry
        Ap = matvec(p)
        pAp = _dot_l(p, Ap)
        # Guard converged / degenerate rows: alpha = rz / pAp with pAp ~ 0
        # would poison the whole batch with NaNs.
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        rr = _dot_l(r, r)
        z = precond(r)
        rz_new = _dot_l(r, z)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[..., None] * p
        return (k + 1, x, r, z, p, rz_new, rr)

    k0 = jnp.asarray(0, jnp.int32)
    k, x, r, *_ , rr = lax.while_loop(cond, body, (k0, x, r, z, p, rz, rr))
    return PCGResult(x=x, iters=k, resnorm=jnp.sqrt(rr))


def pcg_scan(
    matvec: MatVec,
    b: jnp.ndarray,
    precond: Optional[MatVec] = None,
    num_iters: int = 20,
    x0: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fixed-iteration CG: a static computation graph (no data-dependent trip
    count), preferred inside larger jitted programs and for benchmarking.

    Unlike :func:`pcg_trace` this carries NO per-iteration residual norm:
    the extra ||r|| reduction per step is pure overhead when the trace is
    discarded (~32 MB/iter of HBM reads at the M=2^20 headline)."""
    if precond is None:
        precond = lambda r: r

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = _dot(r, z)

    def step(carry, _):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        pAp = _dot(p, Ap)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[..., None] * p
        return (x, r, z, p, rz_new), None

    (x, *_), _ = lax.scan(step, (x, r, z, p, rz), None, length=num_iters)
    return x


def pcg_trace(
    matvec: MatVec,
    b: jnp.ndarray,
    precond: Optional[MatVec] = None,
    num_iters: int = 20,
    metric_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    x0: Optional[jnp.ndarray] = None,
):
    """Fixed-iteration CG collecting ``metric_fn(x_k)`` at every iteration.

    Returns ``(x, traces)`` where ``traces`` is a pytree of stacked
    per-iteration metrics (always includes ``resnorm``).  Drives the
    CG-vs-PCG convergence experiment (reference
    `experiments-hip-gp/run_solve_kn_experiment.py:36-75`).
    """
    if precond is None:
        precond = lambda r: r

    if x0 is None:
        x = jnp.zeros_like(b)
        r = b
    else:
        x = x0
        r = b - matvec(x0)
    z = precond(r)
    p = z
    rz = _dot(r, z)

    def step(carry, _):
        x, r, z, p, rz = carry
        Ap = matvec(p)
        pAp = _dot(p, Ap)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        z = precond(r)
        rz_new = _dot(r, z)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[..., None] * p
        out = {"resnorm": jnp.sqrt(_dot(r, r))}
        if metric_fn is not None:
            out["metric"] = metric_fn(x)
        return (x, r, z, p, rz_new), out

    (x, *_), traces = lax.scan(step, (x, r, z, p, rz), None, length=num_iters)
    return x, traces
