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

import jax
import jax.numpy as jnp
from jax import lax

from .bttb import BTTBSpectrum, matmul_by_Cinv, matmul_by_K, matmul_by_RT
from .cg import pcg, pcg_scan


def _planes_solver_ok(spec: BTTBSpectrum, dtype) -> bool:
    """True when the packed planes-state PCG path applies: 1-D radix-
    supported grid, f32, on the TPU backend, with a crop boundary coarse
    enough for the rectangular stage-1 tables (>= 8 rows)."""
    from . import bttb

    if len(spec.dims) != 1 or dtype != jnp.float32:
        return False
    if not bttb.USE_RADIX_FFT or jax.default_backend() != "tpu":
        return False
    from .radix_fft import radix_supported, row_multiple

    L = spec.edims[0]
    if not radix_supported(L):
        return False
    return -(-spec.M // row_multiple(L)) >= 8


def _planes_weights(spec: BTTBSpectrum, plan):
    """Stage-order clamped circulant spectrum for the planes path, WITHOUT
    the 1/L fold: from the stored embedded column via a radix forward
    transform when available (no natural-order materialization, no 8 MB
    runtime transposes), else by permuting the natural full weights.  The
    clamp floor is recovered as min(spec.eigs): identical to the build-time
    clamp whenever any eigenvalue was actually clamped, a no-op otherwise."""
    from .radix_fft import permute_weights, stage_order_weights
    from .bttb import _full_weights

    L = spec.edims[0]
    if spec.ecolumn is not None:
        w = stage_order_weights(spec.ecolumn, plan)
        return jnp.maximum(w, jnp.min(spec.eigs))
    return permute_weights(_full_weights(spec.eigs, L), plan) * L


def _planes_pcg_fused(s0, dK, dC, plan, rows, mask, num_iters):
    """Fixed-iteration PCG over packed planes with the inner products fused
    into the applies.

    Both CG dots are self-dots of an apply (p . Ap and r . z = r . C^{-1}r),
    so `fused_circulant_apply_cropped_selfdot` emits them as stage-1-inverse
    kernel partials: no separate two-vector reduction pass, no scalar
    pipeline barrier between an apply and the axpys it gates (measured
    0.39 ms/iteration at the M = 2^20 headline — RESULTS sec. 10).
    Identical update order and guards to `cg.pcg_scan`; with `mask` the
    state tails stay zero, so the fused dots (whose partner is the apply's
    own zero-tailed input) need no masking — only the apply output does.
    """
    from .radix_fft import fused_circulant_apply_cropped_selfdot

    def apply_dot(s, d_perm):
        yr, yi, dr, di = fused_circulant_apply_cropped_selfdot(
            s[0], s[1], d_perm, plan, rows, rows
        )
        y = jnp.stack([yr, yi])
        if mask is not None:
            y = y * mask
        return y, jnp.stack([dr, di])

    z, rz = apply_dot(s0, dC)  # rz = r0 . z0 with r0 = s0
    x = jnp.zeros_like(s0)
    r = s0
    p = z

    def step(carry, _):
        x, r, p, rz = carry
        Ap, pAp = apply_dot(p, dK)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        z, rz_new = apply_dot(r, dC)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[..., None] * p
        return (x, r, p, rz_new), None

    (x, *_), _ = lax.scan(step, (x, r, p, rz), None, length=num_iters)
    return x


def _planes_pcg_fused_while(s0, dK, dC, plan, rows, mask, maxiter, tol):
    """Early-exit variant of :func:`_planes_pcg_fused` (`cg.pcg` semantics:
    ``all(||r|| < tol)`` exit).  The two CG dots ride the applies exactly as
    in the scan variant; the exit test's ||r||^2 is the one reduction that
    cannot ride an apply (it gates the while condition), computed right
    after the r update where XLA fuses it into the same pass."""
    from .radix_fft import fused_circulant_apply_cropped_selfdot

    def apply_dot(s, d_perm):
        yr, yi, dr, di = fused_circulant_apply_cropped_selfdot(
            s[0], s[1], d_perm, plan, rows, rows
        )
        y = jnp.stack([yr, yi])
        if mask is not None:
            y = y * mask
        return y, jnp.stack([dr, di])

    z, rz = apply_dot(s0, dC)
    x = jnp.zeros_like(s0)
    r = s0
    p = z
    rr = jnp.sum(r * r, axis=-1)
    tol_sq = jnp.asarray(tol, s0.dtype) ** 2

    def cond(carry):
        k, _x, _r, _p, _rz, rr = carry
        return jnp.logical_and(k < maxiter, jnp.any(rr >= tol_sq))

    def body(carry):
        k, x, r, p, rz, _rr = carry
        Ap, pAp = apply_dot(p, dK)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + alpha[..., None] * p
        r = r - alpha[..., None] * Ap
        rr = jnp.sum(r * r, axis=-1)
        z, rz_new = apply_dot(r, dC)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[..., None] * p
        return (k + 1, x, r, p, rz_new, rr)

    k0 = jnp.asarray(0, jnp.int32)
    _, x, *_ = lax.while_loop(cond, body, (k0, x, r, p, rz, rr))
    return x


def _mxu2d_solver_ok(spec: BTTBSpectrum, dtype) -> bool:
    """True when the fused 2-D sandwich PCG path applies: 2-D grid in the
    MXU matmul-transform regime (every embedded axis <= MATMUL_DFT_MAX_LEN),
    f32, on the TPU backend."""
    from . import bttb

    if len(spec.dims) != 2 or dtype != jnp.float32:
        return False
    if not bttb.USE_MXU2D_PCG or jax.default_backend() != "tpu":
        return False
    if min(spec.edims) <= 1:
        return False
    return max(spec.edims) <= bttb.MATMUL_DFT_MAX_LEN


def _fused_sandwich_pcg(apply_dot, s0, wK, wC, num_iters, tol, fixed_iters):
    """PCG over (B, *grid) sample volumes with fused selfdot applies
    (``apply_dot(s, w) -> (y, dots)``) — rank-generic core shared by the
    2-D and 3-D fused solvers.  Identical update order and guards to
    `cg.pcg / pcg_scan`."""
    nd = s0.ndim - 1
    ax = lambda a: a.reshape(a.shape + (1,) * nd)
    red = tuple(range(-nd, 0))

    z, rz = apply_dot(s0, wC)
    x = jnp.zeros_like(s0)
    r = s0
    p = z

    def step(x, r, p, rz):
        Ap, pAp = apply_dot(p, wK)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + ax(alpha) * p
        r = r - ax(alpha) * Ap
        z, rz_new = apply_dot(r, wC)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + ax(beta) * p
        return x, r, p, rz_new

    if fixed_iters:
        def body(carry, _):
            return step(*carry), None

        (x, *_), _ = lax.scan(body, (x, r, p, rz), None, length=num_iters)
        return x

    rr = jnp.sum(r * r, axis=red)
    tol_sq = jnp.asarray(tol, s0.dtype) ** 2

    def cond(carry):
        k, _x, _r, _p, _rz, rr = carry
        return jnp.logical_and(k < num_iters, jnp.any(rr >= tol_sq))

    def body(carry):
        k, x, r, p, rz, _rr = carry
        Ap, pAp = apply_dot(p, wK)
        safe = jnp.abs(pAp) > 0
        alpha = jnp.where(safe, rz / jnp.where(safe, pAp, 1.0), 0.0)
        x = x + ax(alpha) * p
        r = r - ax(alpha) * Ap
        rr = jnp.sum(r * r, axis=red)
        z, rz_new = apply_dot(r, wC)
        beta = jnp.where(safe, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + ax(beta) * p
        return (k + 1, x, r, p, rz_new, rr)

    k0 = jnp.asarray(0, jnp.int32)
    _, x, *_ = lax.while_loop(cond, body, (k0, x, r, p, rz, rr))
    return x


def _mxu2d_pcg(s0, wK, wC, dims, edims, num_iters, tol, fixed_iters):
    """PCG over (B, d0, d1) sample planes with the fused cropped sandwich
    kernel (ops/mxu2d.py) and the CG inner products emitted per sample
    from the applies — the 2-D analogue of `_planes_pcg_fused(_while)`."""
    from .mxu2d import sandwich_apply_selfdot

    def apply_dot(s, w):
        return sandwich_apply_selfdot(s, w, dims, edims)

    return _fused_sandwich_pcg(apply_dot, s0, wK, wC, num_iters, tol,
                               fixed_iters)


def _mxu2d_solver(spec: BTTBSpectrum, maxiter: int, tol: float,
                  fixed_iters: bool):
    """PCG solver over (B, d0, d1) sample planes for the 2-D matmul-basis
    regime: the cropped fused sandwich kernel keeps the embedded (L0, L1)
    plane VMEM-only (one HBM read + one write of the ORIGINAL-space data
    per apply vs ~10 passes over the 4x-larger embedded planes for the
    einsum chain), and both CG dots ride the applies.  Used as the
    `lax.custom_linear_solve` solver, so gradients never trace it."""
    from .bttb import _full_weights

    dims, edims = spec.dims, spec.edims
    M = spec.M

    def solver(_matvec, b):
        wK = _full_weights(spec.eigs, edims[-1])
        wC = 1.0 / wK
        batch = b.shape[:-1]
        s0 = b.reshape((-1,) + dims)
        x = _mxu2d_pcg(s0, wK, wC, dims, edims, maxiter, tol, fixed_iters)
        return x.reshape(batch + (M,))

    return solver


def _mxu3d_solver_ok(spec: BTTBSpectrum, dtype) -> bool:
    """True when the fused 3-D sandwich PCG path applies: 3-D grid in the
    MXU matmul-transform regime (every embedded axis <= MATMUL_DFT_MAX_LEN),
    f32, on the TPU backend."""
    from . import bttb

    if len(spec.dims) != 3 or dtype != jnp.float32:
        return False
    if not bttb.USE_MXU3D_PCG or jax.default_backend() != "tpu":
        return False
    if min(spec.edims) <= 1:
        return False
    return max(spec.edims) <= bttb.MATMUL_DFT_MAX_LEN


def _inv_perm(perm):
    inv = [0] * len(perm)
    for i, p in enumerate(perm):
        inv[p] = i
    return tuple(inv)


def _mxu3d_solver(spec: BTTBSpectrum, maxiter: int, tol: float,
                  fixed_iters: bool):
    """PCG solver over (B, d0, d1, d2) sample volumes for the 3-D matmul-
    basis regime (ops/mxu3d.py): the outer axis rides relayout-free einsum
    dots, the inner (L1, L2) embedded planes live only in VMEM, and both CG
    dots ride the applies.  State is permuted ONCE per solve into the
    kernel-friendly order (smallest embedded axis outer, largest lane) —
    never per apply.  Used as the `lax.custom_linear_solve` solver, so
    gradients never trace it."""
    from .bttb import _full_weights
    from .mxu3d import best_perm, sandwich_apply_3d_selfdot

    dims, edims = spec.dims, spec.edims
    M = spec.M
    perm = best_perm(edims)
    inv = _inv_perm(perm)
    pdims = tuple(dims[a] for a in perm)
    pedims = tuple(edims[a] for a in perm)

    def solver(_matvec, b):
        wfull = _full_weights(spec.eigs, edims[-1])
        wK = jnp.transpose(wfull, perm)
        wC = 1.0 / wK
        batch = b.shape[:-1]
        s0 = b.reshape((-1,) + dims).transpose(
            (0,) + tuple(a + 1 for a in perm))

        def apply_dot(s, w):
            return sandwich_apply_3d_selfdot(s, w, pdims, pedims)

        x = _fused_sandwich_pcg(apply_dot, s0, wK, wC, maxiter, tol,
                                fixed_iters)
        x = x.transpose((0,) + tuple(a + 1 for a in inv))
        return x.reshape(batch + (M,))

    return solver


def _planes_solver(spec: BTTBSpectrum, maxiter: int, tol: float,
                   fixed_iters: bool):
    """PCG solver over PACKED complex planes for the 1-D radix path.

    The standard path stores PCG state as (B, M) real rows and, per
    circulant apply, pays an XLA pad -> strided deinterleave -> kernel ->
    interleave -> crop round trip (~0.8 ms of the measured 2.36 ms/apply
    at the L = 2^21 headline).  Here the state lives as (2, V, Mp) planes
    (row 2v -> real part, 2v+1 -> imag part of plane v; Mp = M padded to
    the plan's B*C row multiple), the kernels run with CROPPED rectangular
    stage-1 tables (`fused_circulant_apply_cropped` — the embedded padding
    region is never materialized), and the only glue left is one
    deinterleave at entry and one interleave at exit per SOLVE rather than
    per apply.  Returned solutions match the standard path to f32
    reduction order.  Used as the `lax.custom_linear_solve` solver, so
    gradients never trace it: they flow through the differentiable
    `matmul_by_K` instead.
    """
    from .radix_fft import make_plan, row_multiple

    M, L = spec.M, spec.edims[0]
    BC = row_multiple(L)
    rows = -(-M // BC)
    Mp = rows * BC

    def solver(_matvec, b):
        dtype = b.dtype
        plan = make_plan(L, dtype)
        w = _planes_weights(spec, plan)
        dK = w / L
        dC = 1.0 / (w * L)

        batch = b.shape[:-1]
        flat = b.reshape(-1, M)
        nb = flat.shape[0]
        if nb % 2:
            flat = jnp.pad(flat, ((0, 1), (0, 0)))
        if Mp != M:
            flat = jnp.pad(flat, ((0, 0), (0, Mp - M)))
            mask = (jnp.arange(Mp) < M).astype(dtype)
        else:
            mask = None
        s0 = jnp.stack([flat[0::2], flat[1::2]])  # (2, V, Mp)

        if fixed_iters:
            x = _planes_pcg_fused(s0, dK, dC, plan, rows, mask, maxiter)
        else:
            x = _planes_pcg_fused_while(s0, dK, dC, plan, rows, mask,
                                        maxiter, tol)
        out = jnp.stack([x[0], x[1]], axis=1).reshape(-1, Mp)[:nb, :M]
        return out.reshape(batch + (M,))

    return solver

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

    if do_precond and _planes_solver_ok(spec, rhs.dtype):
        solver = _planes_solver(spec, maxiter, tol, fixed_iters)
    elif do_precond and _mxu2d_solver_ok(spec, rhs.dtype):
        solver = _mxu2d_solver(spec, maxiter, tol, fixed_iters)
    elif do_precond and _mxu3d_solver_ok(spec, rhs.dtype):
        solver = _mxu3d_solver(spec, maxiter, tol, fixed_iters)
    else:

        def solver(matvec, b):
            precond = ((lambda v: matmul_by_Cinv(spec, v))
                       if do_precond else None)
            if fixed_iters:
                return pcg_scan(matvec, b, precond=precond,
                                num_iters=maxiter)
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
    if _planes_solver_ok(spec, d.dtype):
        return _rt_planes(spec, d)
    if _mxu2d_solver_ok(spec, d.dtype):
        return _rt_mxu2d(spec, d)
    if _mxu3d_solver_ok(spec, d.dtype):
        return _rt_mxu3d(spec, d)
    return matmul_by_RT(spec, d)


def _rt_mxu2d(spec: BTTBSpectrum, d: jnp.ndarray) -> jnp.ndarray:
    """R^T @ d through the fused 2-D sandwich: (..., M) -> (..., M').

    Same operator as `matmul_by_RT` (sqrt-weights sandwich, cropped input,
    full expanded output); differentiable (the fused apply carries its own
    custom VJP in x and w)."""
    from .bttb import _full_weights
    from .mxu2d import sandwich_apply

    dims, edims = spec.dims, spec.edims
    w = jnp.sqrt(_full_weights(spec.eigs, edims[-1]))
    batch = d.shape[:-1]
    y = sandwich_apply(d.reshape((-1,) + dims), w, dims, edims,
                       out_expanded=True)
    return y.reshape(batch + (spec.Mprime,))


def _rt_mxu3d(spec: BTTBSpectrum, d: jnp.ndarray) -> jnp.ndarray:
    """R^T @ d through the fused 3-D sandwich: (..., M) -> (..., M').

    Same operator as `matmul_by_RT`; the kernel-order permutation is undone
    on the expanded output so the whitened layout matches the einsum path
    exactly.  Differentiable (einsum outer + custom-VJP plane kernel)."""
    from .bttb import _full_weights
    from .mxu3d import best_perm, sandwich_apply_3d

    dims, edims = spec.dims, spec.edims
    perm = best_perm(edims)
    inv = _inv_perm(perm)
    pdims = tuple(dims[a] for a in perm)
    pedims = tuple(edims[a] for a in perm)
    w = jnp.transpose(
        jnp.sqrt(_full_weights(spec.eigs, edims[-1])), perm)
    batch = d.shape[:-1]
    x = d.reshape((-1,) + dims).transpose((0,) + tuple(a + 1 for a in perm))
    y = sandwich_apply_3d(x, w, pdims, pedims, out_expanded=True)
    y = y.transpose((0,) + tuple(a + 1 for a in inv))
    return y.reshape(batch + (spec.Mprime,))


def _rt_planes(spec: BTTBSpectrum, d: jnp.ndarray) -> jnp.ndarray:
    """R^T @ d through the cropped planes apply: (..., M) -> (..., M').

    Same operator as `matmul_by_RT` (sqrt-weights circulant apply with full
    expanded output), minus the per-call pad/deinterleave/crop glue — one
    plane split in, one interleave out.  Differentiable (the cropped apply
    carries its own VJP)."""
    from .radix_fft import fused_circulant_apply_cropped, make_plan, row_multiple

    M, L = spec.M, spec.edims[0]
    rows = -(-M // row_multiple(L))
    Mp = rows * row_multiple(L)
    plan = make_plan(L, d.dtype)
    w = _planes_weights(spec, plan)
    dRT = jnp.sqrt(w) / L

    batch = d.shape[:-1]
    flat = d.reshape(-1, M)
    nb = flat.shape[0]
    if nb % 2:
        flat = jnp.pad(flat, ((0, 1), (0, 0)))
    if Mp != M:
        flat = jnp.pad(flat, ((0, 0), (0, Mp - M)))
    yr, yi = fused_circulant_apply_cropped(
        flat[0::2], flat[1::2], dRT, plan, rows, plan.A
    )
    out = jnp.stack([yr, yi], axis=1).reshape(-1, L)[:nb]
    return out.reshape(batch + (spec.Mprime,))


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
