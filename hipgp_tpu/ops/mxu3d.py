"""Fused 3-D circulant sandwich for the MXU matmul-basis regime.

The 3-D whitening/PCG applies (inter-domain dust map, paper sec. 5.5) are
Kronecker sandwiches  y = P_o (Q0 x Q1 x Q2) diag(w) (.)^T P_i^T x  over
(d0, d1, d2) sample volumes.  The einsum chain materializes the EMBEDDED
volume (8x the data for minimal embeddings) in HBM around every one of six
contractions — ~100 passes over the original data per apply.

This path factors the sandwich through the outer axis:

* **Outer-axis analysis/synthesis as plain einsums.**  Contracting the
  LEADING axis keeps the minor (sublane, lane) layout fixed, so XLA lowers
  it to MXU dots with no relayout (the `bttb._axis_contract` lesson).  The
  (B, L0, d1, d2) intermediate is ~2x the data — the only HBM-resident
  expansion anywhere in the pipeline.
* **A weight-plane-batched 2-D cropped kernel for the inner axes.**  After
  outer analysis the operator is block-diagonal over l0: each (d1, d2)
  plane sees its own 2-D circulant sandwich with spectrum w[l0].
  `mxu2d.sandwich_apply_wp` runs all B*L0 plane problems through the
  cropped-IO Pallas kernel — embedded (L1, L2) planes live only in VMEM,
  each element of the intermediate is read exactly once, and the PCG
  self-dots ride the applies (per-plane dots sum to the full 3-D inner
  product by orthonormality of Q0).

Net HBM traffic per apply: ~10 passes of original-volume data vs the einsum
chain's ~100.  Measured end-to-end: whiten-20 at M = 64x64x32, batch 64 runs
2.17x faster than the einsum chain (97.6 vs 212.3 ms, BENCH_r04
``mxu3d_whiten20_speedup``; per-stage account in RESULTS sec. 14).

Axis order matters: callers permute so the SMALLEST embedded axis is the
outer (einsum) axis and the largest is the lane axis (`best_perm`); the
solver entry/exit transposes are per SOLVE, never per apply
(`solve._mxu3d_solver`).

Exactly the same operator as the einsum path (orthonormal real Fourier
bases per axis, `bttb._real_fourier_basis`), to the bf16 hi/lo 3-pass HIGH
policy's ~1e-5 on f32 (exact on f64 in interpret mode).

Parity reference: the 3-D FFT applies of `ziggy/misc/toeplitz_tensor.py:
70-125` (single-sample torch pipeline), rebuilt as the blocked TPU pipeline.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from .mxu2d import sandwich_apply_wp
from .radix_fft import HIGH

__all__ = ["sandwich_apply_3d", "sandwich_apply_3d_selfdot", "best_perm"]


def best_perm(edims: Sequence[int]) -> Tuple[int, ...]:
    """Axis permutation for the fused 3-D path: embedded lengths ascending,
    so the outer (einsum) axis is the smallest — typically the shallow z
    axis of an (nx, nx, nz) dust grid — and the largest is the lane axis
    of the 2-D kernel.  Stable for ties."""
    return tuple(sorted(range(len(edims)), key=lambda a: edims[a]))


def _outer_contract(x, Q):
    """Contract axis 1 of (B, a, j, k) with Q[a, out], axis kept in place —
    minor dims untouched, so XLA lowers to a relayout-free MXU dot."""
    from .bttb import _axis_contract

    return _axis_contract(x, Q, 1)


def sandwich_apply_3d(x, w, dims, edims, *, in_expanded=False,
                      out_expanded=False, precision=HIGH,
                      samples_per_block=None, interpret=None):
    """Fused y[b] = P_o (Q0 x Q1 x Q2) diag(w) (.)^T P_i^T x[b].

    x: (B, i0, i1, i2) with i = `edims` when ``in_expanded`` else `dims`;
    w: (L0, L1, L2) FULL real spectrum in the same axis order.  Axis 0 is
    the outer einsum axis (callers pre-permute via :func:`best_perm`).
    Returns (B, o0, o1, o2).  Differentiable in x and w."""
    from .bttb import _real_fourier_basis

    L0 = edims[0]
    i0 = L0 if in_expanded else dims[0]
    o0 = L0 if out_expanded else dims[0]
    Q0 = _real_fourier_basis(L0, x.dtype)
    u = _outer_contract(x, Q0[:i0])             # (B, L0, i1, i2)
    b2 = sandwich_apply_wp(u, w, tuple(dims[1:]), tuple(edims[1:]),
                           in_expanded=in_expanded, out_expanded=out_expanded,
                           precision=precision,
                           samples_per_block=samples_per_block,
                           interpret=interpret)  # (B, L0, o1, o2)
    return _outer_contract(b2, Q0[:o0].T)        # (B, o0, o1, o2)


def sandwich_apply_3d_selfdot(x, w, dims, edims, *, precision=HIGH,
                              samples_per_block=None, interpret=None):
    """Cropped in/out 3-D sandwich + fused per-sample self-dot: returns
    (y, dots) with dots[b] = sum(x[b] * y[b]).  The dots are emitted per
    2-D plane by the kernel and summed over the outer axis — equal to the
    3-D inner product because Q0 is orthonormal: <x, Q0 b> = <Q0^T x, b>.
    Solver-internal; NOT differentiable (used under custom_linear_solve)."""
    from .bttb import _real_fourier_basis

    d0, L0 = dims[0], edims[0]
    Q0 = _real_fourier_basis(L0, x.dtype)
    u = _outer_contract(x, Q0[:d0])
    b2, dots = sandwich_apply_wp(u, w, tuple(dims[1:]), tuple(edims[1:]),
                                 precision=precision,
                                 samples_per_block=samples_per_block,
                                 interpret=interpret, selfdot=True)
    y = _outer_contract(b2, Q0[:d0].T)
    return y, dots
