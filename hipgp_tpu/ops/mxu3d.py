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

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .mxu2d import sandwich_apply_wp
from .radix_fft import HIGH

__all__ = ["sandwich_apply_3d", "sandwich_apply_3d_selfdot", "best_perm"]

# Whole-sample fused apply (round 5): the outer-axis analysis/synthesis
# move INTO the kernel and the inner-plane contractions merge across ALL
# W = L_outer planes of a sample — 7 large MXU dots per sample instead of
# ~2W small per-plane ones plus two HBM round trips of the (B, W, d1, d2)
# intermediate.  MEASURED ~PARITY with the two-stage pipeline end-to-end
# (RESULTS sec. 14b round-5 addendum): standalone chained applies run 15%
# faster UNCHUNKED (1.87 vs 2.21 ms at the flagship shape), but the
# unchunked kernel is VMEM-marginal (17.8 of 16 MB — compiles in some
# surrounding programs, not others) and the W-chunked fit (WP3_W_CHUNKS)
# gives the gain back (2.34 ms); meanwhile the wp pipeline's outer
# einsums already overlap with its kernel inside the real PCG loop (both
# whitens ~81 ms in-process).  Default OFF; kept (tested, on-chip-parity
# 2e-5) as the starting point if a deeper VMEM budget arrives.
USE_WP3 = False
# per-sample embedded volume (f32 bytes) budget for the wp3 kernel — the
# (L1, W*L2) analysis slab + the merged weight volume must both sit in
# scoped VMEM next to the IO blocks
WP3_MAX_EVOL_BYTES = 4 * 1024 * 1024
# process the W*L2 axis of the middle stages in this many chunks: halves
# the live (L1, W*L2) slab + its bf16 splits (the flagship shape measured
# 17.8 of 16 MB scoped VMEM unchunked); the outer synthesis accumulates
# partial sums over the W slices, so the result is identical
WP3_W_CHUNKS = 2


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


def _wp3_ok(dims, edims, dtype) -> bool:
    if dtype != jnp.float32:
        return False
    W, L1, L2 = edims
    if L2 % 128 or int(W) * L1 * L2 * 4 > WP3_MAX_EVOL_BYTES:
        return False
    # sublane alignment of the merged views
    return dims[1] % 8 == 0 and dims[0] % 8 == 0 and W % 8 == 0


def _make_kernel_wp3(prec, d0, i0, i1, o0, o1, W, L1, L2, selfdot):
    """One SAMPLE per grid step; the whole 3-D sandwich in VMEM, ordered so
    every reshape crossing the (sublane, lane) boundary happens with a
    128-multiple lane dim (Mosaic's supported cast class — the wp merged
    path's rule; merging/splitting against the raw i1 = d2 lanes is
    rejected):

      1. minor analysis    (d0*i0, i1) @ (i1, L2)     -> (d0*i0, L2)
      2. [cast (d0, i0*L2)]
         outer analysis    (W, d0) @ (d0, i0*L2)      -> (W, i0*L2)
      3. [split + leading transpose -> (i0, W*L2)]
         inner analysis    (L1, i0) @ (i0, W*L2)      -> A (L1, W*L2)
      4. scale             A * w_merged (L1, W*L2)
      5. inner synthesis   (o0, L1) @ (L1, W*L2)      -> (o0, W*L2)
      6. [split + leading transpose -> (W, o0*L2)]
         outer synthesis   (d0, W) @ (W, o0*L2)       -> (d0, o0*L2)
      7. [cast (d0*o0, L2)]
         minor synthesis   (d0*o0, L2) @ (L2, o1)     -> y (d0*o0, o1)

    vs the outer-einsum + wp pipeline: no HBM intermediate (saves two
    round trips of the 2x-volume (B, W, d1, d2) stack), and 7 dots per
    sample instead of ~2W per-plane issues (the measured issue-latency
    wall, RESULTS sec. 14b)."""
    from .mxu2d import _dot_pair

    def kernel(q0oa_ref, q0os_ref, q1a_ref, q0a_ref, q0s_ref, q1s_ref,
               wm_ref, x_ref, *out_refs):
        y_ref = out_refs[0]
        dt = x_ref.dtype
        split, ldot, rdot = _dot_pair(prec, dt)
        q0oa = split(q0oa_ref[...])   # (W, d0) outer analysis
        q0os = split(q0os_ref[...])   # (d0, W) outer synthesis
        q1a = split(q1a_ref[...])     # (i1, L2)
        q0a = split(q0a_ref[...])     # (L1, i0)
        q0s = split(q0s_ref[...])     # (o0, L1)
        q1s = split(q1s_ref[...])     # (L2, o1)
        wm = wm_ref[...]              # (L1, W*L2) merged weight volume
        x = x_ref[0]                  # (d0*i0, i1)

        u = rdot(x, q1a)                                  # (d0*i0, L2)
        u = u.reshape(d0, i0, L2).reshape(d0, i0 * L2)
        v = ldot(q0oa, u)                                 # (W, i0*L2)
        v = v.reshape(W, i0, L2).transpose(1, 0, 2).reshape(i0, W * L2)
        H = WP3_W_CHUNKS if W % WP3_W_CHUNKS == 0 else 1
        Wc = W // H
        y1 = None
        for h in range(H):
            sl = slice(h * Wc * L2, (h + 1) * Wc * L2)
            a = ldot(q0a, v[:, sl]) * wm[:, sl]           # (L1, Wc*L2)
            b = ldot(q0s, a)                              # (o0, Wc*L2)
            b = b.reshape(o0, Wc, L2).transpose(1, 0, 2).reshape(Wc, o0 * L2)
            part = ldot((q0os[0][:, h * Wc:(h + 1) * Wc],
                         q0os[1][:, h * Wc:(h + 1) * Wc])
                        if isinstance(q0os, tuple)
                        else q0os[:, h * Wc:(h + 1) * Wc], b)
            y1 = part if y1 is None else y1 + part        # (d0, o0*L2)
        y1 = y1.reshape(d0, o0, L2).reshape(d0 * o0, L2)
        y = rdot(y1, q1s)                                 # (d0*o0, o1)
        y_ref[0] = y.astype(y_ref.dtype)
        if selfdot:
            # rank >= 2 throughout (Mosaic rejects rank-1 intermediates)
            dots_ref = out_refs[1]    # (1, 8, 128) block
            s = jnp.sum(jnp.sum(x * y.astype(dt), axis=1, keepdims=True),
                        axis=0, keepdims=True)            # (1, 1)
            first = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0) \
                & (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == 0)
            dots_ref[0] = jnp.where(first, s, 0.0).astype(dt)

    return kernel


@functools.lru_cache(maxsize=32)
def _get_wp3(dims, edims, dtype_name, prec, selfdot, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .bttb import _real_fourier_basis_np

    dtype = jnp.dtype(dtype_name)
    d0, d1, d2 = dims
    W, L1, L2 = edims
    i0, i1 = d1, d2
    o0, o1 = d1, d2
    # HOST numpy tables: this builder is memoized and may first run inside
    # an active jit trace — jnp-built tables would be cached TRACERS and
    # leak into the next trace (UnexpectedTracerError; hit by the block
    # natgrad warmstart's ragged-chunk retrace)
    import numpy as _np

    Q0o = _real_fourier_basis_np(W, dtype)
    Q1 = _real_fourier_basis_np(L1, dtype)
    Q2 = _real_fourier_basis_np(L2, dtype)
    q0oa = _np.ascontiguousarray(Q0o[:d0].T)     # (W, d0)
    q0os = _np.ascontiguousarray(Q0o[:d0])       # (d0, W)
    q1a = _np.ascontiguousarray(Q2[:i1])         # (i1, L2)
    q0a = _np.ascontiguousarray(Q1[:i0].T)       # (L1, i0)
    q0s = _np.ascontiguousarray(Q1[:o0])         # (o0, L1)
    q1s = _np.ascontiguousarray(Q2[:o1].T)       # (L2, o1)

    def call(x, w):
        B = x.shape[0]
        # minor-merged HBM views: free row-major bitcasts, and they give
        # the kernel 2-D blocks whose casts stay in Mosaic's supported
        # class (see _make_kernel_wp3)
        x2 = x.reshape(B, d0 * i0, i1)
        wm = jnp.transpose(w, (1, 0, 2)).reshape(L1, W * L2)
        const = lambda shape: pl.BlockSpec(
            shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
        xtile = pl.BlockSpec((1, d0 * i0, i1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        ytile = pl.BlockSpec((1, d0 * o0, o1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
        out_shapes = [jax.ShapeDtypeStruct((B, d0 * o0, o1), dtype)]
        out_specs = [ytile]
        if selfdot:
            out_shapes.append(jax.ShapeDtypeStruct((B, 8, 128), dtype))
            out_specs.append(pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0),
                                          memory_space=pltpu.VMEM))
        out = pl.pallas_call(
            _make_kernel_wp3(prec, d0, i0, i1, o0, o1, W, L1, L2, selfdot),
            grid=(B,),
            in_specs=[const(q0oa.shape), const(q0os.shape), const(q1a.shape),
                      const(q0a.shape), const(q0s.shape), const(q1s.shape),
                      const(wm.shape), xtile],
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(q0oa, q0os, q1a, q0a, q0s, q1s, wm, x2)
        y = out[0].reshape(B, d0, o0, o1)
        if selfdot:
            return y, out[1][:, 0, 0]
        return y

    return call


def sandwich_apply_3d_selfdot(x, w, dims, edims, *, precision=HIGH,
                              samples_per_block=None, interpret=None):
    """Cropped in/out 3-D sandwich + fused per-sample self-dot: returns
    (y, dots) with dots[b] = sum(x[b] * y[b]).  The dots are emitted per
    2-D plane by the kernel and summed over the outer axis — equal to the
    3-D inner product because Q0 is orthonormal: <x, Q0 b> = <Q0^T x, b>.
    Solver-internal; NOT differentiable (used under custom_linear_solve)."""
    from .bttb import _real_fourier_basis

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if USE_WP3 and _wp3_ok(tuple(dims), tuple(edims), x.dtype):
        call = _get_wp3(tuple(dims), tuple(edims), jnp.dtype(x.dtype).name,
                        precision, True, interpret)
        return call(x, w)

    d0, L0 = dims[0], edims[0]
    Q0 = _real_fourier_basis(L0, x.dtype)
    u = _outer_contract(x, Q0[:d0])
    b2, dots = sandwich_apply_wp(u, w, tuple(dims[1:]), tuple(edims[1:]),
                                 precision=precision,
                                 samples_per_block=samples_per_block,
                                 interpret=interpret, selfdot=True)
    y = _outer_contract(b2, Q0[:d0].T)
    return y, dots
