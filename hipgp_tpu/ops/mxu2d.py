"""Cropped-IO fused 2-D circulant apply for the MXU matmul-basis regime.

The hot op of every PCG iteration on 2-D inducing grids is the real-
eigenbasis sandwich  y = P_o Q (diag(w) (Q^T P_i^T x))  per sample — two
analysis matmuls, an elementwise scale, two synthesis matmuls (bttb.
`_apply_spectrum_matmul`).  The einsum chain is HBM-bound: it materializes
the EMBEDDED (L0, L1) planes in HBM around every contraction (~10 passes
over ~4x the original data per apply; measured 3.7 ms/apply in-solve at
(1024, 128, 128) -> (256, 256), right at that unfused roofline).

This kernel applies the two round-3 lessons that made the 1-D radix path
fast (ops/radix_fft.py, RESULTS sec. 10):

* **Cropped IO.**  The circulant padding region is structurally zero on
  input and discarded on output, so the analysis/synthesis tables are
  sliced RECTANGULAR (Q[:d, :] per axis) and the embedded plane exists
  only in VMEM: one HBM read of (S, d0, d1) and one write per block, no
  XLA-side pad/crop copies — ~5x less traffic than the einsum chain.
* **Fused CG self-dots.**  Both PCG inner products are self-dots of an
  apply (p . Ap and r . C^{-1}r dot the apply's own input with its
  output), so the selfdot variant emits them per sample from the kernel
  — no separate reduction pass, no scalar-dependency barrier.

Dot layout follows the middle-kernel v3 lessons: the minor-axis analysis
and synthesis collapse (S, d, .) -> (S*d, .) — a free leading-dim merge —
into ONE large right-dot per block, the leading-axis contractions run as
per-sample plain 2-D matmuls (natural MXU tiles, no relayouts), and the
bf16 hi/lo table splits of the HIGH-precision 3-pass emulation are
hoisted out of the sample loop (Mosaic exposes no HIGH; DEFAULT is both
slower and ~5e-3 wrong on DFT-like sums — RESULTS sec. 11).

Exactly the same operator as the einsum path: Q per axis is the
orthonormal real Fourier basis (`bttb._real_fourier_basis`), so
C = (Q0 x Q1) diag(w) (.)^T with the DFT eigenvalues unchanged.

Parity reference: the FFT applies of `ziggy/misc/toeplitz_tensor.py:70-125`
(single-sample torch pipeline), rebuilt as a blocked TPU kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .radix_fft import HIGH, HIGHEST, _bf16_split

__all__ = ["sandwich_apply", "sandwich_apply_selfdot", "sandwich_apply_wp",
           "MXU2D_MAX_LEN"]

# the five resident tables + a block of sample planes must fit scoped VMEM
MXU2D_MAX_LEN = 512
# default samples per kernel block when callers pass None — a tiling knob
# for on-chip experiments (read at trace time)
SAMPLES_PER_BLOCK = 8


def _dot_pair(prec, dtype):
    """(ldot, rdot) at the requested precision with PRE-SPLIT tables: the
    table operand arrives as a `_bf16_split` pair on the f32 HIGH path so
    the split runs once per grid step, not once per dot."""
    if prec == HIGH and dtype == jnp.float32:
        f = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)

        def ldot(wp, x):
            xh, xl = _bf16_split(x)
            wh, wl = wp
            return f(wh, xh) + f(wl, xh) + f(wh, xl)

        def rdot(x, wp):
            xh, xl = _bf16_split(x)
            wh, wl = wp
            return f(xh, wh) + f(xl, wh) + f(xh, wl)

        return _bf16_split, ldot, rdot
    pr = HIGHEST if prec == HIGH else prec
    ident = lambda a: a
    ldot = lambda w, x: jnp.dot(w, x, precision=pr)
    rdot = lambda x, w: jnp.dot(x, w, precision=pr)
    return ident, ldot, rdot


# Measured and REJECTED (same verdict as the 1-D middle kernel's
# transposed-layout variant): merging the two leading-axis contractions
# across the block via in-VMEM leading-axis transposes — 4 large dots per
# block instead of 2 + 2S small ones — runs the whiten-20 at 74.9 vs
# 61.5 ms (3droad shape) and 29.9 vs 29.9 (paper shape): the VMEM
# transposes cost more than the dot issues they save.  Knob kept for
# on-chip A/B; requires a lane-aligned minor axis.
MERGED_MIDDLE = False


def _make_kernel(prec, S, selfdot):
    def kernel(q0a_ref, q1a_ref, q0s_ref, q1s_ref, w_ref, x_ref, *out_refs):
        y_ref = out_refs[0]
        dt = x_ref.dtype
        split, ldot, rdot = _dot_pair(prec, dt)
        q0a = split(q0a_ref[...])   # (L0, i0)
        q1a = split(q1a_ref[...])   # (i1, L1)
        q0s = split(q0s_ref[...])   # (o0, L0)
        q1s = split(q1s_ref[...])   # (L1, o1)
        w = w_ref[...]              # (L0, L1)
        x = x_ref[...]              # (S, i0, i1)
        _, i0, i1 = x.shape
        L0, L1 = w.shape
        o0 = y_ref.shape[1]
        # minor-axis analysis: ONE merged right-dot over the whole block
        u = rdot(x.reshape(S * i0, i1), q1a).reshape(S, i0, L1)
        # the merged layout's (i0, S, L1) <-> (i0, S*L1) shape casts need a
        # lane-aligned L1 (Mosaic rejects the cast otherwise)
        if MERGED_MIDDLE and L1 % 128 == 0:
            # leading-axis transposes keep the lane dim fixed (cheap VMEM
            # tile copies); both leading contractions become ONE dot each
            uc = u.transpose(1, 0, 2).reshape(i0, S * L1)
            ac = ldot(q0a, uc)                       # (L0, S*L1)
            ac = ac * jnp.tile(w, (1, S)).reshape(L0, S * L1)
            bc = ldot(q0s, ac)                       # (o0, S*L1)
            b = bc.reshape(o0, S, L1).transpose(1, 0, 2)
        else:
            planes = []
            for s in range(S):
                a = ldot(q0a, u[s])   # (L0, L1) embedded plane, VMEM-only
                a = a * w
                planes.append(ldot(q0s, a))   # (o0, L1)
            b = jnp.stack(planes)
        # minor-axis synthesis: merged right-dot
        y = rdot(b.reshape(S * o0, L1), q1s).reshape(S, o0, -1)
        y_ref[...] = y.astype(y_ref.dtype)
        if selfdot:
            # Mosaic wants rank >= 2 throughout: reduce (S, o0, o1) ->
            # (S, o0) -> (S, 1) with keepdims, never materializing a vector
            dots_ref = out_refs[1]
            sums = jnp.sum(jnp.sum(x * y.astype(dt), axis=2), axis=1,
                           keepdims=True)                        # (S, 1)
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1) == 0
            dots_ref[0] = jnp.where(lane0, sums, 0.0).astype(dt)

    return kernel


def _tables(dims, edims, in_expanded, out_expanded, dtype):
    """Rectangular analysis/synthesis slabs of the orthonormal real Fourier
    bases: q0a = Q0[:i0].T, q1a = Q1[:i1], q0s = Q0[:o0], q1s = Q1[:o1].T."""
    from .bttb import _real_fourier_basis

    (d0, d1), (L0, L1) = dims, edims
    i0, i1 = (L0, L1) if in_expanded else (d0, d1)
    o0, o1 = (L0, L1) if out_expanded else (d0, d1)
    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    return Q0[:i0].T, Q1[:i1], Q0[:o0], Q1[:o1].T, (i0, i1), (o0, o1)


def _block_samples(edims, requested, planes=2):
    """Samples per block: ``planes`` (L0, L1)-plane-equivalents of per-sample
    intermediates must fit VMEM next to the resident tables.  The 2-D kernel
    holds ~2 plane-equivalents live per sample; the wp kernel's merged path
    materializes the (L0, S*L1) analysis/weighted/synthesis slabs, ~3 per
    sample — with planes=3 the flagship (128, 128) inner plane clamps to
    S=32 (validated on-chip, 99.7 ms) instead of the unvalidated S=48 the
    2-D heuristic would allow."""
    if requested is None:
        requested = SAMPLES_PER_BLOCK
    budget = max(1, (6 * 1024 * 1024) // (edims[0] * edims[1] * 4 * planes))
    return max(1, min(requested, budget))


def _pallas_sandwich(x, w, dims, edims, in_expanded, out_expanded, selfdot,
                     prec, samples_per_block, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = x.dtype
    q0a, q1a, q0s, q1s, (i0, i1), (o0, o1) = _tables(
        dims, edims, in_expanded, out_expanded, dtype
    )
    L0, L1 = edims
    B = x.shape[0]
    S = _block_samples(edims, samples_per_block)
    nb = -(-B // S)
    pad = nb * S - B
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    const = lambda shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((S, i0, i1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    ytile = pl.BlockSpec((S, o0, o1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((nb * S, o0, o1), dtype)]
    out_specs = [ytile]
    if selfdot:
        # 3-D (nb, S, 128) with a (1, S, 128) block: the trailing dims equal
        # the array dims, so any S satisfies the Mosaic tile constraint
        out_shapes.append(jax.ShapeDtypeStruct((nb, S, 128), dtype))
        out_specs.append(pl.BlockSpec((1, S, 128), lambda b: (b, 0, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _make_kernel(prec, S, selfdot),
        grid=(nb,),
        in_specs=[const(q0a.shape), const(q1a.shape), const(q0s.shape),
                  const(q1s.shape), const(w.shape), xtile],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(q0a, q1a, q0s, q1s, w, x)
    if selfdot:
        y, dots = out
        return y[:B], dots.reshape(nb * S, 128)[:B, 0]
    return out[0][:B]


# Sample-merged middle contractions for the weight-plane kernel: in-VMEM
# leading-axis transposes turn the 2S per-sample middle dots into 2 large
# ones per block.  The 2-D kernel's equivalent (MERGED_MIDDLE) measured
# SLOWER at the 3droad shape, but the wp kernel's verdict INVERTS: its
# per-plane middle dots are small enough that issue latency dominates, and
# merging measured 123.6 -> 105.7 ms on the (64, 64, 32) whiten-20 at B=64
# (bit-identical output; results/repro/mxu3d_ab.py).  Requires lane-aligned
# L1; non-aligned shapes silently take the per-sample loop.
# NOTE: both knobs below are read at TRACE time inside the lru_cache'd
# _get_sandwich_wp (and inside jitted solves): flipping them at runtime has
# no effect unless the caller also runs _get_sandwich_wp.cache_clear() and
# re-jits (results/repro/mxu3d_ab.py does exactly this).
WP_MERGED_MIDDLE = True
# The wp kernel also prefers LARGER sample blocks than the 2-D kernel: the
# resident weight plane is re-fetched once per W step, so more samples per
# block amortize it.  S=32: 99.7 ms vs 105.7 at S=8 on the shape above.
WP_SAMPLES_PER_BLOCK = 32


def _make_kernel_wp(prec, S, selfdot, merged=False):
    """Weight-plane-batched variant of :func:`_make_kernel`: each grid step
    applies ITS OWN (L0, L1) weight plane — the building block of the 3-D
    sandwich (ops/mxu3d.py), where the outer-axis analysis turns one 3-D
    sample into `L_outer` independent 2-D plane problems with per-plane
    spectra w[l].  x blocks arrive as (S, 1, i0, i1) slices of the
    (B, W, i0, i1) intermediate, so every element is still read exactly
    once; only the resident weight plane changes along the W grid axis."""

    def kernel(q0a_ref, q1a_ref, q0s_ref, q1s_ref, w_ref, x_ref, *out_refs):
        y_ref = out_refs[0]
        dt = x_ref.dtype
        split, ldot, rdot = _dot_pair(prec, dt)
        q0a = split(q0a_ref[...])   # (L0, i0)
        q1a = split(q1a_ref[...])   # (i1, L1)
        q0s = split(q0s_ref[...])   # (o0, L0)
        q1s = split(q1s_ref[...])   # (L1, o1)
        w = w_ref[0]                # (L0, L1) — this plane's spectrum
        x4 = x_ref[...]             # (S, 1, i0, i1)
        _, _, i0, i1 = x4.shape
        x = x4.reshape(S, i0, i1)
        L0, L1 = w.shape
        o0, o1 = y_ref.shape[2], y_ref.shape[3]
        u = rdot(x.reshape(S * i0, i1), q1a).reshape(S, i0, L1)
        if merged and L1 % 128 == 0:
            uc = u.transpose(1, 0, 2).reshape(i0, S * L1)
            ac = ldot(q0a, uc)                       # (L0, S*L1)
            ac = ac * jnp.tile(w, (1, S)).reshape(L0, S * L1)
            bc = ldot(q0s, ac)                       # (o0, S*L1)
            b = bc.reshape(o0, S, L1).transpose(1, 0, 2)
        else:
            planes = []
            for s in range(S):
                a = ldot(q0a, u[s])
                a = a * w
                planes.append(ldot(q0s, a))
            b = jnp.stack(planes)
        y = rdot(b.reshape(S * o0, L1), q1s).reshape(S, 1, o0, o1)
        y_ref[...] = y.astype(y_ref.dtype)
        if selfdot:
            dots_ref = out_refs[1]  # block (1, 1, S, 128)
            sums = jnp.sum(jnp.sum(x * y.reshape(S, o0, o1).astype(dt),
                                   axis=2), axis=1, keepdims=True)
            lane0 = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1) == 0
            dots_ref[0, 0] = jnp.where(lane0, sums, 0.0).astype(dt)

    return kernel


def _pallas_sandwich_wp(x, w, dims, edims, in_expanded, out_expanded,
                        selfdot, prec, samples_per_block, interpret):
    """x: (B, W, i0, i1) plane stack, w: (W, L0, L1) per-plane spectra.
    Returns (B, W, o0, o1) (and, with ``selfdot``, the FULL stacked inner
    product dots[b] = sum_w sum(x[b, w] * y[b, w]) — by orthonormality of
    the outer-axis basis this equals the 3-D <x, y> the PCG needs)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = x.dtype
    q0a, q1a, q0s, q1s, (i0, i1), (o0, o1) = _tables(
        dims, edims, in_expanded, out_expanded, dtype
    )
    B, W = x.shape[:2]
    if samples_per_block is None:
        samples_per_block = WP_SAMPLES_PER_BLOCK
    S = _block_samples(edims, samples_per_block, planes=3)
    nb = -(-B // S)
    pad = nb * S - B
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    const = lambda shape: pl.BlockSpec(shape, lambda l, b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    # grid (W, nb): the sample sweep is the inner loop, so the resident
    # weight plane is re-fetched once per W step, not per block
    wtile = pl.BlockSpec((1,) + w.shape[1:], lambda l, b: (l, 0, 0),
                         memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((S, 1, i0, i1), lambda l, b: (b, l, 0, 0),
                         memory_space=pltpu.VMEM)
    ytile = pl.BlockSpec((S, 1, o0, o1), lambda l, b: (b, l, 0, 0),
                         memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((nb * S, W, o0, o1), dtype)]
    out_specs = [ytile]
    if selfdot:
        out_shapes.append(jax.ShapeDtypeStruct((W, nb, S, 128), dtype))
        out_specs.append(pl.BlockSpec((1, 1, S, 128),
                                      lambda l, b: (l, b, 0, 0),
                                      memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        _make_kernel_wp(prec, S, selfdot, merged=WP_MERGED_MIDDLE),
        grid=(W, nb),
        in_specs=[const(q0a.shape), const(q1a.shape), const(q0s.shape),
                  const(q1s.shape), wtile, xtile],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(q0a, q1a, q0s, q1s, w, x)
    if selfdot:
        y, dots = out
        dots = jnp.sum(dots[..., 0].reshape(W, nb * S)[:, :B], axis=0)
        return y[:B], dots
    return out[0][:B]


def _analysis_einsum_wp(x, dims, edims, expanded, dtype):
    """Per-plane Q^T P^T x[:, w] for (B, W, i0, i1) stacks (cold path)."""
    from .bttb import _real_fourier_basis

    (L0, L1) = edims
    i0, i1 = edims if expanded else dims
    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    a = jnp.einsum("bwij,jl->bwil", x, Q1[:i1], precision=HIGHEST)
    return jnp.einsum("bwil,ik->bwkl", a, Q0[:i0], precision=HIGHEST)


@functools.lru_cache(maxsize=64)
def _get_sandwich_wp(dims, edims, in_expanded, out_expanded, dtype_name,
                     prec, samples_per_block, interpret):
    """custom_vjp-wrapped weight-plane-batched sandwich (x: (B, W, i0, i1),
    w: (W, L0, L1)); same pullback structure as :func:`_get_sandwich`,
    per plane."""

    def impl(x, w):
        return _pallas_sandwich_wp(x, w, dims, edims, in_expanded,
                                   out_expanded, False, prec,
                                   samples_per_block, interpret)

    apply = jax.custom_vjp(impl)

    def fwd(x, w):
        return impl(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        pullback = _get_sandwich_wp(dims, edims, out_expanded, in_expanded,
                                    dtype_name, prec, samples_per_block,
                                    interpret)
        gx = pullback(g, w)
        ax = _analysis_einsum_wp(x, dims, edims, in_expanded, x.dtype)
        ag = _analysis_einsum_wp(g, dims, edims, out_expanded, g.dtype)
        gw = jnp.einsum("bwkl,bwkl->wkl", ax, ag, precision=HIGHEST)
        return gx, gw

    apply.defvjp(fwd, bwd)
    return apply


def sandwich_apply_wp(x, w, dims, edims, *, in_expanded=False,
                      out_expanded=False, precision=HIGH,
                      samples_per_block=None, interpret=None, selfdot=False):
    """Weight-plane-batched fused sandwich: y[b, l] = P_o (Q0 x Q1) diag(w[l])
    (Q0 x Q1)^T P_i^T x[b, l] for a (B, W, i0, i1) plane stack with per-plane
    spectra w (W, L0, L1).  Building block of the 3-D path (ops/mxu3d.py).

    Differentiable in x and w unless ``selfdot`` (solver-internal), which
    additionally returns dots[b] = sum_{l} <x[b, l], y[b, l]>."""
    if selfdot:
        return _pallas_sandwich_wp(x, w, tuple(dims), tuple(edims),
                                   bool(in_expanded), bool(out_expanded),
                                   True, precision, samples_per_block,
                                   interpret)
    return _get_sandwich_wp(tuple(dims), tuple(edims), bool(in_expanded),
                            bool(out_expanded), jnp.dtype(x.dtype).name,
                            precision, samples_per_block, interpret)(x, w)


def _analysis_einsum(x, dims, edims, expanded, dtype):
    """Q^T P^T x per axis (cold path, used for the weights cotangent)."""
    from .bttb import _real_fourier_basis

    (L0, L1) = edims
    i0, i1 = edims if expanded else dims
    Q0 = _real_fourier_basis(L0, dtype)
    Q1 = _real_fourier_basis(L1, dtype)
    a = jnp.einsum("bij,jl->bil", x, Q1[:i1], precision=HIGHEST)
    return jnp.einsum("bil,ik->bkl", a, Q0[:i0], precision=HIGHEST)


@functools.lru_cache(maxsize=64)
def _get_sandwich(dims, edims, in_expanded, out_expanded, dtype_name,
                  prec, samples_per_block, interpret):
    """custom_vjp-wrapped fused sandwich, cached per static signature.

    The operator is linear in x with pullback = the sandwich with the two
    crops SWAPPED (P_i and P_o exchange; diag(w) and Q are symmetric);
    the w-cotangent is sum_b analysis(x_b) * analysis(g_b), computed with
    plain einsums (cold path, matching `pallas_transform._bwd`).
    """

    def impl(x, w):
        return _pallas_sandwich(x, w, dims, edims, in_expanded,
                                out_expanded, False, prec,
                                samples_per_block, interpret)

    apply = jax.custom_vjp(impl)

    def fwd(x, w):
        return impl(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        pullback = _get_sandwich(dims, edims, out_expanded, in_expanded,
                                 dtype_name, prec, samples_per_block,
                                 interpret)
        gx = pullback(g, w)
        ax = _analysis_einsum(x, dims, edims, in_expanded, x.dtype)
        ag = _analysis_einsum(g, dims, edims, out_expanded, g.dtype)
        gw = jnp.sum(ax * ag, axis=0)
        return gx, gw

    apply.defvjp(fwd, bwd)
    return apply


def sandwich_apply(x, w, dims, edims, *, in_expanded=False,
                   out_expanded=False, precision=HIGH, samples_per_block=None,
                   interpret=None):
    """Fused y[b] = P_o (Q0 x Q1) diag(w) (Q0 x Q1)^T P_i^T x[b] on TPU.

    x: (B, i0, i1) with (i0, i1) = `edims` when ``in_expanded`` else `dims`;
    w: (L0, L1) FULL real spectrum (`bttb._full_weights` layout).  Returns
    (B, o0, o1).  Differentiable in x and w.  The same operator as the
    einsum chain of `bttb._apply_spectrum_matmul` (orthonormal bases), to
    the bf16 hi/lo 3-pass HIGH policy's ~1e-5 (f32; exact-HIGHEST on f64).
    """
    return _get_sandwich(tuple(dims), tuple(edims), bool(in_expanded),
                         bool(out_expanded), jnp.dtype(x.dtype).name,
                         precision, samples_per_block, interpret)(x, w)


def sandwich_apply_selfdot(x, w, dims, edims, *, precision=HIGH,
                           samples_per_block=None, interpret=None):
    """Cropped in/out sandwich + fused per-sample self-dot: returns
    (y, dots) with dots[b] = sum(x[b] * y[b]) — both PCG inner products
    in one kernel pass (p . Ap, r . C^{-1}r).  Solver-internal; NOT
    differentiable (`solve` wraps it in `lax.custom_linear_solve`, whose
    gradients flow through the differentiable `matmul_by_K`)."""
    return _pallas_sandwich(x, w, tuple(dims), tuple(edims), False, False,
                            True, precision, samples_per_block, interpret)
