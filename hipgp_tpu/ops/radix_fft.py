"""Fused radix-2^k circulant apply: MXU three-stage DFT with a Pallas core.

The headline HIP-GP op is the circulant apply y = F^{-1}(d * F x) on a long
power-of-two axis (L = 2 M - 2, supported up to 2^25; 2^21 for the M = 2^20 headline,
reference protocol `experiments-hip-gp/run_pcg_vs_cholesky.py`).  XLA's TPU
FFT runs it at ~45-90 GB/s effective — ~10x off the HBM roofline — and any
XLA-level composition of smaller stages materializes every intermediate in
HBM (measured: XLA FFT 7.6 ms, einsum three-stage 7.0-7.2 ms per batch-8
unpacked apply at L = 2^21; packed batch-4 XLA FFT apply 2.8 ms).

This module keeps the middle of the transform on-chip.  Factor L = A*B*C
(C = 128 lanes, B sublanes, A the outer einsum factor) and decompose the DFT
as Cooley-Tukey three-stage with twiddles:

  X[ka + A*kb + AB*kc] =
    sum_c W_C[kc,c] T2[kb,c] sum_b W_B[kb,b] T1[ka, b*C+c] sum_a W_A[ka,a] x[a,b,c]

where T1[ka,m] = exp(-2 pi i ka m / L), T2[kb,c] = exp(-2 pi i kb c / (BC)).
The circulant apply never needs natural output order: the diagonal d is
pre-permuted into stage order (a pure reshape/transpose for pow2 factors)
and the inverse transform consumes stage order directly.  The apply is
three Pallas kernels:

  stage F1 (fused Karatsuba A-point DFT)  ->  MIDDLE  ->  stage I1 (conj)

The middle kernel owns R consecutive ka planes of shape (B, C) — each a
natural 2-D VMEM tile, so every dot is a plain (128,128)-class MXU matmul
with zero in-kernel relayouts — and fuses, per plane: T1 multiply (phases
computed in-kernel from a resident theta tile — zero twiddle traffic),
W_B matmul, T2 multiply, W_C matmul, diagonal multiply, conj W_C, conj
T2, conj W_B, conj T1 — four Karatsuba complex matmuls (3 real dots each)
plus the VPU elementwise chain, one HBM read + one write for the whole
middle.  The d slab is reused across the batch (grid iterates the batch
fastest).  The stage-1 kernels fuse the 3 Karatsuba dots + combines into
one read/write of the packed planes (the einsum decomposition costs ~2.5x
the traffic).

Precision (measured at L = 2^21 vs the f64 oracle): all-HIGHEST 2.5e-7;
the shipped policy (HIGH stage-1 einsums + HIGH-emulated kernel dots via
bf16 hi/lo 3-pass splits, see `_make_dot`) 2.3e-5 — well under the f32
truncated-PCG floor; DEFAULT ~5.8e-3 and *slower* (rejected, RESULTS §11).
Measured chained at the headline shape (packed batch-4, L = 2^21):
1.34 ms/apply = stage-1 fwd ~0.4 + middle v3 ~0.55 + stage-1 inv ~0.4,
vs ~10 ms for the standalone XLA c64 FFT pair.  Stage-1 is MXU-throughput
bound (9 bf16 passes per direction = 3 Karatsuba x 3-pass HIGH emulation);
the middle is per-dot issue bound (see `_make_middle_kernel`).  The
cropped-IO variants (`fused_circulant_apply_cropped`) drop the dead
circulant-padding rows from the stage-1 I/O for the planes-state PCG in
`ops/solve.py` (round-3 decomposition: RESULTS §10).

Parity reference: behavioral twin of `ziggy/misc/toeplitz_tensor.py:70-125`
(_matmul_by_K / _matmul_by_Cinv FFT applies), rebuilt as a TPU kernel.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RadixPlan", "make_plan", "permute_weights", "fused_circulant_apply",
           "fused_circulant_apply_cropped", "radix_supported", "row_multiple"]

_LANE = 128
HIGHEST = jax.lax.Precision.HIGHEST
HIGH = jax.lax.Precision.HIGH
# All dots run at the HIGH policy: stage-1 HIGH measured -31%% over HIGHEST
# at 2.1e-5 rel err (2.5e-7 at HIGHEST) — well under the f32 truncated-PCG
# floor; in-kernel HIGH is emulated via bf16 hi/lo 3-pass splits
# (`_make_dot`; Mosaic exposes only DEFAULT/HIGHEST, and DEFAULT measured
# slower AND 5.8e-3 wrong).  Policy set from the sweep in
# experiments/precision_study.py (RESULTS §11).
STAGE1_PRECISION = HIGH


# A/B experiments only (results/repro/middle_factor_ab.py): override the
# factorization for a given L.  Callers must _plan_arrays.cache_clear()
# after changing it — plans are cached per L.
FACTOR_OVERRIDE = {}


def _factorize(L: int) -> Optional[Tuple[int, int, int]]:
    """L = A*B*C with C = 128, B in [8,128], A in [8,2048], all pow2.

    Above A=512 the stage-1 kernel blocks its output k-axis so the DFT
    table slices fit scoped VMEM (see `_stage1_pallas`); L up to 2^25 is
    supported, longer falls back to the XLA FFT path."""
    if L in FACTOR_OVERRIDE:
        return FACTOR_OVERRIDE[L]
    if L <= 0 or L & (L - 1):
        return None
    C = _LANE
    rest = L // C
    if rest * C != L:
        return None
    # prefer B = 128, shrink toward 8; A takes the remainder
    for B in (128, 64, 32, 16, 8):
        if rest % B == 0:
            A = rest // B
            if 8 <= A <= 2048:
                return A, B, C
    return None


def radix_supported(L: int) -> bool:
    return _factorize(L) is not None


def _dft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    k = np.arange(n)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return np.cos(ang), np.sin(ang)


class RadixPlan(NamedTuple):
    L: int
    A: int
    B: int
    C: int
    wac: jnp.ndarray   # (A, A) stage-1 DFT cos
    was: jnp.ndarray   # (A, A) sin
    wasum: jnp.ndarray  # cos + sin (Karatsuba third factor)
    wbc: jnp.ndarray   # (B, B)
    wbs: jnp.ndarray
    wbsum: jnp.ndarray
    wcc: jnp.ndarray   # (C, C)
    wcs: jnp.ndarray
    wcsum: jnp.ndarray
    theta: jnp.ndarray  # (B, C) T1 unit phase: -2 pi (b*C + c) / L
    t2c: jnp.ndarray   # (B, C) T2 cos
    t2s: jnp.ndarray   # (B, C) sin


@functools.lru_cache(maxsize=16)
def _plan_arrays(L: int):
    A, B, C = _factorize(L)
    mats = [_dft_mats(n) for n in (A, B, C)]
    m = (np.arange(B)[:, None] * C + np.arange(C)[None, :]).astype(np.float64)
    theta = -2.0 * np.pi * m / L
    ang2 = -2.0 * np.pi * np.outer(np.arange(B), np.arange(C)) / (B * C)
    return A, B, C, mats, theta, np.cos(ang2), np.sin(ang2)


def make_plan(L: int, dtype=jnp.float32) -> RadixPlan:
    """Plan tables as HOST numpy arrays: safe to close over across jit
    traces (they enter each trace as constants), unlike device arrays."""
    A, B, C, mats, theta, t2c, t2s = _plan_arrays(L)
    npdt = np.dtype(jnp.dtype(dtype).name)
    j = lambda a: np.asarray(a, npdt)
    (wac, was), (wbc, wbs), (wcc, wcs) = mats
    return RadixPlan(
        L, A, B, C,
        j(wac), j(was), j(wac + was),
        j(wbc), j(wbs), j(wbc + wbs),
        j(wcc), j(wcs), j(wcc + wcs),
        j(theta), j(t2c), j(t2s),
    )


def permute_weights(d_natural: jnp.ndarray, plan: RadixPlan) -> jnp.ndarray:
    """Natural-order spectrum (L,) -> kernel stage order (A, B, C), with the
    1/L inverse-transform scale folded in.  k = ka + A*kb + AB*kc means the
    natural layout viewed (C, B, A) C-order transposes to (A, B, C) — ka
    leading so each kernel slab is R consecutive (B, C) planes, each a
    natural 2-D VMEM tile (no in-kernel relayouts)."""
    d = d_natural.reshape(plan.C, plan.B, plan.A).transpose(2, 1, 0)
    return d / plan.L


def _cmul(xr, xi, cr, ci):
    return xr * cr - xi * ci, xr * ci + xi * cr


def _bf16_split(a):
    """f32 -> (hi, lo) bf16 pair with a ~= hi + lo to ~1e-7 relative."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dot(prec, dtype):
    """Kernel dot at the requested precision.  Mosaic exposes only
    DEFAULT/HIGHEST f32 dots; HIGH (3-pass bf16) is emulated manually via
    the hi/lo split — measured 1.38 vs 1.68 ms per packed middle pass at
    L = 2^21 (-18%) for 2.3e-5 vs 2.1e-5 apply error (both dominated by
    the HIGH stage-1 einsums).  Non-f32 dtypes (the f64 interpret-mode
    tests) clamp HIGH to HIGHEST, which is exact on CPU."""
    if prec == HIGH and dtype == jnp.float32:

        def dot3(a, b):
            ah, al = _bf16_split(a)
            bh, bl = _bf16_split(b)
            f = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
            return f(ah, bh) + f(al, bh) + f(ah, bl)

        return dot3
    if prec == HIGH:
        prec = HIGHEST
    return functools.partial(jnp.dot, precision=prec)


# Middle-kernel tiling overrides (None = the measured defaults: R=gcd(A,8),
# VT=2).  Exposed for on-chip tiling experiments; see RESULTS sec. 10.
_MIDDLE_R = None
_MIDDLE_VT = None
# A/B knobs (results/repro/middle_factor_ab.py), read at trace time:
# _MIDDLE_F2_CONCAT collapses the R per-plane F2/I2 left dots into ONE
# (B,B)@(B,R*C) dot via lane-concatenation of the plane tiles (keeps the
# (sublane=B, lane=C) layout — unlike the rejected leading-axis
# transpose); _MIDDLE_F2_BATCHED expresses them as one R-batched
# dot_general instead of a Python loop (no copies — scheduling up to
# Mosaic).
_MIDDLE_F2_CONCAT = False
_MIDDLE_F2_BATCHED = False


def _make_middle_kernel(prec, R, B, C, VT):
    """v3 layout: stage-major over the whole resident (VT, R, B, C) slab.

    vs the per-plane v2 chain (measured 1.49 -> 1.35 ms on the full packed
    apply at L = 2^21): the bf16 hi/lo weight splits are hoisted out of all
    loops, the T1 phase slab is computed once per grid step, each stage's
    dots run consecutively (same weight matrices resident in the MXU), and
    the minor-axis F3/I3 contractions collapse (R, B, C) -> (R*B, C) — a
    free leading-dim merge — into ONE large right-dot instead of R small
    ones (per-dot issue latency on (128,128)@(128,128) dominates v2; a
    transposed-layout variant merging F2/I2 the same way measured SLOWER,
    1.42 ms, because the minor-dim transposes cost more than the issues
    they save)."""

    def _middle_kernel(theta_ref, t2c_ref, t2s_ref, wbc_ref, wbs_ref,
                       wbsum_ref, wcc_ref, wcs_ref, wcsum_ref, d_ref,
                       yr_ref, yi_ref, zr_ref, zi_ref):
        import jax.experimental.pallas as pl

        dt = theta_ref.dtype
        f32_high = prec == HIGH and dt == jnp.float32
        a0 = pl.program_id(0).astype(dt) * R

        # T1 phases for the whole R-slab, once per grid step
        th = theta_ref[...]                                   # (B, C)
        rr = a0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0).astype(dt)
        ang = th[None] * rr                                   # (R, B, C)
        c1 = jnp.cos(ang)
        s1 = jnp.sin(ang)
        t2c = t2c_ref[...][None]
        t2s = t2s_ref[...][None]
        dd = d_ref[...]                                       # (R, B, C)

        if f32_high:
            split = _bf16_split
            neg = lambda p: (-p[0], -p[1])
            f = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)

            def ldot(wp, x):
                xh, xl = _bf16_split(x)
                wh, wl = wp
                return f(wh, xh) + f(wl, xh) + f(wh, xl)

            def rdot(x, wp):
                xh, xl = _bf16_split(x)
                wh, wl = wp
                return f(xh, wh) + f(xl, wh) + f(xh, wl)
        else:
            pr = HIGHEST if prec == HIGH else prec
            split = lambda a: a
            neg = lambda a: -a
            ldot = lambda w, x: jnp.dot(w, x, precision=pr)
            rdot = lambda x, w: jnp.dot(x, w, precision=pr)

        # weight (splits) hoisted out of every loop; DFT matrices are
        # symmetric so the same tables serve left and right dots
        wbcp = split(wbc_ref[...])
        wbsp = split(wbs_ref[...])
        wbsump = split(wbsum_ref[...])
        wccp = split(wcc_ref[...])
        wcsp = split(wcs_ref[...])
        wcsump = split(wcsum_ref[...])
        wbs_m = neg(wbsp)
        wcs_m = neg(wcsp)
        wbdiff = split(wbc_ref[...] - wbs_ref[...])
        wcdiff = split(wcc_ref[...] - wcs_ref[...])

        def cdot_left(br, bi, wr, wi, wsum):
            t1 = ldot(wr, br)
            t2 = ldot(wi, bi)
            t3 = ldot(wsum, br + bi)
            return t1 - t2, t3 - t1 - t2

        def cdot_right(ar, ai, wr, wi, wsum):
            t1 = rdot(ar, wr)
            t2 = rdot(ai, wi)
            t3 = rdot(ar + ai, wsum)
            return t1 - t2, t3 - t1 - t2

        def f2_planes(yr, yi, wr, wi, wsum):
            """F2/I2 over b for the whole (R, B, C) slab."""
            if _MIDDLE_F2_BATCHED:
                bdims = (((2,), (1,)), ((0,), (0,)))

                def bld(wp, x):
                    # w (B,B) batched over R: (R,B,B) x (R,B,C) -> (R,B,C)
                    wb = lambda m: jnp.broadcast_to(m[None], (R,) + m.shape)
                    if f32_high:
                        xh, xl = _bf16_split(x)
                        g = lambda a, b: jax.lax.dot_general(
                            a, b, bdims, preferred_element_type=jnp.float32)
                        wh, wl = wp
                        return (g(wb(wh), xh) + g(wb(wl), xh)
                                + g(wb(wh), xl))
                    pr = HIGHEST if prec == HIGH else prec
                    return jax.lax.dot_general(wb(wp), x, bdims, precision=pr)

                t1 = bld(wr, yr)
                t2 = bld(wi, yi)
                t3 = bld(wsum, yr + yi)
                return t1 - t2, t3 - t1 - t2
            if _MIDDLE_F2_CONCAT:
                # lane-concat the R plane tiles -> ONE (B,B)@(B,R*C) dot
                # trio (sublane layout untouched), then split back
                rc = jnp.concatenate([yr[r] for r in range(R)], axis=-1)
                ic = jnp.concatenate([yi[r] for r in range(R)], axis=-1)
                a, b = cdot_left(rc, ic, wr, wi, wsum)
                yr = jnp.stack([a[:, r * C:(r + 1) * C] for r in range(R)])
                yi = jnp.stack([b[:, r * C:(r + 1) * C] for r in range(R)])
                return yr, yi
            or_, oi_ = [], []
            for r in range(R):
                a, b = cdot_left(yr[r], yi[r], wr, wi, wsum)
                or_.append(a)
                oi_.append(b)
            return jnp.stack(or_), jnp.stack(oi_)

        for v in range(VT):
            yr = yr_ref[v]                                    # (R, B, C)
            yi = yi_ref[v]
            yr, yi = yr * c1 - yi * s1, yr * s1 + yi * c1     # T1
            # F2 over b
            yr, yi = f2_planes(yr, yi, wbcp, wbsp, wbsump)
            yr, yi = yr * t2c - yi * t2s, yr * t2s + yi * t2c  # T2
            # F3 over c: ONE merged right dot on (R*B, C)
            fr, fi = cdot_right(yr.reshape(R * B, C), yi.reshape(R * B, C),
                                wccp, wcsp, wcsump)
            yr = fr.reshape(R, B, C) * dd          # diagonal (1/L folded)
            yi = fi.reshape(R, B, C) * dd
            # I3: conj right dot, merged
            fr, fi = cdot_right(yr.reshape(R * B, C), yi.reshape(R * B, C),
                                wccp, wcs_m, wcdiff)
            yr = fr.reshape(R, B, C)
            yi = fi.reshape(R, B, C)
            yr, yi = yr * t2c + yi * t2s, -yr * t2s + yi * t2c  # conj T2
            # I2: conj F2
            yr, yi = f2_planes(yr, yi, wbcp, wbs_m, wbdiff)
            zr_ref[v] = yr * c1 + yi * s1                      # conj T1
            zi_ref[v] = -yr * s1 + yi * c1

    return _middle_kernel


def _make_middle_kernel_dual(prec, R, B, C, VT):
    """Two-diagonal middle: ONE forward chain (T1, F2, T2, F3), then the
    diagonal multiply + inverse chain (I3, conj T2, I2, conj T1) runs TWICE
    — once per diagonal — on the resident forward slab.

    This is the transform core of the Eisenstat PCG step in `ops/solve`:
    z = C^{-1} r and Az = K C^{-1} r share the forward transform of r
    (both operators are diagonal in the same basis), so per CG iteration
    the middle does 3 half-chains instead of 4 and stage-1 forward runs
    once instead of twice.  Identical per-plane math to
    `_make_middle_kernel` otherwise."""

    def _kernel(theta_ref, t2c_ref, t2s_ref, wbc_ref, wbs_ref,
                wbsum_ref, wcc_ref, wcs_ref, wcsum_ref, dA_ref, dB_ref,
                yr_ref, yi_ref, zAr_ref, zAi_ref, zBr_ref, zBi_ref):
        import jax.experimental.pallas as pl

        dt = theta_ref.dtype
        f32_high = prec == HIGH and dt == jnp.float32
        a0 = pl.program_id(0).astype(dt) * R

        th = theta_ref[...]
        rr = a0 + jax.lax.broadcasted_iota(jnp.int32, (R, 1, 1), 0).astype(dt)
        ang = th[None] * rr
        c1 = jnp.cos(ang)
        s1 = jnp.sin(ang)
        t2c = t2c_ref[...][None]
        t2s = t2s_ref[...][None]
        ddA = dA_ref[...]
        ddB = dB_ref[...]

        if f32_high:
            split = _bf16_split
            neg = lambda p: (-p[0], -p[1])
            f = lambda p, q: jnp.dot(p, q, preferred_element_type=jnp.float32)

            def ldot(wp, x):
                xh, xl = _bf16_split(x)
                wh, wl = wp
                return f(wh, xh) + f(wl, xh) + f(wh, xl)

            def rdot(x, wp):
                xh, xl = _bf16_split(x)
                wh, wl = wp
                return f(xh, wh) + f(xl, wh) + f(xh, wl)
        else:
            pr = HIGHEST if prec == HIGH else prec
            split = lambda a: a
            neg = lambda a: -a
            ldot = lambda w, x: jnp.dot(w, x, precision=pr)
            rdot = lambda x, w: jnp.dot(x, w, precision=pr)

        wbcp = split(wbc_ref[...])
        wbsp = split(wbs_ref[...])
        wbsump = split(wbsum_ref[...])
        wccp = split(wcc_ref[...])
        wcsp = split(wcs_ref[...])
        wcsump = split(wcsum_ref[...])
        wbs_m = neg(wbsp)
        wcs_m = neg(wcsp)
        wbdiff = split(wbc_ref[...] - wbs_ref[...])
        wcdiff = split(wcc_ref[...] - wcs_ref[...])

        def cdot_left(br, bi, wr, wi, wsum):
            t1 = ldot(wr, br)
            t2 = ldot(wi, bi)
            t3 = ldot(wsum, br + bi)
            return t1 - t2, t3 - t1 - t2

        def cdot_right(ar, ai, wr, wi, wsum):
            t1 = rdot(ar, wr)
            t2 = rdot(ai, wi)
            t3 = rdot(ar + ai, wsum)
            return t1 - t2, t3 - t1 - t2

        for v in range(VT):
            yr = yr_ref[v]
            yi = yi_ref[v]
            yr, yi = yr * c1 - yi * s1, yr * s1 + yi * c1     # T1
            or_, oi_ = [], []
            for r in range(R):
                a, b = cdot_left(yr[r], yi[r], wbcp, wbsp, wbsump)
                or_.append(a)
                oi_.append(b)
            yr = jnp.stack(or_)
            yi = jnp.stack(oi_)
            yr, yi = yr * t2c - yi * t2s, yr * t2s + yi * t2c  # T2
            fr, fi = cdot_right(yr.reshape(R * B, C), yi.reshape(R * B, C),
                                wccp, wcsp, wcsump)
            fr = fr.reshape(R, B, C)
            fi = fi.reshape(R, B, C)

            for dd, zr_ref, zi_ref in ((ddA, zAr_ref, zAi_ref),
                                       (ddB, zBr_ref, zBi_ref)):
                yr = fr * dd
                yi = fi * dd
                gr, gi = cdot_right(yr.reshape(R * B, C),
                                    yi.reshape(R * B, C),
                                    wccp, wcs_m, wcdiff)
                yr = gr.reshape(R, B, C)
                yi = gi.reshape(R, B, C)
                yr, yi = yr * t2c + yi * t2s, -yr * t2s + yi * t2c  # conj T2
                or_, oi_ = [], []
                for r in range(R):
                    a, b = cdot_left(yr[r], yi[r], wbcp, wbs_m, wbdiff)
                    or_.append(a)
                    oi_.append(b)
                yr = jnp.stack(or_)
                yi = jnp.stack(oi_)
                zr_ref[v] = yr * c1 + yi * s1                  # conj T1
                zi_ref[v] = -yr * s1 + yi * c1

    return _kernel


def _middle_pallas_dual(yr, yi, dA, dB, plan: RadixPlan, prec):
    """(V, A, B, C) planes -> two outputs, one per diagonal, with the
    forward half of the middle computed once.  VT = 1 (the two extra
    output tiles roughly double the out-slab VMEM next to the
    double-buffered pipeline; a (VT=2) variant would brush the scoped
    limit at B = C = 128)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, A, B, C = yr.shape
    R = math.gcd(A, 8)
    VT = 1
    const = pl.BlockSpec((B, C), lambda a, v: (0, 0), memory_space=pltpu.VMEM)
    sq = lambda n: pl.BlockSpec((n, n), lambda a, v: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((VT, R, B, C), lambda a, v: (v, a, 0, 0),
                        memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((R, B, C), lambda a, v: (a, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((V, A, B, C), yr.dtype)
    return pl.pallas_call(
        _make_middle_kernel_dual(prec, R, B, C, VT),
        grid=(A // R, V // VT),
        in_specs=[const, const, const, sq(B), sq(B), sq(B), sq(C), sq(C),
                  sq(C), dspec, dspec, tile, tile],
        out_specs=[tile, tile, tile, tile],
        out_shape=[out, out, out, out],
        interpret=jax.default_backend() != "tpu",
    )(plan.theta, plan.t2c, plan.t2s, plan.wbc, plan.wbs, plan.wbsum,
      plan.wcc, plan.wcs, plan.wcsum, dA, dB, yr, yi)


def _middle_pallas(yr, yi, d_perm, plan: RadixPlan, prec):
    """(V, A, B, C) complex planes -> same shape, fused middle stages.

    Grid (A/R, V): each step owns R consecutive ka planes of shape (B, C),
    the natural 2-D VMEM tile, so F2/I2 are (B,B)@(B,C) and F3/I3 are
    (B,C)@(C,C) — exact MXU shapes with no reshapes.  The d slab is reused
    across the batch (v iterates fastest)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, A, B, C = yr.shape
    R = _MIDDLE_R if _MIDDLE_R and A % _MIDDLE_R == 0 else math.gcd(A, 8)
    VT = (_MIDDLE_VT if _MIDDLE_VT and V % _MIDDLE_VT == 0
          else (2 if V % 2 == 0 else 1))
    const = pl.BlockSpec((B, C), lambda a, v: (0, 0), memory_space=pltpu.VMEM)
    sq = lambda n: pl.BlockSpec((n, n), lambda a, v: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((VT, R, B, C), lambda a, v: (v, a, 0, 0),
                        memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((R, B, C), lambda a, v: (a, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((V, A, B, C), yr.dtype)
    return pl.pallas_call(
        _make_middle_kernel(prec, R, B, C, VT),
        grid=(A // R, V // VT),
        in_specs=[const, const, const, sq(B), sq(B), sq(B), sq(C), sq(C),
                  sq(C), dspec, tile, tile],
        out_specs=[tile, tile],
        out_shape=[out, out],
        interpret=jax.default_backend() != "tpu",
    )(plan.theta, plan.t2c, plan.t2s, plan.wbc, plan.wbs, plan.wbsum,
      plan.wcc, plan.wcs, plan.wcsum, d_perm, yr, yi)


def _make_s1_kernel(prec):
    def kernel(wc_ref, ws_ref, wsum_ref, xr_ref, xi_ref, yr_ref, yi_ref):
        dot = _make_dot(prec, xr_ref.dtype)
        wc = wc_ref[...]
        ws = ws_ref[...]
        xr = xr_ref[0]
        xi = xi_ref[0]
        t1 = dot(wc, xr)
        t2 = dot(ws, xi)
        t3 = dot(wsum_ref[...], xr + xi)
        yr_ref[0] = t1 - t2
        yi_ref[0] = t3 - t1 - t2

    return kernel


def _make_s1_dot_kernel(prec):
    """Stage-1 kernel that additionally contracts its output against a
    rider input: emits per-block partials of sum(ur * yr) and
    sum(ui * yi).  Both CG inner products have this self-dot shape
    (p . Ap and r . C^{-1}r dot the apply's own INPUT with its output),
    so fusing them here removes the separate 2-vector reduction pass —
    and its pipeline barrier — per PCG iteration."""

    def kernel(wc_ref, ws_ref, wsum_ref, xr_ref, xi_ref, ur_ref, ui_ref,
               yr_ref, yi_ref, pr_ref, pi_ref):
        import jax.experimental.pallas as pl

        dot = _make_dot(prec, xr_ref.dtype)
        wc = wc_ref[...]
        ws = ws_ref[...]
        xr = xr_ref[0]
        xi = xi_ref[0]
        t1 = dot(wc, xr)
        t2 = dot(ws, xi)
        t3 = dot(wsum_ref[...], xr + xi)
        yr = t1 - t2
        yi = t3 - t1 - t2
        yr_ref[0] = yr
        yi_ref[0] = yi
        # partials accumulate into a per-v resident (8, 128) tile (the
        # output block's index map ignores t/k, so it stays in VMEM across
        # the whole v-slice of the grid); host side sums the tile.
        first = jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0)

        @pl.when(first)
        def _init():
            pr_ref[...] = jnp.zeros_like(pr_ref)
            pi_ref[...] = jnp.zeros_like(pi_ref)

        row0 = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == 0)

        def lane_sum(prod):
            v = jnp.sum(prod, axis=0)                    # (T,)
            v = jnp.sum(v.reshape(-1, 128), axis=0)      # (128,)
            return jnp.where(row0, v[None, :], 0.0).astype(prod.dtype)

        pr_ref[0] += lane_sum(ur_ref[0] * yr)
        pi_ref[0] += lane_sum(ui_ref[0] * yi)

    return kernel


def _stage1_pallas(xr3, xi3, wc, ws, wsum, prec):
    """Fused Karatsuba A-axis DFT: (V, Ain, BC) @ (Aout, Ain) tables with
    one HBM read of (xr, xi) and one write of (yr, yi) — the einsum
    decomposition costs ~2.5x the traffic (3 dots + combines each
    round-tripping HBM).  Measured 0.65 vs 0.99 ms per packed batch-4
    direction at L = 2^21.

    Tables may be RECTANGULAR: the cropped-IO applies slice the DFT matrix
    to the rows that land inside the original M grid (fwd: (A, in_rows)
    since the embedded tail rows are zero; inv: (out_rows, A) since the
    cropped output discards the tail) — halving the dead half of the
    stage-1 I/O traffic without any XLA-side pad/crop copies.

    For A > 512 the full tables no longer fit scoped VMEM next to the I/O
    blocks, so the output k-axis is blocked: grid gains a fastest k
    dimension with (KB, Ain) table slices, and the x block's index map is
    k-independent, so Pallas keeps it resident across the k steps (no
    re-fetch traffic)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, Ain, BC = xr3.shape
    Aout = wc.shape[0]
    # table budget ~6MB: 3 slices of (KB, Ain) f32 -> KB <= 512K/Ain, pow2
    kb_max = max(128, 1 << (((6 * 1024 * 1024) // (12 * Ain)).bit_length() - 1))
    KB = min(Aout, kb_max)
    while Aout % KB:
        KB //= 2
    # VMEM budget: 3 (KB, Ain) f32 tables + 2 input blocks of (Ain, T) +
    # 2 output blocks of (KB, T), each double-buffered (~2 live instances)
    # must stay under the 16MB scoped limit; clamp T to the largest power
    # of two that fits (BC is a power of two, so divisibility is automatic)
    budget = max(128, (10 * 1024 * 1024 - 3 * KB * Ain * 4)
                 // ((Ain + KB) * 4 * 4))
    T = min(1024, BC, 1 << (budget.bit_length() - 1))
    while BC % T:
        T //= 2
    sq = pl.BlockSpec((KB, Ain), lambda v, t, k: (k, 0),
                      memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((1, Ain, T), lambda v, t, k: (v, 0, t),
                         memory_space=pltpu.VMEM)
    ytile = pl.BlockSpec((1, KB, T), lambda v, t, k: (v, k, t),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((V, Aout, BC), xr3.dtype)
    return pl.pallas_call(
        _make_s1_kernel(prec),
        grid=(V, BC // T, Aout // KB),
        in_specs=[sq, sq, sq, xtile, xtile],
        out_specs=[ytile, ytile],
        out_shape=[out, out],
    )(wc, ws, wsum, xr3, xi3)


def _stage1_inv_dot_pallas(zr3, zi3, ur3, ui3, wc, ws, wsum, prec):
    """`_stage1_pallas` with the self-dot rider (see `_make_s1_dot_kernel`):
    returns (yr, yi, dr, di) where dr[v] = sum(ur[v] * yr[v]) etc."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, Ain, BC = zr3.shape
    Aout = wc.shape[0]
    kb_max = max(128, 1 << (((6 * 1024 * 1024) // (12 * Ain)).bit_length() - 1))
    KB = min(Aout, kb_max)
    while Aout % KB:
        KB //= 2
    # rider blocks double the output-side VMEM: (Ain + 3*KB) live tiles
    budget = max(128, (10 * 1024 * 1024 - 3 * KB * Ain * 4)
                 // ((Ain + 3 * KB) * 4 * 4))
    T = min(1024, BC, 1 << (budget.bit_length() - 1))
    while BC % T:
        T //= 2
    sq = pl.BlockSpec((KB, Ain), lambda v, t, k: (k, 0),
                      memory_space=pltpu.VMEM)
    xtile = pl.BlockSpec((1, Ain, T), lambda v, t, k: (v, 0, t),
                         memory_space=pltpu.VMEM)
    ytile = pl.BlockSpec((1, KB, T), lambda v, t, k: (v, k, t),
                         memory_space=pltpu.VMEM)
    ptile = pl.BlockSpec((1, 8, 128), lambda v, t, k: (v, 0, 0),
                         memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((V, Aout, BC), zr3.dtype)
    pshape = jax.ShapeDtypeStruct((V, 8, 128), zr3.dtype)
    yr, yi, pr, pi = pl.pallas_call(
        _make_s1_dot_kernel(prec),
        grid=(V, BC // T, Aout // KB),
        in_specs=[sq, sq, sq, xtile, xtile, ytile, ytile],
        out_specs=[ytile, ytile, ptile, ptile],
        out_shape=[out, out, pshape, pshape],
        interpret=jax.default_backend() != "tpu",
    )(wc, ws, wsum, zr3, zi3, ur3, ui3)
    return yr, yi, jnp.sum(pr, axis=(1, 2)), jnp.sum(pi, axis=(1, 2))


def _stage1_inv_dot(zr, zi, ur, ui, plan: RadixPlan, prec,
                    out_rows: Optional[int] = None):
    """`_stage1_inv` + fused self-dot: (yr, yi, dr, di) with
    dr[v] = ur[v] . yr[v], di[v] = ui[v] . yi[v] (ur/ui shaped like the
    cropped output)."""
    V = zr.shape[0]
    A, B, C = plan.A, plan.B, plan.C
    rows = A if out_rows is None else out_rows
    wc = plan.wac if rows == A else plan.wac[:rows]
    ws = -(plan.was if rows == A else plan.was[:rows])
    if _use_s1_pallas(zr.dtype):
        yr, yi, dr, di = _stage1_inv_dot_pallas(
            zr.reshape(V, A, B * C), zi.reshape(V, A, B * C),
            ur.reshape(V, rows, B * C), ui.reshape(V, rows, B * C),
            wc, ws, wc + ws, prec,
        )
        return yr.reshape(V, rows * B * C), yi.reshape(V, rows * B * C), dr, di
    yr, yi = _stage1_inv(zr, zi, plan, prec, out_rows)
    return yr, yi, jnp.sum(ur * yr, axis=-1), jnp.sum(ui * yi, axis=-1)


def _use_s1_pallas(dtype):
    return dtype == jnp.float32 and jax.default_backend() == "tpu"


def _stage1_fwd(xr, xi, plan: RadixPlan, prec, in_rows: Optional[int] = None):
    """(V, in_rows*B*C) -> (V, A, B, C): DFT over the a axis, output
    ka-major so the middle kernel reads contiguous (B, C) planes.

    ``in_rows`` < A declares the remaining a-rows structurally ZERO (the
    circulant embedding's padding region): the DFT tables are sliced to
    (A, in_rows) columns, so the dead rows are neither read nor multiplied.
    Pallas-fused on TPU f32; XLA einsum fallback elsewhere (CPU/f64)."""
    V = xr.shape[0]
    A, B, C = plan.A, plan.B, plan.C
    rows = A if in_rows is None else in_rows
    wc, ws, wsum = plan.wac, plan.was, plan.wasum
    if rows != A:
        wc, ws, wsum = wc[:, :rows], ws[:, :rows], wsum[:, :rows]
    if _use_s1_pallas(xr.dtype):
        yr, yi = _stage1_pallas(
            xr.reshape(V, rows, B * C), xi.reshape(V, rows, B * C),
            wc, ws, wsum, prec,
        )
        return yr.reshape(V, A, B, C), yi.reshape(V, A, B, C)
    ein = functools.partial(jnp.einsum, precision=prec)
    ar = xr.reshape(V, rows, B, C)
    ai = xi.reshape(V, rows, B, C)
    t1 = ein("ka,vabc->vkbc", wc, ar)
    t2 = ein("ka,vabc->vkbc", ws, ai)
    t3 = ein("ka,vabc->vkbc", wsum, ar + ai)
    return t1 - t2, t3 - t1 - t2


def _stage1_inv(zr, zi, plan: RadixPlan, prec, out_rows: Optional[int] = None):
    """(V, A, B, C) -> (V, out_rows*B*C): conj DFT over the ka axis,
    natural order.  ``out_rows`` < A computes only the a-rows that survive
    the crop back to the original grid (tables sliced to (out_rows, A))."""
    V = zr.shape[0]
    A, B, C = plan.A, plan.B, plan.C
    rows = A if out_rows is None else out_rows
    wc = plan.wac if rows == A else plan.wac[:rows]
    ws = -(plan.was if rows == A else plan.was[:rows])
    if _use_s1_pallas(zr.dtype):
        yr, yi = _stage1_pallas(
            zr.reshape(V, A, B * C), zi.reshape(V, A, B * C),
            wc, ws, wc + ws, prec,
        )
        return yr.reshape(V, rows * B * C), yi.reshape(V, rows * B * C)
    ein = functools.partial(jnp.einsum, precision=prec)
    # tables are (out_rows, A): contract over their SECOND axis (the DFT
    # matrix is symmetric, so this matches the square case bit-for-bit)
    t1 = ein("ak,vkbc->vabc", wc, zr)
    t2 = ein("ak,vkbc->vabc", ws, zi)
    t3 = ein("ak,vkbc->vabc", wc + ws, zr + zi)
    out = rows * B * C
    return (t1 - t2).reshape(V, out), (t3 - t1 - t2).reshape(V, out)


def _apply_impl(xr, xi, d_perm, plan: RadixPlan, kprec, s1prec,
                in_rows=None, out_rows=None):
    yr, yi = _stage1_fwd(xr, xi, plan, s1prec, in_rows)
    zr, zi = _middle_pallas(yr, yi, d_perm, plan, kprec)
    return _stage1_inv(zr, zi, plan, s1prec, out_rows)


def _forward_stages(xr, xi, plan: RadixPlan, prec, in_rows=None):
    """Forward transform only, pure XLA — used for the weights cotangent.
    Returns (V, A, B, C) planes AFTER T1/F2/T2/F3 (d_perm's layout)."""
    A, B, C = plan.A, plan.B, plan.C
    yr, yi = _stage1_fwd(xr, xi, plan, prec, in_rows)  # (V, A, B, C)
    ka = jnp.arange(A, dtype=yr.dtype).reshape(1, A, 1, 1)
    ang = plan.theta.reshape(1, 1, B, C) * ka
    yr, yi = _cmul(yr, yi, jnp.cos(ang), jnp.sin(ang))
    ein = functools.partial(jnp.einsum, precision=prec)
    rr = ein("kb,vabc->vakc", plan.wbc, yr) - ein("kb,vabc->vakc", plan.wbs, yi)
    ri = ein("kb,vabc->vakc", plan.wbc, yi) + ein("kb,vabc->vakc", plan.wbs, yr)
    yr, yi = _cmul(rr, ri, plan.t2c.reshape(1, 1, B, C), plan.t2s.reshape(1, 1, B, C))
    rr = ein("vabc,ck->vabk", yr, plan.wcc) - ein("vabc,ck->vabk", yi, plan.wcs)
    ri = ein("vabc,ck->vabk", yi, plan.wcc) + ein("vabc,ck->vabk", yr, plan.wcs)
    return rr, ri


@functools.lru_cache(maxsize=64)
def _get_apply(L: int, dtype_name: str, kprec, s1prec,
               in_rows=None, out_rows=None):
    """custom_vjp closure over a host-numpy plan, cached per (L, dtype,
    precisions, crop rows) — plan tables enter every jit trace as fresh
    constants, so the closure is safe to reuse across traces."""
    plan = make_plan(L, dtype_name)

    @jax.custom_vjp
    def apply(xr, xi, d_perm):
        return _apply_impl(xr, xi, d_perm, plan, kprec, s1prec,
                           in_rows, out_rows)

    def fwd(xr, xi, d_perm):
        y = _apply_impl(xr, xi, d_perm, plan, kprec, s1prec,
                        in_rows, out_rows)
        return y, (xr, xi, d_perm)

    def bwd(res, g):
        xr, xi, d_perm = res
        gr, gi = g
        # x-cotangent: y = P_out C_d P_in^T x with C_d real symmetric and
        # P_* row-selections, so the pullback is the apply with the crops
        # swapped (the same apply when in_rows == out_rows).
        xbr, xbi = _apply_impl(gr, gi, d_perm, plan, kprec, s1prec,
                               in_rows=out_rows, out_rows=in_rows)
        # d-cotangent: in permuted coordinates y = conjF(d_perm . F x) with
        # no scale (1/L lives inside d_perm via permute_weights), so
        # dL/dd_perm = sum_v Re[(F x) . conj(F g)] in stage order.
        fxr, fxi = _forward_stages(xr, xi, plan, s1prec, in_rows)
        fgr, fgi = _forward_stages(gr, gi, plan, s1prec, out_rows)
        dbar = jnp.sum(fxr * fgr + fxi * fgi, axis=0)
        return xbr, xbi, dbar

    apply.defvjp(fwd, bwd)
    return apply


def fused_circulant_apply(xr, xi, d_perm, plan: RadixPlan, precision=HIGH,
                          stage1_precision=None):
    """Packed circulant apply: returns (C_d xr, C_d xi) for real even spectra.

    xr, xi: (V, L) planes (two real RHS per complex slot — the 2-for-1
    packing of `bttb._fft_apply_core`).  d_perm: `permute_weights` output.
    ``precision`` is the Pallas-kernel dot precision; the surrounding
    stage-1 einsums run at ``stage1_precision`` (default
    :data:`STAGE1_PRECISION`, set from the measured precision study).
    Differentiable in xr/xi (the operator is symmetric: the pullback is the
    same fused apply) and in d_perm (two forward transforms).
    """
    s1 = STAGE1_PRECISION if stage1_precision is None else stage1_precision
    return _get_apply(plan.L, jnp.dtype(xr.dtype).name, precision, s1)(
        xr, xi, d_perm
    )


def fused_circulant_apply_cropped_selfdot(
    xr, xi, d_perm, plan: RadixPlan,
    in_rows: int, out_rows: int,
    precision=HIGH, stage1_precision=None,
):
    """Cropped apply + fused input.output inner products: returns
    (yr, yi, dr, di) with y = C_d x (cropped as in
    :func:`fused_circulant_apply_cropped`), dr[v] = xr[v] . yr[v] and
    di[v] = xi[v] . yi[v].

    Both PCG inner products are self-dots of an apply (p . Ap for the
    matvec, r . z for the preconditioner), so emitting them from the
    stage-1 inverse kernel's partials removes a separate two-vector
    reduction pass — and its scalar-dependency pipeline barrier — per
    iteration (measured 0.39 ms/iter of the M = 2^20 headline solve).
    Requires in_rows == out_rows (the self-dot needs matching spaces).
    Solver-internal; not differentiable (see `..._dual`).
    """
    assert in_rows == out_rows, "self-dot needs matching in/out crops"
    s1 = STAGE1_PRECISION if stage1_precision is None else stage1_precision
    yr, yi = _stage1_fwd(xr, xi, plan, s1, in_rows)
    zr, zi = _middle_pallas(yr, yi, d_perm, plan, precision)
    return _stage1_inv_dot(zr, zi, xr, xi, plan, s1, out_rows)


def fused_circulant_apply_cropped_dual(
    xr, xi, dA, dB, plan: RadixPlan,
    in_rows: int, out_rows: int,
    precision=HIGH, stage1_precision=None,
):
    """Cropped-IO circulant apply with TWO diagonals sharing one forward
    transform: returns (C_dA x, C_dB x) as ((yAr, yAi), (yBr, yBi)).

    Per pair this costs one stage-1 forward + one dual middle (3
    half-chains) + two stage-1 inverses — vs two forwards + two full
    middles + two inverses for two independent applies (~25% fewer MXU
    passes and one fewer HBM round-trip of the input slab; measured
    2.00 ms/pair vs 2.45, RESULTS sec. 10).

    NOT used by the PCG solver: the solver's matvec is the CROPPED
    operator P C_K P^T and P^T P != I blocks diagonal composition — the
    two PCG applies (matvec and preconditioner) act on DIFFERENT vectors,
    so no shared forward exists (Eisenstat-style tricks are structurally
    unusable here).  Kept for non-PCG consumers that need two spectra of
    one vector, e.g. applying K and d/d(hyper) K to the same slab.

    NOT differentiable (no custom_vjp) — solver-internal-style plumbing
    only; gradients flow through the differentiable `matmul_by_K`.
    """
    s1 = STAGE1_PRECISION if stage1_precision is None else stage1_precision
    yr, yi = _stage1_fwd(xr, xi, plan, s1, in_rows)
    zAr, zAi, zBr, zBi = _middle_pallas_dual(yr, yi, dA, dB, plan, precision)
    outA = _stage1_inv(zAr, zAi, plan, s1, out_rows)
    outB = _stage1_inv(zBr, zBi, plan, s1, out_rows)
    return outA, outB


def row_multiple(L: int) -> int:
    """B*C for ``L``'s plan: the cropped applies' row granularity."""
    A, B, C = _factorize(L)
    return B * C


def stage_order_weights(emb: jnp.ndarray, plan: RadixPlan,
                        stage1_precision=None) -> jnp.ndarray:
    """(L,) real embedded column -> its UNCLAMPED DFT in kernel stage order.

    Output (A, B, C) with entry [a, b, c] = DFT(emb)[a + A*b + A*B*c] —
    exactly :func:`permute_weights`' layout WITHOUT the folded 1/L scale,
    computed by the radix forward stages themselves: the natural-order
    spectrum is never materialized, so no 8 MB minor-dim transpose sits in
    the jitted solve (measured ~4 ms for the three weight permutes at
    L = 2^21).  The DFT of the real even column is real; the discarded
    imaginary part is fp noise.

    Defaults to HIGHEST precision (unlike the apply kernels): near-zero
    eigenvalues are formed by cancellation, and the clamp + 1/w + sqrt(w)
    consumers amplify the HIGH policy's ~2e-5 absolute noise into O(1)
    relative weight errors on the clamped modes (measured 2.6e-2 whiten
    disagreement vs the natural-FFT spectrum at HIGH, 1e-3-class at
    HIGHEST); this is ONE (1, L) transform per solve, so the slower
    precision is free."""
    s1 = HIGHEST if stage1_precision is None else stage1_precision
    fr, _ = _forward_stages(emb[None], jnp.zeros_like(emb)[None], plan, s1)
    return fr[0]


def fused_circulant_apply_cropped(
    xr, xi, d_perm, plan: RadixPlan,
    in_rows: int, out_rows: int,
    precision=HIGH, stage1_precision=None,
):
    """Cropped-IO packed circulant apply: y = P_out C_d P_in^T x.

    xr, xi: (V, in_rows * B * C) planes — the LEADING slab of the embedded
    vector (the caller asserts everything beyond it is structurally zero,
    i.e. the circulant padding region).  Returns (V, out_rows * B * C):
    the leading slab of C_d applied to the embedded input, computed with
    rectangular stage-1 DFT tables so the dead rows never touch HBM and no
    XLA-side pad/crop copy exists.  This is the PCG-iteration apply for
    ``ops.solve``'s planes-state whitening solver: with M | B*C the crop
    boundary is row-aligned and in_rows = out_rows = M // (B*C); otherwise
    the caller pads its state to the next row multiple and masks the tail
    (see `solve._whiten_planes`).

    Differentiable like :func:`fused_circulant_apply` (the x-pullback swaps
    the crops; C_d is symmetric).
    """
    s1 = STAGE1_PRECISION if stage1_precision is None else stage1_precision
    return _get_apply(plan.L, jnp.dtype(xr.dtype).name, precision, s1,
                      in_rows, out_rows)(xr, xi, d_perm)
