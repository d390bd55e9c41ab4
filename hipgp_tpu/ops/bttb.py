"""Block-Toeplitz-Toeplitz-Block (BTTB) structured operator, TPU-native.

The Gram matrix of a stationary kernel evaluated on a Cartesian product grid of
inducing points is (nested-level) symmetric BTTB.  Embedding it into a circulant
tensor (mirror extension of the defining column along every grid dimension)
diagonalizes it by the multi-dimensional DFT, giving O(M log M) matvecs and an
exact O(M log M) "whitening" square root R with  K = R^T R  where
R = C^{1/2}[:, :M] restricted to the original grid.

Parity reference: `ziggy/misc/toeplitz_tensor.py` (ToeplitzTensor) in the HIP-GP
code release — rebuilt here functionally for XLA: native complex dtypes via
`jnp.fft.rfftn/irfftn` (the reference emulates complex numbers with a trailing
dim-2 on torch<=1.7), pure-function matvecs over an immutable spectrum pytree,
and batch shapes handled by vectorized reshapes instead of pre-registered
scratch buffers.

All matvecs operate on the *last* axis; arbitrary leading batch dims are
supported and map onto a single fused pad->rFFT->scale->irFFT->crop pipeline
that XLA tiles across the batch.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "BTTBSpectrum",
    "toeplitz_column",
    "circulant_embed",
    "make_spectrum",
    "spectrum_from_column",
    "bttb_matvec",
    "matmul_by_K",
    "matmul_by_RT",
    "matmul_by_R",
    "matmul_by_Cinv",
    "expanded_dims",
    "embedded_dims",
    "next_fast_len",
    "dense_gram",
]

# Eigenvalue floor for the circulant embedding.  Smooth kernels have fast-
# decaying spectra; clamping keeps C (and hence the preconditioner and the
# whitening sqrt) positive definite in finite precision.  Matches the
# reference's clamp (`ziggy/misc/toeplitz_tensor.py:26`).
DEFAULT_EIG_FLOOR = 1e-6


def expanded_dims(dims: Sequence[int]) -> Tuple[int, ...]:
    """Minimal circulant-embedding size per grid dim: m -> 2m-2 (m if m == 1)."""
    return tuple(2 * d - 2 if d > 1 else d for d in dims)


def _is_smooth(n: int) -> bool:
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


def next_fast_len(n: int, multiple_of: int = 1) -> int:
    """Smallest L >= n whose prime factors are all in {2, 3, 5} (and which
    is a multiple of ``multiple_of``, itself required {2,3,5}-smooth — used
    to make embedded axes divisible by a shard count, see `parallel`).

    TPU-specific constraints, measured on v5e:
    * any non-smooth length lowers to a dense L x L DFT matmul — O(L^2)
      memory, fatal at L ~ 1e6;
    * a factor of 7 is nominally supported but ~15x slower than neighboring
      {2,3,5}-smooth lengths (126 vs 128 at 2-D batch 1000), so 7 is
      excluded.
    The minimal embedding length 2m-2 is rarely smooth, so spectra are built
    on the padded smooth length instead (the circulant embedding is valid
    for ANY L >= 2m-2; see :func:`make_spectrum`).
    """
    if multiple_of > 1:
        if not _is_smooth(multiple_of):
            raise ValueError(
                f"multiple_of={multiple_of} must be {{2,3,5}}-smooth (a "
                "non-smooth shard count would force a non-smooth FFT length)"
            )
        k = max(1, -(-n // multiple_of))
        while not _is_smooth(k):
            k += 1
        return k * multiple_of
    if n <= 1:
        return 1
    best = 1 << (n - 1).bit_length()  # next power of two always works
    p5 = 1
    while p5 < best:
        p3 = p5
        while p3 < best:
            p2 = p3
            while p2 < n:
                p2 *= 2
            if p2 < best:
                best = p2
            p3 *= 3
        p5 *= 5
    return best


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _next_pow2_mult(n: int, multiple_of: int) -> int:
    """Smallest L = r * 2^b >= n with multiple_of | L, where r is the odd
    part of multiple_of — 'power of two except for the shard factor'."""
    if multiple_of <= 1:
        return _next_pow2(n)
    if not _is_smooth(multiple_of):
        raise ValueError(f"multiple_of={multiple_of} must be {{2,3,5}}-smooth")
    r = multiple_of
    while r % 2 == 0:
        r //= 2
    L = r * _next_pow2(-(-n // r))
    while L % multiple_of:
        L *= 2
    return L


def embedded_dims(
    dims: Sequence[int], multiple_of: Optional[Sequence[int]] = None
) -> Tuple[int, ...]:
    """Actual (transform-friendly) embedding size per grid dim.

    When every axis fits the MXU matmul transform (<= MATMUL_DFT_MAX_LEN),
    the minimal {2,3,5}-smooth lengths are used — matmul cost is insensitive
    to factorization.  If ANY axis exceeds the threshold the whole transform
    runs through XLA's FFT, whose device time is erratic across smooth
    radices on TPU (measured: L=10^4 = 2^4*5^4 runs ~100x slower than L=2^14
    or even L=2*10^4), so in that case EVERY axis pads to the next power of
    two (<= 2x memory per axis, reliably fast).

    ``multiple_of`` (per-axis) additionally rounds each length up to a
    multiple — the grid-sharded solves need the leading and minor embedded
    axes divisible by the shard count (`parallel/fft_sharded.py`).
    """
    exp = expanded_dims(dims)
    mult = tuple(multiple_of) if multiple_of is not None else (1,) * len(exp)
    if len(mult) != len(exp):
        raise ValueError("multiple_of must have one entry per grid dim")
    smooth = [next_fast_len(e, m) for e, m in zip(exp, mult)]
    if all(s <= MATMUL_DFT_MAX_LEN for s in smooth):
        return tuple(smooth)
    return tuple(
        _next_pow2_mult(e, m) if e > 1 else e for e, m in zip(exp, mult)
    )


@struct.dataclass
class BTTBSpectrum:
    """Immutable pytree holding the BTTB column and its circulant spectrum.

    Attributes:
      column:   (*dims) Gram column k(x_0, X) over the grid (C order),
                with the jitter nugget added at the origin.
      eigs:     real half-spectrum of the circulant embedding on the rfftn
                grid, clamped to ``eig_floor``; shape (*edims[:-1], edims[-1]//2+1).
      dims:     static grid shape (m_1, ..., m_D).
      edims:    static embedded shape (2m_d - 2 per dim).
    """

    column: jnp.ndarray
    eigs: jnp.ndarray
    dims: Tuple[int, ...] = struct.field(pytree_node=False)
    edims: Tuple[int, ...] = struct.field(pytree_node=False)
    # full embedded (wrapped-lag padded) column, shape (*edims).  Lets the
    # 1-D radix planes solver (ops/solve.py) build its stage-order spectrum
    # slabs by a forward radix transform instead of materializing the
    # natural-order weights and paying three 8 MB minor-dim transposes per
    # jitted solve (measured ~4 ms at L = 2^21).  None on spectra built by
    # older call sites; everything falls back to `permute_weights` then.
    ecolumn: Optional[jnp.ndarray] = None

    @property
    def M(self) -> int:
        return math.prod(self.dims)

    @property
    def Mprime(self) -> int:
        return math.prod(self.edims)

    @property
    def ndim(self) -> int:
        return len(self.dims)


def toeplitz_column(
    xgrids: Sequence[jnp.ndarray],
    kernel_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    jitter: float = 1e-3,
) -> jnp.ndarray:
    """First column of the Gram matrix of ``kernel_fn`` on the product grid.

    ``kernel_fn(x, y)`` maps (N, D), (M, D) -> (N, M).  Returns shape (*dims).
    The nugget ``jitter`` is added to the origin entry, matching the reference
    (`ziggy/misc/toeplitz_tensor.py:127-133`).
    """
    dims = tuple(len(g) for g in xgrids)
    mesh = jnp.meshgrid(*xgrids, indexing="ij")
    pts = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)  # (M, D)
    col = kernel_fn(pts[:1], pts)[0]  # (M,)
    col = col.at[0].add(jitter)
    return col.reshape(dims)


def circulant_embed(col: jnp.ndarray) -> jnp.ndarray:
    """Mirror-extend the Toeplitz column along every dim: (m,) -> (2m-2,).

    The resulting tensor defines a (nested) circulant operator whose top-left
    M x M block is the original BTTB Gram matrix.
    """
    out = col
    for axis, m in enumerate(col.shape):
        if m <= 1:
            continue
        rev = jnp.flip(out, axis=axis)
        idx = [slice(None)] * out.ndim
        idx[axis] = slice(1, -1)
        out = jnp.concatenate([out, rev[tuple(idx)]], axis=axis)
    return out


def _real_even_half_spectrum(emb: jnp.ndarray) -> jnp.ndarray:
    """rfftn-layout half-spectrum of a real even-symmetric tensor.

    Computed as the COMPLEX fftn sliced to the non-redundant half: XLA's
    TPU rfft is catastrophically slow at long pow2 lengths (measured 430 ms
    vs 0.3 ms for the c64 fft at L = 2^21), and the circulant tensor's DFT
    is real anyway, so the complex transform loses nothing."""
    cplx = jnp.complex128 if emb.dtype == jnp.float64 else jnp.complex64
    full = jnp.fft.fftn(emb.astype(cplx)).real
    L = emb.shape[-1]
    return full[..., : L // 2 + 1]


def spectrum_from_column(
    col: jnp.ndarray, eig_floor: float = DEFAULT_EIG_FLOOR
) -> BTTBSpectrum:
    """Build the clamped circulant half-spectrum from a Toeplitz column."""
    dims = tuple(col.shape)
    emb = circulant_embed(col)
    edims = tuple(emb.shape)
    # The circulant tensor is real and even-symmetric, so its DFT is real;
    # the non-redundant half is all we need for real input/output matvecs.
    eigs = _real_even_half_spectrum(emb)
    eigs = jnp.maximum(eigs, jnp.asarray(eig_floor, eigs.dtype))
    return BTTBSpectrum(column=col, eigs=eigs, dims=dims, edims=edims,
                        ecolumn=emb)


def _cosine_matrix(L: int, dtype) -> jnp.ndarray:
    """(L, L) cosine DFT matrix C[n, k] = cos(2 pi n k / L), cached."""
    import numpy as _np

    key = ("cos", L, _np.dtype(dtype).name)
    if key not in _BASIS_CACHE:
        n = _np.arange(L, dtype=_np.float64)
        _BASIS_CACHE[key] = _np.cos(
            (2.0 * _np.pi / L) * _np.outer(n, n)
        ).astype(dtype)
    return jnp.asarray(_BASIS_CACHE[key])


def _real_even_half_spectrum_matmul(emb: jnp.ndarray) -> jnp.ndarray:
    """FFT-free half-spectrum of a per-axis-even real tensor.

    The DFT of an even vector is its cosine transform, so one (L, L)
    cosine-matrix contraction per axis yields the exact eigenvalues of the
    circulant embedding — same operator as :func:`_real_even_half_spectrum`,
    MXU-shaped instead of an FFT custom call.  Also the robust choice inside
    large partitioned (mesh) programs: XLA's CPU fft thunk RET_CHECKs on the
    non-major layouts those graphs feed it, which this path never hits.
    Intended for embedded axes up to ~MATMUL_DFT_MAX_LEN.
    """
    full = emb
    for a in range(emb.ndim):
        L = emb.shape[a]
        full = _axis_contract(full, _cosine_matrix(L, emb.dtype), a)
    return full[..., : emb.shape[-1] // 2 + 1]


def make_spectrum(
    xgrids: Sequence[jnp.ndarray],
    kernel_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    jitter: float = 1e-3,
    eig_floor: float = DEFAULT_EIG_FLOOR,
    pad_to_fast: bool = True,
    multiple_of: Optional[Sequence[int]] = None,
    transform: str = "fft",
) -> BTTBSpectrum:
    """Column + circulant embedding + clamped rFFT spectrum in one call.

    The embedding length per dim is padded from the minimal 2m-2 up to the
    next {2,3,5}-smooth length (see :func:`next_fast_len`) by evaluating
    the stationary kernel at *wrapped lags*: the circulant defined by
    c_j = k(tau_j) with tau_j[d] = min(j_d, L_d - j_d) * h_d has the exact
    BTTB Gram as its top-left M x M block for any L_d >= 2 m_d - 2, so
    padding changes only the whitened basis dimension, never K itself.
    Requires uniformly spaced grids (as does the Toeplitz structure itself).

    Differentiable w.r.t. kernel hyperparameters closed over by ``kernel_fn``
    (the whole pipeline is jnp ops), so spectra can sit on the hot path of
    hyperparameter learning without a custom backward pass.

    ``transform``: 'fft' (default) or 'matmul' — the cosine-matrix
    eigendecomposition (`_real_even_half_spectrum_matmul`), preferred when
    every embedded axis is short and the spectrum build sits inside a
    partitioned (mesh) program.
    """
    if transform not in ("fft", "matmul"):
        raise ValueError(f"unknown transform {transform!r}")
    if not pad_to_fast:
        if multiple_of is not None:
            raise ValueError("multiple_of requires pad_to_fast=True")
        return spectrum_from_column(
            toeplitz_column(xgrids, kernel_fn, jitter), eig_floor
        )
    dims = tuple(len(g) for g in xgrids)
    edims = embedded_dims(dims, multiple_of)
    # wrapped-lag coordinates per dim: x0 + min(j, L-j) * h
    coords = []
    for g, L in zip(xgrids, edims):
        g = jnp.asarray(g)
        if L == 1:
            coords.append(g[:1])
            continue
        h = g[1] - g[0]
        j = jnp.arange(L, dtype=g.dtype)
        lag = jnp.minimum(j, L - j) * h
        coords.append(g[0] + lag)
    mesh = jnp.meshgrid(*coords, indexing="ij")
    pts = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
    c = kernel_fn(pts[:1], pts)[0]
    c = c.at[0].add(jitter)
    emb = c.reshape(edims)
    if transform == "matmul":
        eigs = _real_even_half_spectrum_matmul(emb)
    else:
        eigs = _real_even_half_spectrum(emb)
    eigs = jnp.maximum(eigs, jnp.asarray(eig_floor, eigs.dtype))
    col_idx = tuple(slice(0, d) for d in dims)
    return BTTBSpectrum(column=emb[col_idx], eigs=eigs, dims=dims,
                        edims=edims, ecolumn=emb)


def _fft_axes(ndim: int) -> Tuple[int, ...]:
    return tuple(range(-ndim, 0))


# ---------------------------------------------------------------------------
# Real-eigenbasis transform on the MXU (replaces XLA FFT for small axes)
#
# Two TPU facts, measured on v5e, force this path:
#  * XLA's TPU FFT is SILENTLY INACCURATE at large batch: at (1000, 128, 128)
#    every output row of irfftn(rfftn(x) * w) is off by up to ~25% relative,
#    while the same computation is exact to f32 eps at batch 4.
#  * even when accurate it runs ~2 orders of magnitude off the HBM roofline
#    for these axis sizes.
#
# Because the circulant embedding is even-symmetric, its spectrum is real and
# even, so the operator diagonalizes in the REAL Fourier basis
#   Q = [1/sqrt(L), sqrt(2/L) cos(2 pi k n / L), (-1)^n / sqrt(L),
#        sqrt(2/L) sin(2 pi k n / L)]
# with C = (Q_1 x ... x Q_D) diag(lam) (.)^T and the symmetric PSD square
# root unique — so Q-based K / R^T / R / C^{-1} matvecs are EXACTLY the same
# operators as the FFT formulation.  One real (L, L) matmul per axis per
# direction: precisely the MXU's shape.  Used whenever every embedded axis
# is <= MATMUL_DFT_MAX_LEN; the long-1-D case falls back to XLA FFT (whose
# accuracy at the relevant batch is validated in tests).
# ---------------------------------------------------------------------------

MATMUL_DFT_MAX_LEN = 512
# DFT-style sums cancel heavily; single-pass bf16 (DEFAULT) loses 4.3e-3
# relative at the paper shape.  Swept in experiments/precision_study.py
# (RESULTS §11): HIGH (3-pass bf16) is 1.5x faster end-to-end than HIGHEST
# on the M=125^2 whitening solve (37.5 vs 56.2 ms) at 3.7e-5 per-apply /
# 7.5e-4 per-20-iteration-solve error — under the f32 truncated-PCG floor,
# with model-level RMSE unchanged to 3 digits.  Policy set from that data.
MATMUL_DFT_PRECISION = jax.lax.Precision.HIGH
# Storage dtype for the transform matmuls: None = operand dtype (f32 path).
# Setting jnp.bfloat16 casts basis+operand to bf16 with f32 accumulation
# (preferred_element_type) — swept by the precision study, not the default.
MATMUL_DFT_DTYPE = None
# Fused Pallas kernel for the 2-D transform (ops/pallas_transform.py).
# The v1 (blocked rank-3 dots, HIGHEST) measured 7x SLOWER than the einsum
# chain; the v2 (per-sample 2-D dots, bf16 hi/lo 3-pass HIGH emulation)
# measures 18% faster as a STANDALONE apply at both paper shapes, but
# inside the whitening solve the einsum chain wins back (35.4 vs 36.4 ms
# per 20-iteration batch-256 solve at M=125^2): XLA fuses the PCG
# elementwise ops into the chain while pallas_call is a fusion barrier.
# Off by default; flip for apply-dominated standalone workloads.
USE_PALLAS_TRANSFORM = False
# Fused cropped-IO 2-D sandwich PCG (ops/mxu2d.py + solve._mxu2d_solver):
# unlike the full-plane v2 kernel above, the cropped kernel streams only
# the ORIGINAL-space data (the embedded plane lives in VMEM) and emits the
# CG inner products from the applies, so it wins INSIDE the solve too.
# Engages for 2-D f32 TPU solves in the matmul regime.
USE_MXU2D_PCG = True
# Fused 3-D sandwich PCG (ops/mxu3d.py + solve._mxu3d_solver): outer-axis
# einsum + weight-plane-batched cropped 2-D kernel — the embedded (L1, L2)
# planes never touch HBM and the CG dots ride the applies (~10 passes of
# original-volume data per apply vs ~100 for the einsum chain over the 8x
# embedded volume).  Engages for 3-D f32 TPU solves in the matmul regime.
USE_MXU3D_PCG = True
# The 1-D long-axis circulant apply DOES win from fusion: the three-stage
# radix-128 DFT with a Pallas middle kernel (ops/radix_fft.py) runs the
# 20-iteration whitening solve at 44.3 vs 59.0 ms against the XLA-FFT path
# (L = 2^21, batch 8, matched protocol), 2.3e-5 vs the f64 oracle at the
# shipped HIGH policy — on by default for supported pow2 lengths.
USE_RADIX_FFT = True


_BASIS_CACHE: dict = {}


def _real_fourier_basis(L: int, dtype) -> jnp.ndarray:
    """Orthogonal (L, L) real Fourier basis Q, columns ordered so column k
    pairs with frequency min(k, L-k) — the same layout as the full DFT
    spectrum, letting the even eigenvalue vector be used unchanged."""
    import numpy as _np

    key = (L, _np.dtype(dtype).name)
    if key not in _BASIS_CACHE:
        n = _np.arange(L)[:, None]
        k = _np.arange(L)[None, :]
        ang = 2.0 * _np.pi * n * k / L
        Q = _np.where(k <= L // 2, _np.cos(ang), _np.sin(2.0 * _np.pi * n * (L - k) / L))
        scale = _np.full(L, _np.sqrt(2.0 / L))
        scale[0] = _np.sqrt(1.0 / L)
        if L % 2 == 0:
            scale[L // 2] = _np.sqrt(1.0 / L)
        Q = Q * scale[None, :]
        _BASIS_CACHE[key] = Q.astype(dtype)
    return jnp.asarray(_BASIS_CACHE[key])


def _real_fourier_basis_np(L: int, dtype):
    """HOST-numpy view of :func:`_real_fourier_basis` — for tables that a
    memoized closure captures across jit traces (a jnp table built inside
    an active trace is a tracer; caching it leaks it into the next trace —
    the `radix_fft.make_plan` lesson)."""
    _real_fourier_basis(L, dtype)
    import numpy as _np

    return _BASIS_CACHE[(L, _np.dtype(dtype).name)]


_LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _axis_contract(x, Q, axis: int):
    """Contract ``axis`` of x with Q[in, out], keeping the axis in place.

    Uses einsum so XLA folds the layout change into the dot_general — an
    explicit transpose materializes at TPU minor-dim-shuffle speed (~25 ms
    for 64 MB) while the fused contraction runs at MXU speed.
    """
    nd = x.ndim
    axis = axis % nd
    subs = _LETTERS[:nd]
    out = subs[:axis] + "Z" + subs[axis + 1 :]
    eq = f"{subs},{subs[axis]}Z->{out}"
    if MATMUL_DFT_DTYPE is not None:
        y = jnp.einsum(
            eq,
            x.astype(MATMUL_DFT_DTYPE),
            Q.astype(MATMUL_DFT_DTYPE),
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype)
    return jnp.einsum(eq, x, Q, precision=MATMUL_DFT_PRECISION)


def _axis_transform(x, axis, L, dtype, inverse: bool):
    """One-axis analysis (Q^T x) or synthesis (Q x) as a single real matmul."""
    Q = _real_fourier_basis(L, dtype)
    if inverse:
        Q = Q.T
    return _axis_contract(x, Q, axis)


def _full_weights(half: jnp.ndarray, L: int) -> jnp.ndarray:
    """Expand an rfftn half-spectrum to the full spectrum by mirroring the
    last axis (the circulant spectrum is real and even, so elementwise
    functions of it — sqrt, reciprocal — commute with the mirror)."""
    if L == 1 or half.shape[-1] == L:
        return half
    if L % 2 == 0:
        mirror = jnp.flip(half[..., 1:-1], axis=-1)
    else:
        mirror = jnp.flip(half[..., 1:], axis=-1)
    return jnp.concatenate([half, mirror], axis=-1)


def _apply_spectrum_matmul(
    spec: "BTTBSpectrum",
    v: jnp.ndarray,
    weights_full: jnp.ndarray,
    in_expanded: bool,
    out_expanded: bool,
) -> jnp.ndarray:
    dims, edims = spec.dims, spec.edims
    nd = len(dims)
    batch = v.shape[:-1]
    dtype = v.dtype

    if in_expanded:
        x = v.reshape(batch + edims)
    else:
        x = v.reshape(batch + dims)
        pad = [(0, 0)] * len(batch) + [(0, e - d) for d, e in zip(dims, edims)]
        x = jnp.pad(x, pad)

    use_pallas = False
    if USE_PALLAS_TRANSFORM and nd == 2 and jax.default_backend() == "tpu":
        from .pallas_transform import PALLAS_MAX_LEN

        use_pallas = max(edims) <= PALLAS_MAX_LEN
    if use_pallas:
        # fused VMEM-resident kernel: one HBM read + one write per sample
        from .pallas_transform import circulant_apply_2d

        Q0 = _real_fourier_basis(edims[0], dtype)
        Q1 = _real_fourier_basis(edims[1], dtype)
        x = circulant_apply_2d(
            x.reshape((-1,) + edims), Q0, Q1, weights_full
        ).reshape(batch + edims)
    else:
        # Contraction ORDER is the performance lever on TPU: analyze the
        # minor (lane) axis first and synthesize it last — measured 3.8 ms
        # vs 50 ms for the opposite order at (1000, 128, 128).
        for a in range(-1, -nd - 1, -1):
            x = _axis_transform(x, a, edims[a], dtype, inverse=False)
        x = x * weights_full
        for a in range(-nd, 0):
            x = _axis_transform(x, a, edims[a], dtype, inverse=True)

    y = x
    if out_expanded:
        return y.reshape(batch + (spec.Mprime,))
    crop = tuple([slice(None)] * len(batch) + [slice(0, d) for d in dims])
    return y[crop].reshape(batch + (spec.M,))


def _apply_spectrum(
    spec: BTTBSpectrum,
    v: jnp.ndarray,
    weights: jnp.ndarray,
    in_expanded: bool,
    out_expanded: bool,
) -> jnp.ndarray:
    """Core pipeline: reshape -> (zero-pad) -> transform -> scale ->
    inverse-transform -> (crop).

    ``v`` has shape (..., M) if ``in_expanded`` is False else (..., M').
    ``weights`` is a real half-spectrum broadcastable against the rfftn
    output.  The transform is the MXU real-eigenbasis matmul whenever every
    embedded axis fits (see MATMUL_DFT_MAX_LEN), else XLA's FFT — chunked
    over the batch: XLA's multi-dim TPU FFT silently corrupts results above
    ~600 batched transforms (30% relative error measured at batch 1000,
    exact at 600), so the fallback never exceeds FFT_SAFE_BATCH per call.
    """
    dims, edims = spec.dims, spec.edims
    nd = len(dims)
    batch = v.shape[:-1]

    if max(edims) <= MATMUL_DFT_MAX_LEN:
        wfull = _full_weights(weights, edims[-1])
        return _apply_spectrum_matmul(spec, v, wfull, in_expanded, out_expanded)

    out_len = spec.Mprime if out_expanded else spec.M
    flat = v.reshape(-1, v.shape[-1])
    B = flat.shape[0]
    if nd >= 2 and B > FFT_SAFE_BATCH:
        nchunks = -(-B // FFT_SAFE_BATCH)
        padded = jnp.pad(flat, ((0, nchunks * FFT_SAFE_BATCH - B), (0, 0)))
        chunks = padded.reshape(nchunks, FFT_SAFE_BATCH, -1)
        out = jax.lax.map(
            lambda c: _fft_apply_core(spec, c, weights, in_expanded, out_expanded),
            chunks,
        )
        return out.reshape(-1, out_len)[:B].reshape(batch + (out_len,))
    return _fft_apply_core(spec, flat, weights, in_expanded, out_expanded).reshape(
        batch + (out_len,)
    )


FFT_SAFE_BATCH = 512


def _fft_apply_core(
    spec: "BTTBSpectrum",
    v: jnp.ndarray,
    weights: jnp.ndarray,
    in_expanded: bool,
    out_expanded: bool,
) -> jnp.ndarray:
    """XLA-FFT pipeline on a (B, len) block (B within the accuracy-safe range).

    Uses the 2-for-1 complex-packing identity: the circulant spectrum is real
    and EVEN along every axis (mirror symmetry of the embedding), so
    ifftn(d * fftn(v1 + i v2)) = C_d v1 + i C_d v2 with both parts real —
    two real matvecs per complex FFT, no Hermitian unpacking.  Measured 2.1x
    faster than rfftn/irfftn on v5e at L = 2^21 (XLA's TPU rfft does not
    exploit real symmetry), f32-exact (5.6e-7 rel).
    """
    dims, edims = spec.dims, spec.edims
    nd = len(dims)
    B = v.shape[0]
    axes = _fft_axes(nd)

    if in_expanded:
        x = v.reshape((B,) + edims)
    else:
        x = v.reshape((B,) + dims)
        pad = [(0, 0)] + [(0, e - d) for d, e in zip(dims, edims)]
        x = jnp.pad(x, pad)

    wfull = _full_weights(weights, edims[-1])
    if B % 2:
        x = jnp.pad(x, [(0, 1)] + [(0, 0)] * nd)

    use_radix = False
    if USE_RADIX_FFT and nd == 1 and jax.default_backend() == "tpu":
        from .radix_fft import radix_supported

        use_radix = radix_supported(edims[0])
    if use_radix:
        # fused Pallas three-stage DFT: 17% faster than XLA's FFT at the
        # headline L = 2^21 shape; shipped HIGH policy measures 2.3e-5 vs
        # the f64 oracle (4.7e-7 belongs to the slower all-HIGHEST variant
        # — see ops/radix_fft.py precision table)
        from .radix_fft import fused_circulant_apply, make_plan, permute_weights

        plan = make_plan(edims[0], v.dtype)
        dperm = permute_weights(wfull, plan)
        yr, yi = fused_circulant_apply(x[0::2], x[1::2], dperm, plan)
        y = jnp.stack([yr, yi], axis=1).reshape((-1,) + edims)[:B]
    else:
        z = jax.lax.complex(x[0::2], x[1::2])
        w = jnp.fft.ifftn(wfull * jnp.fft.fftn(z, axes=axes), axes=axes)
        y = jnp.stack([w.real, w.imag], axis=1).reshape((-1,) + edims)[:B]
        y = y.astype(v.dtype)

    if out_expanded:
        return y.reshape((B, spec.Mprime))
    crop = tuple([slice(None)] + [slice(0, d) for d in dims])
    return y[crop].reshape((B, spec.M))


def matmul_by_K(spec: BTTBSpectrum, v: jnp.ndarray) -> jnp.ndarray:
    """K @ v for (..., M) vectors: embed, scale by eigs, crop."""
    return _apply_spectrum(spec, v, spec.eigs, in_expanded=False, out_expanded=False)


def matmul_by_RT(spec: BTTBSpectrum, v: jnp.ndarray) -> jnp.ndarray:
    """R^T @ v: original space (..., M) -> whitened/expanded space (..., M')."""
    return _apply_spectrum(
        spec, v, jnp.sqrt(spec.eigs), in_expanded=False, out_expanded=True
    )


def matmul_by_R(spec: BTTBSpectrum, v: jnp.ndarray) -> jnp.ndarray:
    """R @ v: expanded space (..., M') -> original space (..., M)."""
    return _apply_spectrum(
        spec, v, jnp.sqrt(spec.eigs), in_expanded=True, out_expanded=False
    )


def matmul_by_Cinv(spec: BTTBSpectrum, v: jnp.ndarray) -> jnp.ndarray:
    """Circulant-inverse preconditioner: top-left block of C^{-1} applied to v."""
    return _apply_spectrum(
        spec, v, 1.0 / spec.eigs, in_expanded=False, out_expanded=False
    )


def bttb_matvec(spec: BTTBSpectrum, v: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Dispatch table over the four structured matvecs.

    mode: 'gram' (Kv), 'rtv' (R^T v), 'rv' (Rv), 'cinv' (C^{-1}v).
    Mirrors the reference's ``multiply_type`` contract
    (`ziggy/misc/toeplitz_expanded.py:61-250`).
    """
    if mode == "gram":
        return matmul_by_K(spec, v)
    if mode == "rtv":
        return matmul_by_RT(spec, v)
    if mode == "rv":
        return matmul_by_R(spec, v)
    if mode == "cinv":
        return matmul_by_Cinv(spec, v)
    raise ValueError(f"unknown mode {mode!r}")


def dense_gram(
    xgrids: Sequence[jnp.ndarray],
    kernel_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    jitter: float = 1e-3,
) -> jnp.ndarray:
    """Materialize the dense M x M Gram matrix (test oracle; O(M^2) memory)."""
    mesh = jnp.meshgrid(*xgrids, indexing="ij")
    pts = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)
    K = kernel_fn(pts, pts)
    return K + jitter * jnp.eye(K.shape[0], dtype=K.dtype)
