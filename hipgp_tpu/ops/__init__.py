"""Structured linear algebra: BTTB/circulant FFT operators, batched PCG,
differentiable solves, Golub-Kahan bidiagonalization."""
from .bttb import (
    BTTBSpectrum,
    bttb_matvec,
    circulant_embed,
    dense_gram,
    expanded_dims,
    embedded_dims,
    next_fast_len,
    make_spectrum,
    matmul_by_Cinv,
    matmul_by_K,
    matmul_by_R,
    matmul_by_RT,
    spectrum_from_column,
    toeplitz_column,
)
from .cg import PCGResult, pcg, pcg_result, pcg_scan, pcg_trace
from .solve import cholesky_whiten, gram_solve, inv_matmul, spd_inverse, spd_solve, whiten
from .bidiag import bidiag_solve, golub_kahan_bidiag
from .tridiag import tridiagonal_solve
from .toeplitz_dense import sym_toeplitz, sym_toeplitz_matmul, toeplitz, toeplitz_matmul

__all__ = [
    "BTTBSpectrum",
    "bttb_matvec",
    "circulant_embed",
    "dense_gram",
    "expanded_dims",
    "embedded_dims",
    "next_fast_len",
    "make_spectrum",
    "matmul_by_Cinv",
    "matmul_by_K",
    "matmul_by_R",
    "matmul_by_RT",
    "spectrum_from_column",
    "toeplitz_column",
    "PCGResult",
    "pcg",
    "pcg_result",
    "pcg_scan",
    "pcg_trace",
    "cholesky_whiten",
    "spd_inverse",
    "spd_solve",
    "gram_solve",
    "inv_matmul",
    "whiten",
    "bidiag_solve",
    "golub_kahan_bidiag",
    "tridiagonal_solve",
    "toeplitz",
    "sym_toeplitz",
    "toeplitz_matmul",
    "sym_toeplitz_matmul",
]
