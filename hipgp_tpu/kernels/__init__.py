"""Stationary, inter-domain, and derivative kernels."""
from .stationary import Gneiting, Kernel, Matern, SqExp, kernel_from_name
from .interdomain import (
    DoublyDiagInterpolator,
    k_doubly_diag_quad,
    k_semi_mc,
    k_semi_quad,
    k_semi_sqexp,
    normal_cdf,
)
from . import derivatives

__all__ = [
    "Gneiting",
    "Kernel",
    "Matern",
    "SqExp",
    "kernel_from_name",
    "DoublyDiagInterpolator",
    "k_doubly_diag_quad",
    "k_semi_mc",
    "k_semi_quad",
    "k_semi_sqexp",
    "normal_cdf",
    "derivatives",
]
