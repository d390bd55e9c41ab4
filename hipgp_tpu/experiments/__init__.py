"""Experiment harness + paper experiment drivers."""
from .harness import evaluate_and_save, fit_predict_and_save, make_model
from . import (
    demo_1d,
    preconditioner_analysis,
    run_3droad,
    run_derivative_1d,
    run_domain,
    run_pcg_vs_cholesky,
    run_solve_kn,
    run_synthetic,
    run_ukhousing,
    synthetic_data,
)

__all__ = [
    "demo_1d",
    "evaluate_and_save",
    "fit_predict_and_save",
    "make_model",
    "preconditioner_analysis",
    "run_3droad",
    "run_derivative_1d",
    "run_domain",
    "run_pcg_vs_cholesky",
    "run_solve_kn",
    "run_synthetic",
    "run_ukhousing",
    "synthetic_data",
]
