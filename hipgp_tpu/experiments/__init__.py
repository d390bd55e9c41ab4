"""Experiment harness + paper experiment drivers."""
from .harness import evaluate_and_save, fit_predict_and_save, make_model
from . import synthetic_data

__all__ = [
    "evaluate_and_save",
    "fit_predict_and_save",
    "make_model",
    "synthetic_data",
]
