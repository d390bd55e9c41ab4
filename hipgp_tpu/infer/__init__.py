"""Training and inference loops: natural-gradient SVI, lengthscale grid
search, chunked prediction."""
from .fit import (
    FitConfig,
    batch_predict,
    ell_fit,
    make_train_step,
    prefer_eager_batch_solve,
    prepare_batches,
    predictive_variance_correction,
    svigp_fit,
)

__all__ = [
    "FitConfig",
    "batch_predict",
    "ell_fit",
    "make_train_step",
    "prefer_eager_batch_solve",
    "prepare_batches",
    "predictive_variance_correction",
    "svigp_fit",
]
