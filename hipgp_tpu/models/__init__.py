"""Model layer: HIP-GP variational families, dense SVGP baseline,
derivative-observation GPs, exact-GP oracles."""
from .hipgp import HIPGP, HIPGPState

__all__ = ["HIPGP", "HIPGPState"]
