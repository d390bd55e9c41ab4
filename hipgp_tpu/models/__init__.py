"""Model layer: HIP-GP variational families, dense SVGP baseline,
derivative-observation GPs, exact-GP oracles."""
from .hipgp import HIPGP, HIPGPState, FactoredSolveInconsistency
from .svgp import SVGP, SVGPState
from . import derivative_gp

__all__ = ["HIPGP", "HIPGPState", "FactoredSolveInconsistency", "SVGP",
           "SVGPState", "derivative_gp"]
