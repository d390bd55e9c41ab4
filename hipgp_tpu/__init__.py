"""hipgp_tpu — TPU-native Hierarchical Inducing-Point Gaussian Processes.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the HIP-GP
reference (AISTATS 2021, arXiv:2103.00393): BTTB-structured inducing-point
Gram operators diagonalized by circulant FFT embedding, preconditioned CG
solves, O(M log M) whitening, stochastic variational inference with natural
gradients, inter-domain (line-integral) and derivative observations — scaled
over TPU device meshes with `jax.sharding`.
"""

__version__ = "0.1.0"

from . import ops, kernels, models, infer, parallel, utils

__all__ = ["ops", "kernels", "models", "infer", "parallel", "utils"]
