"""Stationary covariance kernels as pure jnp functions.

Contract (parity reference `ziggy/kernels.py:11-61`): every kernel exposes
``__call__(x, y, params) -> (N, M)`` dense cross-covariance, ``diag(x, params)
-> (N,)``, and — for inter-domain observations — ``k_semi`` /
``k_semi_mc`` / ``k_doubly_diag`` (see `interdomain.py`).  ``params`` is the
``(sig2, ell)`` tuple passed explicitly at every call so hyperparameter
gradients flow naturally; ``ell`` may be a scalar or a (D,) ARD vector.

Kernel objects are static (hashable) — safe as jit closure constants; all
state lives in ``params``.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["Kernel", "SqExp", "Matern", "Gneiting", "kernel_from_name"]

Params = Tuple[jnp.ndarray, jnp.ndarray]


def _scaled_sqdist(x: jnp.ndarray, y: jnp.ndarray, ell) -> jnp.ndarray:
    """sum_d ((x_d - y_d)/ell_d)^2, shape (N, M)."""
    diff = (x[:, None, :] - y[None, :, :]) / ell
    return jnp.sum(diff * diff, axis=-1)


class Kernel:
    """Base class. Subclasses implement ``__call__`` and ``diag``."""

    has_k_semi = False
    is_stationary = True

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, params: Params) -> jnp.ndarray:
        raise NotImplementedError

    def diag(self, x: jnp.ndarray, params: Params) -> jnp.ndarray:
        sig2, _ = params
        return sig2 * jnp.ones(x.shape[0], dtype=x.dtype)

    # --- inter-domain methods are attached in interdomain.py ---

    def __hash__(self):
        return hash((type(self).__name__, getattr(self, "_static_key", ())))

    def __eq__(self, other):
        return type(self) is type(other) and getattr(
            self, "_static_key", ()
        ) == getattr(other, "_static_key", ())


class SqExp(Kernel):
    """Squared-exponential kernel, the only one with an analytic
    semi-integrated cross-covariance (`ziggy/kernels.py:64-93`)."""

    has_k_semi = True

    def __call__(self, x, y, params):
        sig2, ell = params
        return sig2 * jnp.exp(-0.5 * _scaled_sqdist(x, y, ell))


class Matern(Kernel):
    """Matern kernel, nu in {0.5, 1.5, 2.5} closed forms
    (`ziggy/kernels.py:131-165`)."""

    def __init__(self, nu: float = 0.5):
        if nu not in (0.5, 1.5, 2.5):
            raise ValueError("nu must be one of 0.5, 1.5, 2.5")
        self.nu = nu
        self._static_key = (nu,)

    def __call__(self, x, y, params):
        sig2, ell = params
        # Reference semantics: isotropic distance scaled by scalar ell
        # AFTER the norm (Matern in the reference divides sqrt(sqdist) by ell).
        sqd = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
        d = jnp.sqrt(jnp.maximum(sqd, 1e-36))
        if self.nu == 0.5:
            k = jnp.exp(-d / ell)
        elif self.nu == 1.5:
            dp = math.sqrt(3.0) * d / ell
            k = (1.0 + dp) * jnp.exp(-dp)
        else:  # 2.5
            dp = math.sqrt(5.0) * d / ell
            k = (1.0 + dp + (5.0 / 3.0) * sqd / (ell * ell)) * jnp.exp(-dp)
        return sig2 * k


class Gneiting(Kernel):
    """Compactly-supported Gneiting kernel: zero beyond scaled distance 1
    (`ziggy/kernels.py:96-128`)."""

    def __init__(self, alpha: float = 1.0):
        self.alpha = alpha
        self._static_key = (alpha,)

    def __call__(self, x, y, params):
        sig2, ell = params
        t = jnp.sqrt(jnp.maximum(_scaled_sqdist(x, y, ell), 1e-36))
        cterms = (1.0 - t) * jnp.cos(jnp.pi * t) + (1.0 / jnp.pi) * jnp.sin(jnp.pi * t)
        cij = (1.0 + t**self.alpha) ** (-3.0) * cterms
        cij = jnp.where(t > 1.0, 0.0, cij)
        return sig2 * cij


def kernel_from_name(name: str) -> Kernel:
    """Factory matching the reference CLI names
    (`ziggy/misc/experiment_util.py:80-91`)."""
    table = {
        "SqExp": lambda: SqExp(),
        "sqexp": lambda: SqExp(),
        "Mat12": lambda: Matern(0.5),
        "Mat32": lambda: Matern(1.5),
        "Mat52": lambda: Matern(2.5),
        "Gneiting": lambda: Gneiting(),
    }
    if name not in table:
        raise ValueError(f"unknown kernel {name!r}; choose from {sorted(table)}")
    return table[name]()
