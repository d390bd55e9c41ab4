"""Dense SVGP baseline (exact inducing-point posterior machinery).

Parity reference: `ziggy/svgp.py` — the O(M^3) dense twin used as the
correctness baseline for HIP-GP.  Whitened (L^{-1} basis, prior = N(0,I)) and
unwhitened (K_mm^{-1} basis, prior = N(0, K_mm)) variants.

Deviations from the reference, deliberate:
* dtype-polymorphic (the reference hard-asserts float64 — unavailable on
  TPU; f64 remains the CPU test configuration).
* the natural gradient is returned as a pytree scaled as plain (deta1,
  deta2); the reference multiplies by 1000/N before poking ``.grad``
  (`ziggy/svgp.py:356-357`) — an lr rescale we leave to the optimizer.
* fixes the reference's `.cuda()` call on the unwhitened path
  (`ziggy/svgp.py:124`) that broke CPU execution — no device pinning here.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kernels import k_semi_mc, k_semi_sqexp
from ..ops import spd_inverse, spd_solve
from ..utils import stats

__all__ = ["SVGP", "SVGPState"]

LN2PI = math.log(2.0 * math.pi)


@struct.dataclass
class SVGPState:
    theta1: jnp.ndarray  # (M,)
    theta2: jnp.ndarray  # (M, M)
    log_sig2: jnp.ndarray
    log_ell: jnp.ndarray


class SVGP:
    def __init__(
        self,
        kernel,
        xinduce: jnp.ndarray,
        num_obs: int,
        whitened: bool = False,
        sig2_init: float = 1.0,
        ell_init: float = 1.0,
        init_Svar: float = 0.1,
        prior_ell: Tuple[float, float] = (0.1, 0.025),
        prior_sig2: Tuple[float, float] = (1.0, 10.0),
        jitter: float = 1e-3,
        support_integrated_obs: bool = False,
        dtype=None,
    ):
        self.kernel = kernel
        self.xinduce = jnp.asarray(xinduce)
        self.dtype = dtype if dtype is not None else self.xinduce.dtype
        self.xinduce = self.xinduce.astype(self.dtype)
        self.M = self.xinduce.shape[0]
        self.N = int(num_obs)
        self.whitened = whitened
        self.jitter = float(jitter)
        self.init_Svar = float(init_Svar)
        self.sig2_init = float(sig2_init)
        self.ell_init = ell_init
        self.prior_ell = prior_ell
        self.prior_sig2 = prior_sig2
        if support_integrated_obs:
            from ..kernels import DoublyDiagInterpolator

            self.diag_interp = DoublyDiagInterpolator(kernel)
        else:
            self.diag_interp = None

    def init_state(self) -> SVGPState:
        dt = self.dtype
        return SVGPState(
            theta1=jnp.zeros((self.M,), dt),
            theta2=(-0.5 / self.init_Svar) * jnp.eye(self.M, dtype=dt),
            log_sig2=jnp.asarray(math.log(self.sig2_init), dt),
            log_ell=jnp.log(jnp.asarray(self.ell_init, dt)),
        )

    def kernel_params(self, state: SVGPState):
        return jnp.exp(state.log_sig2), jnp.exp(state.log_ell)

    def standard_params(self, state: SVGPState):
        S = spd_inverse(-2.0 * state.theta2)
        m = S @ state.theta1
        return m, S

    # ------------------------------------------------------------------

    def _kmm(self, state):
        p = self.kernel_params(state)
        return self.kernel(self.xinduce, self.xinduce, p)

    def make_grams(self, state, x, integrated_obs=False,
                   semi_integrated_estimator="analytic",
                   semi_integrated_samps=10, key=None):
        p = self.kernel_params(state)
        if integrated_obs:
            if semi_integrated_estimator == "analytic":
                Knm = k_semi_sqexp(self.xinduce, x, p).T
            elif semi_integrated_estimator == "mc-biased":
                if key is None:
                    key = jax.random.PRNGKey(0)
                Knm = k_semi_mc(key, self.kernel, self.xinduce, x, p,
                                npts=semi_integrated_samps).T
            else:
                raise ValueError(semi_integrated_estimator)
            Knn_diag = self.diag_interp(x, p)
        else:
            Knm = self.kernel(x, self.xinduce, p)
            Knn_diag = self.kernel.diag(x, p)
        return Knm, Knn_diag

    def make_kn(self, state, Knm, Kmm=None):
        """whitened: kn = (L^{-1} Kmn)^T; unwhitened: kn = ((Kmm+jI)^{-1} Kmn)^T."""
        if Kmm is None:
            Kmm = self._kmm(state)
        I = jnp.eye(self.M, dtype=Knm.dtype)
        if self.whitened:
            L = jnp.linalg.cholesky(Kmm + self.jitter * I)
            return jax.scipy.linalg.solve_triangular(L, Knm.T, lower=True).T
        return spd_solve(Kmm + self.jitter * I, Knm.T).T

    def _ktilde_diag(self, Knn_diag, kn, Knm):
        if self.whitened:
            return Knn_diag - jnp.sum(kn * kn, axis=-1)
        return Knn_diag - jnp.sum(kn * Knm, axis=-1)

    def _kl(self, state, qm, qS, Kmm):
        if self.whitened:
            return stats.kl_to_standard(qm, qS)
        return stats.kl_mvn(qm, qS, jnp.zeros_like(qm), Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype))

    # ------------------------------------------------------------------

    def batch_an(self, y, noise_std, kn, Knm, Knn_diag, qm, qS):
        y = y.reshape(-1)
        ns = noise_std.reshape(-1)
        ivar = 1.0 / (ns * ns)
        knt_m = kn @ qm
        knSkn = jnp.sum((kn @ qS) * kn, axis=-1)
        mse = (knt_m - y) ** 2
        variance = self._ktilde_diag(Knn_diag.reshape(-1), kn, Knm) + knSkn
        return -0.5 * ivar * (mse + variance) - jnp.log(ns) - 0.5 * LN2PI

    def elbo(self, state, x, y, noise_std, integrated_obs=False,
             semi_integrated_estimator="analytic", semi_integrated_samps=10,
             key=None, weights=None, **_):
        Knm, Knn_diag = self.make_grams(
            state, x, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        Kmm = self._kmm(state)
        kn = self.make_kn(state, Knm, Kmm)
        qm, qS = self.standard_params(state)
        an = self.batch_an(y, noise_std, kn, Knm, Knn_diag, qm, qS)
        if weights is not None:
            mean_an = jnp.sum(an * weights) / jnp.maximum(jnp.sum(weights), 1.0)
        else:
            mean_an = jnp.mean(an)
        return mean_an - self._kl(state, qm, qS, Kmm) / self.N

    def elbo_and_grads(self, state, x, y, noise_std,
                       integrated_obs=False,
                       semi_integrated_estimator="analytic",
                       semi_integrated_samps=10, key=None,
                       compute_kernel_grads=False,
                       compute_hyper_grads=None,
                       weights=None, **_):
        """(elbo, grads) with natgrad theta leaves in optax convention
        (`ziggy/svgp.py:280-359` without the hard-coded 1000/N rescale).

        Signature-compatible with HIPGP.elbo_and_grads so the shared SVI
        loop drives either model (maxiter_cg etc. accepted and ignored;
        ``compute_hyper_grads`` aliases ``compute_kernel_grads``)."""
        if compute_hyper_grads is not None:
            compute_kernel_grads = compute_hyper_grads
        if noise_std is None:
            raise ValueError(
                "SVGP has no learnable noise parameter (matching the "
                "reference, ziggy/svgp.py): per-point noise_std is required; "
                "learn_noise is a HIPGP-only feature"
            )
        y = y.reshape(-1)
        ns = noise_std.reshape(-1)
        if weights is not None:
            bscale = self.N / jnp.maximum(jnp.sum(weights), 1.0)
        else:
            bscale = self.N / y.shape[0]

        def elbo_parts(st):
            Knm, Knn_diag = self.make_grams(
                st, x, integrated_obs, semi_integrated_estimator,
                semi_integrated_samps, key,
            )
            Kmm = self._kmm(st)
            kn = self.make_kn(st, Knm, Kmm)
            qm, qS = self.standard_params(st)
            an = self.batch_an(y, noise_std, kn, Knm, Knn_diag, qm, qS)
            if weights is not None:
                mean_an = jnp.sum(an * weights) / jnp.maximum(jnp.sum(weights), 1.0)
            else:
                mean_an = jnp.mean(an)
            e = mean_an - self._kl(st, qm, qS, Kmm) / self.N
            return e, (kn, Kmm)

        if compute_kernel_grads:
            def elbo_fn2(log_sig2, log_ell):
                st = state.replace(
                    theta1=jax.lax.stop_gradient(state.theta1),
                    theta2=jax.lax.stop_gradient(state.theta2),
                    log_sig2=log_sig2, log_ell=log_ell,
                )
                e, aux = elbo_parts(st)
                return e + self.kernel_param_prior(st) / self.N, aux
            (elbo, (kn, Kmm)), grads = jax.value_and_grad(
                elbo_fn2, argnums=(0, 1), has_aux=True
            )(state.log_sig2, state.log_ell)
            g_sig2, g_ell = (-grads[0], -grads[1])
        else:
            elbo, (kn, Kmm) = elbo_parts(state)
            g_sig2 = jnp.zeros_like(state.log_sig2)
            g_ell = jnp.zeros_like(state.log_ell)
        kn_t = kn / ns[:, None]
        if weights is not None:
            kn_t = kn_t * jnp.sqrt(weights)[:, None]
        if self.whitened:
            prior_prec = jnp.eye(self.M, dtype=kn.dtype)
        else:
            prior_prec = spd_inverse(Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype))
        Lam = bscale * (kn_t.T @ kn_t) + prior_prec
        dS = -0.5 * Lam - state.theta2
        yw = (y / ns) if weights is None else (y / ns) * jnp.sqrt(weights)
        uhat = kn_t.T @ yw
        dm = bscale * uhat - state.theta1

        grads = SVGPState(
            theta1=-dm, theta2=-dS, log_sig2=g_sig2, log_ell=g_ell
        )
        return elbo, grads

    def batch_solve(self, state, xobs, yobs, noise_std, batch_size=-1,
                    integrated_obs=False, semi_integrated_estimator="analytic",
                    semi_integrated_samps=10, key=None, compute_elbo=False,
                    **_):
        """Closed-form optimal q (`ziggy/svgp.py:169-235`)."""
        N = xobs.shape[0]
        y = yobs.reshape(-1)
        ns = noise_std.reshape(-1)
        Kmm = self._kmm(state)
        Knm, Knn_diag = self.make_grams(
            state, xobs, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        kn = self.make_kn(state, Knm, Kmm)
        kn_t = kn / ns[:, None]
        if self.whitened:
            prior_prec = jnp.eye(self.M, dtype=kn.dtype)
        else:
            prior_prec = spd_inverse(Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype))
        Lam = prior_prec + kn_t.T @ kn_t
        b = kn_t.T @ (y / ns)
        new_state = state.replace(theta1=b, theta2=-0.5 * Lam)
        if not compute_elbo:
            return new_state
        qm, qS = self.standard_params(new_state)
        an = self.batch_an(y, noise_std, kn, Knm, Knn_diag, qm, qS)
        elbo = jnp.sum(an) / N - self._kl(new_state, qm, qS, Kmm) / self.N
        return new_state, elbo

    def predict(self, state, x, integrated_obs=False,
                semi_integrated_estimator="analytic",
                semi_integrated_samps=10, key=None, var_clamp=0.0, **_):
        Knm, Knn_diag = self.make_grams(
            state, x, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        Kmm = self._kmm(state)
        kn = self.make_kn(state, Knm, Kmm)
        qm, qS = self.standard_params(state)
        mu = kn @ qm
        ktilde = jnp.maximum(self._ktilde_diag(Knn_diag.reshape(-1), kn, Knm), var_clamp)
        sig = jnp.sqrt(ktilde + jnp.sum((kn @ qS) * kn, axis=-1))
        return mu, sig

    def kernel_param_prior(self, state):
        """Gamma log-prior on the lengthscale (`ziggy/svgp.py:361-375`)."""
        mu, sig = self.prior_ell
        alpha, beta = stats.gamma_params(mu, sig**2)
        return stats.gamma_lnpdf_lnx(state.log_ell, alpha, beta)
