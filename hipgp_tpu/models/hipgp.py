"""HIP-GP: hierarchical inducing-point GP with BTTB-structured prior.

TPU-native rebuild of the reference model family (`ziggy/hipgp.py`:
ToeplitzInducingGP + MeanField/Block/FullRank variational families).  Design
differences from the reference, deliberate and TPU-first:

* The model object is a *static* container (kernel, grids, index tables);
  all learnable state lives in the :class:`HIPGPState` pytree.  Every method
  is a pure function of (state, data) — jit/vmap/grad compose freely, and
  there is no ``.grad``-poking natural-gradient hack: ``elbo_and_grads``
  *returns* the natural gradient as a pytree.
* The BTTB spectrum is constructed inside the jitted step from the current
  hyperparameters (one O(M' log M') FFT — the cost of a single extra PCG
  iteration), fixing the reference's per-batch host-side ToeplitzTensor
  rebuild (`ziggy/hipgp.py:142-143`).
* Hyperparameter gradients flow through the PCG solve via
  ``lax.custom_linear_solve`` implicit differentiation instead of a custom
  autograd Function.
* Whitened space: ``whitened_type='ziggy'`` uses the expanded circulant basis
  (M' = prod(2 m_d - 2)); ``'cholesky'`` the dense L^{-1} basis (M' = M),
  kept as the exact oracle twin and for learn-kernel protocols.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..kernels import DoublyDiagInterpolator, k_semi_mc, k_semi_sqexp
from ..ops import (
    make_spectrum,
    matmul_by_Cinv,
    matmul_by_K,
    matmul_by_R,
    matmul_by_RT,
    spd_inverse,
    spd_solve,
    whiten,
)
from ..ops.bttb import BTTBSpectrum, embedded_dims
from ..utils import blocks as blk
from ..utils import stats

__all__ = ["HIPGP", "HIPGPState", "FactoredSolveInconsistency"]

LN2PI = math.log(2.0 * math.pi)

# max batches per gram-sweep dispatch: one whole-data dispatch is killed by
# the TPU runtime watchdog beyond M ~ 128^2 (see `_batch_solve_gram`); at
# the 3droad shape 64 batches ~ 10 s of device time per dispatch
GRAM_SWEEP_MAX_BATCHES = 64
# ... and the 64-batch cap itself is not enough once per-batch cost grows:
# a paper-scale sweep at maxiter_cg=60 measured ~135 s/dispatch and was
# watchdog-killed.  Dispatches are additionally bounded by a WORK budget
# (bsz * M' * maxiter units; calibrated: the 3droad sweep runs ~8.5e9
# units/s, so 5e11 ~ 60 s of device work).
GRAM_SWEEP_WORK_BUDGET = 5e11


def _sweep_chunk_batches(Mprime: int, bsz: int, maxiter: int) -> int:
    """Batches per device dispatch for whole-data sweeps: the 64-batch cap
    AND the work budget (watchdog-safe at any per-batch cost)."""
    w = max(1, int(Mprime) * int(bsz) * max(int(maxiter), 1))
    return max(1, min(GRAM_SWEEP_MAX_BATCHES, int(GRAM_SWEEP_WORK_BUDGET // w)))

# f32 trust region of the 'factored' solver's kappa(spectrum) pre-check
# (RESULTS sec. 13); module-level so the trust-region study
# (results/repro/factored_trustregion.py) can probe past it.
FACTORED_F32_KAPPA_MAX = 1e3

# Disable ONLY for accuracy studies that need the raw factored output past
# a firing guard (results/repro/factored_trustregion.py); production code
# must never turn these off.
FACTORED_GUARDS = True



class FactoredSolveInconsistency(RuntimeError):
    """The factored batch solve's exactness check failed.

    For any PSD kernel, sum_n ivar_n kn_n.kn_n <= sum_n ivar_n Knn_n (the
    Nystrom residual is the Schur complement of a PSD matrix).  The factored
    solver computes the left side as tr(K^{-1} A) = ||W L_A||_F^2 through
    truncated PCG solves on the ROUGH Cholesky-factor columns of the data
    Gram; on heavily clamped spectra in f32 those solves can be far less
    converged than the smooth kernel-row solves of the sweep-based paths
    (measured: SqExp at ell = 2.5 grid spacings on a 32^2 grid breaks the
    identity by orders of magnitude while the sweep path stays consistent).
    `batch_solve` catches this and falls back to the 'gram' sweep solver.
    """


@struct.dataclass
class HIPGPState:
    """Learnable state pytree.

    ``theta1``/``theta2`` are the natural (expectation-family) parameters of
    q in the whitened space — or (m, S) directly under the 'standard'
    parameterization.  Shapes: theta1 (M',); theta2 (M',) mean-field,
    (num_blocks, bs, bs) block, (M', M') full-rank.
    """

    theta1: jnp.ndarray
    theta2: jnp.ndarray
    log_sig2: jnp.ndarray
    log_ell: jnp.ndarray
    log_noise2: jnp.ndarray


class HIPGP:
    """Static model container; all methods are pure in (state, data).

    Args mirror the reference constructor (`ziggy/hipgp.py:17-74`):
      kernel:       a `hipgp_tpu.kernels.Kernel`.
      xgrids:       list of 1-D grids defining the inducing-point mesh.
      num_obs:      total N (balances data vs KL terms in the bound).
      family:       'mean-field' | 'block' | 'full-rank'.
      whitened_type:'ziggy' (circulant-expanded) | 'cholesky' (dense oracle).
      parameterization: 'expectation-family' | 'standard'.
      block_sizes:  per-dim chunk edges for the block family (or
                    ``xblock_size`` uniform).
      support_integrated_obs: precompute the doubly-integrated diagonal
                    interpolation table (host quadrature) at build time.
    """

    def __init__(
        self,
        kernel,
        xgrids: Sequence[jnp.ndarray],
        num_obs: int,
        family: str = "mean-field",
        whitened_type: str = "ziggy",
        parameterization: str = "expectation-family",
        xblock_size: int = 10,
        block_sizes: Optional[Sequence[int]] = None,
        jitter: float = 1e-3,
        sig2_init: float = 1.0,
        ell_init: float = 0.05,
        noise2_init: float = 1.0,
        init_Svar: float = 0.1,
        learn_kernel: bool = False,
        learn_noise: bool = False,
        support_integrated_obs: bool = False,
        grid_shards: Optional[int] = None,
        dtype=None,
    ):
        if family not in ("mean-field", "block", "full-rank"):
            raise ValueError(f"unknown family {family!r}")
        if whitened_type not in ("ziggy", "cholesky"):
            raise ValueError(f"unknown whitened_type {whitened_type!r}")
        if parameterization not in ("expectation-family", "standard"):
            raise ValueError(f"unknown parameterization {parameterization!r}")

        self.kernel = kernel
        self.family = family
        self.whitened_type = whitened_type
        self.parameterization = parameterization
        self.jitter = float(jitter)
        self.N = int(num_obs)
        self.learn_kernel = learn_kernel
        self.learn_noise = learn_noise
        # default dtype: follow the inducing grids (f32 on TPU, f64 in
        # x64-enabled oracle tests)
        self.dtype = dtype if dtype is not None else jnp.asarray(xgrids[0]).dtype
        self.sig2_init = float(sig2_init)
        self.ell_init = ell_init
        self.noise2_init = float(noise2_init)
        self.init_Svar = float(init_Svar)

        self.xgrids = tuple(jnp.asarray(g, self.dtype) for g in xgrids)
        self.dims = tuple(len(g) for g in self.xgrids)
        mesh = jnp.meshgrid(*self.xgrids, indexing="ij")
        self.xinduce = jnp.stack([m.reshape(-1) for m in mesh], axis=-1)  # (M, D)
        self.M = int(np.prod(self.dims))
        self.ndim = len(self.dims)

        # grid_shards: pad the circulant embedding so it shards evenly over
        # an n-way 'grid' mesh axis (model parallelism, `parallel/mp.py`);
        # padding is exact — it changes M' but never the operator K
        self.grid_shards = grid_shards
        self._spec_multiple = None
        if whitened_type == "ziggy":
            if grid_shards and grid_shards > 1:
                from ..parallel.fft_sharded import shard_multiples

                self._spec_multiple = shard_multiples(self.dims, grid_shards)
            self.edims = embedded_dims(self.dims, self._spec_multiple)
            self.Mprime = int(np.prod(self.edims))
        else:
            self.edims = self.dims
            self.Mprime = self.M

        # Block family: chunk the *whitened* grid (expanded dims under ziggy
        # whitening — `ziggy/hipgp.py:595-601`).
        self.blk_idx = None
        self.blk_inv = None
        if family == "block":
            if block_sizes is None:
                block_sizes = [xblock_size] * self.ndim
            self.block_sizes = tuple(int(c) for c in block_sizes)
            bidx, binv = blk.block_indices(self.edims, block_sizes)
            self.blk_idx = jnp.asarray(bidx)
            self.blk_inv = jnp.asarray(binv)
            self.num_blocks, self.block_size = bidx.shape

        self.diag_interp = (
            DoublyDiagInterpolator(kernel) if support_integrated_obs else None
        )

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, key: Optional[jax.Array] = None) -> HIPGPState:
        dt = self.dtype
        Mp = self.Mprime
        if key is None:
            key = jax.random.PRNGKey(0)
        # Glorot-style init of the mean parameter for mf/block (the reference
        # uses xavier_normal_ on (M',1)); zeros for full-rank.
        std = math.sqrt(2.0 / (Mp + 1))
        if self.family == "full-rank":
            theta1 = jnp.zeros((Mp,), dt)
        else:
            theta1 = std * jax.random.normal(key, (Mp,), dt)

        if self.parameterization == "standard":
            if self.family == "mean-field":
                theta2 = self.init_Svar * jnp.ones((Mp,), dt)
            elif self.family == "block":
                theta2 = jnp.tile(
                    self.init_Svar * jnp.eye(self.block_size, dtype=dt),
                    (self.num_blocks, 1, 1),
                )
            else:
                theta2 = self.init_Svar * jnp.eye(Mp, dtype=dt)
        else:
            val = -0.5 / self.init_Svar
            if self.family == "mean-field":
                theta2 = val * jnp.ones((Mp,), dt)
            elif self.family == "block":
                theta2 = jnp.tile(
                    val * jnp.eye(self.block_size, dtype=dt),
                    (self.num_blocks, 1, 1),
                )
            else:
                theta2 = val * jnp.eye(Mp, dtype=dt)

        return HIPGPState(
            theta1=theta1,
            theta2=theta2,
            log_sig2=jnp.asarray(math.log(self.sig2_init), dt),
            log_ell=jnp.log(jnp.asarray(self.ell_init, dt)),
            log_noise2=jnp.asarray(math.log(self.noise2_init), dt),
        )

    def kernel_params(self, state: HIPGPState):
        return jnp.exp(state.log_sig2), jnp.exp(state.log_ell)

    # ------------------------------------------------------------------
    # covariance plumbing
    # ------------------------------------------------------------------

    def spectrum(self, state: HIPGPState, transform: str = "fft") -> BTTBSpectrum:
        # memoized jitted builder: the eager build compiles outside the
        # persistent compilation cache (~13 s per fresh process at the
        # paper 125^2 shape, measured); one jitted program per transform
        # mode caches across processes and reuses in-process executables
        cache = self.__dict__.setdefault("_spectrum_jit_cache", {})
        if transform not in cache:

            def build(st):
                p = (jnp.exp(st.log_sig2), jnp.exp(st.log_ell))
                return make_spectrum(
                    self.xgrids, lambda x, y: self.kernel(x, y, p),
                    jitter=self.jitter, multiple_of=self._spec_multiple,
                    transform=transform,
                )

            cache[transform] = jax.jit(build)
        return cache[transform](state)

    def _kmm_chol(self, state: HIPGPState) -> jnp.ndarray:
        params = self.kernel_params(state)
        Kmm = self.kernel(self.xinduce, self.xinduce, params)
        Kmm = Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype)
        return jnp.linalg.cholesky(Kmm)

    def make_grams(
        self,
        state: HIPGPState,
        x: jnp.ndarray,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(Knm (bsz, M), Knn_diag (bsz,)) — `ziggy/svi_gp.py:48-76`."""
        params = self.kernel_params(state)
        if integrated_obs:
            if semi_integrated_estimator == "analytic":
                if not getattr(self.kernel, "has_k_semi", False):
                    raise ValueError(
                        "analytic semi-integrated estimator requires a kernel "
                        "with a closed form (SqExp); use 'mc-biased'"
                    )
                Knm = k_semi_sqexp(self.xinduce, x, params).T  # (bsz, M)
            elif semi_integrated_estimator == "mc-biased":
                if key is None:
                    key = jax.random.PRNGKey(0)
                Knm = k_semi_mc(
                    key, self.kernel, self.xinduce, x, params,
                    npts=semi_integrated_samps,
                ).T
            else:
                raise ValueError(
                    f"unknown estimator {semi_integrated_estimator!r} "
                    "(the quadrature oracle is host-only: kernels.k_semi_quad)"
                )
            if self.diag_interp is None:
                raise ValueError(
                    "integrated_obs requires support_integrated_obs=True at build"
                )
            Knn_diag = self.diag_interp(x, params)
        else:
            Knm = self.kernel(x, self.xinduce, params)
            Knn_diag = self.kernel.diag(x, params)
        return Knm, Knn_diag

    def compute_kn(
        self,
        state: HIPGPState,
        Knm: jnp.ndarray,
        maxiter_cg: int = 10,
        tol: float = 1e-8,
        spec: Optional[BTTBSpectrum] = None,
    ) -> jnp.ndarray:
        """kn: whitened cross-covariances, (bsz, M').

        ziggy: kn = R^T K^{-1} Kmn via PCG (`ziggy/hipgp.py:138-145`);
        cholesky: kn = L^{-1} Kmn (`:132-137`).
        """
        if self.whitened_type == "cholesky":
            L = self._kmm_chol(state)
            sol = jax.scipy.linalg.solve_triangular(L, Knm.T, lower=True)
            return sol.T
        if spec is None:
            spec = self.spectrum(state)
        return whiten(spec, Knm, maxiter=maxiter_cg, tol=tol)

    # ------------------------------------------------------------------
    # variational family dispatch
    # ------------------------------------------------------------------

    def standard_params(self, state: HIPGPState):
        """(qm (M',), qS family-shaped) from the stored parameterization."""
        t1, t2 = state.theta1, state.theta2
        if self.parameterization == "standard":
            return t1, t2
        if self.family == "mean-field":
            S = -0.5 / t2  # (M',)
            m = S * t1
        elif self.family == "block":
            S = spd_inverse(-2.0 * t2)  # (nb, bs, bs)
            m = self.block_diag_multiply(S, t1[None, :])[0]
        else:
            S = spd_inverse(-2.0 * t2)
            m = S @ t1
        return m, S

    def block_diag_multiply(self, S_block: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        """(nb, bs, bs) block-diag matrix applied to (bsz, M') vectors."""
        vb = blk.to_blocks(v, self.blk_idx)  # (bsz, nb, bs)
        Sv = jnp.einsum("nij,bnj->bni", S_block, vb)
        return blk.from_blocks(Sv, self.blk_inv)

    def compute_knSkn(self, kn: jnp.ndarray, qS: jnp.ndarray) -> jnp.ndarray:
        """diag(kn S kn^T) per batch row — `ziggy/hipgp.py` family methods."""
        if self.family == "mean-field":
            return jnp.sum(kn * qS[None, :] * kn, axis=-1)
        if self.family == "block":
            Skn = self.block_diag_multiply(qS, kn)
            return jnp.sum(kn * Skn, axis=-1)
        return jnp.sum((kn @ qS) * kn, axis=-1)

    def kl_to_prior(self, qm: jnp.ndarray, qS: jnp.ndarray) -> jnp.ndarray:
        if self.family == "mean-field":
            return stats.diag_kl_to_standard(qm, qS)
        if self.family == "block":
            return stats.block_kl_to_standard(qm, qS)
        return stats.kl_to_standard(qm, qS)

    def get_lam(
        self, ivar: jnp.ndarray, kn: jnp.ndarray, bscale=1.0, add_identity=True
    ):
        """Family-shaped Lambda = bscale * sum_n kn_n kn_n^T / sigma_n^2 (+ I).

        ivar: (bsz,) inverse noise variances (zero-weight rows masked out).
        """
        if self.family == "mean-field":
            lam = bscale * jnp.sum(ivar[:, None] * kn * kn, axis=0)
            return lam + 1.0 if add_identity else lam
        if self.family == "block":
            knb = blk.to_blocks(kn, self.blk_idx)  # (bsz, nb, bs)
            lam = bscale * jnp.einsum("bni,bnj,b->nij", knb, knb, ivar)
            if add_identity:
                lam = lam + jnp.eye(self.block_size, dtype=kn.dtype)
            return lam
        lam = bscale * jnp.einsum("bi,bj,b->ij", kn, kn, ivar)
        if add_identity:
            lam = lam + jnp.eye(self.Mprime, dtype=kn.dtype)
        return lam

    def _S_from_lam(self, lam):
        if self.family == "mean-field":
            return 1.0 / lam
        return spd_inverse(lam)

    # ------------------------------------------------------------------
    # ELBO pieces
    # ------------------------------------------------------------------

    def _ivar_and_lognoise(self, state, noise_std, bsz):
        """(ivar (bsz,), log_noise_std (bsz,) or scalar)."""
        if noise_std is not None:
            ns = noise_std.reshape(-1)
            return 1.0 / (ns * ns), jnp.log(ns)
        ivar = jnp.exp(-state.log_noise2) * jnp.ones((bsz,), self.dtype)
        return ivar, 0.5 * state.log_noise2

    def batch_an(
        self, state, y, noise_std, kn, Knn_diag, qm, qS
    ) -> jnp.ndarray:
        """Per-point expected log-likelihood a_n (`ziggy/hipgp.py:370-414`):
        a_n = -1/(2 s_n^2) [ (kn.m - y)^2 + Knn - kn.kn + kn S kn ]
              - log s_n - 1/2 log 2 pi.
        """
        y = y.reshape(-1)
        ivar, log_noise_std = self._ivar_and_lognoise(state, noise_std, y.shape[0])
        knt_m = kn @ qm
        knt_kn = jnp.sum(kn * kn, axis=-1)
        knSkn = self.compute_knSkn(kn, qS)
        mse = (knt_m - y) ** 2
        variance = Knn_diag.reshape(-1) - knt_kn + knSkn
        return -0.5 * ivar * (mse + variance) - log_noise_std - 0.5 * LN2PI

    def elbo(
        self,
        state: HIPGPState,
        x: jnp.ndarray,
        y: jnp.ndarray,
        noise_std: Optional[jnp.ndarray] = None,
        maxiter_cg: int = 10,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
        weights: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Minibatch ELBO estimate: mean(a_n) - KL/N (`ziggy/hipgp.py:160-192`).

        ``weights`` (0/1 per row) supports padded batches under jit.
        """
        Knm, Knn_diag = self.make_grams(
            state, x, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg)
        qm, qS = self.standard_params(state)
        an = self.batch_an(state, y, noise_std, kn, Knn_diag, qm, qS)
        if weights is not None:
            mean_an = jnp.sum(an * weights) / jnp.maximum(jnp.sum(weights), 1.0)
        else:
            mean_an = jnp.mean(an)
        return mean_an - self.kl_to_prior(qm, qS) / self.N

    # ------------------------------------------------------------------
    # natural gradient
    # ------------------------------------------------------------------

    def _natgrad(self, state, kn, y, ivar, qm, bscale):
        """(deta1, deta2): natural-gradient ascent directions
        (`ziggy/hipgp.py:229-271`)."""
        y = y.reshape(-1)
        knt_m = kn @ qm
        bdiff = ivar * (knt_m - y)  # (bsz,)
        data_dm = -(kn.T @ bdiff)  # (M',)
        dm = bscale * data_dm - qm

        if self.family == "mean-field":
            lam_diag = bscale * jnp.sum(ivar[:, None] * kn * kn, axis=0) + 1.0
            dS = -0.5 * lam_diag - state.theta2
            deta1 = dm + dS * (-2.0 * qm)
            deta2 = dS
        elif self.family == "block":
            lam_block = self.get_lam(ivar, kn, bscale=bscale, add_identity=True)
            dS = -0.5 * lam_block - state.theta2
            dSdeta1 = self.block_diag_multiply(dS, (-2.0 * qm)[None, :])[0]
            deta1 = dm + dSdeta1
            deta2 = dS
        else:
            lam = self.get_lam(ivar, kn, bscale=bscale, add_identity=True)
            dS = -0.5 * lam - state.theta2
            b = kn.T @ (ivar * y)
            deta1 = b - state.theta1
            deta2 = dS
        return deta1, deta2

    def elbo_and_grads(
        self,
        state: HIPGPState,
        x: jnp.ndarray,
        y: jnp.ndarray,
        noise_std: Optional[jnp.ndarray] = None,
        maxiter_cg: int = 10,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
        weights: Optional[jnp.ndarray] = None,
        compute_hyper_grads: bool = False,
        kn_fn=None,
    ):
        """ELBO + natural gradients (+ optional hyperparameter gradients).

        Returns (elbo, grads) where ``grads`` is a :class:`HIPGPState`-shaped
        pytree in *optax convention* (descent direction on -ELBO): the theta
        leaves hold -deta so that ``theta - lr * grad = theta + lr * deta``
        (the reference writes -deta into ``.grad`` and runs SGD,
        `ziggy/hipgp.py:270-271`); hyperparameter leaves hold -d(elbo)/d(log.)
        when requested, else zeros.

        ``kn_fn(st, x, key) -> (kn, Knn_diag)``: optional override of the
        whitened cross-covariance computation — the hook the model-parallel
        layer uses to run the whitening solve grid-sharded
        (`parallel.mp.make_mp_kn_fn`) while every downstream contraction
        (ELBO terms, natural gradient, hyper grads) stays this exact code,
        executed on the sharded global arrays.  Must be differentiable in
        the hyperparameters carried by ``st``.
        """
        if self.parameterization != "expectation-family":
            raise ValueError("natural-gradient step needs expectation-family")

        y = y.reshape(-1)

        def elbo_fn(log_sig2, log_ell, log_noise2):
            st = state.replace(
                theta1=jax.lax.stop_gradient(state.theta1),
                theta2=jax.lax.stop_gradient(state.theta2),
                log_sig2=log_sig2,
                log_ell=log_ell,
                log_noise2=log_noise2,
            )
            if kn_fn is not None:
                kn, Knn_diag = kn_fn(st, x, key)
            else:
                Knm, Knn_diag = self.make_grams(
                    st, x, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, key,
                )
                kn = self.compute_kn(st, Knm, maxiter_cg=maxiter_cg)
            qm, qS = self.standard_params(st)
            an = self.batch_an(st, y, noise_std, kn, Knn_diag, qm, qS)
            if weights is not None:
                mean_an = jnp.sum(an * weights) / jnp.maximum(jnp.sum(weights), 1.0)
            else:
                mean_an = jnp.mean(an)
            elbo = mean_an - self.kl_to_prior(qm, qS) / self.N
            return elbo, (kn, qm)

        hypers = (state.log_sig2, state.log_ell, state.log_noise2)
        if compute_hyper_grads:
            (elbo, (kn, qm)), hgrads = jax.value_and_grad(
                elbo_fn, argnums=(0, 1, 2), has_aux=True
            )(*hypers)
            g_sig2, g_ell, g_noise2 = jax.tree.map(lambda g: -g, hgrads)
        else:
            elbo, (kn, qm) = elbo_fn(*hypers)
            g_sig2 = jnp.zeros_like(state.log_sig2)
            g_ell = jnp.zeros_like(state.log_ell)
            g_noise2 = jnp.zeros_like(state.log_noise2)

        ivar, _ = self._ivar_and_lognoise(state, noise_std, y.shape[0])
        if weights is not None:
            ivar = ivar * weights
            bscale = self.N / jnp.maximum(jnp.sum(weights), 1.0)
        else:
            bscale = self.N / y.shape[0]
        deta1, deta2 = self._natgrad(state, kn, y, ivar, qm, bscale)

        grads = HIPGPState(
            theta1=-deta1,
            theta2=-deta2,
            log_sig2=g_sig2,
            log_ell=g_ell,
            log_noise2=g_noise2,
        )
        return elbo, grads

    # ------------------------------------------------------------------
    # closed-form full-batch solve
    # ------------------------------------------------------------------

    def accumulate_lam_b(
        self,
        state: HIPGPState,
        x: jnp.ndarray,
        y: jnp.ndarray,
        ivar: jnp.ndarray,
        maxiter_cg: int = 10,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
        spec: Optional[BTTBSpectrum] = None,
    ):
        """One batch's additive contributions to the information-form solve:
        (lam, b, big) WITHOUT prior identities.  ``ivar`` is the per-row
        inverse noise variance with any padding mask already folded in.

        This is the unit of data parallelism: contributions are plain sums,
        so sharded batches combine with a single psum (see `parallel.dp`).
        """
        Knm, _ = self.make_grams(
            state, x, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg, spec=spec)
        y = y.reshape(-1)
        lam = self.get_lam(ivar, kn, bscale=1.0, add_identity=False)
        b = kn.T @ (ivar * y)
        big = (
            jnp.einsum("bi,bj,b->ij", kn, kn, ivar)
            if self.family != "full-rank"
            else None
        )
        return lam, b, big

    def finalize_from_lam_b(self, state: HIPGPState, lam, b, big) -> HIPGPState:
        """Turn accumulated (lam, b, big) — prior identities NOT included —
        into the optimal variational state (`ziggy/hipgp.py:327-345`)."""
        lam = lam + self.get_lam(
            jnp.zeros((1,), self.dtype),
            jnp.zeros((1, self.Mprime), self.dtype),
            add_identity=True,
        )
        if big is not None:
            big = big + jnp.eye(self.Mprime, dtype=self.dtype)

        if self.parameterization == "standard":
            S = self._S_from_lam(lam)
            m = S @ b if self.family == "full-rank" else spd_solve(big, b)
            return state.replace(theta1=m, theta2=S)
        theta2 = -0.5 * lam
        if self.family == "mean-field":
            mhat = spd_solve(big, b)
            theta1 = mhat * lam
        elif self.family == "block":
            mhat = spd_solve(big, b)
            theta1 = self.block_diag_multiply(lam, mhat[None, :])[0]
        else:
            theta1 = b
        return state.replace(theta1=theta1, theta2=theta2)

    def _state_from_lam_mhat(self, state, lam, mhat):
        """Assemble the optimal state from the accumulated family-shaped
        Lambda (WITHOUT prior identity) and the already-solved optimal mean
        mhat — shared tail of the matrix-free mean-solver paths."""
        lam_with_I = lam + self.get_lam(
            jnp.zeros((1,), self.dtype),
            jnp.zeros((1, self.Mprime), self.dtype),
            add_identity=True,
        )
        if self.parameterization == "standard":
            return state.replace(theta1=mhat, theta2=self._S_from_lam(lam_with_I))
        theta2 = -0.5 * lam_with_I
        if self.family == "mean-field":
            return state.replace(theta1=mhat * lam_with_I, theta2=theta2)
        return state.replace(
            theta1=self.block_diag_multiply(lam_with_I, mhat[None, :])[0],
            theta2=theta2,
        )

    def _lam_from_factor_rows(self, G: jnp.ndarray):
        """Family-shaped sum_k g_k g_k^T (no prior identity) from factor
        rows G, where row k is (W l_k)^T with A = sum_k l_k l_k^T."""
        if self.family == "mean-field":
            return jnp.sum(G * G, axis=0)
        if self.family == "block":
            Gb = blk.to_blocks(G, self.blk_idx)  # (r, nb, bs)
            return jnp.einsum("rni,rnj->nij", Gb, Gb)
        return G.T @ G

    def _batch_solve_factored(
        self, state, spec, xp, yp, w, keys, nsp, N, *,
        maxiter_cg, integrated_obs, semi_integrated_estimator,
        semi_integrated_samps, mean_solver_maxiter, mean_solver_tol,
        compute_elbo, factor_jitter,
    ):
        """Closed-form solve with O(M) whitening solves instead of O(N).

        The sweep-based paths run one truncated-PCG whitening per data batch
        (twice when the ELBO is requested) — 2N right-hand sides total.  But
        with W = R^T K^{-1} and K = R R^T holding EXACTLY for the clamped
        circulant operator (`matmul_by_K` IS P C P^T with the same clamped
        spectrum R is built from), every quantity of the closed-form optimum
        (`ziggy/hipgp.py:278-368`) is a function of the M-space data Gram
        A = sum_n Knm_n Knm_n^T / s_n^2 and b_m = sum_n y_n Knm_n / s_n^2:

        * Lambda - I = W A W^T = G^T-products of  G = W L_A  where
          A = L_A L_A^T (Cholesky): M whitening solves, not N.
        * optimal mean: m = R (K+A)^{-1} b_m (the 'gram' Woodbury collapse).
        * ELBO data term, summed in closed form with z = (K+A)^{-1} b_m
          (and v = K^{-1} R qm in general, = z when qm = R^T z):
            sum ivar (kn.m - y)^2 = v A v - 2 v b_m + sum ivar y^2,
            sum ivar kn.kn        = tr(K^{-1} A) = ||G||_F^2,
            sum ivar kn S kn      = sum(S * (Lambda - I))  (family-shaped),
          plus per-point scalars (sum ivar Knn, noise log-terms) accumulated
          in the same no-PCG sweep as A.

        The data sweep therefore contains NO PCG at all (kernel evaluations
        + MXU rank-bsz updates), and the whitening cost drops from 2N to
        M+2 right-hand sides — the method of choice when N >> M.  Identical
        family optimum as 'gram'; truncation error enters through the
        factor solves instead of the per-point kn solves (agreement vs the
        dense path is checked in tests/test_factored_solve.py).
        """
        dtype = self.dtype
        zero = jnp.asarray(0.0, dtype)

        # Pre-check (f32 + circulant whitening, eager).  Root cause pinned
        # by the round-5 boundary study (RESULTS sec. 13b,
        # results/repro/factored_trustregion.py): the f32 error lives in
        # the f32 WHITENING SOLVES of the factor columns — Cholesky columns
        # are localized (delta-like), so the f32 PCG floor enters as
        # broadband content that W amplifies into Lambda.  It is NOT the
        # factor's precision: an exact f64 factor cast down reproduces the
        # error bit-for-near (V3 = V4), while rounding the factor of an
        # f64 pipeline to f32 is harmless (V2: 1e-6).  A full eigen-factor
        # fixes it (orthogonal columns with sqrt(eig) norms: 35x better
        # theta2, valid to kappa ~ 2e4) but TPU eigh at M >= 4k is
        # impractical (minutes), and partial-eigh/Nystrom variants fail
        # because the residual Cholesky reintroduces localized columns
        # (measured k-insensitive).  Trust region: kappa <= 1e3 in f32.
        # f64 resolves the floor; the post-hoc checks govern there.
        if (
            spec is not None
            and np.dtype(dtype) == np.dtype(np.float32)
            and not isinstance(spec.eigs, jax.core.Tracer)
        ):
            kap = float(jnp.max(spec.eigs) / jnp.min(spec.eigs))
            if kap > FACTORED_F32_KAPPA_MAX:
                raise FactoredSolveInconsistency(
                    f"spectrum dynamic range {kap:.2e} exceeds the measured "
                    f"f32 trust region ({FACTORED_F32_KAPPA_MAX:g}): the f32 "
                    "whitening solves of the LOCALIZED factor columns cannot "
                    "resolve the spectral tail that Lambda needs (the bound "
                    "is a property of the solves, not the factor — see "
                    "RESULTS sec. 13b)"
                )

        if nsp is None:
            # homoscedastic: ivar = w exp(-log_noise2) and log s_n =
            # log_noise2 / 2 are exactly the heteroscedastic formulas
            # evaluated at ns = exp(log_noise2 / 2)
            nsp = jnp.exp(0.5 * state.log_noise2) * jnp.ones_like(w)

        fns = self._factored_stage_fns(
            (maxiter_cg, integrated_obs, semi_integrated_estimator,
             semi_integrated_samps, mean_solver_maxiter, mean_solver_tol, N)
        )

        A, bm, sy2, sKnn, slog = fns["stats_sweep"](
            state, xp, yp, w, keys, nsp
        )

        # symmetric factor of A (PSD up to roundoff; relative jitter keeps
        # the f32 Cholesky alive — the perturbation is epsilon * diag(W W^T)
        # on Lambda, far below the data terms).  Eagerly (the shipped path —
        # prefer_eager_batch_solve routes 'factored' eager) the jitter
        # escalates x100 up to 4 times before failing loudly; under an outer
        # jit the first value must suffice.
        if factor_jitter is None:
            # measured at 3droad M=128^2 (f32, HIGHEST accumulation): rungs
            # below 1e-4 x meandiag leave A indefinite; f64 tolerates 1e-10
            factor_jitter = (
                1e-4 if np.dtype(dtype) == np.dtype(np.float32) else 1e-10
            )
        eps = factor_jitter * jnp.mean(jnp.diag(A))
        L_A = fns["chol_at"](A, eps)
        if not isinstance(L_A, jax.core.Tracer):
            tries = 0
            while not bool(jnp.all(jnp.isfinite(L_A))) and tries < 4:
                eps = eps * 100.0
                tries += 1
                L_A = fns["chol_at"](A, eps)
            if not bool(jnp.all(jnp.isfinite(L_A))):
                raise FloatingPointError(
                    "factored mean solver: Cholesky of the accumulated data "
                    "Gram stayed non-finite up to jitter "
                    f"{float(eps):.3e}; raise factor_jitter (A is PSD only "
                    "up to accumulation roundoff)"
                )

        if self.whitened_type == "cholesky":
            lam, trKinvA = fns["g_stage"](state, L_A)
        else:
            lam, trKinvA = fns["g_stage"](spec, L_A)

        # exactness self-check: sum ivar kn.kn <= sum ivar Knn must hold for
        # any PSD kernel (Nystrom residual >= 0); a violation means the
        # truncated PCG on the rough factor columns diverged from the
        # smooth-RHS truncation the sweep paths see (observed on heavily
        # clamped f32 spectra).  Eager only — under an outer jit the values
        # are tracers.
        # Threshold anchors (measured): a healthy-but-rough f32 run (3droad
        # M=128^2, Mat32) overshoots by 4.3% from benign CG roundoff while
        # producing BETTER post-RMSE than the sweep path; the genuinely
        # broken regime (SqExp at 2.5 spacings, f32) overshoots 2.3x with
        # garbage Lambda.  1.2x splits them with margin on both sides.
        if FACTORED_GUARDS and not isinstance(trKinvA, jax.core.Tracer):
            tr_f = float(trKinvA)
            sk_f = float(sKnn)
            if not np.isfinite(tr_f) or tr_f > 1.2 * sk_f + 1e-6:
                raise FactoredSolveInconsistency(
                    f"tr(K^-1 A) = {tr_f:.4e} exceeds sum ivar Knn = "
                    f"{sk_f:.4e}: the factor-column PCG solves are "
                    "inconsistent at this conditioning (clamped spectrum / "
                    "f32); use the 'gram' sweep solver or raise maxiter_cg"
                )

        z = None
        if self.family == "full-rank":
            bw = fns["whiten_bm"](state, bm, spec)
            new_state = self.finalize_from_lam_b(state, lam, bw, None)
        elif self.whitened_type == "cholesky":
            mhat, z = fns["mean_stage"](state, A, bm)
            new_state = self._state_from_lam_mhat(state, lam, mhat)
        else:
            mhat, z = fns["mean_stage"](spec, A, bm)
            new_state = self._state_from_lam_mhat(state, lam, mhat)

        if not compute_elbo:
            return new_state

        qm, qS = self.standard_params(new_state)
        if z is not None:
            v = z.reshape(-1)
        elif self.whitened_type == "cholesky":
            v = fns["v_of_qm"](state, qm)
        else:
            v = fns["v_of_qm"](spec, qm)

        # second post-check: the aggregate variance bracket
        # sum ivar (Knn - kn.kn + kn S kn) = sKnn - tr(K^-1 A) + sum(S*lam)
        # is a sum of nonnegative per-point terms — a negative value means
        # the ELBO identities broke below the 1.2x tr threshold (observed:
        # an inflated ELBO of +5.0 vs the sweep's -0.98 slipped through
        # the tr check alone at kappa = 1.3e4)
        sSkn = jnp.sum(qS * lam)
        if FACTORED_GUARDS and not isinstance(sSkn, jax.core.Tracer):
            bracket = float(sKnn) - float(trKinvA) + float(sSkn)
            if bracket < -1e-3 * float(sKnn):
                raise FactoredSolveInconsistency(
                    f"aggregate variance bracket {bracket:.4e} is negative "
                    f"(sKnn {float(sKnn):.4e}, tr {float(trKinvA):.4e}): "
                    "the closed-form ELBO is invalid at this conditioning"
                )

        elbo = fns["elbo_stage"](
            v, A, bm, sy2, sKnn, slog, trKinvA, lam, qm, qS
        )
        return new_state, elbo

    def _factored_stage_fns(self, cfg):
        """Memoized jitted stage functions for `_batch_solve_factored`.

        Every stage is EXPLICITLY jitted with all traced values as
        arguments: eager lax.scan/while_loop executions bypass the
        persistent compilation cache, so the staged solve would otherwise
        pay ~50 s of XLA compiles in every fresh process (measured at
        3droad M=128^2); closure-captured arrays would embed as HLO
        constants and defeat the cache across hyperparameter values; and
        per-call `jax.jit` wrappers would re-trace + re-link on every
        solve (measured ~4.7 s per call for the 16k Cholesky alone).
        Memoizing the jitted callables on the model keeps in-process
        repeat solves (ell_fit sweeps, per-epoch refits) at pure runtime
        cost.  Staged (eager-between-stages) dispatch keeps the
        watchdog-safe profile of prefer_eager_batch_solve.
        """
        cache = self.__dict__.setdefault("_factored_jit_cache", {})
        if cfg in cache:
            return cache[cfg]
        (maxiter_cg, integrated_obs, semi_integrated_estimator,
         semi_integrated_samps, mean_solver_maxiter, mean_solver_tol,
         N) = cfg
        dtype = self.dtype

        def stats_sweep(state, xp, yp, w, keys, nsp):
            def stats_of(carry, inp):
                A, bm, sy2, sKnn, slog = carry
                xb, yb, wb, kb, nsb = inp
                Knm, Knn = self.make_grams(
                    state, xb, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, kb,
                )
                yv = yb.reshape(-1)
                ivar = wb / (nsb * nsb)
                logs = jnp.log(nsb)
                # HIGHEST: the TPU-default bf16 dot leaves A indefinite at
                # scale (measured: the f32 Cholesky at 3droad M=128^2 NaNs
                # on the DEFAULT-precision accumulation); one-time cost
                A = A + jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar,
                                   precision=jax.lax.Precision.HIGHEST)
                bm = bm + jnp.einsum("bi,b->i", Knm, ivar * yv,
                                     precision=jax.lax.Precision.HIGHEST)
                sy2 = sy2 + jnp.sum(ivar * yv * yv)
                sKnn = sKnn + jnp.sum(ivar * Knn.reshape(-1))
                slog = slog + jnp.sum(wb * (-logs - 0.5 * LN2PI))
                return (A, bm, sy2, sKnn, slog), None

            zero = jnp.asarray(0.0, dtype)
            carry0 = (
                jnp.zeros((self.M, self.M), dtype),
                jnp.zeros((self.M,), dtype),
                zero, zero, zero,
            )
            return jax.lax.scan(stats_of, carry0, (xp, yp, w, keys, nsp))[0]

        def chol_at(A, e):
            return jnp.linalg.cholesky(A + e * jnp.eye(self.M, dtype=dtype))

        if self.whitened_type == "cholesky":

            def g_stage(state, L_A):
                Lk = self._kmm_chol(state)
                G = jax.scipy.linalg.solve_triangular(Lk, L_A, lower=True).T
                return self._lam_from_factor_rows(G), jnp.sum(G * G)

            def mean_stage(state, A, bm):
                Kmm = self.kernel(self.xinduce, self.xinduce,
                                  self.kernel_params(state))
                Kmm = Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype)
                z = spd_solve(Kmm + A, bm)
                return jnp.linalg.cholesky(Kmm).T @ z, z

            def v_of_qm(state, qm):
                # kn.m = Knm^T L^{-T} m  =>  v = L^{-T} qm
                return jax.scipy.linalg.solve_triangular(
                    self._kmm_chol(state).T, qm, lower=False
                )

        else:

            def g_stage(spec, L_A):
                # L_A may be rectangular (M, C): any factor with
                # L_A L_A^T = A works (C > M for the partial-eigh factor)
                ncols = L_A.shape[1]
                cs = min(ncols, 2048)
                nc = -(-ncols // cs)
                Lt = L_A.T
                if nc * cs != ncols:
                    Lt = jnp.pad(Lt, ((0, nc * cs - ncols), (0, 0)))
                Lt = Lt.reshape(nc, cs, self.M)
                lam0 = jax.tree.map(
                    jnp.zeros_like,
                    self._lam_from_factor_rows(
                        jnp.zeros((1, self.Mprime), dtype)
                    ),
                )

                def gstep(carry, rows):
                    lam_acc, tr_acc = carry
                    Gc = whiten(spec, rows, maxiter=maxiter_cg)
                    return (
                        lam_acc + self._lam_from_factor_rows(Gc),
                        tr_acc + jnp.sum(Gc * Gc),
                    ), None

                (lam, tr), _ = jax.lax.scan(
                    gstep, (lam0, jnp.asarray(0.0, dtype)), Lt
                )
                return lam, tr

            def mean_stage(spec, A, bm):
                from ..ops import pcg as _pcg

                def kpa_mv(v):
                    return matmul_by_K(spec, v) + v @ A

                z = _pcg(
                    kpa_mv, bm[None, :],
                    precond=lambda v: matmul_by_Cinv(spec, v),
                    maxiter=mean_solver_maxiter, tol=mean_solver_tol,
                )[0]
                return matmul_by_RT(spec, z), z

            def v_of_qm(spec, qm):
                from ..ops import inv_matmul as _inv_matmul

                return _inv_matmul(
                    spec, matmul_by_R(spec, qm[None, :]),
                    maxiter=mean_solver_maxiter, tol=mean_solver_tol,
                )[0]

        def whiten_bm(state, bm, spec):
            return self.compute_kn(
                state, bm[None, :], maxiter_cg=mean_solver_maxiter, spec=spec
            )[0]

        def elbo_stage(v, A, bm, sy2, sKnn, slog, trKinvA, lam, qm, qS):
            quad = v @ (A @ v) - 2.0 * (v @ bm) + sy2
            # sum_n ivar kn S kn = sum(S * (Lambda - I)), family-shaped
            sSkn = jnp.sum(qS * lam)
            total_an = -0.5 * (quad + sKnn - trKinvA + sSkn) + slog
            return total_an / N - self.kl_to_prior(qm, qS) / self.N

        fns = {
            "stats_sweep": jax.jit(stats_sweep),
            "chol_at": jax.jit(chol_at),
            "g_stage": jax.jit(g_stage),
            "mean_stage": jax.jit(mean_stage),
            "v_of_qm": jax.jit(v_of_qm),
            "whiten_bm": jax.jit(whiten_bm),
            "elbo_stage": jax.jit(elbo_stage),
        }
        cache[cfg] = fns
        return fns

    def _gram_stage_fns(self, cfg):
        """Memoized jitted stages for the one-sweep 'gram' solver — same
        staging rationale as `_factored_stage_fns` (persistent-cache-able
        compiles, no constant-embedding, no per-call re-linking)."""
        cache = self.__dict__.setdefault("_gram_jit_cache", {})
        if cfg in cache:
            return cache[cfg]
        (maxiter_cg, integrated_obs, semi_integrated_estimator,
         semi_integrated_samps, mean_solver_maxiter, mean_solver_tol,
         N) = cfg
        dtype = self.dtype

        def sweep(carry0, state, spec, xp, yp, w, keys, nsp):
            def body(carry, inp):
                lam, A, bm, sy2, sKnn, sknkn, slog = carry
                xb, yb, wb, kb, nsb = inp
                Knm, Knn = self.make_grams(
                    state, xb, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, kb,
                )
                kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg,
                                     spec=spec)
                yv = yb.reshape(-1)
                ivar = wb / (nsb * nsb)
                logs = jnp.log(nsb)
                lam = lam + self.get_lam(ivar, kn, bscale=1.0,
                                         add_identity=False)
                # HIGHEST: the bf16-default dot degrades the Woodbury mean
                # (measured at 3droad: post-RMSE 0.032 -> 0.025 with an
                # accurately accumulated A)
                A = A + jnp.einsum("bi,bj,b->ij", Knm, Knm, ivar,
                                   precision=jax.lax.Precision.HIGHEST)
                bm = bm + jnp.einsum("bi,b->i", Knm, ivar * yv,
                                     precision=jax.lax.Precision.HIGHEST)
                sy2 = sy2 + jnp.sum(ivar * yv * yv)
                sKnn = sKnn + jnp.sum(ivar * Knn.reshape(-1))
                sknkn = sknkn + jnp.sum(ivar * jnp.sum(kn * kn, axis=-1))
                slog = slog + jnp.sum(wb * (-logs - 0.5 * LN2PI))
                return (lam, A, bm, sy2, sKnn, sknkn, slog), None

            return jax.lax.scan(body, carry0, (xp, yp, w, keys, nsp))[0]

        if self.whitened_type == "cholesky":

            def mean_stage(state, A, bm):
                Kmm = self.kernel(self.xinduce, self.xinduce,
                                  self.kernel_params(state))
                Kmm = Kmm + self.jitter * jnp.eye(self.M, dtype=Kmm.dtype)
                z = spd_solve(Kmm + A, bm)
                return jnp.linalg.cholesky(Kmm).T @ z, z

        else:

            def mean_stage(spec, A, bm):
                from ..ops import pcg as _pcg

                def kpa_mv(v):
                    return matmul_by_K(spec, v) + v @ A

                z = _pcg(
                    kpa_mv, bm[None, :],
                    precond=lambda v: matmul_by_Cinv(spec, v),
                    maxiter=mean_solver_maxiter, tol=mean_solver_tol,
                )[0]
                return matmul_by_RT(spec, z), z

        def elbo_stage(z, A, bm, sy2, sKnn, sknkn, slog, lam, qm, qS):
            # kn.m = Knm (K+A)^{-1} b_m exactly (R R^T = K), so the data
            # quadratic collapses onto (A, b_m, z); kn.kn and kn S kn come
            # from the SWEPT kn — reference-consistent truncation
            zv = z.reshape(-1)
            quad = zv @ (A @ zv) - 2.0 * (zv @ bm) + sy2
            sSkn = jnp.sum(qS * lam)
            total_an = -0.5 * (quad + sKnn - sknkn + sSkn) + slog
            return total_an / N - self.kl_to_prior(qm, qS) / self.N

        fns = {
            # the carry is donated: A (M x M) updates in place across the
            # chunked dispatches — one resident copy at any scale
            "sweep": jax.jit(sweep, donate_argnums=(0,)),
            "mean_stage": jax.jit(mean_stage),
            "elbo_stage": jax.jit(elbo_stage),
        }
        cache[cfg] = fns
        return fns

    def _batch_solve_gram(
        self, state, spec, xp, yp, w, keys, nsp, N, *,
        maxiter_cg, integrated_obs, semi_integrated_estimator,
        semi_integrated_samps, mean_solver_maxiter, mean_solver_tol,
        compute_elbo,
    ):
        """One-sweep 'gram' solver (mean-field/block).

        Round-3 rework of the original two-sweep gram path: the single data
        sweep computes per-point kn (Lambda keeps the reference's per-point
        truncation semantics — unlike 'factored', this is f32-robust at any
        conditioning) AND accumulates (A, b_m) for the Woodbury mean plus
        the ELBO scalars, so the second ELBO sweep of
        `ziggy/hipgp.py:347-368` disappears: sum ivar kn.kn and
        sum ivar kn S kn = sum(S * Lambda_data) are pass-1 accumulables,
        and the data quadratic collapses onto (A, b_m, z).  Halves the
        dominant cost.  Stages are memoized-jitted (`_gram_stage_fns`).

        The sweep runs in chunks of at most ``GRAM_SWEEP_MAX_BATCHES``
        batches per dispatch with the accumulator carry DONATED between
        chunks: a single whole-data dispatch exceeds the TPU runtime's
        watchdog beyond M ~ 128^2 (the worker process is killed mid-solve
        — same failure mode as RESULTS sec. 9's fused graph, reproduced at
        M=192^2), while chunked dispatches pipeline back-to-back at
        identical accumulation order (the chunk boundary splits the same
        sequential adds), so the result is bit-identical.  The batch stack
        is padded to a multiple of the chunk with zero-weight batches so
        every chunk shares one compiled program.
        """
        dtype = self.dtype
        if nsp is None:
            nsp = jnp.exp(0.5 * state.log_noise2) * jnp.ones_like(w)
        fns = self._gram_stage_fns(
            (maxiter_cg, integrated_obs, semi_integrated_estimator,
             semi_integrated_samps, mean_solver_maxiter, mean_solver_tol, N)
        )
        nb = xp.shape[0]
        # even chunks <= the bound, so the zero-weight pad is < nchunks
        # batches (vs up to chunk-1 when slicing at the max directly)
        bound = _sweep_chunk_batches(self.Mprime, xp.shape[1], maxiter_cg)
        nchunks = -(-nb // max(1, min(nb, bound)))
        chunk = -(-nb // nchunks)
        pad = (-nb) % chunk
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            xp, keys = rep(xp), rep(keys)
            yp = jnp.concatenate([yp, jnp.zeros((pad,) + yp.shape[1:], dtype)])
            w = jnp.concatenate([w, jnp.zeros((pad,) + w.shape[1:], dtype)])
            nsp = jnp.concatenate([nsp, jnp.ones((pad,) + nsp.shape[1:], dtype)])
        # distinct scalar buffers: the donated carry may not alias leaves
        zero = lambda: jnp.zeros((), dtype)
        lam0 = jax.tree.map(
            jnp.zeros_like,
            self.get_lam(jnp.zeros((1,), dtype),
                         jnp.zeros((1, self.Mprime), dtype),
                         add_identity=False),
        )
        carry = (lam0, jnp.zeros((self.M, self.M), dtype),
                 jnp.zeros((self.M,), dtype), zero(), zero(), zero(), zero())
        for i in range(0, xp.shape[0], chunk):
            s = slice(i, i + chunk)
            carry = fns["sweep"](carry, state, spec, xp[s], yp[s], w[s],
                                 keys[s], nsp[s])
        lam, A, bm, sy2, sKnn, sknkn, slog = carry
        if self.whitened_type == "cholesky":
            mhat, z = fns["mean_stage"](state, A, bm)
        else:
            mhat, z = fns["mean_stage"](spec, A, bm)
        new_state = self._state_from_lam_mhat(state, lam, mhat)
        if not compute_elbo:
            return new_state
        qm, qS = self.standard_params(new_state)
        elbo = fns["elbo_stage"](z, A, bm, sy2, sKnn, sknkn, slog, lam,
                                 qm, qS)
        return new_state, elbo

    def _matfree_stage_fns(self, cfg):
        """Memoized jitted stages for the matrix-free 'matfree' solver —
        same staging rationale as `_gram_stage_fns`."""
        cache = self.__dict__.setdefault("_matfree_jit_cache", {})
        if cfg in cache:
            return cache[cfg]
        (maxiter_cg, integrated_obs, semi_integrated_estimator,
         semi_integrated_samps, N) = cfg

        def sweep(carry0, state, spec, xp, yp, w, keys, nsp):
            # the gram sweep minus its M x M accumulator: matfree exists
            # because A cannot be HBM-resident at paper-scale 3-D grids
            # (64x64x32 -> A = 68 GB)
            def body(carry, inp):
                lam, bm, sy2, sKnn, sknkn, slog = carry
                xb, yb, wb, kb, nsb = inp
                Knm, Knn = self.make_grams(
                    state, xb, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, kb,
                )
                kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg,
                                     spec=spec)
                yv = yb.reshape(-1)
                ivar = wb / (nsb * nsb)
                logs = jnp.log(nsb)
                lam = lam + self.get_lam(ivar, kn, bscale=1.0,
                                         add_identity=False)
                bm = bm + jnp.einsum("bi,b->i", Knm, ivar * yv,
                                     precision=jax.lax.Precision.HIGHEST)
                sy2 = sy2 + jnp.sum(ivar * yv * yv)
                sKnn = sKnn + jnp.sum(ivar * Knn.reshape(-1))
                sknkn = sknkn + jnp.sum(ivar * jnp.sum(kn * kn, axis=-1))
                slog = slog + jnp.sum(wb * (-logs - 0.5 * LN2PI))
                return (lam, bm, sy2, sKnn, sknkn, slog), None

            return jax.lax.scan(body, carry0, (xp, yp, w, keys, nsp))[0]

        def a_mv(acc, state, xp, w, keys, nsp, v):
            """acc + sum_n Knm_n (Knm_n . v) / s_n^2 over this chunk of
            batches — the data-Gram matvec with Knm recomputed on the fly
            (HIGHEST: information-form accumulation feeding the mean)."""
            def body(a, inp):
                xb, wb, kb, nsb = inp
                Knm, _ = self.make_grams(
                    state, xb, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, kb,
                )
                u = (wb / (nsb * nsb)) * jnp.einsum(
                    "bi,i->b", Knm, v, precision=jax.lax.Precision.HIGHEST)
                return a + jnp.einsum(
                    "bi,b->i", Knm, u,
                    precision=jax.lax.Precision.HIGHEST), None

            return jax.lax.scan(body, acc, (xp, w, keys, nsp))[0]

        def kv(spec, v):
            return matmul_by_K(spec, v[None, :])[0]

        def pcg_update(spec, z, r, p, rz, Ap, rtol2):
            """One preconditioned-CG update given the already-computed
            (K + A) p; returns the new state and a host-checkable done
            flag (||r||^2 <= rtol2)."""
            alpha = rz / jnp.vdot(p, Ap)
            z2 = z + alpha * p
            r2 = r - alpha * Ap
            y = matmul_by_Cinv(spec, r2[None, :])[0]
            rz2 = jnp.vdot(r2, y)
            p2 = y + (rz2 / rz) * p
            return z2, r2, p2, rz2, jnp.sum(r2 * r2) <= rtol2

        def pcg_init(spec, bm):
            y = matmul_by_Cinv(spec, bm[None, :])[0]
            return jnp.zeros_like(bm), bm, y, jnp.vdot(bm, y), jnp.sum(bm * bm)

        def finish(spec, z):
            return matmul_by_RT(spec, z)

        def elbo_stage(z, Az, bm, sy2, sKnn, sknkn, slog, lam, qm, qS):
            # identical algebra to the 'gram' elbo_stage with z^T A z
            # precomputed (Az is the solver's final data-Gram matvec)
            zv = z.reshape(-1)
            quad = zv @ Az - 2.0 * (zv @ bm) + sy2
            sSkn = jnp.sum(qS * lam)
            total_an = -0.5 * (quad + sKnn - sknkn + sSkn) + slog
            return total_an / N - self.kl_to_prior(qm, qS) / self.N

        fns = {
            "sweep": jax.jit(sweep, donate_argnums=(0,)),
            "a_mv": jax.jit(a_mv, donate_argnums=(0,)),
            "kv": jax.jit(kv),
            "pcg_update": jax.jit(pcg_update, donate_argnums=(1, 2, 3)),
            "pcg_init": jax.jit(pcg_init),
            "finish": jax.jit(finish),
            "elbo_stage": jax.jit(elbo_stage),
        }
        cache[cfg] = fns
        return fns

    def _matfree_gram_mv(self, fns, state, xp, w, keys, nsp):
        """The (K + A) matvec as chunked eager dispatches (each bounded by
        GRAM_SWEEP_MAX_BATCHES batches — the same watchdog bound as the
        gram sweep)."""
        nb = xp.shape[0]
        chunk = max(1, min(nb, GRAM_SWEEP_MAX_BATCHES))

        def a_only(v):
            acc = jnp.zeros_like(v)
            for i in range(0, nb, chunk):
                s = slice(i, i + chunk)
                acc = fns["a_mv"](acc, state, xp[s], w[s], keys[s], nsp[s], v)
            return acc

        def mv(spec, v):
            return fns["kv"](spec, v) + a_only(v)

        return mv, a_only

    def _batch_solve_matfree(
        self, state, spec, xp, yp, w, keys, nsp, N, *,
        maxiter_cg, integrated_obs, semi_integrated_estimator,
        semi_integrated_samps, mean_solver_maxiter, mean_solver_tol,
        compute_elbo,
    ):
        """Matrix-free 'gram' (mean-field/block): the Woodbury mean
        m = R (K + A)^{-1} b_m is solved WITHOUT materializing the M x M
        data Gram — each CG iteration applies A by re-sweeping the data in
        bounded chunks, recomputing Knm on the fly.  O(M + bsz*M) memory:
        the only path that runs full-batch at paper-scale 3-D grids
        (M = 64x64x32 = 131k, where A alone would be 68 GB).  The CG loop
        is host-driven (one matvec dispatch + one update dispatch per
        iteration), so no single dispatch exceeds the TPU watchdog.

        Reference semantics: `ziggy/hipgp.py:278-368` (same closed-form
        optimum; the reference's dense big_lam caps it at M' ~ 16k).
        """
        if self.whitened_type != "ziggy":
            raise ValueError("mean_solver='matfree' requires ziggy whitening")
        dtype = self.dtype
        if nsp is None:
            nsp = jnp.exp(0.5 * state.log_noise2) * jnp.ones_like(w)
        fns = self._matfree_stage_fns(
            (maxiter_cg, integrated_obs, semi_integrated_estimator,
             semi_integrated_samps, N)
        )
        nb = xp.shape[0]
        bound = _sweep_chunk_batches(self.Mprime, xp.shape[1], maxiter_cg)
        nchunks = -(-nb // max(1, min(nb, bound)))
        chunk = -(-nb // nchunks)
        pad = (-nb) % chunk
        if pad:
            rep = lambda a: jnp.concatenate(
                [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
            xp, keys = rep(xp), rep(keys)
            yp = jnp.concatenate([yp, jnp.zeros((pad,) + yp.shape[1:], dtype)])
            w = jnp.concatenate([w, jnp.zeros((pad,) + w.shape[1:], dtype)])
            nsp = jnp.concatenate([nsp, jnp.ones((pad,) + nsp.shape[1:], dtype)])
        zero = lambda: jnp.zeros((), dtype)
        lam0 = jax.tree.map(
            jnp.zeros_like,
            self.get_lam(jnp.zeros((1,), dtype),
                         jnp.zeros((1, self.Mprime), dtype),
                         add_identity=False),
        )
        carry = (lam0, jnp.zeros((self.M,), dtype),
                 zero(), zero(), zero(), zero())
        for i in range(0, xp.shape[0], chunk):
            s = slice(i, i + chunk)
            carry = fns["sweep"](carry, state, spec, xp[s], yp[s], w[s],
                                 keys[s], nsp[s])
        lam, bm, sy2, sKnn, sknkn, slog = carry

        mv, a_only = self._matfree_gram_mv(fns, state, xp, w, keys, nsp)
        z, r, p, rz, b2 = fns["pcg_init"](spec, bm)
        rtol2 = jnp.asarray(mean_solver_tol, dtype) ** 2 * b2
        for _ in range(mean_solver_maxiter):
            Ap = mv(spec, p)
            z, r, p, rz, done = fns["pcg_update"](spec, z, r, p, rz, Ap,
                                                  rtol2)
            if bool(done):
                break
        mhat = fns["finish"](spec, z)
        new_state = self._state_from_lam_mhat(state, lam, mhat)
        if not compute_elbo:
            return new_state
        Az = a_only(z)
        qm, qS = self.standard_params(new_state)
        elbo = fns["elbo_stage"](z, Az, bm, sy2, sKnn, sknkn, slog, lam,
                                 qm, qS)
        return new_state, elbo

    def batch_solve(
        self,
        state: HIPGPState,
        xobs: jnp.ndarray,
        yobs: jnp.ndarray,
        noise_std: Optional[jnp.ndarray] = None,
        batch_size: int = -1,
        maxiter_cg: int = 10,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
        compute_elbo: bool = False,
        mean_solver: str = "dense",
        mean_solver_maxiter: int = 200,
        mean_solver_tol: float = 1e-8,
        factor_jitter: Optional[float] = None,
    ):
        """Closed-form optimal q: accumulate (Lambda, b) over batches, then
        S = Lambda^{-1}, m = S b (`ziggy/hipgp.py:278-368`).

        Data is padded to a batch multiple and masked, so the whole solve is
        one jit-compatible ``lax.scan``.  Returns ``new_state`` (or
        ``(new_state, elbo)`` when ``compute_elbo``).

        ``mean_solver``: the mean-field/block optimal *mean* solves the FULL
        system (I + sum_n kn kn^T / s_n^2) m = b.  Three paths:

        * 'dense' materializes that M' x M' matrix (the reference's behavior
          — caps M' around ~16k on one chip);
        * 'cg' keeps the stacked kn (N x M') in HBM and solves by CG with
          matvecs m -> m + kn^T (ivar * (kn m)) — O(N M') memory, for large
          M' at moderate N;
        * 'gram' accumulates the ORIGINAL-space data Gram
          A = sum_n Knm_n Knm_n^T / s_n^2 (M x M) and uses the exact
          Woodbury collapse  m = R (K + A)^{-1} b_m  with
          b_m = sum_n y_n Knm_n / s_n^2 (derivation: Lambda = I + W A W^T
          with W = R K^{-1} and W^T W = K^{-1}, so
          Lambda^{-1} W b_m = R (K + A)^{-1} b_m) — O(M^2) memory
          INDEPENDENT of N and M', one PCG solve on the SPD system K + A
          with the circulant preconditioner.  This also sidesteps the
          truncated-PCG kn approximation in the mean (kn enters only
          Lambda/S): the mean is the exact optimum of the family.
        * 'factored' pushes the same idea through Lambda and the ELBO too:
          EVERYTHING is computed from (A, b_m) plus O(M) whitening solves,
          so no per-data-point PCG happens at all — see
          `_batch_solve_factored`.  O(M) solves instead of O(N); the method
          of choice when N >> M (measured ~6x on the 3droad M=128^2
          protocol, RESULTS.md).

        * 'matfree' is 'gram' without the resident A: each mean-CG
          iteration re-applies the data Gram by sweeping the data in
          bounded chunks, recomputing Knm on the fly (O(M + bsz*M)
          memory) — see `_batch_solve_matfree`.

        Crossover on one 16 GB chip: 'dense' to M' ~ 16k, 'gram'/'factored'
        to M ~ 40k (A is M^2), 'cg' when M is huge but N x M' fits,
        'matfree' beyond all of those (paper-scale 3-D grids).
        """
        N = xobs.shape[0]
        y = yobs.reshape(-1)
        if batch_size == -1 or batch_size >= N:
            batch_size = N
        nb = -(-N // batch_size)
        pad = nb * batch_size - N

        def padded(a, fill=0.0):
            if pad == 0:
                return a
            width = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, width, constant_values=fill)

        xp = padded(xobs).reshape(nb, batch_size, -1)
        yp = padded(y).reshape(nb, batch_size)
        w = padded(jnp.ones((N,), self.dtype)).reshape(nb, batch_size)
        if noise_std is not None:
            # pad with 1s to keep 1/ns^2 finite; masked anyway
            nsp = padded(noise_std.reshape(-1), fill=1.0).reshape(nb, batch_size)
        else:
            nsp = None

        spec = self.spectrum(state) if self.whitened_type == "ziggy" else None
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, nb)

        if mean_solver == "factored":
            try:
                return self._batch_solve_factored(
                    state, spec, xp, yp, w, keys, nsp, N,
                    maxiter_cg=maxiter_cg,
                    integrated_obs=integrated_obs,
                    semi_integrated_estimator=semi_integrated_estimator,
                    semi_integrated_samps=semi_integrated_samps,
                    mean_solver_maxiter=mean_solver_maxiter,
                    mean_solver_tol=mean_solver_tol,
                    compute_elbo=compute_elbo,
                    factor_jitter=factor_jitter,
                )
            except FactoredSolveInconsistency as e:
                import warnings

                warnings.warn(
                    f"factored batch solve failed its exactness check "
                    f"({e}); falling back to the sweep-based 'gram' solver",
                    RuntimeWarning,
                )
                mean_solver = "gram"

        if mean_solver == "matfree" and self.family != "full-rank":
            return self._batch_solve_matfree(
                state, spec, xp, yp, w, keys, nsp, N,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                mean_solver_maxiter=mean_solver_maxiter,
                mean_solver_tol=mean_solver_tol,
                compute_elbo=compute_elbo,
            )

        if mean_solver == "gram" and self.family != "full-rank":
            return self._batch_solve_gram(
                state, spec, xp, yp, w, keys, nsp, N,
                maxiter_cg=maxiter_cg,
                integrated_obs=integrated_obs,
                semi_integrated_estimator=semi_integrated_estimator,
                semi_integrated_samps=semi_integrated_samps,
                mean_solver_maxiter=mean_solver_maxiter,
                mean_solver_tol=mean_solver_tol,
                compute_elbo=compute_elbo,
            )

        def kn_of(xb, kb):
            Knm, Knn_diag = self.make_grams(
                state, xb, integrated_obs, semi_integrated_estimator,
                semi_integrated_samps, kb,
            )
            if self.whitened_type == "ziggy":
                kn = whiten(spec, Knm, maxiter=maxiter_cg)
            else:
                kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg)
            return kn, Knn_diag

        if mean_solver not in ("dense", "cg", "gram", "factored", "matfree"):
            raise ValueError(f"mean_solver={mean_solver!r}")
        need_big = self.family != "full-rank" and mean_solver == "dense"
        collect_kn = self.family != "full-rank" and mean_solver == "cg"

        def ivar_of(wb, nsb):
            if nsb is not None:
                return wb / (nsb * nsb)
            return wb * jnp.exp(-state.log_noise2)

        def accum(carry, inp):
            lam_acc, b_acc, big_acc = carry
            xb, yb, wb, kb, nsb = inp
            ivar = ivar_of(wb, nsb)
            if collect_kn:
                # keep kn: the dense M' x M' Lambda is never materialized
                Knm, _ = self.make_grams(
                    state, xb, integrated_obs, semi_integrated_estimator,
                    semi_integrated_samps, kb,
                )
                kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg, spec=spec)
                lam = self.get_lam(ivar, kn, bscale=1.0, add_identity=False)
                b = kn.T @ (ivar * yb.reshape(-1))
                out = (kn, ivar)
            else:
                lam, b, big = self.accumulate_lam_b(
                    state, xb, yb, ivar,
                    maxiter_cg=maxiter_cg,
                    integrated_obs=integrated_obs,
                    semi_integrated_estimator=semi_integrated_estimator,
                    semi_integrated_samps=semi_integrated_samps,
                    key=kb,
                    spec=spec,
                )
                if need_big:
                    big_acc = big_acc + big
                out = None
            lam_acc = lam_acc + lam
            b_acc = b_acc + b
            return (lam_acc, b_acc, big_acc), out

        lam0 = jax.tree.map(
            jnp.zeros_like,
            self.get_lam(jnp.ones((1,), self.dtype), jnp.zeros((1, self.Mprime), self.dtype)),
        )
        b0 = jnp.zeros((self.Mprime,), self.dtype)
        big0 = (
            jnp.zeros((self.Mprime, self.Mprime), self.dtype)
            if need_big
            else jnp.zeros((1, 1), self.dtype)
        )
        if nsp is None:
            (lam, b, big), kn_stack = jax.lax.scan(
                lambda c, i: accum(c, (*i, None)),
                (lam0, b0, big0), (xp, yp, w, keys),
            )
        else:
            (lam, b, big), kn_stack = jax.lax.scan(
                accum, (lam0, b0, big0), (xp, yp, w, keys, nsp)
            )

        if collect_kn:
            from ..ops import pcg as _pcg

            kn_all = kn_stack[0].reshape(-1, self.Mprime)  # (N', M')
            ivar_all = kn_stack[1].reshape(-1)

            def big_mv_flat(v):
                # (B, M') -> v + (kn^T diag(ivar) kn) v, never materializing
                # the M' x M' Gram
                return v + ((ivar_all * (kn_all @ v.T).T) @ kn_all)

            mhat = _pcg(
                big_mv_flat, b[None, :], maxiter=mean_solver_maxiter,
                tol=mean_solver_tol,
            )[0]
            new_state = self._state_from_lam_mhat(state, lam, mhat)
        else:
            new_state = self.finalize_from_lam_b(
                state, lam, b, big if need_big else None
            )

        if not compute_elbo:
            return new_state

        qm, qS = self.standard_params(new_state)

        if collect_kn:
            # reuse the stacked kn from the solve pass: only the prior
            # diagonal (cheap) needs computing — no second PCG sweep and no
            # second cross-covariance evaluation
            params = self.kernel_params(new_state)

            def diag_of(xb, kb):
                if integrated_obs:
                    return self.diag_interp(xb, params)
                return self.kernel.diag(xb, params)

            def elbo_batch(carry, inp):
                kn, xb, yb, wb, kb, nsb = inp
                an = self.batch_an(new_state, yb, nsb, kn, diag_of(xb, kb), qm, qS)
                return carry + jnp.sum(an * wb), None

            kn_batches = kn_stack[0]
            if nsp is None:
                total_an, _ = jax.lax.scan(
                    lambda c, i: elbo_batch(c, (*i, None)),
                    jnp.asarray(0.0, self.dtype), (kn_batches, xp, yp, w, keys),
                )
            else:
                total_an, _ = jax.lax.scan(
                    elbo_batch, jnp.asarray(0.0, self.dtype),
                    (kn_batches, xp, yp, w, keys, nsp),
                )
            elbo = total_an / N - self.kl_to_prior(qm, qS) / self.N
            return new_state, elbo

        def elbo_batch(carry, inp):
            xb, yb, wb, kb, nsb = inp
            kn, Knn_diag = kn_of(xb, kb)
            an = self.batch_an(new_state, yb, nsb, kn, Knn_diag, qm, qS)
            return carry + jnp.sum(an * wb), None

        if nsp is None:
            total_an, _ = jax.lax.scan(
                lambda c, i: elbo_batch(c, (*i, None)),
                jnp.asarray(0.0, self.dtype), (xp, yp, w, keys),
            )
        else:
            total_an, _ = jax.lax.scan(
                elbo_batch, jnp.asarray(0.0, self.dtype), (xp, yp, w, keys, nsp)
            )
        elbo = total_an / N - self.kl_to_prior(qm, qS) / self.N
        return new_state, elbo

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------

    def predict(
        self,
        state: HIPGPState,
        x: jnp.ndarray,
        maxiter_cg: int = 50,
        integrated_obs: bool = False,
        semi_integrated_estimator: str = "analytic",
        semi_integrated_samps: int = 10,
        key: Optional[jax.Array] = None,
        var_clamp: float = 1e-5,
    ):
        """(mu*, sig*) posterior mean/marginal-std at x (`ziggy/hipgp.py:416-446`)."""
        Knm, Knn_diag = self.make_grams(
            state, x, integrated_obs, semi_integrated_estimator,
            semi_integrated_samps, key,
        )
        kn = self.compute_kn(state, Knm, maxiter_cg=maxiter_cg)
        qm, qS = self.standard_params(state)
        mu = kn @ qm
        ktilde = jnp.maximum(Knn_diag.reshape(-1) - jnp.sum(kn * kn, axis=-1), var_clamp)
        sig = jnp.sqrt(ktilde + self.compute_knSkn(kn, qS))
        return mu, sig

    def get_inducing_S(self, state: HIPGPState) -> jnp.ndarray:
        """R S R^T: the variational covariance mapped back to the original
        inducing space (`ziggy/hipgp.py:780-797`, full-rank only)."""
        if self.family != "full-rank":
            raise ValueError("get_inducing_S is defined for the full-rank family")
        _, S = self.standard_params(state)
        spec = self.spectrum(state)
        v = matmul_by_R(spec, S)  # rows: (M', M') -> (M', M)
        return matmul_by_R(spec, v.T)  # (M, M)
