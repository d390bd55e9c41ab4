"""Where exactly does the factored solver's f32 error come from — and does
a higher-precision factor extend the trust region?

RESULTS sec. 13 measured the f32 factored path 0.18 max-rel off in theta2
at a kappa(spectrum) ~ 4e3 oracle config and set the f32 trust region at
kappa <= 1e3.  The round-4 verdict names two candidate fixes (compensated
two-float factor; host-f64 factor cast down).  This study isolates each
precision boundary at several conditionings, with the exactness guards OFF
so raw accuracies are visible (hm.FACTORED_GUARDS):

  gram32    f32 one-sweep gram (the fallback's accuracy = the bar)
  V4        f32 pipeline as shipped (f32 chol, jitter 1e-4 x meandiag)
  V3        f32 pipeline, factor = f64 chol of A32 cast down ('host64')
  V1        f64 pipeline with A rounded to f32 (A-representation boundary)
  V2        f64 pipeline with L_A rounded to f32 (factor-representation)

All errors are max-rel vs the f64 factored truth.

Run (CPU): PYTHONPATH=... python results/repro/factored_trustregion.py
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import warnings

import jax.numpy as jnp
import numpy as np

from hipgp_tpu.kernels import Matern
from hipgp_tpu.models import HIPGP
from hipgp_tpu.models import hipgp as hm

N = 2048
rng = np.random.default_rng(0)
X = rng.uniform(0.03, 0.97, (N, 2))
Y = rng.standard_normal(N)
S = np.full((N,), 0.1)

BSZ, MAXITER = 256, 100
MEAN_KW = dict(mean_solver_maxiter=800, mean_solver_tol=1e-13)


def build(dtype, grid_n, ell):
    model = HIPGP(Matern(2.5), [jnp.linspace(0.0, 1.0, grid_n, dtype=dtype)] * 2,
                  num_obs=N, family="mean-field", ell_init=ell,
                  noise2_init=0.01, dtype=dtype)
    st0 = model.init_state()
    data = (jnp.asarray(X, dtype), jnp.asarray(Y, dtype), jnp.asarray(S, dtype))
    return model, st0, data


def solve_factored_raw(model, st0, data, chol_patch=None, jitter=None):
    """Run _batch_solve_factored directly (no gram fallback), guards off."""
    x, y, s = data
    nb = -(-N // BSZ)
    xp = x.reshape(nb, BSZ, -1)
    yp = y.reshape(nb, BSZ)
    w = jnp.ones((nb, BSZ), model.dtype)
    nsp = s.reshape(nb, BSZ)
    spec = model.spectrum(st0) if model.whitened_type == "ziggy" else None
    keys = jax.random.split(jax.random.PRNGKey(0), nb)

    orig_fns = model._factored_stage_fns
    if chol_patch is not None:
        def wrapped(cfg):
            fns = dict(orig_fns(cfg))
            fns["chol_at"] = chol_patch
            return fns

        model._factored_stage_fns = wrapped
    try:
        return model._batch_solve_factored(
            st0, spec, xp, yp, w, keys, nsp, N,
            maxiter_cg=MAXITER, integrated_obs=False,
            semi_integrated_estimator="analytic", semi_integrated_samps=10,
            compute_elbo=True, factor_jitter=jitter, **MEAN_KW)
    finally:
        model._factored_stage_fns = orig_fns


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b)) / np.max(np.abs(b)))


def report(label, st, e, st_t):
    print(f"  {label}: theta2 rel {rel(st.theta2, st_t.theta2):.2e}  "
          f"theta1 rel {rel(st.theta1, st_t.theta1):.2e}  "
          f"elbo {float(e):+.6f}")


def chol_v1(A, eps):
    A32 = A.astype(jnp.float32).astype(jnp.float64)
    e = 2e-7 * jnp.max(jnp.diag(A32)) + eps
    return jnp.linalg.cholesky(A32 + e * jnp.eye(A.shape[0], dtype=A.dtype))


def chol_v2(A, eps):
    L = jnp.linalg.cholesky(A + eps * jnp.eye(A.shape[0], dtype=A.dtype))
    return L.astype(jnp.float32).astype(jnp.float64)


def chol_v3(A, eps):
    A64 = np.asarray(A, np.float64)
    e = 2e-7 * float(np.max(np.diag(A64))) + float(eps)
    L = np.linalg.cholesky(A64 + e * np.eye(A64.shape[0]))
    return jnp.asarray(L, jnp.float32)


def fourier_chol_factor_for(dims):
    """L = Q chol(Q^T A Q): any orthogonal Q gives L L^T = A; the grid's
    real-Fourier basis approximates the kernel eigenbasis, so chol of the
    decaying-diagonal B has decaying column norms (eigh-like smoothness at
    Cholesky cost) and each column is nearly a single K-eigendirection
    (well-behaved whitening solves)."""
    from hipgp_tpu.ops.bttb import _real_fourier_basis

    def f(A, eps):
        dt = A.dtype
        Qs = [_real_fourier_basis(d, dt) for d in dims]
        M = A.shape[0]
        T = A.reshape(dims + dims)
        # B = Q^T A Q via per-axis contractions
        B = jnp.einsum("ia,jb,abcd,ck,dl->ijkl", Qs[0].T, Qs[1].T, T,
                       Qs[0], Qs[1]).reshape(M, M)
        B = 0.5 * (B + B.T)
        e = 2e-7 * jnp.max(jnp.diag(B)) + eps
        LB = jnp.linalg.cholesky(B + e * jnp.eye(M, dtype=dt))
        L = jnp.einsum("ai,bj,ijk->abk",
                       Qs[0], Qs[1], LB.reshape(dims + (M,))).reshape(M, M)
        return L

    return f


def peigh_factor(k, iters=6):
    """Partial-eigh Nystrom-Schur factor L = [F | chol(S + eps I)] with
    F = (A V) B^{-1/2} (top-k subspace) and S = A - F F^T (exactly PSD for
    PSD A).  Rectangular (M, k + M); g_stage accepts any column count."""

    def f(A, eps):
        dt = A.dtype
        M = A.shape[0]
        hp = jax.lax.Precision.HIGHEST
        V = jnp.asarray(np.random.default_rng(1).standard_normal((M, k)), dt)
        for _ in range(iters):
            V = jnp.linalg.qr(jnp.matmul(A, V, precision=hp))[0]
        AV = jnp.matmul(A, V, precision=hp)
        B = jnp.matmul(V.T, AV, precision=hp)
        wB, P = jnp.linalg.eigh(0.5 * (B + B.T))
        keep = wB > 1e-6 * jnp.max(wB)
        inv_sqrt = jnp.where(keep,
                             1.0 / jnp.sqrt(jnp.where(keep, wB, 1.0)), 0.0)
        F = jnp.matmul(AV, P * inv_sqrt[None, :], precision=hp)
        S = A - jnp.matmul(F, F.T, precision=hp)
        S = 0.5 * (S + S.T)
        e = 2e-7 * jnp.max(jnp.diag(A)) + eps
        Lres = jnp.linalg.cholesky(S + e * jnp.eye(M, dtype=dt))
        return jnp.concatenate([F, Lres], axis=1)

    return f


def eigh_factor(A, eps):
    """Symmetric eigen-factor L = U sqrt(max(w, 0)): L L^T = A with column
    norms decaying like sqrt(eig) — the rough tail columns carry almost no
    weight, so the f32 truncation/floor error of their whitening solves is
    damped by the column norm instead of entering at full diagonal scale
    (Cholesky columns all have O(diag) norm and mix rough content)."""
    w, U = jnp.linalg.eigh(A)
    return U * jnp.sqrt(jnp.clip(w, 0.0))[None, :]


hm.FACTORED_GUARDS = False
hm.FACTORED_F32_KAPPA_MAX = 1e12

# (grid_n, ell in units of grid spacing) chosen to span the trust boundary
for grid_n, ell_sp in [(32, 2.0), (32, 2.6), (32, 3.7)]:
    ell = ell_sp * 1.0 / (grid_n - 1)
    m64, st64, d64 = build(jnp.float64, grid_n, ell)
    spec = m64.spectrum(st64)
    kap = float(jnp.max(spec.eigs) / jnp.min(spec.eigs))
    print(f"grid {grid_n}^2, ell = {ell_sp} spacings: kappa = {kap:.2e}")

    st_t, e_t = solve_factored_raw(m64, st64, d64, jitter=1e-12)
    print(f"  f64 factored truth: elbo {float(e_t):+.6f}", flush=True)

    m32, st32, d32 = build(jnp.float32, grid_n, ell)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        st_g, e_g = m32.batch_solve(
            st32, *d32, batch_size=BSZ, maxiter_cg=MAXITER,
            compute_elbo=True, mean_solver="gram", **MEAN_KW)
    report("gram32 (the bar)   ", st_g, e_g, st_t)

    for label, chol_patch, jitter, model, st0, data in [
        ("V4 f32 shipped     ", None, None, m32, st32, d32),
        ("V3 f32+host64 chol ", chol_v3, None, m32, st32, d32),
        ("V6 f32 eigh factor ", eigh_factor, None, m32, st32, d32),
        ("V7 f32 fourier chol", fourier_chol_factor_for((grid_n, grid_n)),
         None, m32, st32, d32),
        ("V1 f64, A->f32     ", chol_v1, None, m64, st64, d64),
        ("V2 f64, L->f32     ", chol_v2, 1e-12, m64, st64, d64),
    ]:
        try:
            st, e = solve_factored_raw(model, st0, data,
                                       chol_patch=chol_patch, jitter=jitter)
            report(label, st, e, st_t)
        except Exception as ex:
            print(f"  {label}: FAILED {type(ex).__name__}: {ex}")

    # partial-eigh (Nystrom-Schur) at several subspace sizes k — measured
    # REJECTED: k-insensitive (the residual Cholesky's localized columns
    # dominate regardless of residual size), so it was not shipped
    for kcap in (64, 256):
        try:
            st, e = solve_factored_raw(m32, st32, d32,
                                       chol_patch=peigh_factor(kcap))
            report(f"V10 f32 peigh k={kcap:<4d}", st, e, st_t)
        except Exception as ex:
            print(f"  V10 f32 peigh k={kcap}: FAILED {type(ex).__name__}: {ex}")
    print()
