"""PCG solver + differentiable inv_matmul/whiten against dense oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import Matern, SqExp
from hipgp_tpu.ops import (
    bidiag_solve,
    cholesky_whiten,
    dense_gram,
    gram_solve,
    inv_matmul,
    make_spectrum,
    matmul_by_Cinv,
    matmul_by_K,
    pcg,
    pcg_result,
    pcg_scan,
    pcg_trace,
    tridiagonal_solve,
    whiten,
)

PARAMS = (1.0, 0.1)  # PSD circulant embedding at this scale
JITTER = 1e-3


def _setup(dims=(12, 11), kernel=None):
    kernel = kernel or SqExp()
    grids = [jnp.linspace(0.0, 1.0, m) for m in dims]
    kfun = lambda x, y: kernel(x, y, PARAMS)
    spec = make_spectrum(grids, kfun, jitter=JITTER)
    K = dense_gram(grids, kfun, jitter=JITTER)
    return spec, K


def test_pcg_solves_dense_system(rng):
    A = rng.standard_normal((30, 30))
    A = A @ A.T + 30 * np.eye(30)
    b = jnp.asarray(rng.standard_normal((5, 30)))
    Aj = jnp.asarray(A)
    x = pcg(lambda v: v @ Aj.T, b, maxiter=100, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x @ Aj.T), np.asarray(b), rtol=1e-8, atol=1e-9)


def test_pcg_early_exit_counts_iters(rng):
    A = jnp.eye(8) * 4.0
    b = jnp.asarray(rng.standard_normal((2, 8)))
    res = pcg_result(lambda v: v @ A, b, maxiter=50, tol=1e-10)
    assert int(res.iters) <= 3
    assert np.all(np.asarray(res.resnorm) < 1e-10)


def test_preconditioner_accelerates_convergence(rng):
    """Circulant preconditioner cuts the iteration count on a BTTB system —
    the core claim of the paper (reference protocol:
    experiments-hip-gp/run_solve_kn_experiment.py)."""
    spec, K = _setup(dims=(20, 20), kernel=Matern(2.5))
    b = jnp.asarray(rng.standard_normal((4, K.shape[0])))
    mv = lambda v: matmul_by_K(spec, v)
    res_plain = pcg_result(mv, b, maxiter=500, tol=1e-8)
    res_pre = pcg_result(
        mv, b, precond=lambda v: matmul_by_Cinv(spec, v), maxiter=500, tol=1e-8
    )
    assert int(res_pre.iters) < int(res_plain.iters)
    x_dense = jnp.linalg.solve(K, b.T).T
    np.testing.assert_allclose(np.asarray(res_pre.x), np.asarray(x_dense), rtol=1e-5, atol=1e-6)


def test_pcg_scan_matches_while(rng):
    spec, K = _setup()
    b = jnp.asarray(rng.standard_normal((3, K.shape[0])))
    mv = lambda v: matmul_by_K(spec, v)
    pc = lambda v: matmul_by_Cinv(spec, v)
    x_while = pcg(mv, b, precond=pc, maxiter=25, tol=0.0)  # tol=0: run all iters
    x_scan = pcg_scan(mv, b, precond=pc, num_iters=25)
    np.testing.assert_allclose(np.asarray(x_while), np.asarray(x_scan), rtol=1e-10, atol=1e-12)


def test_pcg_trace_residuals_decrease(rng):
    spec, K = _setup()
    b = jnp.asarray(rng.standard_normal((2, K.shape[0])))
    x, traces = pcg_trace(
        lambda v: matmul_by_K(spec, v),
        b,
        precond=lambda v: matmul_by_Cinv(spec, v),
        num_iters=30,
        metric_fn=lambda xk: jnp.max(jnp.abs(xk)),
    )
    res = np.asarray(traces["resnorm"])  # (iters, bsz)
    assert res[-1].max() < res[0].max() * 1e-4
    assert traces["metric"].shape == (30,)


def test_inv_matmul_matches_dense(rng):
    spec, K = _setup()
    rhs = jnp.asarray(rng.standard_normal((6, K.shape[0])))
    got = inv_matmul(spec, rhs, maxiter=200, tol=1e-12)
    want = jnp.linalg.solve(K, rhs.T).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-8)


def test_whiten_matches_cholesky_quadratics(rng):
    """ziggy-whitened kn and cholesky-whitened kn differ as vectors (different
    bases) but must agree on every quadratic: kn kn^T = Knm K^{-1} Kmn."""
    spec, K = _setup()
    Knm = jnp.asarray(rng.standard_normal((5, K.shape[0])))
    kn_fft = whiten(spec, Knm, maxiter=300, tol=1e-13)
    kn_chol = cholesky_whiten(K, Knm)
    got = kn_fft @ kn_fft.T
    want = kn_chol @ kn_chol.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-8)


def test_inv_matmul_grad_rhs(rng):
    spec, K = _setup(dims=(8, 7))
    rhs = jnp.asarray(rng.standard_normal((2, K.shape[0])))

    def loss(r):
        return jnp.sum(inv_matmul(spec, r, maxiter=300, tol=1e-13) ** 2)

    g = jax.grad(loss)(rhs)
    # analytic: d/dr ||K^{-1}r||^2 = 2 K^{-1} K^{-1} r (K symmetric)
    Kinv_r = jnp.linalg.solve(K, rhs.T).T
    want = 2.0 * jnp.linalg.solve(K, Kinv_r.T).T
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-5, atol=1e-7)


def test_inv_matmul_grad_hyperparams_fd():
    """Gradients w.r.t. kernel hyperparameters through the PCG solve, checked
    against central finite differences (replaces the reference's
    sym_toeplitz_derivative_quadratic_form machinery)."""
    kernel = SqExp()
    grids = [jnp.linspace(0.0, 1.0, 8), jnp.linspace(0.0, 1.0, 7)]
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal((2, 56)))

    def loss(log_ell):
        ell = jnp.exp(log_ell)
        kfun = lambda x, y: kernel(x, y, (1.0, ell))
        spec = make_spectrum(grids, kfun, jitter=1e-3)
        return jnp.sum(inv_matmul(spec, rhs, maxiter=400, tol=1e-13) * rhs)

    l0 = jnp.log(0.3)
    g = jax.grad(loss)(l0)
    eps = 1e-5
    fd = (loss(l0 + eps) - loss(l0 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_gram_solve_is_whiten_alias(rng):
    spec, K = _setup(dims=(9,2))
    v = jnp.asarray(rng.standard_normal((2, K.shape[0])))
    np.testing.assert_allclose(
        np.asarray(gram_solve(spec, v, maxiter=50)),
        np.asarray(whiten(spec, v, maxiter=50)),
    )


def test_tridiagonal_solve_matches_dense(rng):
    n, bsz = 12, 3
    d = jnp.asarray(rng.uniform(2.0, 3.0, (n, bsz)))
    c = jnp.asarray(rng.uniform(-0.5, 0.5, (n - 1, bsz)))
    b = jnp.asarray(rng.standard_normal((n, bsz)))
    x = tridiagonal_solve(d, c, b)
    for j in range(bsz):
        A = np.diag(np.asarray(d[:, j])) + np.diag(np.asarray(c[:, j]), 1) + np.diag(
            np.asarray(c[:, j]), -1
        )
        np.testing.assert_allclose(A @ np.asarray(x[:, j]), np.asarray(b[:, j]), rtol=1e-9, atol=1e-10)


def test_bidiag_factors_reconstruct(rng):
    """Full-rank GK run (v-started): A V = U B, B upper bidiagonal, with
    orthonormal U, V.  The last beta is the residual norm (beyond B)."""
    from hipgp_tpu.ops.bidiag import golub_kahan_bidiag

    N, M = 10, 14
    A = jnp.asarray(rng.standard_normal((M, N)))
    b = jnp.asarray(rng.standard_normal((N, 2)))
    f = golub_kahan_bidiag(lambda v: A @ v, lambda u: A.T @ u, b, num_iters=N)
    for j in range(2):
        U = np.asarray(f.U[:, :, j]).T  # (M, J)
        V = np.asarray(f.V[:, :, j]).T  # (N, J)
        np.testing.assert_allclose(U.T @ U, np.eye(N), atol=1e-8)
        np.testing.assert_allclose(V.T @ V, np.eye(N), atol=1e-8)
        B = np.diag(np.asarray(f.alphas[:, j])) + np.diag(
            np.asarray(f.betas[:-1, j]), 1
        )
        np.testing.assert_allclose(np.asarray(A) @ V, U @ B, atol=1e-8)


def test_bidiag_solve_full_rank_matches_formula(rng):
    """At J = N, c = V (B B^T)^{-1} alpha_1 ||b|| e_1 computed densely."""
    from hipgp_tpu.ops.bidiag import golub_kahan_bidiag

    N, M = 9, 12
    A = jnp.asarray(rng.standard_normal((M, N)))
    b = jnp.asarray(rng.standard_normal((N, 1)))
    c = bidiag_solve(lambda v: A @ v, lambda u: A.T @ u, b, num_iters=N)
    f = golub_kahan_bidiag(lambda v: A @ v, lambda u: A.T @ u, b, num_iters=N)
    V = np.asarray(f.V[:, :, 0]).T
    BBt = np.diag(np.asarray(f.alphas[:, 0] ** 2 + f.betas[:, 0] ** 2))
    off = np.asarray(f.alphas[1:, 0] * f.betas[:-1, 0])
    BBt += np.diag(off, 1) + np.diag(off, -1)
    e1 = np.zeros(N)
    e1[0] = float(f.alphas[0, 0]) * float(jnp.linalg.norm(b[:, 0]))
    want = V @ np.linalg.solve(BBt, e1)
    np.testing.assert_allclose(np.asarray(c[:, 0]), want, rtol=1e-6, atol=1e-8)


def test_dense_toeplitz_constructors_and_matmul(rng):
    from hipgp_tpu.ops import sym_toeplitz, toeplitz, toeplitz_matmul

    c = jnp.asarray(rng.standard_normal(6))
    r = jnp.asarray(np.concatenate([[float(c[0])], rng.standard_normal(4)]))
    T = np.asarray(toeplitz(c, r))
    for i in range(6):
        for j in range(5):
            want = float(c[i - j]) if i >= j else float(r[j - i])
            assert T[i, j] == pytest.approx(want)
    v = jnp.asarray(rng.standard_normal((3, 5)))
    got = toeplitz_matmul(c, r, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(v) @ T.T, rtol=1e-9, atol=1e-11)
    Ts = np.asarray(sym_toeplitz(c))
    np.testing.assert_allclose(Ts, Ts.T)


def test_interleaved_blocks_partition():
    from hipgp_tpu.utils.blocks import interleaved_block_indices

    blk = interleaved_block_indices((8, 8), 4)
    assert blk.shape == (16, 4)
    assert sorted(blk.reshape(-1).tolist()) == list(range(64))
