"""BTTB operator correctness against dense oracles (1-D/2-D/3-D grids)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import Matern, SqExp
from hipgp_tpu.ops import (
    circulant_embed,
    dense_gram,
    expanded_dims,
    make_spectrum,
    matmul_by_Cinv,
    matmul_by_K,
    matmul_by_R,
    matmul_by_RT,
    toeplitz_column,
)

JITTER = 1e-3
PARAMS = (1.3, 0.1)  # ell small enough that the circulant embedding is PSD (no clamp)


def _grids(dims):
    return [jnp.linspace(0.0, 1.0, m) for m in dims]


def _kfun(kernel=None):
    kernel = kernel or SqExp()
    return lambda x, y: kernel(x, y, PARAMS)


@pytest.mark.parametrize("dims", [(17,), (9, 7), (5, 4, 3)])
def test_column_matches_dense_first_row(dims):
    grids = _grids(dims)
    col = toeplitz_column(grids, _kfun(), jitter=JITTER)
    K = dense_gram(grids, _kfun(), jitter=JITTER)
    np.testing.assert_allclose(np.asarray(col).ravel(), np.asarray(K[0]), rtol=1e-12)


@pytest.mark.parametrize("dims", [(17,), (9, 7), (5, 4, 3)])
@pytest.mark.parametrize("kernel", [SqExp(), Matern(2.5)])
def test_gram_matvec_matches_dense(dims, kernel, rng):
    grids = _grids(dims)
    spec = make_spectrum(grids, _kfun(kernel), jitter=JITTER)
    K = dense_gram(grids, _kfun(kernel), jitter=JITTER)
    M = K.shape[0]
    v = jnp.asarray(rng.standard_normal((4, M)))
    got = matmul_by_K(spec, v)
    want = v @ K.T  # K symmetric
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("dims", [(17,), (9, 7)])
def test_R_RT_factorize_K(dims, rng):
    """R R^T = K: whitening consistency. R^T: M->M', R: M'->M."""
    grids = _grids(dims)
    spec = make_spectrum(grids, _kfun(), jitter=JITTER)
    K = dense_gram(grids, _kfun(), jitter=JITTER)
    M = K.shape[0]
    v = jnp.asarray(rng.standard_normal((3, M)))
    rrt_v = matmul_by_R(spec, matmul_by_RT(spec, v))
    want = v @ K.T
    np.testing.assert_allclose(np.asarray(rrt_v), np.asarray(want), rtol=1e-8, atol=1e-9)


def test_rt_output_shape():
    dims = (9, 7)
    grids = _grids(dims)
    spec = make_spectrum(grids, _kfun())
    assert spec.edims == expanded_dims(dims) == (16, 12)
    v = jnp.ones((2, spec.M))
    assert matmul_by_RT(spec, v).shape == (2, 16 * 12)


def test_cinv_is_inverse_on_circulant(rng):
    """C^{-1} composed with C acts as identity on the expanded space;
    on the original space it is only a preconditioner, so test via the
    expanded circulant operator directly."""
    dims = (9, 7)
    grids = _grids(dims)
    spec = make_spectrum(grids, _kfun())
    # Build dense circulant operator by applying "embed->scale->extract full".
    Mp = spec.Mprime
    v = jnp.asarray(rng.standard_normal((2, Mp)))

    def c_apply(w):
        x = w.reshape((-1,) + spec.edims)
        fx = jnp.fft.rfftn(x, axes=(-2, -1))
        return jnp.fft.irfftn(fx * spec.eigs, s=spec.edims, axes=(-2, -1)).reshape(
            w.shape[0], -1
        )

    def cinv_apply(w):
        x = w.reshape((-1,) + spec.edims)
        fx = jnp.fft.rfftn(x, axes=(-2, -1))
        return jnp.fft.irfftn(fx / spec.eigs, s=spec.edims, axes=(-2, -1)).reshape(
            w.shape[0], -1
        )

    np.testing.assert_allclose(
        np.asarray(cinv_apply(c_apply(v))), np.asarray(v), rtol=1e-9, atol=1e-10
    )


def test_circulant_embed_shape_and_symmetry():
    col = jnp.arange(5.0)
    emb = circulant_embed(col)
    assert emb.shape == (8,)
    np.testing.assert_allclose(np.asarray(emb), [0, 1, 2, 3, 4, 3, 2, 1])


def test_spectrum_positive():
    grids = _grids((25, 25))
    spec = make_spectrum(grids, _kfun(), jitter=1e-3)
    assert np.all(np.asarray(spec.eigs) >= 1e-6)


def test_matvec_f32_close_to_f64(rng):
    """f32 path (TPU dtype) stays within a few ulps of the f64 oracle."""
    dims = (16, 16)
    grids32 = [g.astype(jnp.float32) for g in _grids(dims)]
    grids64 = _grids(dims)
    spec32 = make_spectrum(grids32, _kfun())
    spec64 = make_spectrum(grids64, _kfun())
    v64 = jnp.asarray(rng.standard_normal((2, spec64.M)))
    v32 = v64.astype(jnp.float32)
    got32 = matmul_by_K(spec32, v32)
    got64 = matmul_by_K(spec64, v64)
    assert got32.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got32), np.asarray(got64), rtol=2e-4, atol=2e-5
    )


def test_ard_spectrum_matches_dense(rng):
    """ARD (per-dimension) lengthscales through the wrapped-lag embedding."""
    from hipgp_tpu.ops import make_spectrum, matmul_by_K, dense_gram

    grids = _grids((12, 10))
    ell = jnp.asarray([0.08, 0.14])
    kfun = lambda x, y: SqExp()(x, y, (1.1, ell))
    spec = make_spectrum(grids, kfun, jitter=1e-3)
    K = dense_gram(grids, kfun, jitter=1e-3)
    v = jnp.asarray(rng.standard_normal((3, K.shape[0])))
    np.testing.assert_allclose(
        np.asarray(matmul_by_K(spec, v)), np.asarray(v @ K.T), rtol=1e-8, atol=1e-9
    )


def test_1d_grid_model_supported(rng):
    """HIPGP on a single 1-D grid (the reference asserts len(xgrids) > 1;
    we support 1-D, used by the derivative-observation workflow)."""
    from hipgp_tpu.models import HIPGP

    grid = jnp.linspace(0.0, 1.0, 16)
    model = HIPGP(SqExp(), [grid], num_obs=30, family="mean-field",
                  whitened_type="ziggy", ell_init=0.1, noise2_init=0.01)
    x = jnp.asarray(rng.uniform(0, 1, (30, 1)))
    y = jnp.sin(5 * x[:, 0])
    s = jnp.full(30, 0.1)
    st = model.batch_solve(model.init_state(), x, y, s, maxiter_cg=100)
    mu, sig = model.predict(st, x, maxiter_cg=100)
    assert float(jnp.sqrt(jnp.mean((mu - y) ** 2))) < 0.2


def test_toeplitz_getitem_matches_dense(rng):
    from hipgp_tpu.ops import toeplitz, toeplitz_getitem

    c = jnp.asarray(rng.standard_normal(7))
    r = jnp.asarray(rng.standard_normal(7)).at[0].set(c[0])
    T = np.asarray(toeplitz(c, r))
    ii, jj = np.meshgrid(np.arange(7), np.arange(7), indexing="ij")
    got = np.asarray(toeplitz_getitem(c, r, ii.ravel(), jj.ravel())).reshape(7, 7)
    np.testing.assert_allclose(got, T)


def test_fft_path_hyperparam_gradcheck(rng):
    """Hyperparameter gradients through the packed-FFT transform path
    (1-D edim > MATMUL_DFT_MAX_LEN) match finite differences."""
    from hipgp_tpu.ops import whiten
    from hipgp_tpu.kernels import Matern

    m = 300  # edim 598 -> pow2 1024: forces the XLA-FFT (complex-packed) path
    grids = [jnp.linspace(0.0, 1.0, m)]
    b = jnp.asarray(rng.standard_normal((3, m)))

    def loss(log_ell):
        kfun = lambda x, y: Matern(1.5)(x, y, (1.0, jnp.exp(log_ell)))
        spec = make_spectrum(grids, kfun, jitter=1e-3)
        return jnp.sum(whiten(spec, b, maxiter=400, tol=1e-12) ** 2)

    le = jnp.log(0.05)
    g = jax.grad(loss)(le)
    eps = 1e-6
    fd = (loss(le + eps) - loss(le - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)


def test_matmul_spectrum_matches_fft(rng):
    """transform='matmul' (cosine-matrix eigendecomposition, FFT-free) must
    produce the SAME clamped spectrum as the default FFT build — it is the
    path the model-parallel natgrad graph uses (mp.make_mp_kn_fn)."""
    from hipgp_tpu.kernels import Matern, SqExp

    for kern, nd, m in [(SqExp(), 2, 11), (Matern(1.5), 1, 40),
                        (SqExp(), 3, 7)]:
        grids = [jnp.linspace(0.0, 1.0, m)] * nd
        kfun = lambda x, y: kern(x, y, (1.3, 0.12))
        s_f = make_spectrum(grids, kfun, jitter=1e-3, transform="fft")
        s_m = make_spectrum(grids, kfun, jitter=1e-3, transform="matmul")
        np.testing.assert_allclose(np.asarray(s_m.eigs), np.asarray(s_f.eigs),
                                   rtol=1e-12, atol=1e-13)


def test_matmul_spectrum_hyperparam_gradcheck(rng):
    """Hyper gradients through the cosine-matmul spectrum build match FD."""
    from hipgp_tpu.ops import whiten
    from hipgp_tpu.kernels import SqExp

    grids = [jnp.linspace(0.0, 1.0, 9)] * 2
    b = jnp.asarray(rng.standard_normal((3, 81)))

    def loss(log_ell):
        kfun = lambda x, y: SqExp()(x, y, (1.0, jnp.exp(log_ell)))
        spec = make_spectrum(grids, kfun, jitter=1e-3, transform="matmul")
        return jnp.sum(whiten(spec, b, maxiter=200, tol=1e-12) ** 2)

    le = jnp.log(0.08)
    g = jax.grad(loss)(le)
    eps = 1e-6
    fd = (loss(le + eps) - loss(le - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
