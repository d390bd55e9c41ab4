"""Grid-sharded circulant solves vs single-device oracles (8 CPU devices)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.ops import (
    gram_solve,
    inv_matmul,
    make_spectrum,
    matmul_by_K,
)
from hipgp_tpu.parallel import make_mesh
from hipgp_tpu.parallel.fft_sharded import (
    sharded_gram_solve,
    sharded_inv_matmul,
    sharded_matmul_by_K,
)


@pytest.fixture(scope="module")
def setup():
    # dims (m0, m1) -> edims divisible by 8 shards
    grids = [jnp.linspace(0.0, 1.0, 17), jnp.linspace(0.0, 1.0, 13)]
    kf = lambda a, b: SqExp()(a, b, (1.0, 0.1))
    spec = make_spectrum(grids, kf, jitter=1e-3)
    assert spec.edims[0] % 8 == 0, spec.edims
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((5, spec.M)))
    mesh = make_mesh(8, axis_names=("grid",))
    return spec, b, mesh


def test_sharded_matmul_matches(setup):
    spec, b, mesh = setup
    got = sharded_matmul_by_K(spec, b, mesh, axis="grid")
    want = matmul_by_K(spec, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)


def test_sharded_inv_matmul_matches(setup):
    spec, b, mesh = setup
    got = sharded_inv_matmul(spec, b, mesh, axis="grid", maxiter=200, tol=1e-12)
    want = inv_matmul(spec, b, maxiter=200, tol=1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-7, atol=1e-9)


def test_sharded_gram_solve_matches(setup):
    spec, b, mesh = setup
    got = sharded_gram_solve(spec, b, mesh, axis="grid", maxiter=200, tol=1e-12)
    want = gram_solve(spec, b, maxiter=200, tol=1e-12)
    assert got.shape == want.shape == (5, spec.Mprime)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-7, atol=1e-9)


def test_sharded_rejects_bad_shard_count():
    grids = [jnp.linspace(0.0, 1.0, 4), jnp.linspace(0.0, 1.0, 4)]
    spec = make_spectrum(grids, lambda a, b: SqExp()(a, b, (1.0, 0.1)))
    mesh = make_mesh(8, axis_names=("grid",))
    b = jnp.ones((1, spec.M))
    with pytest.raises(ValueError):
        sharded_gram_solve(spec, b, mesh)  # edims[0]=6 not divisible by 8


def test_sharded_3d_matches_single_device():
    """3-D grid sharding (the dust-map regime)."""
    grids = [jnp.linspace(0.0, 1.0, 9), jnp.linspace(0.0, 1.0, 7),
             jnp.linspace(0.0, 1.0, 5)]
    kf = lambda a, b: SqExp()(a, b, (1.0, 0.2))
    spec = make_spectrum(grids, kf, jitter=1e-3)
    assert spec.edims[0] % 8 == 0 and spec.edims[-1] % 8 == 0, spec.edims
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((3, spec.M)))
    mesh = make_mesh(8, axis_names=("grid",))
    np.testing.assert_allclose(
        np.asarray(sharded_matmul_by_K(spec, b, mesh)),
        np.asarray(matmul_by_K(spec, b)), rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(sharded_gram_solve(spec, b, mesh, maxiter=150, tol=1e-12)),
        np.asarray(gram_solve(spec, b, maxiter=150, tol=1e-12)),
        rtol=1e-7, atol=1e-9,
    )


def test_sharded_1d_four_step_matches():
    """1-D grids shard via the distributed four-step FFT (the M=1e6
    pcg-vs-cholesky regime, `run_pcg_vs_cholesky.py:64` in the reference)."""
    from hipgp_tpu.parallel import shard_multiples

    M = 1000
    grids = [jnp.linspace(0.0, 1.0, M)]
    kf = lambda a, b: SqExp()(a, b, (1.0, 0.005))
    spec = make_spectrum(grids, kf, jitter=1e-3,
                         multiple_of=shard_multiples((M,), 8))
    assert spec.edims[0] % 64 == 0, spec.edims
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((4, M)))
    mesh = make_mesh(8, axis_names=("grid",))
    # force the four-step FFT path (the real target is L ~ 2^21 on TPU)
    np.testing.assert_allclose(
        np.asarray(sharded_matmul_by_K(spec, b, mesh)),
        np.asarray(matmul_by_K(spec, b)), rtol=1e-9, atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(sharded_gram_solve(spec, b, mesh, maxiter=100, tol=1e-12)),
        np.asarray(gram_solve(spec, b, maxiter=100, tol=1e-12)),
        rtol=1e-7, atol=1e-9,
    )


def test_sharded_long_axis_fft_path():
    """Axes beyond the matmul-basis limit transform via LOCAL complex FFTs
    mixed with real-basis matmuls on the short axes — exercised here by
    forcing a tiny matmul_max_len so the CPU test hits the FFT branch."""
    grids = [jnp.linspace(0.0, 1.0, 17), jnp.linspace(0.0, 1.0, 13)]
    kf = lambda a, b: SqExp()(a, b, (1.0, 0.1))
    spec = make_spectrum(grids, kf, jitter=1e-3)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((5, spec.M)))
    mesh = make_mesh(8, axis_names=("grid",))
    for max_len in (0, 30):  # 0: both axes FFT; 30: leading FFT, minor matmul
        np.testing.assert_allclose(
            np.asarray(sharded_matmul_by_K(spec, b, mesh,
                                           matmul_max_len=max_len)),
            np.asarray(matmul_by_K(spec, b)), rtol=1e-9, atol=1e-11,
        )
        np.testing.assert_allclose(
            np.asarray(sharded_gram_solve(spec, b, mesh, maxiter=150,
                                          tol=1e-12, matmul_max_len=max_len)),
            np.asarray(gram_solve(spec, b, maxiter=150, tol=1e-12)),
            rtol=1e-7, atol=1e-9,
        )


def test_shard_multiples_padding_is_exact():
    """Padding the embedding to shard-divisible lengths changes M' but
    NEVER the operator K."""
    from hipgp_tpu.ops import dense_gram
    from hipgp_tpu.parallel import shard_multiples

    grids = [jnp.linspace(0.0, 1.0, 15), jnp.linspace(0.0, 1.0, 4)]
    kf = lambda a, b: SqExp()(a, b, (1.0, 0.07))
    # minimal edims (30, 6): neither divisible by 8
    spec_pad = make_spectrum(grids, kf, jitter=1e-3,
                             multiple_of=shard_multiples((15, 4), 8))
    assert spec_pad.edims[0] % 8 == 0 and spec_pad.edims[-1] % 8 == 0
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal((3, spec_pad.M)))
    Kd = dense_gram(grids, kf, jitter=1e-3)
    np.testing.assert_allclose(
        np.asarray(matmul_by_K(spec_pad, b)), np.asarray(b @ Kd),
        rtol=1e-9, atol=1e-11,
    )
    mesh = make_mesh(8, axis_names=("grid",))
    np.testing.assert_allclose(
        np.asarray(sharded_matmul_by_K(spec_pad, b, mesh)),
        np.asarray(b @ Kd), rtol=1e-9, atol=1e-11,
    )


def test_local_spectrum_weights_matches_host():
    """In-graph per-shard spectrum build (no device materializes all M'
    eigenvalues) vs host_weights, machine precision, 1-D/2-D/3-D."""
    from jax import shard_map
    from jax.sharding import Mesh
    from hipgp_tpu.ops import make_spectrum
    from hipgp_tpu.parallel.fft_sharded import (
        GridShardInfo, host_weights, local_spectrum_weights, shard_multiples,
        weights_pspec,
    )
    from hipgp_tpu.kernels import Matern, SqExp

    cases = [((11, 13), 4, SqExp(), 0.15),
             ((9, 7, 6), 4, Matern(2.5), 0.2),
             ((40,), 4, SqExp(), 0.08),
             ((300,), 8, Matern(1.5), 0.01)]
    for dims, ng, kern, ell in cases:
        grids = [jnp.linspace(0.0, 1.0, m) for m in dims]
        kf = lambda a, b: kern(a, b, (1.3, ell))
        spec = make_spectrum(grids, kf, jitter=1e-3,
                             multiple_of=shard_multiples(dims, ng))
        info = GridShardInfo(spec, ng)
        want = host_weights(spec, info)
        mesh = Mesh(np.array(jax.devices()[:ng]), ("grid",))
        fn = shard_map(
            lambda: local_spectrum_weights(grids, kf, info, "grid",
                                           jitter=1e-3),
            mesh=mesh, in_specs=(), out_specs=weights_pspec(info, "grid"),
            check_vma=False,
        )
        got = jax.jit(fn)()
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-13, err_msg=str(dims))
