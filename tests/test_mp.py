"""Model-parallel (grid-sharded) HIP-GP vs the single-device model.

8 virtual CPU devices in a ('dp', 'grid') mesh; f64.  The sharded mean-field
batch_solve and predict must agree with `models.hipgp.HIPGP.batch_solve` /
`.predict` on a model built with the SAME shard padding (padding changes M'
but never K — see test_fft_sharded.test_shard_multiples_padding_is_exact).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipgp_tpu.kernels import SqExp
from hipgp_tpu.models import HIPGP
from hipgp_tpu.parallel import make_mesh, mp_batch_solve, mp_predict, mp_shard_state


def _mesh(ndp, ng):
    devs = np.array(jax.devices()[: ndp * ng]).reshape(ndp, ng)
    from jax.sharding import Mesh

    return Mesh(devs, ("dp", "grid"))


def _data(N=300, seed=0, dim=2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, 0.95, (N, dim))
    f = np.sin(3 * x[:, 0]) * np.cos(2 * x[:, -1])
    s = rng.uniform(0.05, 0.15, N)
    y = f + s * rng.standard_normal(N)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(s)


@pytest.mark.parametrize("ndp,ng", [(2, 4), (1, 8)])
def test_mp_batch_solve_matches_single_device(ndp, ng):
    x, y, s = _data()
    grids = [jnp.linspace(0.0, 1.0, 11)] * 2
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.15, noise2_init=0.01, grid_shards=ng,
                  dtype=jnp.float64)
    state = model.init_state()

    ref_state, ref_elbo = model.batch_solve(
        state, x, y, s, batch_size=100, maxiter_cg=50, compute_elbo=True,
        mean_solver="cg", mean_solver_maxiter=300, mean_solver_tol=1e-12,
    )

    mesh = _mesh(ndp, ng)
    got_state, got_elbo = mp_batch_solve(
        model, mp_shard_state(state, mesh), x, y, s, mesh,
        batch_size=100, maxiter_cg=50, mean_solver_maxiter=300,
        mean_solver_tol=1e-12, compute_elbo=True,
    )
    # theta1 comes out of a ~kappa=1e4 truncated CG mean solve; sharded
    # reduction order perturbs iterates at ~1e-5 relative (theta2 is tight)
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(got_elbo), float(ref_elbo), rtol=1e-6)


def test_mp_predict_matches_single_device():
    x, y, s = _data()
    grids = [jnp.linspace(0.0, 1.0, 11)] * 2
    ng = 4
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.15, noise2_init=0.01, grid_shards=ng,
                  dtype=jnp.float64)
    state = model.batch_solve(state=model.init_state(), xobs=x, yobs=y,
                              noise_std=s, batch_size=100, maxiter_cg=50)

    xq, _, _ = _data(N=123, seed=5)
    mu_ref, sig_ref = model.predict(state, xq, maxiter_cg=50)

    mesh = _mesh(2, ng)
    mu, sig = mp_predict(model, mp_shard_state(state, mesh), xq, mesh,
                         batch_size=64, maxiter_cg=50)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=1e-6, atol=1e-9)


def test_mp_1d_grid():
    """1-D model-parallel path (four-step sharded FFT under the model)."""
    x, y, s = _data(N=200, dim=1)
    ng = 4
    grids = [jnp.linspace(0.0, 1.0, 40)]
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.08, noise2_init=0.01, grid_shards=ng,
                  dtype=jnp.float64)
    assert model.edims[0] % (ng * ng) == 0, model.edims
    state = model.init_state()
    ref_state = model.batch_solve(state, x, y, s, batch_size=64,
                                  maxiter_cg=60, mean_solver="cg",
                                  mean_solver_maxiter=300,
                                  mean_solver_tol=1e-12)
    mesh = _mesh(2, ng)
    got_state = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s,
                               mesh, batch_size=64, maxiter_cg=60,
                               mean_solver_maxiter=300, mean_solver_tol=1e-12)
    # theta1 comes out of a ~kappa=1e4 truncated CG mean solve; sharded
    # reduction order perturbs iterates at ~1e-5 relative (theta2 is tight)
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-7, atol=1e-9)


def test_mp_integrated_obs():
    """Line-integral observations through the sharded path (analytic SqExp
    semi-integrated cross-covariances, `ziggy/kernels.py:223-237`)."""
    rng = np.random.default_rng(3)
    N = 150
    x = jnp.asarray(rng.uniform(0.1, 0.95, (N, 2)))
    y = jnp.asarray(rng.standard_normal(N))
    s = jnp.asarray(rng.uniform(0.1, 0.2, N))
    grids = [jnp.linspace(0.0, 1.0, 9)] * 2
    ng = 4
    model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                  ell_init=0.2, noise2_init=0.01, grid_shards=ng,
                  support_integrated_obs=True, dtype=jnp.float64)
    state = model.init_state()
    ref_state = model.batch_solve(state, x, y, s, batch_size=50,
                                  maxiter_cg=50, integrated_obs=True,
                                  mean_solver="cg",
                                  mean_solver_maxiter=300,
                                  mean_solver_tol=1e-12)
    mesh = _mesh(2, ng)
    got_state = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s,
                               mesh, batch_size=50, maxiter_cg=50,
                               integrated_obs=True,
                               mean_solver_maxiter=300,
                               mean_solver_tol=1e-12)
    # theta1 comes out of a ~kappa=1e4 truncated CG mean solve; sharded
    # reduction order perturbs iterates at ~1e-5 relative (theta2 is tight)
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=2e-4, atol=1e-6)

    mu_ref, sig_ref = model.predict(ref_state, x[:40], maxiter_cg=50,
                                    integrated_obs=True)
    mu, sig = mp_predict(model, mp_shard_state(got_state, mesh), x[:40],
                         mesh, maxiter_cg=50, integrated_obs=True)
    # atol covers near-zero mu entries where the sharded CG's reduction
    # order perturbs the ~1e4-conditioned mean solve at the last few ulps
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=1e-6, atol=1e-9)


def test_mp_rejects_unsupported_family():
    grids = [jnp.linspace(0.0, 1.0, 6)] * 2
    model = HIPGP(SqExp(), grids, num_obs=10, family="full-rank",
                  parameterization="standard", dtype=jnp.float64)
    mesh = _mesh(2, 4)
    with pytest.raises(ValueError, match="mean-field"):
        mp_batch_solve(model, model.init_state(), jnp.zeros((4, 2)),
                       jnp.zeros(4), None, mesh)


# ---------------------------------------------------------------------------
# block family under grid sharding (VERDICT round-2 item 4)
# ---------------------------------------------------------------------------


def _block_model(N, ng, block_sizes, grids=None, dim=2, **kw):
    grids = grids or [jnp.linspace(0.0, 1.0, 11)] * dim
    return HIPGP(SqExp(), grids, num_obs=N, family="block",
                 block_sizes=block_sizes, ell_init=0.15, noise2_init=0.01,
                 grid_shards=ng, dtype=jnp.float64, **kw)


@pytest.mark.parametrize("ndp,ng", [(2, 4), (1, 8)])
def test_mp_block_batch_solve_matches_single_device(ndp, ng):
    """Block-diagonal Lambda sharded over 'grid' along the block axis: the
    mp solve must match the single-device block batch_solve (blocks are
    independent in Lambda/S, so each shard owns whole blocks)."""
    x, y, s = _data()
    # leading chunk = rows_per (= padded edims[0]/ng) so blocks align with
    # the shard boundary for any ng
    from hipgp_tpu.ops.bttb import embedded_dims
    from hipgp_tpu.parallel.fft_sharded import shard_multiples

    e0 = embedded_dims((11, 11), shard_multiples((11, 11), ng))[0]
    model = _block_model(len(x), ng, (e0 // ng, 4))
    state = model.init_state()

    ref_state, ref_elbo = model.batch_solve(
        state, x, y, s, batch_size=100, maxiter_cg=50, compute_elbo=True,
        mean_solver="cg", mean_solver_maxiter=300, mean_solver_tol=1e-12,
    )
    mesh = _mesh(ndp, ng)
    got_state, got_elbo = mp_batch_solve(
        model, mp_shard_state(state, mesh), x, y, s, mesh,
        batch_size=100, maxiter_cg=50, mean_solver_maxiter=300,
        mean_solver_tol=1e-12, compute_elbo=True,
    )
    assert got_state.theta2.shape == ref_state.theta2.shape
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=2e-4, atol=1e-5)
    # off-diagonal block entries pass near zero; the truncated-PCG kn error
    # enters Lambda quadratically, so reduction order surfaces at ~1e-8 abs
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(got_elbo), float(ref_elbo), rtol=1e-6)


def test_mp_block_predict_matches_single_device():
    x, y, s = _data()
    ng = 4
    model = _block_model(len(x), ng, (5, 4))
    state = model.batch_solve(state=model.init_state(), xobs=x, yobs=y,
                              noise_std=s, batch_size=100, maxiter_cg=50)
    xq, _, _ = _data(N=123, seed=5)
    mu_ref, sig_ref = model.predict(state, xq, maxiter_cg=50)

    mesh = _mesh(2, ng)
    mu, sig = mp_predict(model, mp_shard_state(state, mesh), xq, mesh,
                         batch_size=64, maxiter_cg=50)
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref),
                               rtol=1e-6, atol=1e-9)


def test_mp_block_1d():
    x, y, s = _data(N=200, dim=1)
    ng = 4
    grids = [jnp.linspace(0.0, 1.0, 40)]
    model = _block_model(len(x), ng, (4,), grids=grids, dim=1)
    assert model.edims[0] % (ng * ng) == 0, model.edims
    state = model.init_state()
    ref_state = model.batch_solve(state, x, y, s, batch_size=64,
                                  maxiter_cg=60, mean_solver="cg",
                                  mean_solver_maxiter=300,
                                  mean_solver_tol=1e-12)
    mesh = _mesh(2, ng)
    got_state = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s,
                               mesh, batch_size=64, maxiter_cg=60,
                               mean_solver_maxiter=300, mean_solver_tol=1e-12)
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-6, atol=1e-6)


def test_mp_block_misaligned_raises():
    """Leading chunk size that does not divide the per-shard row count must
    fail loudly with the alignment explanation."""
    x, y, s = _data(N=40)
    ng = 4
    # nb = 100 (shardable 4 ways) but rows_per=5 is not divisible by chunk0=2
    model = _block_model(len(x), ng, (2, 2))
    mesh = _mesh(2, ng)
    with pytest.raises(ValueError, match="per-shard row count"):
        mp_batch_solve(model, mp_shard_state(model.init_state(), mesh),
                       x, y, s, mesh)


# ---------------------------------------------------------------------------
# mp memory scalability (VERDICT round-2 item 5): gram mean solver +
# sharded spectrum build
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("family,bs_kw", [
    ("mean-field", {}), ("block", {"block_sizes": (5, 4)}),
])
def test_mp_gram_mean_solver_matches_single_device(family, bs_kw):
    """mean_solver='gram': the exact Woodbury mean m = R (K+A)^{-1} b_m with
    A accumulated over 'dp' and K applied grid-sharded — NO kn stack kept
    (the memory profile for M' beyond the stacked-kn path), vs the
    single-device gram solver (`models/hipgp.py` batch_solve)."""
    x, y, s = _data()
    ng = 4
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 11)] * 2, num_obs=len(x),
                  family=family, ell_init=0.15, noise2_init=0.01,
                  grid_shards=ng, dtype=jnp.float64, **bs_kw)
    state = model.init_state()
    # mean_solver_maxiter 2000: converge the ~1e4-conditioned K+A PCG past
    # sharded-reduction-order sensitivity (see the factored tests)
    ref, ref_elbo = model.batch_solve(
        state, x, y, s, batch_size=100, maxiter_cg=50, compute_elbo=True,
        mean_solver="gram", mean_solver_maxiter=2000, mean_solver_tol=1e-12,
    )
    mesh = _mesh(2, ng)
    got, got_elbo = mp_batch_solve(
        model, mp_shard_state(state, mesh), x, y, s, mesh,
        batch_size=100, maxiter_cg=50, mean_solver="gram",
        mean_solver_maxiter=2000, mean_solver_tol=1e-12, compute_elbo=True,
    )
    np.testing.assert_allclose(np.asarray(got.theta1), np.asarray(ref.theta1),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(got.theta2), np.asarray(ref.theta2),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(got_elbo), float(ref_elbo), rtol=1e-6)


def test_mp_gram_1d():
    x, y, s = _data(N=200, dim=1)
    ng = 4
    grids = [jnp.linspace(0.0, 1.0, 40)]
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.08, noise2_init=0.01, grid_shards=ng,
                  dtype=jnp.float64)
    state = model.init_state()
    ref = model.batch_solve(state, x, y, s, batch_size=64, maxiter_cg=60,
                            mean_solver="gram", mean_solver_maxiter=300,
                            mean_solver_tol=1e-12)
    mesh = _mesh(2, ng)
    got = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s, mesh,
                         batch_size=64, maxiter_cg=60, mean_solver="gram",
                         mean_solver_maxiter=300, mean_solver_tol=1e-12)
    np.testing.assert_allclose(np.asarray(got.theta1), np.asarray(ref.theta1),
                               rtol=2e-4, atol=1e-5)


def test_mp_sharded_spectrum_matches_host():
    """spectrum_mode='sharded' (in-graph per-shard spectrum build, no device
    materializes all M' eigenvalues) must reproduce the host-built spectrum
    path through the full solve + predict."""
    x, y, s = _data()
    ng = 4
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 11)] * 2, num_obs=len(x),
                  family="mean-field", ell_init=0.15, noise2_init=0.01,
                  grid_shards=ng, dtype=jnp.float64)
    state = model.init_state()
    mesh = _mesh(2, ng)
    kw = dict(batch_size=100, maxiter_cg=50, mean_solver_maxiter=300,
              mean_solver_tol=1e-12, compute_elbo=True)
    st_h, elbo_h = mp_batch_solve(model, mp_shard_state(state, mesh),
                                  x, y, s, mesh, spectrum_mode="host", **kw)
    st_s, elbo_s = mp_batch_solve(model, mp_shard_state(state, mesh),
                                  x, y, s, mesh, spectrum_mode="sharded", **kw)
    # host and in-graph spectrum builds differ at the last f64 ulp (fusion
    # order); the kn/mean conditioning amplifies that seed to ~2e-6 in
    # theta1 (iteration-independent — measured identical at maxiter 2000)
    np.testing.assert_allclose(np.asarray(st_s.theta1),
                               np.asarray(st_h.theta1), rtol=5e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_s.theta2),
                               np.asarray(st_h.theta2), rtol=1e-7)
    np.testing.assert_allclose(float(elbo_s), float(elbo_h), rtol=1e-7)

    xq, _, _ = _data(N=64, seed=5)
    mu_h, sig_h = mp_predict(model, st_h, xq, mesh, maxiter_cg=50,
                             spectrum_mode="host")
    mu_s, sig_s = mp_predict(model, st_h, xq, mesh, maxiter_cg=50,
                             spectrum_mode="sharded")
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_h),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(sig_s), np.asarray(sig_h),
                               rtol=1e-6)


def test_mp_gram_integrated_obs():
    """gram mean solver with line-integral observations (the A accumulation
    uses the analytic semi-integrated cross-covariance)."""
    rng = np.random.default_rng(3)
    N = 150
    x = jnp.asarray(rng.uniform(0.1, 0.95, (N, 2)))
    y = jnp.asarray(rng.standard_normal(N))
    s = jnp.asarray(rng.uniform(0.1, 0.2, N))
    grids = [jnp.linspace(0.0, 1.0, 9)] * 2
    ng = 4
    model = HIPGP(SqExp(), grids, num_obs=N, family="mean-field",
                  ell_init=0.2, noise2_init=0.01, grid_shards=ng,
                  support_integrated_obs=True, dtype=jnp.float64)
    state = model.init_state()
    ref = model.batch_solve(state, x, y, s, batch_size=50, maxiter_cg=50,
                            integrated_obs=True, mean_solver="gram",
                            mean_solver_maxiter=300, mean_solver_tol=1e-12)
    mesh = _mesh(2, ng)
    got = mp_batch_solve(model, mp_shard_state(state, mesh), x, y, s, mesh,
                         batch_size=50, maxiter_cg=50, integrated_obs=True,
                         mean_solver="gram", mean_solver_maxiter=300,
                         mean_solver_tol=1e-12)
    np.testing.assert_allclose(np.asarray(got.theta1), np.asarray(ref.theta1),
                               rtol=2e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# factored solver under grid sharding (O(M) whitening solves, RESULTS §13)
# ---------------------------------------------------------------------------

# mean_solver_maxiter 2000: at this conditioning the (K+A) PCG needs
# ~1000+ iterations to converge past reduction-order sensitivity; once
# converged, sharded and single-device theta1 agree to ~5e-8 (measured)
FACTORED = dict(mean_solver="factored", mean_solver_maxiter=2000,
                mean_solver_tol=1e-12, factor_jitter=1e-12)


@pytest.mark.parametrize("ndp,ng", [(2, 4), (1, 8)])
def test_mp_factored_matches_single_device(ndp, ng):
    """The factored mp solve (A/b_m/scalars over dp, factor rows split over
    dp, grid-sharded whitening per row chunk, closed-form ELBO) must match
    the single-device factored batch_solve."""
    x, y, s = _data(N=400)
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 11)] * 2, num_obs=len(x),
                  family="mean-field", ell_init=0.15, noise2_init=0.01,
                  grid_shards=ng, dtype=jnp.float64)
    state = model.init_state()
    ref_state, ref_elbo = model.batch_solve(
        state, x, y, s, batch_size=100, maxiter_cg=50, compute_elbo=True,
        **FACTORED,
    )
    mesh = _mesh(ndp, ng)
    got_state, got_elbo = mp_batch_solve(
        model, mp_shard_state(state, mesh), x, y, s, mesh,
        batch_size=100, maxiter_cg=50, compute_elbo=True, **FACTORED,
    )
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(got_elbo), float(ref_elbo), rtol=1e-6)


def test_mp_factored_block():
    x, y, s = _data(N=400)
    from hipgp_tpu.ops.bttb import embedded_dims
    from hipgp_tpu.parallel.fft_sharded import shard_multiples

    ng = 4
    e0 = embedded_dims((11, 11), shard_multiples((11, 11), ng))[0]
    model = _block_model(len(x), ng, (e0 // ng, 4))
    state = model.init_state()
    ref_state, ref_elbo = model.batch_solve(
        state, x, y, s, batch_size=100, maxiter_cg=50, compute_elbo=True,
        **FACTORED,
    )
    mesh = _mesh(2, ng)
    got_state, got_elbo = mp_batch_solve(
        model, mp_shard_state(state, mesh), x, y, s, mesh,
        batch_size=100, maxiter_cg=50, compute_elbo=True, **FACTORED,
    )
    np.testing.assert_allclose(np.asarray(got_state.theta1),
                               np.asarray(ref_state.theta1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_state.theta2),
                               np.asarray(ref_state.theta2),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(float(got_elbo), float(ref_elbo), rtol=1e-6)


def test_mp_factored_guard_falls_back():
    """f32 + heavily clamped spectrum: the post-hoc exactness guard must
    detect the factor-column PCG breakdown and fall back to 'gram'."""
    rng = np.random.default_rng(3)
    N = 512
    x32 = jnp.asarray(rng.uniform(0.05, 0.95, (N, 2)), jnp.float32)
    y32 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    s32 = jnp.full((N,), 0.1, jnp.float32)
    ng = 4
    # ell = 2.5 grid spacings on a 33-point grid (edims 64): the heavily
    # clamped spectrum that breaks the rough-RHS PCG (RESULTS section 13)
    model = HIPGP(SqExp(), [jnp.linspace(0.0, 1.0, 33, dtype=jnp.float32)] * 2,
                  num_obs=N, family="mean-field", ell_init=0.08,
                  noise2_init=0.01, grid_shards=ng, dtype=jnp.float32)
    mesh = _mesh(2, ng)
    st0 = mp_shard_state(model.init_state(), mesh)
    with pytest.warns(RuntimeWarning, match="falling back"):
        st_f = mp_batch_solve(model, st0, x32, y32, s32, mesh,
                              batch_size=128, maxiter_cg=30,
                              mean_solver="factored")
    st_g = mp_batch_solve(model, st0, x32, y32, s32, mesh,
                          batch_size=128, maxiter_cg=30, mean_solver="gram")
    np.testing.assert_allclose(np.asarray(st_f.theta2),
                               np.asarray(st_g.theta2), rtol=1e-6)
    # spectrum_mode='sharded' must run the SAME f32 trust-region pre-check
    # (via the shard-local spectrum extrema) — it used to skip straight to
    # the factored solve
    with pytest.warns(RuntimeWarning, match="falling back"):
        st_s = mp_batch_solve(model, st0, x32, y32, s32, mesh,
                              batch_size=128, maxiter_cg=30,
                              mean_solver="factored",
                              spectrum_mode="sharded")
    # control: the sharded-spectrum gram solve — the exact path the
    # fallback must land on (the host-spectrum gram differs at this
    # clamped config's truncated-PCG level, ~1e-2)
    st_gs = mp_batch_solve(model, st0, x32, y32, s32, mesh,
                           batch_size=128, maxiter_cg=30,
                           mean_solver="gram", spectrum_mode="sharded")
    np.testing.assert_allclose(np.asarray(st_s.theta2),
                               np.asarray(st_gs.theta2), rtol=1e-6)


def test_ell_fit_mp_matches_single_device():
    """Mesh-aware ell_fit with parallel='mp': the grid-sharded sweep picks
    the same argmax as the single-device one (gram mean solver both sides:
    exact Woodbury mean, no truncated-CG reduction-order sensitivity)."""
    from hipgp_tpu.infer import ell_fit

    x, y, s = _data()
    grids = [jnp.linspace(0.0, 1.0, 11)] * 2
    model = HIPGP(SqExp(), grids, num_obs=len(x), family="mean-field",
                  ell_init=0.15, noise2_init=0.01, grid_shards=4,
                  dtype=jnp.float64)
    st = model.init_state()
    kw = dict(ell_min=0.1, ell_max=0.3, ell_step_size=0.1,
              batch_solve_bsz=100, maxiter_cg=50, verbose=False,
              mean_solver="gram")
    _, ell_1d, ells_1d, elbos_1d = ell_fit(model, st, x, y, s, **kw)
    _, ell_mp, ells_mp, elbos_mp = ell_fit(model, st, x, y, s,
                                           parallel="mp", mesh=_mesh(2, 4),
                                           **kw)
    assert ells_mp == ells_1d
    assert ell_mp == ell_1d
    # at the large-ell (ill-conditioned) candidates the maxiter_cg=50
    # TRUNCATED kn iterates differ under sharded reduction order (the
    # CLAUDE.md truncated-iterate trap) — the curve agrees to ~1e-2 there
    # while the argmax region is tight
    np.testing.assert_allclose(elbos_mp, elbos_1d, rtol=2e-2)
